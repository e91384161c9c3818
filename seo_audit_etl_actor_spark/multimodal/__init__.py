"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages (north-star extension surface)."""
