"""Multimodal binary-column plumbing tests: binaryFile scan → mapInPandas
metadata extraction → content dedup. Codec-free: PNG/JPEG headers are
synthesized byte-exactly; the pixel-decode stub must raise."""

from __future__ import annotations

import struct

import pytest

from seo_audit_etl_actor_spark.multimodal import binary_ops as B


def _png(w: int, h: int) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08\x06" + b"\x00" * 64


def _jpeg(w: int, h: int) -> bytes:
    sof0 = b"\xff\xc0" + struct.pack(">H", 8 + 9) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9 + sof0 + b"\x00" * 32


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "a.png").write_bytes(_png(640, 480))
    (d / "b.jpg").write_bytes(_jpeg(1024, 768))
    (d / "dup_of_a.png").write_bytes(_png(640, 480))
    (d / "junk.bin").write_bytes(b"\x00\x01\x02" * 100)
    return str(d)


def test_image_meta_extraction(spark, blob_dir):
    df = B.read_binary_dir(spark, blob_dir)
    meta = {r["path"].rsplit("/", 1)[-1]: r for r in B.decode_image_meta(df).collect()}
    assert meta["a.png"]["format"] == "png"
    assert (meta["a.png"]["width"], meta["a.png"]["height"]) == (640, 480)
    assert meta["b.jpg"]["format"] == "jpeg"
    assert (meta["b.jpg"]["width"], meta["b.jpg"]["height"]) == (1024, 768)
    assert meta["junk.bin"]["format"] is None
    assert meta["a.png"]["content_sha1"] == meta["dup_of_a.png"]["content_sha1"]


def test_content_dedup(spark, blob_dir):
    meta = B.decode_image_meta(B.read_binary_dir(spark, blob_dir))
    dups = B.dedup_by_content(meta).collect()
    assert len(dups) == 1
    assert dups[0]["n_copies"] == 2
    assert dups[0]["canonical_path"].endswith("a.png")


def test_frame_sampler_shape(spark, blob_dir):
    frames = B.sample_frames(B.read_binary_dir(spark, blob_dir), every_n_bytes=64, max_frames=3)
    rows = frames.collect()
    assert {r["path"].rsplit("/", 1)[-1] for r in rows} == {"a.png", "b.jpg", "dup_of_a.png", "junk.bin"}
    assert all(0 <= r["frame_idx"] < 3 for r in rows)
    assert all(len(r["frame_fingerprint"]) == 40 for r in rows)


def test_thumb_decode_deterministic_fake(spark, blob_dir):
    """decode_image_thumbs: fixed-width rows per image, deterministic
    content-derived thumbs (identical blobs → identical thumbs), header
    dims carried through."""
    df = B.read_binary_dir(spark, blob_dir)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in B.decode_image_thumbs(df).collect()}
    assert set(rows) == {"a.png", "b.jpg", "dup_of_a.png", "junk.bin"}
    for r in rows.values():
        assert len(r["thumb"]) == B.THUMB_SIDE**2
        assert all(0 <= v <= 255 for v in r["thumb"])
        assert abs(r["mean_luma"] - sum(r["thumb"]) / len(r["thumb"])) < 1e-9
    assert rows["a.png"]["thumb"] == rows["dup_of_a.png"]["thumb"]
    assert rows["a.png"]["format"] == "png" and rows["junk.bin"]["format"] is None
    assert rows["a.png"]["width"] is not None
    # rerun → identical output (deterministic fake decoder)
    again = {r["path"].rsplit("/", 1)[-1]: r for r in B.decode_image_thumbs(df).collect()}
    assert {k: v["thumb"] for k, v in rows.items()} == {k: v["thumb"] for k, v in again.items()}
