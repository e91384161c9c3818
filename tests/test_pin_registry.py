"""Cache-pin registry (operators/pin_registry.py): the durable backstop
for the `_spark_graft_release` attribute the near-dup pipelines hang on
their result DataFrames. ADVICE r5: any caller-side transformation between
pipeline output and consumer drops that attribute silently, leaking the
persisted frames for the session — the registry must still release them
via drain(), and double-release through both paths must be harmless."""

from __future__ import annotations

from seo_audit_etl_actor_spark.operators import pin_registry
from seo_audit_etl_actor_spark.operators.components import connected_components
from seo_audit_etl_actor_spark.operators.dedup import minhash_near_dup_pairs


def _docs(spark, n=40):
    rows = [(i, f"alpha beta gamma delta epsilon zeta token{i % 4} " * 3) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_register_release_is_idempotent_and_deregisters():
    calls = []
    rel = pin_registry.register(lambda: calls.append(1))
    before = pin_registry.pinned_count()
    rel()
    rel()
    assert calls == [1]
    assert pin_registry.pinned_count() == before - 1
    # drain must not re-fire an already-released pin
    pin_registry.drain()
    assert calls == [1]


def test_attribute_release_also_clears_registry(spark):
    pin_registry.drain()  # isolate
    pairs = minhash_near_dup_pairs(_docs(spark), threshold=0.2)
    assert pin_registry.pinned_count() >= 1
    connected_components(pairs)  # consumes via the attribute hook
    assert pin_registry.pinned_count() == 0
    assert pin_registry.drain() == 0


def test_drain_releases_pins_lost_to_transformations(spark):
    """The ADVICE failure mode: a .select between the pipeline and the
    consumer drops the attribute; drain() must still unpersist."""
    pin_registry.drain()
    pairs = minhash_near_dup_pairs(_docs(spark), threshold=0.2)
    reshaped = pairs.select("id_a", "id_b")  # attribute silently lost
    assert not hasattr(reshaped, "_spark_graft_release")
    connected_components(reshaped)
    assert pin_registry.pinned_count() >= 1  # would leak without the registry
    released = pin_registry.drain()
    assert released >= 1
    assert pin_registry.pinned_count() == 0
