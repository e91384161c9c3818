"""Streaming curation funnel vs the batch funnel (the streaming analog of
the oracle-differential strategy, SURVEY §5.2): draining the document
stream must reproduce the batch curation_funnel's per-(source, stage)
doc/token counts exactly.

Input files are id-range-partitioned (file 1 = low ids, file 2 = high
ids) so first-arrival keep-first coincides with the batch min-doc_id
keep-first — that makes the differential exact, including every
`duplicate` row. A second drain starting from existing state checks the
cross-batch dedup path: a re-sent document must come back `duplicate`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators.curation import curation_funnel
from seo_audit_etl_actor_spark.session import load_table
from seo_audit_etl_actor_spark.streaming import curation as sc
from seo_audit_etl_actor_spark.streaming.events import run_to_completion


@pytest.fixture(scope="module")
def doc_stream_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("doc_stream")
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    docs.where(F.col("doc_id") <= mid).coalesce(1).write.mode("overwrite").parquet(
        str(out / "f1")
    )
    docs.where(F.col("doc_id") > mid).coalesce(1).write.mode("overwrite").parquet(
        str(out / "f2")
    )
    # one directory, two files: availableNow drains both (file order by
    # path name keeps low ids first when batches split)
    import shutil

    final = tmp_path_factory.mktemp("doc_stream_flat")
    i = 0
    for sub in ("f1", "f2"):
        for p in sorted((out / sub).glob("*.parquet")):
            shutil.copy(p, final / f"part-{i:03d}.parquet")
            i += 1
    return str(final)


def test_stream_funnel_matches_batch(spark, sf_dir, doc_stream_dir, tmp_path):
    stream = sc.read_document_stream(spark, doc_stream_dir)
    verdicts = sc.curate_document_stream(stream)
    sink, totals = sc.funnel_stats_sink(spark)
    q = (
        verdicts.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r["source"], r["stage"]): (r["n_docs"], r["total_tokens"])
        for r in curation_funnel(load_table(spark, sf_dir, "documents")).collect()
    }
    got = {k: (v[0], v[1]) for k, v in totals.items()}
    assert got == batch
    assert sum(v[0] for v in got.values()) == load_table(
        spark, sf_dir, "documents"
    ).count()


def test_resent_documents_flag_duplicate_across_restarts(spark, doc_stream_dir, tmp_path):
    """State survival: drain once, then drop the SAME files in again under
    the same checkpoint — every re-sent doc must be labeled duplicate
    (its fingerprint is in state from the first drain)."""
    import shutil
    from pathlib import Path

    src = Path(doc_stream_dir)
    live = tmp_path / "live"
    live.mkdir()
    for p in sorted(src.glob("*.parquet")):
        shutil.copy(p, live / p.name)

    stream = sc.read_document_stream(spark, str(live))
    verdicts = sc.curate_document_stream(stream)
    ck = str(tmp_path / "ck2")

    sink1, totals1 = sc.funnel_stats_sink(spark)
    q1 = (
        verdicts.writeStream.foreachBatch(sink1)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    n_docs = sum(v[0] for v in totals1.values())

    for p in sorted(src.glob("*.parquet")):
        shutil.copy(p, live / f"resend-{p.name}")
    sink2, totals2 = sc.funnel_stats_sink(spark)
    q2 = (
        verdicts.writeStream.foreachBatch(sink2)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    dup_only = {k: v for k, v in totals2.items() if k[1] == "duplicate"}
    assert sum(v[0] for v in totals2.values()) == n_docs
    assert sum(v[0] for v in dup_only.values()) == n_docs


def test_mark_duplicates_group_spanning_chunks():
    """Regression (ADVICE r3): a fingerprint group spanning multiple Arrow
    chunks within one micro-batch must keep the GLOBAL min doc_id, not the
    first chunk's local min. Feed the state fn two chunks where the
    group's true min lives in the SECOND chunk."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.updated = v

    def chunk(ids):
        return pd.DataFrame(
            {
                "doc_id": ids,
                "source": ["s"] * len(ids),
                "pred_lang": ["en"] * len(ids),
                "n_tokens": [10] * len(ids),
                "q4": [100] * len(ids),
            }
        )

    state = FakeState()
    (out,) = list(
        sc.mark_duplicates(("fp",), iter([chunk([50, 70]), chunk([10, 60])]), state)
    )
    kept = out.loc[~out["is_dup"], "doc_id"].tolist()
    assert kept == [10]  # global min across chunks, not 50
    assert out["is_dup"].sum() == 3
    assert state.updated == (True,)

    # already-seen fingerprint: everything is a duplicate
    state2 = FakeState()
    state2.exists = True
    (out2,) = list(sc.mark_duplicates(("fp",), iter([chunk([1, 2])]), state2))
    assert out2["is_dup"].all()
