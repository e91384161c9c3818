"""ORC round-trip parity and tolerant JSON-lines degradation
(sources/formats.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.plans import audit
from seo_audit_etl_actor_spark.session import load_table
from seo_audit_etl_actor_spark.sources import formats


def test_orc_roundtrip_parity_and_pushdown(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    formats.write_orc(docs, path)
    back = formats.read_orc(spark, path)
    assert back.count() == docs.count()
    a = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    assert a == b
    # the same scan machinery as parquet: filter pushdown + column pruning
    q = back.where(F.col("doc_id") < 10).select("doc_id")
    assert any("doc_id" in f for f in audit.pushed_filters(q))
    assert audit.read_schema_columns(q) == {"doc_id"}


SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def test_jsonl_tolerant_quarantines_bad_rows(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "good row"}),
        "{not json at all",
        json.dumps({"doc_id": 2, "text": "another good row"}),
        '{"doc_id": "not-a-number", "text": "type mismatch"}',
        "",
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    df = formats.read_jsonl_tolerant(spark, str(p), SCHEMA)
    rows = df.collect()
    clean = [r for r in rows if r[formats.CORRUPT_COL] is None]
    bad = [r for r in rows if r[formats.CORRUPT_COL] is not None]
    assert sorted(r["doc_id"] for r in clean if r["doc_id"] is not None) == [1, 2]
    # the raw bad line is preserved for quarantine
    assert any("{not json at all" in r[formats.CORRUPT_COL] for r in bad)
    # type-mismatch row: corrupt carries the original line, fields null
    assert any("not-a-number" in r[formats.CORRUPT_COL] for r in bad)
    # no exception was raised anywhere - per-row degradation, not job failure
