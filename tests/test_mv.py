"""Incremental MV maintenance from the lake CDC feed: merge ≡ recompute,
exactly (integer measures), including group-moving rows and emptied
groups (operators/mv.py + lake_maintenance.diff_versions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import lake_maintenance as lm
from seo_audit_etl_actor_spark.operators.mv import apply_cdc_to_view, grouped_sum_view
from seo_audit_etl_actor_spark.session import load_table

MEASURES = {"total_chars": "CAST(n_chars AS BIGINT)"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_merge_equals_recompute(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake_mv")
    docs = load_table(spark, sf_dir, "documents")
    lm.publish_version(docs, lake_dir)
    v1 = lm.read_lake(spark, lake_dir, 1)
    view1 = grouped_sum_view(v1, "source", MEASURES)

    # v2: mutate chars for doc 0, MOVE doc 1 to another source, remove
    # doc 2, add a brand-new doc in a brand-new source, and empty one
    # source entirely
    some_source = docs.where(F.col("doc_id") == 3).first()["source"]
    v2 = (
        docs.where((F.col("doc_id") != 2) & (F.col("source") != some_source))
        .withColumn(
            "n_chars",
            F.when(F.col("doc_id") == 0, F.col("n_chars") + 1000).otherwise(
                F.col("n_chars")
            ),
        )
        .withColumn(
            "source",
            F.when(F.col("doc_id") == 1, F.lit("moved_source")).otherwise(
                F.col("source")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [(777777, "brand new text", "en", "new_source", 14)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    lm.publish_version(v2, lake_dir)

    cdc = lm.diff_versions(spark, lake_dir, 1, 2, ["doc_id"], include_values=True)
    incremental = apply_cdc_to_view(view1, cdc, "source", MEASURES)
    recomputed = grouped_sum_view(lm.read_lake(spark, lake_dir, 2), "source", MEASURES)
    assert _rows(incremental) == _rows(recomputed)
    # the emptied source must be gone, the new ones present
    sources = {r["source"] for r in incremental.collect()}
    assert some_source not in sources
    assert {"moved_source", "new_source"} <= sources


def test_string_literal_measures_survive_prefixing(spark, sf_dir, tmp_path):
    """ADVICE r4: _prefix_expr must not rewrite identifiers inside '...'
    literals (CASE WHEN lang = 'en' must not become new.lang = 'new.en')."""
    measures = {
        "en_chars": "CASE WHEN lang = 'en' THEN CAST(n_chars AS BIGINT) ELSE 0 END"
    }
    lake_dir = str(tmp_path / "lake_mv_lit")
    docs = load_table(spark, sf_dir, "documents")
    lm.publish_version(docs, lake_dir)
    view1 = grouped_sum_view(lm.read_lake(spark, lake_dir, 1), "source", MEASURES | measures)
    v2 = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.lit("en")).otherwise(F.col("lang")),
    ).where(F.col("doc_id") % 11 != 3)
    lm.publish_version(v2, lake_dir)
    cdc = lm.diff_versions(spark, lake_dir, 1, 2, ["doc_id"], include_values=True)
    incremental = apply_cdc_to_view(view1, cdc, "source", MEASURES | measures)
    recomputed = grouped_sum_view(
        lm.read_lake(spark, lake_dir, 2), "source", MEASURES | measures
    )
    assert _rows(incremental) == _rows(recomputed)


def test_noop_cdc_leaves_view_unchanged(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake_mv2")
    docs = load_table(spark, sf_dir, "documents")
    lm.publish_version(docs, lake_dir)
    lm.publish_version(docs, lake_dir)  # identical v2
    view = grouped_sum_view(lm.read_lake(spark, lake_dir, 1), "source", MEASURES)
    cdc = lm.diff_versions(spark, lake_dir, 1, 2, ["doc_id"], include_values=True)
    assert _rows(apply_cdc_to_view(view, cdc, "source", MEASURES)) == _rows(view)
