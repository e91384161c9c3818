"""Distributed fetch (S1 scale path): file:// URLs through the executor-side
fetch must byte-match the files, dead URLs must degrade to status rows, and
the fetch → unzip → csv-parse chain must compose without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.sources.fetch_distributed import fetch_urls
from seo_audit_etl_actor_spark.sources.zip_distributed import explode_zip_entries
from tests.fixtures_seo import build_fixture_zip


@pytest.fixture(scope="module")
def url_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fetch")
    (d / "one.zip").write_bytes(build_fixture_zip())
    (d / "two.bin").write_bytes(b"\x00\x01payload")
    return d


def test_fetch_bytes_match_and_dead_urls_degrade(spark, url_dir):
    urls = [
        (f"file://{url_dir}/one.zip",),
        (f"file://{url_dir}/two.bin",),
        (f"file://{url_dir}/missing.zip",),
    ]
    out = {r["url"]: r for r in fetch_urls(spark.createDataFrame(urls, "url: string")).collect()}
    assert bytes(out[urls[0][0]]["content"]) == (url_dir / "one.zip").read_bytes()
    assert bytes(out[urls[1][0]]["content"]) == b"\x00\x01payload"
    dead = out[urls[2][0]]
    assert dead["status"] == "error" and dead["content"] is None and dead["error"]


def test_fetch_unzip_parse_chain_is_map_only(spark, url_dir):
    urls = spark.createDataFrame([(f"file://{url_dir}/one.zip",)], "url: string")
    fetched = fetch_urls(urls).where(F.col("status") == "ok")
    entries = explode_zip_entries(fetched, content_col="content", path_col="url")
    plan = entries._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    names = {r["entry_name"] for r in entries.collect()}
    assert "ahrefs_keywords.csv" in names and any(n.startswith("ahrefs_site_audit.zip!") for n in names)
