"""Distributed ZIP explode (SURVEY §2.1 S3/S4 scale path): the binaryFile +
mapInPandas route must byte-match the driver-side zipfile parse of the same
FIXTURES.md archive, including nested-ZIP expansion and the partial-degrade
statuses."""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.sources import zip_distributed as zd
from seo_audit_etl_actor_spark.sources.csv_smart import parse_csv_smart_rows
from tests.fixtures_seo import build_fixture_zip


@pytest.fixture(scope="module")
def zip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zips")
    (d / "audit_fixture.zip").write_bytes(build_fixture_zip())
    (d / "corrupt_inner.zip").write_bytes(build_fixture_zip(corrupt_site_audit=True))
    (d / "not_a_zip.zip").write_bytes(b"HTML error page, definitely not PK")
    return str(d)


@pytest.fixture(scope="module")
def exploded(spark, zip_dir):
    df = spark.read.format("binaryFile").load(zip_dir)
    return zd.explode_zip_entries(df).cache()


def _driver_entries(buf: bytes) -> dict[str, bytes]:
    out = {}
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            data = zf.read(info)
            if info.filename.lower().endswith(".zip"):
                try:
                    with zipfile.ZipFile(io.BytesIO(data)) as inner:
                        for i in inner.infolist():
                            if not i.is_dir():
                                out[f"{info.filename}!{i.filename}"] = inner.read(i)
                    continue
                except zipfile.BadZipFile:
                    pass
            out[info.filename] = data
    return out


def test_bytes_match_driver_side_parse(exploded):
    """Every distributed-path entry of the pristine fixture byte-matches the
    driver-side zipfile read (reference semantics src/etl.js:81-87,110)."""
    want = _driver_entries(build_fixture_zip())
    got = {
        r["entry_name"]: bytes(r["content"])
        for r in exploded.where(
            F.col("zip_path").endswith("audit_fixture.zip") & (F.col("status") == "ok")
        ).collect()
    }
    assert got == want


def test_nested_entries_expanded(exploded):
    nested = exploded.where(
        F.col("zip_path").endswith("audit_fixture.zip") & F.col("is_nested")
    )
    names = [r["entry_name"] for r in nested.collect()]
    assert all(n.startswith("ahrefs_site_audit.zip!") for n in names)
    assert any(n.endswith("Error-4XX_page.csv") for n in names)


def test_corrupt_nested_degrades_not_fails(exploded):
    rows = exploded.where(F.col("zip_path").endswith("corrupt_inner.zip")).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r["entry_name"])
    assert "ahrefs_site_audit.zip" in by_status["nested_unreadable"]
    # the other entries still extract fine
    assert "ahrefs_keywords.csv" in by_status["ok"]


def test_not_a_zip_degrades_with_payload(exploded):
    row = exploded.where(F.col("zip_path").endswith("not_a_zip.zip")).collect()
    assert len(row) == 1 and row[0]["status"] == "not_a_zip"
    assert bytes(row[0]["content"]).startswith(b"HTML error page")


def test_entries_feed_csv_smart_per_entry(exploded):
    """The per-entry encoding decision (UTF-16LE+tab for ahrefs, UTF-8+comma
    for sf_*) must reproduce the driver-side parse of the same bytes."""
    rows = {
        r["entry_name"]: bytes(r["content"])
        for r in exploded.where(
            F.col("zip_path").endswith("audit_fixture.zip") & (F.col("status") == "ok")
        ).collect()
    }
    kw = parse_csv_smart_rows(rows["ahrefs_keywords.csv"])
    assert kw.header[0] == "Keyword" and len(kw.rows) == 10
    ref = parse_csv_smart_rows(_driver_entries(build_fixture_zip())["ahrefs_keywords.csv"])
    assert (kw.header, kw.rows) == (ref.header, ref.rows)
    sf = parse_csv_smart_rows(rows["sf_internal_all.csv"])
    assert sf.header[:2] == ["Address", "Status Code"]


def test_map_only_no_shuffle(exploded, spark, zip_dir):
    """The explode is a map-only pass — no Exchange in the plan."""
    df = zd.explode_zip_entries(spark.read.format("binaryFile").load(zip_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
