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


def test_corrupt_outer_zip_degrades_not_fails(spark, tmp_path):
    """PK prefix + truncated central directory (a cut-off download) must
    yield one zip_unreadable row, not a failed task."""
    d = tmp_path / "corrupt_outer"
    d.mkdir()
    (d / "good.zip").write_bytes(build_fixture_zip())
    (d / "truncated.zip").write_bytes(build_fixture_zip()[:100])
    out = zd.explode_zip_entries(spark.read.format("binaryFile").load(str(d)))
    rows = out.collect()
    bad = [r for r in rows if r["zip_path"].endswith("truncated.zip")]
    assert len(bad) == 1 and bad[0]["status"] == "zip_unreadable"
    assert any(
        r["zip_path"].endswith("good.zip") and r["status"] == "ok" for r in rows
    )


def test_half_readable_nested_zip_no_duplicate_entries(spark, tmp_path):
    """A nested archive whose directory parses but whose member data is
    corrupt must degrade to ONE nested_unreadable row — no inner entry may
    be emitted twice (once decoded, once inside the raw fallback blob)."""
    import io as _io
    import zipfile as _zf

    inner = _io.BytesIO()
    with _zf.ZipFile(inner, "w", compression=_zf.ZIP_DEFLATED) as z:
        z.writestr("a.csv", "h\n1\n")
        z.writestr("b.csv", "h\n2\n")
    blob = bytearray(inner.getvalue())
    # corrupt b.csv's deflate stream: flip bytes in the middle of the file
    # body region (after a.csv's local header) but before the central dir
    for off in range(45, 60):
        blob[off] ^= 0xFF

    outer = _io.BytesIO()
    with _zf.ZipFile(outer, "w") as z:
        z.writestr("nested.zip", bytes(blob))
        z.writestr("plain.csv", "x\n9\n")
    d = tmp_path / "halfbad"
    d.mkdir()
    (d / "archive.zip").write_bytes(outer.getvalue())

    rows = zd.explode_zip_entries(spark.read.format("binaryFile").load(str(d))).collect()
    by_name = {}
    for r in rows:
        by_name.setdefault(r["entry_name"], []).append(r["status"])
    assert by_name["plain.csv"] == ["ok"]
    # either the whole nested zip degraded as one row, or (if the corruption
    # didn't break extraction) every inner entry appears exactly once
    if "nested.zip" in by_name:
        assert by_name["nested.zip"] == ["nested_unreadable"]
        assert not any(n and n.startswith("nested.zip!") for n in by_name)
    else:
        assert sorted(n for n in by_name if n and n.startswith("nested.zip!")) == [
            "nested.zip!a.csv",
            "nested.zip!b.csv",
        ]
        assert all(len(v) == 1 for v in by_name.values())
