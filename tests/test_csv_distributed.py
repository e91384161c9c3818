"""read_csv_distributed — the at-scale CSV path: driver sniffs 4 KiB, Spark
parses distributed. Must recover the same cells as the driver-side chain
for both encodings."""

from __future__ import annotations

import pytest

from seo_audit_etl_actor_spark.sources.csv_smart import read_csv_distributed


@pytest.fixture(scope="module")
def csv_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvs")
    utf8 = d / "utf8.csv"
    utf8.write_text("Keyword,Position,Volume\nalpha,1,100\nbeta,12,50\n")
    utf16 = d / "utf16.csv"
    utf16.write_bytes(
        b"\xff\xfe" + "Keyword\tPosition\tVolume\nalpha\t1\t100\nbeta\t12\t50".encode("utf-16-le")
    )
    return str(utf8), str(utf16)


def test_utf8_comma_distributed(spark, csv_files):
    utf8, _ = csv_files
    df = read_csv_distributed(spark, utf8)
    assert df.columns == ["Keyword", "Position", "Volume"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("alpha", "1", "100"), ("beta", "12", "50")]


def test_utf16_tab_distributed(spark, csv_files):
    _, utf16 = csv_files
    df = read_csv_distributed(spark, utf16)
    assert df.columns == ["Keyword", "Position", "Volume"]
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("alpha", "1", "100"), ("beta", "12", "50")]
