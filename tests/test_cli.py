"""CLI entry point: file:// fetch → full pipeline → four artifacts on disk;
non-ZIP payload → ZIP_DEBUG.bin + exit 2 (the reference's failure path)."""

from __future__ import annotations

import json

from seo_audit_etl_actor_spark.pipeline.cli import main
from tests.fixtures_seo import build_fixture_zip


def test_cli_end_to_end(spark, tmp_path):
    zip_path = tmp_path / "audit.zip"
    zip_path.write_bytes(build_fixture_zip())
    out = tmp_path / "out"
    rc = main(
        [
            "--client", "Acme",
            "--domain", "acme.example",
            "--run-date", "2025-06-01",
            "--zip-url", f"file://{zip_path}",
            "--out", str(out),
        ]
    )
    assert rc == 0
    assert (out / "INPUT_ECHO.json").exists()
    audit = json.loads((out / "normalized_audit.json").read_text())
    assert audit["onsite"]["keywords"]["top3"] == 3
    scores = json.loads((out / "scores.json").read_text())
    assert scores["oss_weight_used"] == 55
    manifest = json.loads((out / "etl_manifest.json").read_text())
    assert manifest["sf_images.csv"]["status"] == "missing"
    assert (out / "OUTPUT.json").exists()
    headers = json.loads((out / "ahrefs_keywords_headers.json").read_text())
    assert headers == ["Keyword", "Current position", "Volume"]


def test_cli_non_zip_payload_dumps_debug(spark, tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"<html>nope</html>")
    out = tmp_path / "out2"
    rc = main(
        [
            "--client", "Acme",
            "--domain", "acme.example",
            "--run-date", "2025-06-01",
            "--zip-url", f"file://{bad}",
            "--out", str(out),
        ]
    )
    assert rc == 2
    assert (out / "ZIP_DEBUG.bin").read_bytes() == b"<html>nope</html>"
