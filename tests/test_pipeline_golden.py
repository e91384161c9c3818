"""Golden end-to-end pipeline test (SURVEY §5.2 strategy #2): fixture ZIP →
process_zip → compare the three artifacts against hand-computed
expectations, including every degradation path (missing entry, corrupted
nested zip, non-ZIP payload, missing position column, placeholder files).

All expected numbers are derived BY HAND from tests/fixtures_seo.py data —
see the arithmetic notes inline.
"""

from __future__ import annotations

import pytest

from seo_audit_etl_actor_spark.pipeline.document import to_reference_json
from seo_audit_etl_actor_spark.pipeline.run import JobInput, process_zip, write_outputs
from seo_audit_etl_actor_spark.sources.zip_io import NotAZipError
from tests.fixtures_seo import build_fixture_zip

JOB = JobInput(client="Acme Plumbing", domain="acme.example", run_date="2025-06-01", zip_url="memory://fixture")


@pytest.fixture(scope="module")
def result(spark):
    return process_zip(spark, JOB, fetch_impl=lambda url: build_fixture_zip())


def test_meta_and_provenance(result):
    doc = result["normalized_audit"]
    assert doc["meta"] == {"client": "Acme Plumbing", "domain": "acme.example", "run_date": "2025-06-01"}
    ref = to_reference_json(doc)
    assert ref["provenance"] == {
        "ahrefs": True,
        "screamingfrog": True,
        "lighthouse": True,
        "brightlocal": True,
        "gbp_public": True,
        "gsc": "present",  # real gsc_queries_28d rows
        "ga4": "missing",  # only a placeholder ga4 file
        "leadsnap": "missing",
    }


def test_keywords_buckets(result):
    # positions 1,2,3,5,9,15,50,120 valid (abc→0 and -2 dropped by >0)
    assert result["normalized_audit"]["onsite"]["keywords"] == {"top3": 3, "top10": 5, "top100": 7}


def test_pages_and_backlinks(result):
    doc = result["normalized_audit"]
    # distinct URLs /a /b /c — ahrefs wins the ?? coalesce over sf's 7 rows
    assert doc["onsite"]["content"]["pages_total"] == 3
    assert doc["backlinks"]["ref_domains"] == 4
    # DR mean over [50, 70, 0, 30] — empty cell coerces to 0 (JS Number(''))
    assert doc["backlinks"]["dr"] == pytest.approx(37.5)


def test_error_accumulation(result):
    # site audit: 4xx 2+1, 5xx 1, redirects 2, dup_titles 1, orphans 2
    # sf_internal adds: 404,404 → +2 4xx; 500 → +1 5xx ('abc'→0 out of range)
    assert result["normalized_audit"]["onsite"]["errors"] == {
        "4xx": 5,
        "5xx": 2,
        "redirect_chains": 2,
        "canonical": 0,
        "thin": 0,
        "duplicate_titles": 1,
        "orphan_pages": 2,
    }


def test_cwv_rollup(result):
    cwv = result["normalized_audit"]["onsite"]["cwv"]
    # two lighthouse files: p75 index floor(.75*1)=0 → the smaller value
    assert cwv["lcp_p75"] == 2000
    assert cwv["cls_p75"] == 0.05
    assert cwv["inp_p75"] == 150
    assert cwv["pass_rate"] == pytest.approx(0.5)  # home passes, service fails


def test_local_block(result):
    local = result["normalized_audit"]["local"]
    assert local["rank"] == {
        "avg_pos": pytest.approx(7.0),  # (1+3+4+20)/4
        "pct_top3": pytest.approx(0.5),  # 1,3 of 4
        "keywords_tracked": 4,
    }
    # Live / OK+link / Dead / (blank, uncounted) / link-only → 3 of 4
    assert local["citations"]["consistency"] == pytest.approx(0.75)
    assert local["reviews"]["count_total"] == pytest.approx(120)
    assert local["reviews"]["avg_rating"] == pytest.approx(4.4)
    assert local["gbp"]["primary_category"] == "Plumber"
    assert local["gbp"]["secondary_categories"] == ["Emergency Plumber", "Drainage Service"]
    # gbp_photos 'total' row overwrites the insights max (35 → 42)
    assert local["gbp"]["photos_total"] == pytest.approx(42)


def test_scores(result):
    s = result["scores"]
    # OSS: used = kw 20 + health 20 + cwv 15 = 55 of 100
    #   kw = min(5/7, 1); health = clamp(1 - (12/3)/0.5) = 0; cwv = 0.5
    #   score = round((20*(5/7) + 0 + 7.5) / 55 * 1000)/10 = 39.6
    assert s["oss"] == pytest.approx(39.6)
    assert s["oss_coverage"] == pytest.approx(0.55)
    assert s["oss_weight_used"] == 55 and s["oss_weight_total"] == 100
    # LSS: used = rank 40 + pct_top3 25 + citations 15 + reviews 10 = 90
    #   rank = 1-(7-1)/19 = 13/19; pct .5; cit .75; reviews (4.4-3.5)/1.5
    #   score = round((40*13/19 + 12.5 + 11.25 + 6.0)/90*1000)/10 = 63.5
    assert s["lss"] == pytest.approx(63.5)
    assert s["lss_coverage"] == pytest.approx(0.9)
    assert s["lss_weight_used"] == 90 and s["lss_weight_total"] == 100
    raw = s["components"]["oss"]["raw"]
    assert raw["kw_top10"] == pytest.approx(5 / 7)
    assert raw["site_health"] == pytest.approx(0.0)
    assert raw["gsc_clicks"] is None and raw["indexed_valid"] is None


def test_manifest_statuses(result):
    m = result["manifest"]
    assert m["ahrefs_keywords.csv"] == {"status": "present", "size": m["ahrefs_keywords.csv"]["size"], "rows": 10}
    assert m["ahrefs_site_audit.zip"]["status"] == "full"
    assert m["sf_images.csv"] == {"status": "missing"}
    assert m["lighthouse_city.json"] == {"status": "missing"}
    assert m["lighthouse_home.json"] == {"status": "full"}
    assert m["brightlocal_reviews.csv"]["status"] == "placeholder"
    assert m["brightlocal_reviews.csv"]["note"] == "login_required"
    assert m["brightlocal_gbp_insights.csv"]["note"] == "public listing only; true Insights missing"
    assert m["gsc_queries_28d.csv"] == {"status": "full", "rows": 2}
    assert m["ga4_pages.csv"] == {"status": "placeholder", "note": "access_required_or_empty"}
    assert m["leadsnap_calls.csv"] == {"status": "missing"}
    assert m["sf_duplicates.csv"]["rows"] == 3


def test_missing_sentinels_serialized(result):
    ref = to_reference_json(result["normalized_audit"])
    gbp = ref["local"]["gbp"]
    assert gbp["insights_calls"] == "missing"
    assert gbp["insights_directions"] == "missing"
    assert gbp["insights_website_clicks"] == "missing"


def test_write_outputs(result, tmp_path):
    paths = write_outputs(result, str(tmp_path / "out"))
    import json

    audit = json.loads(open(paths["normalized_audit.json"]).read())
    assert audit["provenance"]["gsc"] == "present"
    scores = json.loads(open(paths["scores.json"]).read())
    assert scores["oss"] == pytest.approx(39.6)
    assert "etl_manifest.json" in paths and "OUTPUT.json" in paths


# ---------------------------------------------------------- degradations
def test_non_zip_payload(spark):
    with pytest.raises(NotAZipError) as ei:
        process_zip(spark, JOB, fetch_impl=lambda url: b"<html>not a zip</html>")
    assert ei.value.payload.startswith(b"<html>")  # debug-dump material


def test_corrupt_nested_zip_degrades_to_partial(spark):
    res = process_zip(
        spark, JOB, fetch_impl=lambda url: build_fixture_zip(corrupt_site_audit=True)
    )
    m = res["manifest"]["ahrefs_site_audit.zip"]
    assert m["status"] == "partial" and m["note"]
    # inner counts skipped, sf_internal still contributes
    assert res["normalized_audit"]["onsite"]["errors"]["4xx"] == 2
    assert res["normalized_audit"]["onsite"]["errors"]["orphan_pages"] == 0


def test_missing_keywords_entry(spark):
    res = process_zip(
        spark, JOB, fetch_impl=lambda url: build_fixture_zip(omit={"ahrefs_keywords.csv"})
    )
    assert res["manifest"]["ahrefs_keywords.csv"] == {"status": "missing"}
    assert res["normalized_audit"]["onsite"]["keywords"] == {"top3": None, "top10": None, "top100": None}
    # kw component unavailable → OSS used drops to 35
    assert res["scores"]["oss_weight_used"] == 35


def test_keywords_without_position_column(spark):
    res = process_zip(
        spark,
        JOB,
        fetch_impl=lambda url: build_fixture_zip(keywords_no_position_col=True),
    )
    # warning path: file present with rows, but buckets stay null
    assert res["manifest"]["ahrefs_keywords.csv"]["rows"] == 10
    assert res["normalized_audit"]["onsite"]["keywords"]["top10"] is None


def test_validation_rejects_blank_input():
    with pytest.raises(ValueError, match="zipUrl"):
        JobInput(client="c", domain="d", run_date="2025-01-01", zip_url="")
