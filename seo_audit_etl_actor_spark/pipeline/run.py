"""Pipeline orchestration: the reference's `processZip` re-expressed as
driver orchestration over per-source Spark stanzas (SURVEY §3.2, §3.4).

Flow: fetch → PK validation → unzip → per-source stanzas in reference
order (each one Spark aggregation job) → coverage-weighted scoring →
{normalized_audit, scores, manifest}. Cross-stanza dependencies are
exactly the reference's: the errors.* `+=` accumulation (A11) and the
pages_total coalesce priority (A12) — everything else is independent.

Citations: /root/reference/src/main.js:4-41, src/etl.js:93-454.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.pipeline import stanzas
from seo_audit_etl_actor_spark.pipeline.document import (
    empty_normalized,
    to_reference_json,
)
from seo_audit_etl_actor_spark.pipeline.scoring import compute_scores
from seo_audit_etl_actor_spark.sources.csv_smart import (
    parse_csv_smart,
    parse_csv_smart_rows,
)
from seo_audit_etl_actor_spark.sources.lighthouse import extract_lighthouse
from seo_audit_etl_actor_spark.sources.zip_io import (
    FetchImpl,
    default_fetch,
    open_nested_zip,
    open_zip,
    read_entry,
)

LIGHTHOUSE_FILES = ("lighthouse_home.json", "lighthouse_service.json", "lighthouse_city.json")
PLACEHOLDER_FILES = (
    "surfer_page_queue.csv",
    "gsc_queries_28d.csv",
    "gsc_pages_28d.csv",
    "ga4_pages.csv",
    "ga4_conversions.csv",
    "ga4_channels.csv",
    "leadsnap_leads.csv",
    "leadsnap_calls.csv",
    "leadsnap_reviews.csv",
)
GSC_FILES = ("gsc_queries_28d.csv", "gsc_pages_28d.csv")
GA4_FILES = ("ga4_pages.csv", "ga4_conversions.csv", "ga4_channels.csv")


@dataclass(frozen=True)
class JobInput:
    """Typed job contract (S9; .actor/actor.json:13-41, src/main.js:17-22)."""

    client: str
    domain: str
    run_date: str
    zip_url: str

    def __post_init__(self) -> None:
        missing = [
            k
            for k, v in (
                ("client", self.client),
                ("domain", self.domain),
                ("runDate", self.run_date),
                ("zipUrl", self.zip_url),
            )
            if not v
        ]
        if missing:
            raise ValueError(f"Missing required input: {', '.join(missing)}")


def _parse(spark: SparkSession, buf: bytes) -> DataFrame | None:
    return parse_csv_smart(spark, buf)


def process_zip(
    spark: SparkSession,
    job: JobInput,
    fetch_impl: FetchImpl | None = None,
    debug: dict | None = None,
) -> dict:
    """→ {"normalized_audit": dict, "scores": dict, "manifest": dict}
    (engine-typed; serialize with `write_outputs`/`to_reference_json`).

    `debug`, when passed a dict, collects the reference's observability
    artifacts (S8): `ahrefs_keywords_headers` — the headers actually seen
    (src/etl.js:121)."""
    manifest: dict = {}
    raw = (fetch_impl or default_fetch)(job.zip_url)
    zf = open_zip(raw)  # raises NotAZipError with payload for debug dump
    doc = empty_normalized(job.client, job.domain, job.run_date)
    prov = doc["provenance"]

    def csv_stanza(name: str, apply) -> None:
        """Shared shape: read entry → parse → rows>0 → stanza + rows count;
        empty parse → 'partial' (src/etl.js:149,164,180,229)."""
        buf = read_entry(zf, name, manifest)
        if buf is None:
            return
        df = _parse(spark, buf)
        n = df.count() if df is not None else 0
        if n:
            apply(df)
            manifest[name]["rows"] = n
        else:
            manifest[name]["status"] = "partial"

    # ---- Ahrefs keywords (src/etl.js:115-151)
    def _keywords(df: DataFrame) -> None:
        if debug is not None:  # S8 headers dump (src/etl.js:121)
            debug["ahrefs_keywords_headers"] = [
                c for c in df.columns if c != "__row_id"
            ]
        stanzas.ahrefs_keywords(df, doc)
        prov["ahrefs"] = True

    csv_stanza("ahrefs_keywords.csv", _keywords)

    # ---- Ahrefs top pages (src/etl.js:153-165)
    def _top_pages(df: DataFrame) -> None:
        stanzas.ahrefs_top_pages(df, doc)
        prov["ahrefs"] = True

    csv_stanza("ahrefs_top_pages.csv", _top_pages)

    # ---- Ahrefs backlinks (src/etl.js:168-181)
    def _backlinks(df: DataFrame) -> None:
        stanzas.ahrefs_backlinks(df, doc)
        prov["ahrefs"] = True

    csv_stanza("ahrefs_backlinks.csv", _backlinks)

    # ---- Ahrefs site audit — nested ZIP (src/etl.js:184-213)
    buf = read_entry(zf, "ahrefs_site_audit.zip", manifest)
    if buf is not None:
        try:
            inner = open_nested_zip(buf)
            names = set(inner.namelist())
            counts = {
                f: len(parse_csv_smart_rows(inner.read(f)).rows)
                for files in stanzas.SITE_AUDIT_ISSUES.values()
                for f in files
                if f in names
            }
            stanzas.site_audit_issue_counts(counts, doc)
            prov["ahrefs"] = True
            manifest["ahrefs_site_audit.zip"]["status"] = "full"
        except Exception as e:  # degrade, don't abort (src/etl.js:209-212)
            manifest["ahrefs_site_audit.zip"]["status"] = "partial"
            manifest["ahrefs_site_audit.zip"]["note"] = str(e)

    # ---- Screaming Frog internal (src/etl.js:216-230)
    def _sf_internal(df: DataFrame) -> None:
        prov["screamingfrog"] = True
        stanzas.sf_internal(df, doc)

    csv_stanza("sf_internal_all.csv", _sf_internal)

    # ---- Screaming Frog structured data (src/etl.js:234-250)
    buf = read_entry(zf, "sf_structured_data.csv", manifest)
    if buf is not None:
        df = _parse(spark, buf)
        n = df.count() if df is not None else 0
        if n:
            note = stanzas.sf_structured_data(doc)
            manifest["sf_structured_data.csv"]["rows"] = n
            manifest["sf_structured_data.csv"]["note"] = note
            prov["screamingfrog"] = True

    # ---- duplicates / images: row counts only (src/etl.js:253-256)
    for name in ("sf_duplicates.csv", "sf_images.csv"):
        buf = read_entry(zf, name, manifest)
        if buf is not None:
            manifest[name]["rows"] = len(parse_csv_smart_rows(buf).rows)

    # ---- Lighthouse JSONs (src/etl.js:259-304)
    lh_metrics = []
    for name in LIGHTHOUSE_FILES:
        try:
            data = zf.read(name)
        except KeyError:
            manifest[name] = {"status": "missing"}
            continue
        try:
            lh_metrics.append(extract_lighthouse(data))
            manifest[name] = {"status": "full"}
            prov["lighthouse"] = True
        except Exception as e:
            manifest[name] = {"status": "partial", "note": str(e)}
    if lh_metrics:
        stanzas.lighthouse_rollup(lh_metrics, doc)

    # ---- BrightLocal ranks (src/etl.js:307-328)
    def _ranks(df: DataFrame) -> None:
        prov["brightlocal"] = True
        stanzas.brightlocal_ranks(df, doc)

    csv_stanza("brightlocal_ranks.csv", _ranks)

    # ---- BrightLocal citations (src/etl.js:332-366)
    def _citations(df: DataFrame) -> None:
        prov["brightlocal"] = True
        stanzas.brightlocal_citations(df, doc)

    csv_stanza("brightlocal_citations.csv", _citations)

    # ---- BrightLocal reviews — placeholder-prone (src/etl.js:369-379)
    buf = read_entry(zf, "brightlocal_reviews.csv", manifest)
    if buf is not None:
        df = _parse(spark, buf)
        n = df.count() if df is not None else 0
        if n and not stanzas.is_placeholder(df):
            prov["brightlocal"] = True
            manifest["brightlocal_reviews.csv"]["rows"] = n
        else:
            manifest["brightlocal_reviews.csv"]["status"] = "placeholder"
            manifest["brightlocal_reviews.csv"]["note"] = "login_required"

    # ---- BrightLocal GBP insights (src/etl.js:382-397)
    buf = read_entry(zf, "brightlocal_gbp_insights.csv", manifest)
    if buf is not None:
        df = _parse(spark, buf)
        n = df.count() if df is not None else 0
        if n:
            stanzas.brightlocal_gbp_insights(df, doc)
            prov["brightlocal"] = True
            manifest["brightlocal_gbp_insights.csv"] = {
                "status": "partial",
                "rows": n,
                "note": "public listing only; true Insights missing",
            }

    # ---- GBP categories / photos (src/etl.js:400-421)
    buf = read_entry(zf, "gbp_categories.csv", manifest)
    if buf is not None:
        df = _parse(spark, buf)
        if df is not None:
            stanzas.gbp_categories(df, doc)
        prov["gbp_public"] = True
        manifest["gbp_categories.csv"]["rows"] = df.count() if df is not None else 0

    buf = read_entry(zf, "gbp_photos.csv", manifest)
    if buf is not None:
        df = _parse(spark, buf)
        if df is not None:
            stanzas.gbp_photos(df, doc)
        prov["gbp_public"] = True
        manifest["gbp_photos.csv"]["rows"] = df.count() if df is not None else 0

    # ---- login-required placeholders (src/etl.js:424-434)
    placeholder_dfs: dict[str, DataFrame | None] = {}
    for name in PLACEHOLDER_FILES:
        try:
            data = zf.read(name)
        except KeyError:
            manifest[name] = {"status": "missing"}
            continue
        df = _parse(spark, data)
        placeholder_dfs[name] = df
        n = df.count() if df is not None else 0
        if n and not stanzas.is_placeholder(df):
            manifest[name] = {"status": "full", "rows": n}
        else:
            manifest[name] = {"status": "placeholder", "note": "access_required_or_empty"}

    # ---- GSC/GA4 presence flags (src/etl.js:437-448)
    def _real_rows(name: str) -> bool:
        df = placeholder_dfs.get(name)
        if df is None:
            return False
        return bool(df.count()) and not stanzas.is_placeholder(df)

    if any(_real_rows(n) for n in GSC_FILES):
        prov["gsc"] = True
    if any(_real_rows(n) for n in GA4_FILES):
        prov["ga4"] = True

    scores = compute_scores(spark, doc)
    return {"normalized_audit": doc, "scores": scores, "manifest": manifest}


def manifest_df(spark: SparkSession, manifest: dict) -> DataFrame:
    """Long-format lineage frame (SURVEY §1.4): queryable provenance,
    writes to the same JSON."""
    schema = T.StructType(
        [
            T.StructField("file", T.StringType(), False),
            T.StructField("status", T.StringType(), True),
            T.StructField("size", T.LongType(), True),
            T.StructField("rows", T.LongType(), True),
            T.StructField("note", T.StringType(), True),
        ]
    )
    rows = [
        (name, m.get("status"), m.get("size"), m.get("rows"), m.get("note"))
        for name, m in manifest.items()
    ]
    return spark.createDataFrame(rows, schema)


def write_outputs(result: dict, out_dir: str) -> dict[str, str]:
    """KV-sink analog (S7, src/main.js:30-38): three JSON artifacts + the
    OUTPUT index, reference-shaped (sentinels restored by the serializer)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    artifacts = {
        "normalized_audit.json": to_reference_json(result["normalized_audit"]),
        "scores.json": result["scores"],
        "etl_manifest.json": result["manifest"],
    }
    paths = {}
    for name, obj in artifacts.items():
        p = out / name
        p.write_text(json.dumps(obj, indent=2, ensure_ascii=False))
        paths[name] = str(p)
    index = {"artifacts": sorted(artifacts), "client": result["normalized_audit"]["meta"]["client"]}
    (out / "OUTPUT.json").write_text(json.dumps(index, indent=2))
    paths["OUTPUT.json"] = str(out / "OUTPUT.json")
    return paths
