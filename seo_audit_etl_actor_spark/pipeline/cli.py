"""CLI entry point — the reference actor's `main.js` re-expressed
(/root/reference/src/main.js:4-41): validate typed input, run the
pipeline, write the four KV artifacts (+ debug dumps on failure paths).

Usage:
    python -m seo_audit_etl_actor_spark.pipeline.cli \
        --client "Acme" --domain acme.example --run-date 2025-06-01 \
        --zip-url file:///path/to/audit.zip --out ./out
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="SEO-audit ETL (PySpark engine)")
    ap.add_argument("--client", required=True)
    ap.add_argument("--domain", required=True)
    ap.add_argument("--run-date", required=True)
    ap.add_argument("--zip-url", required=True)
    ap.add_argument("--out", default="./audit_out")
    args = ap.parse_args(argv)

    from seo_audit_etl_actor_spark.pipeline.run import (
        JobInput,
        process_zip,
        write_outputs,
    )
    from seo_audit_etl_actor_spark.session import get_spark
    from seo_audit_etl_actor_spark.sources.zip_io import NotAZipError

    job = JobInput(
        client=args.client,
        domain=args.domain,
        run_date=args.run_date,
        zip_url=args.zip_url,
    )
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # input echo — the reference's first KV write (src/main.js:15)
    (out / "INPUT_ECHO.json").write_text(
        json.dumps(
            {
                "client": job.client,
                "domain": job.domain,
                "runDate": job.run_date,
                "zipUrl": job.zip_url,
            },
            indent=2,
        )
    )
    spark = get_spark("seo-audit-etl")
    debug: dict = {}
    try:
        result = process_zip(spark, job, debug=debug)
    except NotAZipError as e:
        # debug dump for non-ZIP payloads (src/etl.js:104)
        (out / "ZIP_DEBUG.bin").write_bytes(e.payload)
        print(f"ERROR: {e}", file=sys.stderr)
        return 2
    if "ahrefs_keywords_headers" in debug:  # S8 (src/etl.js:121)
        (out / "ahrefs_keywords_headers.json").write_text(
            json.dumps(debug["ahrefs_keywords_headers"])
        )
    paths = write_outputs(result, str(out))
    print(json.dumps({"artifacts": paths}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
