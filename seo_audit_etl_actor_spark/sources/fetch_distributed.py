"""Distributed HTTP fetch (SURVEY §2.1 S1 at-scale path): the reference
fetches ONE ZIP driver-side (src/etl.js:97-99, impl injected
src/main.js:25-27); at corpus scale the URL list is itself a DataFrame and
the fetch fans out per partition via mapInPandas.

Design:
- fetch_impl is injected (same seam the reference uses), defaulting to
  zip_io.default_fetch (urllib, non-2xx → error). Tests inject file:// or
  fakes — no network in CI;
- per-URL degradation: a failed fetch yields a status row with the error
  string, never a failed task — one dead URL in a million must not kill
  the job (mirrors the reference's per-source partial degrade);
- output (url, content, byte_len, status, error) feeds zip_distributed.
  explode_zip_entries or csv_smart directly in the same stage — no
  shuffle between fetch and parse;
- repartition the URL list before fetching (ensure_parallelism) so a
  small URL table still fans out across executors — the work per row is
  network-bound, not data-bound.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    fetch_impl: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """DataFrame of URLs → (url, content, byte_len, status, error) rows.
    Map-only; fetch_impl runs on the executors (it must be picklable —
    module-level functions, not closures over sockets)."""
    if fetch_impl is None:
        from seo_audit_etl_actor_spark.sources.zip_io import default_fetch

        fetch_impl = default_fetch
    ensure_package_on_executors(urls.sparkSession)

    def fetch(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in FETCH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                try:
                    data = fetch_impl(url)
                    rows.append(
                        {
                            "url": url,
                            "content": data,
                            "byte_len": len(data),
                            "status": "ok",
                            "error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-URL degrade is the contract
                    rows.append(
                        {
                            "url": url,
                            "content": None,
                            "byte_len": None,
                            "status": "error",
                            "error": str(e)[:500],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return urls.select(url_col).mapInPandas(fetch, FETCH_SCHEMA)
