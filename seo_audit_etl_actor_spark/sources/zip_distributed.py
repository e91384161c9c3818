"""Distributed ZIP-entry explode (SURVEY §2.1 S3/S4 at-scale path).

The reference processes ONE ZIP of ~20 small CSVs driver-side
(/root/reference/src/etl.js:81-87,110); zip_io.py covers that case exactly.
This operator is the declared 100 TB extension: a corpus of MANY ZIPs
arrives as a `binaryFile` DataFrame (one row per archive), and entry
extraction runs on the executors — `mapInPandas`, one Arrow batch of
archives in, one batch of (zip_path, entry_name, content) rows out.

Scale design:
- the archive blobs never leave the executor: unzip is a map-only pass, no
  shuffle; downstream parsing (csv_smart's per-entry encoding decision)
  consumes the `content` column in the same stage;
- `binaryFile` fans archives out by `spark.sql.files.maxPartitionBytes`;
  cap Arrow batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`)
  when archives are multi-MB so executor memory stays bounded;
- per-file degradation, not job failure: a non-ZIP payload or corrupt
  nested archive yields a `status` row (mirroring the reference's
  partial-degrade + ZIP_DEBUG semantics, src/etl.js:102-104,184-187)
  instead of raising — one poison blob in a 100 TB corpus must not kill
  the job;
- nested ZIPs (the reference's ahrefs_site_audit.zip case) are expanded one
  level, entries named "<outer_entry>!<inner_entry>" with is_nested=true.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.sources.zip_io import is_zip

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

ZIP_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("zip_path", T.StringType(), True),
        T.StructField("entry_name", T.StringType(), True),
        T.StructField("is_nested", T.BooleanType(), False),
        T.StructField("entry_size", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

STATUS_OK = "ok"
STATUS_NOT_A_ZIP = "not_a_zip"
STATUS_ZIP_UNREADABLE = "zip_unreadable"
STATUS_ENTRY_UNREADABLE = "entry_unreadable"
STATUS_NESTED_UNREADABLE = "nested_unreadable"


def _row(path, name, nested, data, status):
    return {
        "zip_path": path,
        "entry_name": name,
        "is_nested": nested,
        "entry_size": len(data) if data is not None else None,
        "content": data,
        "status": status,
    }


def _entries_of(path: str, blob: bytes, expand_nested: bool) -> Iterator[dict]:
    if not is_zip(blob):
        # the reference dumps the payload as ZIP_DEBUG.bin and errors
        # (src/etl.js:102-104); at corpus scale we degrade per file and
        # keep the payload so a debug sink can still dump it
        yield _row(path, None, False, blob, STATUS_NOT_A_ZIP)
        return
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        infos = [i for i in zf.infolist() if not i.is_dir()]
    except Exception:  # noqa: BLE001 — PK prefix but corrupt directory
        # a truncated download passes the 2-byte magic check yet has no
        # readable central directory; one poison blob must not kill the job
        yield _row(path, None, False, blob, STATUS_ZIP_UNREADABLE)
        return
    with zf:
        for info in infos:
            try:
                data = zf.read(info)
            except Exception:  # noqa: BLE001 — CRC/deflate-corrupt member
                yield _row(path, info.filename, False, None, STATUS_ENTRY_UNREADABLE)
                continue
            if expand_nested and info.filename.lower().endswith(".zip"):
                # attempt expansion on the NAME, not the magic bytes — the
                # reference's corrupt-site-audit branch degrades on any
                # unreadable payload claiming to be an archive. Materialize
                # ALL inner entries BEFORE yielding any: a half-readable
                # nested archive must not emit entry 1 decoded and then the
                # whole raw blob again (duplicate content downstream).
                try:
                    with zipfile.ZipFile(io.BytesIO(data)) as inner:
                        inner_rows = [
                            _row(
                                path,
                                f"{info.filename}!{iinfo.filename}",
                                True,
                                inner.read(iinfo),
                                STATUS_OK,
                            )
                            for iinfo in inner.infolist()
                            if not iinfo.is_dir()
                        ]
                    yield from inner_rows
                    continue
                except Exception:  # noqa: BLE001 — BadZipFile, zlib.error, CRC
                    # partial-degrade exactly like the reference's corrupt
                    # site-audit branch (src/etl.js:184-187): surface the
                    # raw entry, flag it, keep going
                    yield _row(path, info.filename, False, data, STATUS_NESTED_UNREADABLE)
                    continue
            yield _row(path, info.filename, False, data, STATUS_OK)


def explode_zip_entries(
    archives: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    expand_nested: bool = True,
) -> DataFrame:
    """binaryFile DataFrame of ZIP archives → one row per entry.

    Output: ZIP_ENTRY_SCHEMA. `content` carries the decompressed entry
    bytes — feed them to csv_smart.parse_csv_smart_rows (per-entry encoding
    decision, same chain as the driver-side path) or any downstream binary
    op. Map-only: no shuffle is introduced; Catalyst prunes the binaryFile
    scan to (path, content).
    """
    ensure_package_on_executors(archives.sparkSession)

    def unzip(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in ZIP_ENTRY_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                b = bytes(blob) if blob is not None else b""
                rows.extend(_entries_of(path, b, expand_nested))
            yield pd.DataFrame(rows, columns=cols)

    return archives.select(path_col, content_col).mapInPandas(unzip, ZIP_ENTRY_SCHEMA)
