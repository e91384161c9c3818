"""Encoding-sniffing CSV reader (SURVEY §2.1 S5, §7.3 H1).

Parse chain, exactly the reference's (/root/reference/src/etl.js:23-41):

1. unless the buffer sniffs as UTF-16: decode UTF-8, auto-detect delimiter,
   parse; accept unless "bad";
2. decode UTF-16LE, parse with TAB; accept unless "bad";
3. decode UTF-16LE, parse with COMMA; accept unconditionally.

"Bad parse" = more than 5 row errors (field count != header count — the
papaparse TooFewFields/TooManyFields analog) OR zero data rows
(src/etl.js:23).

The decode + parse happens on the driver: these are the reference's
ZIP-of-small-CSVs inputs, where per-file drivers-side parsing is the right
cost model (SURVEY §3.4). The result is handed to Spark as an all-string
DataFrame with a `__row_id` ingest-order column (H2 determinism — Spark has
no implicit file order). For big standalone CSVs use
`read_csv_distributed`, which pushes the same encoding/delimiter decision
into Spark's distributed CSV scan.

Deliberate divergence: papaparse emits a phantom `{col: ""}` row for a
trailing newline; Python's csv module does not. We follow csv-module
semantics (no phantom row) — recorded here per SURVEY §5.2.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.sources.sniff import (
    looks_utf16,
    sniff_delimiter,
    utf16_variant,
)

MAX_ROW_ERRORS = 5
ROW_ID = "__row_id"


@dataclass
class ParsedCsv:
    """Driver-side parse result: header + string rows + error count."""

    header: list[str] = field(default_factory=list)
    rows: list[list[str | None]] = field(default_factory=list)
    n_errors: int = 0

    @property
    def bad(self) -> bool:
        return self.n_errors > MAX_ROW_ERRORS or not self.rows


def _dedupe_header(header: list[str]) -> list[str]:
    seen: dict[str, int] = {}
    out = []
    for h in header:
        if h in seen:
            seen[h] += 1
            out.append(f"{h}_{seen[h]}")
        else:
            seen[h] = 0
            out.append(h)
    return out


def _parse_text(text: str, delimiter: str) -> ParsedCsv:
    reader = csv.reader(io.StringIO(text), delimiter=delimiter)
    try:
        header = next(reader)
    except StopIteration:
        return ParsedCsv()
    header = _dedupe_header([h for h in header])
    width = len(header)
    rows: list[list[str | None]] = []
    n_errors = 0
    for raw in reader:
        if not raw:
            continue  # blank line
        if len(raw) != width:
            n_errors += 1
        # pad missing fields with None / drop extras — papaparse row shape
        row: list[str | None] = list(raw[:width]) + [None] * max(0, width - len(raw))
        rows.append(row)
    return ParsedCsv(header=header, rows=rows, n_errors=n_errors)


def parse_csv_smart_rows(buf: bytes) -> ParsedCsv:
    """The reference's parse chain over raw bytes → header + string rows."""
    if not looks_utf16(buf):
        # lstrip BOM: iconv-lite/papaparse strip it; Python decode keeps it
        text = buf.decode("utf-8", errors="replace").lstrip("﻿")
        res = _parse_text(text, sniff_delimiter(text))
        if not res.bad:
            return res
    text16 = buf.decode(utf16_variant(buf), errors="replace").lstrip("﻿")
    res = _parse_text(text16, "\t")
    if not res.bad:
        return res
    return _parse_text(text16, ",")


def to_dataframe(spark: SparkSession, parsed: ParsedCsv) -> DataFrame | None:
    """All-string DataFrame + ingest-order `__row_id` (H2: deterministic
    first/collect need an explicit order column)."""
    if not parsed.header:
        return None
    schema = T.StructType(
        [T.StructField(ROW_ID, T.LongType(), False)]
        + [T.StructField(h, T.StringType(), True) for h in parsed.header]
    )
    data = [(i, *row) for i, row in enumerate(parsed.rows)]
    return spark.createDataFrame(data, schema)


def parse_csv_smart(spark: SparkSession, buf: bytes) -> DataFrame | None:
    """Sniff + parse chain → Spark DataFrame (None for an empty buffer)."""
    return to_dataframe(spark, parse_csv_smart_rows(buf))


def read_csv_distributed(
    spark: SparkSession, path: str, probe: bytes | None = None
) -> DataFrame:
    """The at-scale path: probe the first 4 KiB driver-side (one ranged
    read), then let Spark's distributed CSV scan do the parsing with the
    sniffed encoding/delimiter — the file splits across executors, the
    sniff does not.

    UTF-16 inputs are read with multiLine so the univocity parser applies
    the charset itself (Hadoop line splitting is byte-oriented and would
    break surrogate pairs at split boundaries).
    """
    if probe is None:
        import builtins

        with builtins.open(path.removeprefix("file://"), "rb") as f:
            probe = f.read(4096)
    reader = spark.read.option("header", True).option("mode", "PERMISSIVE")
    if looks_utf16(probe):
        enc = "UTF-16LE" if utf16_variant(probe) == "utf-16-le" else "UTF-16BE"
        df = (
            reader.option("encoding", enc)
            .option("multiLine", True)
            .option("sep", "\t")
            .csv(path)
        )
    else:
        text = probe.decode("utf-8", errors="replace")
        df = reader.option("sep", sniff_delimiter(text)).csv(path)
    # Spark keeps a BOM char in the first header; normalize it away
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df
