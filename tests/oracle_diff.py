"""Local mirror of the driver's Spark-vs-DuckDB comparison: row count,
schema (column names), and order-insensitive EXACT value comparison (we
compare values directly instead of hashing so failures are debuggable).

Exactness matches the driver: it hashes values with no float tolerance, so
a result that differs in the 7th decimal must fail HERE, locally, not in
the per-round driver run. Queries whose outputs are genuinely
float-arithmetic-order-dependent must quantize in BOTH the Spark
expression and the oracle SQL (the catalog's integer-quantization idiom)
rather than rely on comparison slack."""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: -0.0 vs 0.0 is the one representational (not arithmetic)
        # difference a hash of the decimal string would also collapse
        return v + 0.0 if v == 0.0 else v
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalars
        return _norm_cell(v.item())
    if isinstance(v, int):
        return v
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d_cols = [c[0] for c in duck_rel.description]
    d_rows = [tuple(r) for r in duck_rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")

    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:5]
        extra_s = [r for r in sn if r not in dn][:3]
        extra_d = [r for r in dn if r not in sn][:3]
        problems.append(
            f"value mismatch; first paired diffs={diffs} spark-only={extra_s} duck-only={extra_d}"
        )
    return problems
