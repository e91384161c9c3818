"""Incremental materialized-view maintenance from the lake CDC feed
(engine extension surface): keep a grouped SUM/COUNT view in sync with a
versioned base table by applying only the CHANGED rows — never rescanning
the base. The algebraic-merge counterpart of `queries/scale_ext.py`'s
partial-aggregate merge, driven by `lake_maintenance.diff_versions`.

Semantics (standard delta-maintenance for SUM/COUNT aggregates, which are
commutative groups — every change row contributes a signed delta):

    removed row   ->  -old measures, count -1
    added row     ->  +new measures, count +1
    changed row   ->  (new - old) measures, count 0

The deltas aggregate per group, then merge into the old view with a
full-outer join + null-safe addition; groups whose count reaches 0 drop
out (they no longer exist in the base). Because measures here are exact
BIGINTs, merge ≡ recompute EXACTLY (asserted by the test) — the float
caveat of incremental maintenance doesn't arise.

Scale: the delta pass touches ONLY the diff rows (at 100 TB typically
orders of magnitude fewer than the base); one shuffle on the group key
for the delta agg + one for the merge join. A full recompute would rescan
the entire base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_sum_view(base: DataFrame, group_col: str, measures: dict[str, str]) -> DataFrame:
    """The view definition: per-group COUNT(*) plus SUM of each measure
    expression (must be exact-integer expressions for merge ≡ recompute).
    `measures` maps output column -> SQL expression over a base row."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.expr(expr)).alias(out) for out, expr in measures.items()
    ]
    return base.groupBy(group_col).agg(*aggs)


def apply_cdc_to_view(
    view: DataFrame,
    cdc: DataFrame,
    group_col: str,
    measures: dict[str, str],
) -> DataFrame:
    """Merge a `diff_versions(..., include_values=True)` feed into the view.

    The group column itself may change for a key (a row moving between
    groups): the old side contributes its delta to the OLD group and the
    new side to the NEW group, which the signed union below handles
    naturally."""
    changed = F.col("change") == "changed"
    added = F.col("change") == "added"
    removed = F.col("change") == "removed"

    def delta_leg(struct_name: str, sign: int, cond) -> DataFrame:
        prefixed = {
            out: _prefix_expr(expr, struct_name) for out, expr in measures.items()
        }
        return cdc.where(cond).select(
            F.col(f"{struct_name}.{group_col}").alias(group_col),
            F.lit(sign).alias("__d_rows"),
            *[
                (F.lit(sign) * F.expr(expr)).alias(out)
                for out, expr in prefixed.items()
            ],
        )

    legs = [
        delta_leg("new", 1, added),
        delta_leg("old", -1, removed),
        delta_leg("new", 1, changed),
        delta_leg("old", -1, changed),
    ]
    deltas_raw = legs[0]
    for leg in legs[1:]:
        deltas_raw = deltas_raw.unionByName(leg)
    deltas = deltas_raw.groupBy(group_col).agg(
        F.sum("__d_rows").alias("d_rows"),
        *[F.sum(out).alias(out) for out in measures],
    )

    merged = view.alias("v").join(deltas.alias("d"), group_col, "full_outer")
    out_cols = [
        (F.coalesce(F.col("v.n_rows"), F.lit(0)) + F.coalesce(F.col("d.d_rows"), F.lit(0))).alias("n_rows")
    ] + [
        (F.coalesce(F.col(f"v.{out}"), F.lit(0)) + F.coalesce(F.col(f"d.{out}"), F.lit(0))).alias(out)
        for out in measures
    ]
    return (
        merged.select(group_col, *out_cols)
        .where(F.col("n_rows") > 0)  # emptied groups leave the view
    )


def _prefix_expr(expr: str, struct_name: str) -> str:
    """Qualify bare column references in a simple measure expression with
    the CDC struct name. Supports the exact-integer measure idiom used in
    this repo (column names, literals, arithmetic, ROUND/CAST) by
    prefixing identifier tokens that aren't SQL keywords/functions."""
    import re

    keywords = {
        "CAST", "AS", "BIGINT", "INT", "DOUBLE", "ROUND", "ABS", "CASE",
        "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT", "NULL",
        "COALESCE", "LENGTH",
    }

    def repl(m: "re.Match[str]") -> str:
        tok = m.group(0)
        # A '...'-quoted literal (first alternative below) passes through
        # verbatim: identifiers inside string literals must NOT be qualified
        # (e.g. CASE WHEN lang = 'en' ... must keep 'en' intact).
        if tok.startswith("'"):
            return tok
        if tok.upper() in keywords or tok[0].isdigit():
            return tok
        return f"{struct_name}.{tok}"

    # Match string literals (with '' escapes) before identifiers so quoted
    # regions are never rewritten.
    return re.sub(r"'(?:[^']|'')*'|[A-Za-z_][A-Za-z0-9_]*", repl, expr)
