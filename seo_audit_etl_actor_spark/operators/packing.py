"""Sequence packing — the actual PACKER behind `packing_stats`' efficiency
accounting (engine extension surface): assign documents to fixed-size
training sequences so pad waste approaches the stats query's ideal bound.

Algorithm: deterministic first-fit-decreasing within hash buckets.

- documents are hash-bucketed (`pmod(xxhash64(doc_id), n_buckets)`) so the
  imperative bin-packing state is PER BUCKET — bounded memory, and the
  bucket count is the parallelism knob (the same bounded-state discipline
  as streaming/heavyhitters.py);
- within a bucket, docs sort by (n_tokens DESC, doc_id ASC) — a total
  order, so the packing is a pure function of the bucket's membership and
  invariant to input partitioning (asserted by test);
- first-fit-decreasing walks open sequences in creation order and places
  each doc into the first one with room, opening a new sequence otherwise;
  docs longer than `max_tokens` get a single overflow sequence of their
  own (the caller chunks them upstream — `chunk_stats` covers that path);
- sequence ids are globally unique without coordination:
  seq_id = bucket * 2^40 + local_index.

FFD waste bound (classic): ≤ 11/9 · OPT + 1 bins per bucket; the test
asserts ≥ 80% mean fill on the synthetic corpus, far above the naive
one-doc-per-window baseline that packing_stats reports (~0.3 fill at
ctx=512 there).

Scale: one shuffle on the bucket key; each task holds only open-sequence
fill levels (O(seqs-in-bucket) ints). applyInPandas is the sanctioned
Arrow path for genuinely imperative per-group logic (SURVEY §2.10).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seo_audit_etl_actor_spark.session import ensure_package_on_executors

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("seq_id", T.LongType(), False),
        T.StructField("seq_fill", T.LongType(), False),
    ]
)


def ffd_pack(items: list[tuple[int, int]], max_tokens: int) -> dict[int, int]:
    """Pure-Python first-fit-decreasing: [(doc_id, n_tokens)] → {doc_id:
    local_seq_index}. Deterministic: sorts by (-n_tokens, doc_id)."""
    fills: list[int] = []
    assign: dict[int, int] = {}
    for doc_id, n in sorted(items, key=lambda x: (-x[1], x[0])):
        if n >= max_tokens:
            assign[doc_id] = len(fills)
            fills.append(n)
            continue
        for i, f in enumerate(fills):
            if f + n <= max_tokens:
                assign[doc_id] = i
                fills[i] = f + n
                break
        else:
            assign[doc_id] = len(fills)
            fills.append(n)
    return assign


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every doc to a training sequence: (doc_id, n_tokens, seq_id,
    seq_fill). Each doc appears exactly once; seq_fill is its sequence's
    total tokens (≤ max_tokens except single-doc overflow sequences)."""
    ensure_package_on_executors(docs.sparkSession)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        bucket = int(pdf["__bucket"].iloc[0])
        items = list(zip(pdf[id_col].astype(int), pdf[tokens_col].astype(int)))
        assign = ffd_pack(items, max_tokens)
        fills: dict[int, int] = {}
        for doc_id, n in items:
            s = assign[doc_id]
            fills[s] = fills.get(s, 0) + n
        base = bucket << 40
        return pd.DataFrame(
            {
                "doc_id": [d for d, _ in items],
                "n_tokens": [n for _, n in items],
                "seq_id": [base + assign[d] for d, _ in items],
                "seq_fill": [fills[assign[d]] for d, _ in items],
            }
        )

    keyed = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    ).withColumn("__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)))
    return keyed.groupBy("__bucket").applyInPandas(pack, PACKED_SCHEMA)
