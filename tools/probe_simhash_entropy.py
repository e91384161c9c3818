"""Offline attribution for the simhash md5-vs-xxhash64 verified-pair gap
(r8 hash study): with the synthetic corpus's tiny vocabulary (31 distinct
whitespace tokens at near-equal tf), a document's simhash fingerprint is
the sign pattern of 31 nearly-balanced votes — so a bit separates
documents ONLY if the 31 tokens' hash bits nearly cancel (|sum of +-1
votes| small). The number of such "live" bits is the fingerprint's
effective entropy, and it is pure luck of the draw per hash family on
this support: fewer live bits => documents concentrate in Hamming space
=> the verified-pair count explodes.

Measured (m316, 200k-doc tf sample): md5 37 bits with |vote sum| <= 3 vs
xxhash64's 30 — matching the 4.6x verified-pair gap the Spark-side probe
found (tools/probe_simhash_hash.py: 74.97M vs 16.21M at Hamming <= 3).

The XXH64 implementation is pure-Python, spec-derived (xxHash spec,
public domain), and verified bit-exact against Spark's F.xxhash64
(seed=42) — so the analysis speaks for the engine's actual hash.

Usage: python tools/probe_simhash_entropy.py [DIR] (default /tmp/scale_m316)
"""

from __future__ import annotations

import hashlib
import math
import struct
import sys

P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)
M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 per the public spec; seed 42 matches Spark's F.xxhash64."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M]
        while i + 32 <= n:
            for j in range(4):
                lane = struct.unpack_from("<Q", data, i + 8 * j)[0]
                v[j] = (_rotl((v[j] + lane * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & M
        for j in range(4):
            h ^= (_rotl((v[j] * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = (_rotl((struct.unpack_from("<Q", data, i)[0] * P2) & M, 31) * P1) & M
        h = (_rotl(h ^ k, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((struct.unpack_from("<I", data, i)[0] * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def md5_60(tok: bytes) -> int:
    """operators/text.md5_long equivalent: 15-hex-char md5 prefix."""
    return int(hashlib.md5(tok).hexdigest()[:15], 16)


def main() -> None:
    import json

    import duckdb

    # self-check: spec test vectors, then Spark parity is asserted by
    # tests/test_banding.py::test_pure_python_xxh64_matches_spark
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B

    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_m316"
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT tok, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM read_parquet(?) USING SAMPLE 200000 ROWS)
        WHERE tok <> '' GROUP BY tok ORDER BY tf DESC
        """,
        [f"{d}/documents.parquet"],
    ).fetchall()
    total = sum(tf for _, tf in rows)
    out = {"dir": d, "n_distinct_tokens": len(rows), "total_tf": total, "families": {}}
    sigma = math.sqrt(sum(tf * tf for _, tf in rows)) / total
    for fam, fn in (("xxhash64", lambda b: xxh64(b, 42)), ("md5", md5_60)):
        hashes = {tok: fn(tok.encode()) for tok, _ in rows}
        votes = [0] * 60
        for tok, tf in rows:
            h = hashes[tok]
            for i in range(60):
                votes[i] += tf if (h >> i) & 1 else -tf
        bias = sorted((abs(v) / total for v in votes), reverse=True)
        sums = [
            sum(1 if (hashes[tok] >> i) & 1 else -1 for tok, _ in rows)
            for i in range(60)
        ]
        out["families"][fam] = {
            "tf_weighted_bias_top5": [round(b, 4) for b in bias[:5]],
            "sigma_iid": round(sigma, 4),
            "live_bits_abs_sum_eq_1": sum(1 for s in sums if abs(s) == 1),
            "near_live_bits_abs_sum_le_3": sum(1 for s in sums if abs(s) <= 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
