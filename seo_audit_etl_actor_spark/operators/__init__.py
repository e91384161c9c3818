"""Aggregate and relational operator builders.

aggregates — conditional counts, ratios, nearest-rank percentiles,
             order-deterministic first/collect, coverage-weighted scoring
asof       — as-of (most-recent-match) join for time-series enrichment
dedup      — exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication
similarity — embedding cosine similarity search (brute-force + LSH-bucketed)
text       — language ID, quality scoring, token counting, fingerprinting
"""
