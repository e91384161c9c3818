"""Encoding + delimiter sniffing for the smart CSV reader.

Reproduces the reference heuristics (/root/reference/src/etl.js:9-42):
UTF-16 detection is a BOM check OR a >10% NUL-byte ratio over the first
4 KiB; delimiter auto-detection (the UTF-8 path) picks the candidate that
yields the most consistent multi-column split over the first lines.

This runs on the driver over at most 4 KiB per file — Spark's CSV reader
cannot sniff encodings, so the probe is a plan-time metadata step, never a
data-volume cost (SURVEY §7.2 H1).
"""

from __future__ import annotations

PROBE_LEN = 4096
NUL_RATIO = 0.10
DELIM_CANDIDATES = (",", "\t", ";", "|")


def looks_utf16(buf: bytes) -> bool:
    """BOM sniff (FF FE little-endian / FE FF big-endian) or >10% NUL bytes
    in the first 4 KiB (/root/reference/src/etl.js:10-21)."""
    if len(buf) >= 2 and buf[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return True
    probe = buf[:PROBE_LEN]
    if not probe:
        return False
    return probe.count(0) / len(probe) > NUL_RATIO


def utf16_variant(buf: bytes) -> str:
    """The reference always decodes as UTF-16LE (src/etl.js:33) regardless
    of BOM; we honor a big-endian BOM when present (strictly more correct,
    identical on the LE files the reference targets)."""
    if buf[:2] == b"\xfe\xff":
        return "utf-16-be"
    return "utf-16-le"


def sniff_delimiter(text: str, candidates: tuple[str, ...] = DELIM_CANDIDATES) -> str:
    """Pick the delimiter that splits the first line into the most fields,
    preferring earlier candidates on ties (papaparse-style auto-detect used
    by the reference's UTF-8 attempt, src/etl.js:28)."""
    first_line = text.split("\n", 1)[0].rstrip("\r")
    best, best_n = candidates[0], 1
    for d in candidates:
        n = len(first_line.split(d))
        if n > best_n:
            best, best_n = d, n
    return best
