"""Lighthouse JSON extraction (SURVEY §2.1 S6, F11).

One small JSON document per audited URL; parsed driver-side and navigated
with None-safe dict access — the analog of the reference's optional
chaining (src/etl.js:265-274). At corpus scale the same extraction is a
`spark.read.json` + struct field references; this path serves the
ZIP-of-three-files reality.
"""

from __future__ import annotations

import json

METRIC_AUDITS = {
    "lcp_ms": "largest-contentful-paint",
    "cls": "cumulative-layout-shift",
    "inp_ms": "interactive",
    "ttfb_ms": "server-response-time",
}


def extract_lighthouse(buf: bytes) -> dict:
    """→ {lcp_ms, cls, inp_ms, ttfb_ms, perf_score}, None for any missing
    path. Raises on invalid JSON (caller records 'partial' + note)."""
    obj = json.loads(buf.decode("utf-8"))
    audits = obj.get("audits") or {}

    def num(key: str):
        a = audits.get(key)
        return a.get("numericValue") if isinstance(a, dict) else None

    perf = ((obj.get("categories") or {}).get("performance") or {}).get("score")
    out = {name: num(audit) for name, audit in METRIC_AUDITS.items()}
    out["perf_score"] = perf
    return out
