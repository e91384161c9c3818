"""The normalized output document (SURVEY §1.1 shape 2).

Engine-typed version of the reference's fixed nested schema
(/root/reference/src/schema.js:1-38): every leaf is typed-nullable — the
reference's `"missing"` string sentinels (cwv.*, provenance.gsc/ga4/
leadsnap) are represented as None/bool here and only materialize as
`"missing"`/`"present"` in the JSON serializer (SURVEY §1.4, §7.2 H3 — the
one deliberate model divergence: Spark columns are monotyped, so the
number-or-string union stays out of the engine).
"""

from __future__ import annotations

from copy import deepcopy

_EMPTY = {
    "meta": {"client": None, "domain": None, "run_date": None},
    "onsite": {
        "site_health": None,
        "errors": {
            "4xx": 0,
            "5xx": 0,
            "redirect_chains": 0,
            "canonical": 0,
            "thin": 0,
            "duplicate_titles": 0,
            "orphan_pages": 0,
        },
        "meta": {"missing_title": 0, "missing_description": 0, "weak_title": 0},
        "schema": {
            "organization": False,
            "localbusiness": False,
            "service": False,
            "faq": False,
            "review": False,
        },
        # engine-typed: None ⇒ serialized as "missing"
        "cwv": {"lcp_p75": None, "cls_p75": None, "inp_p75": None, "pass_rate": None},
        "content": {
            "pages_total": None,
            "service_pages": None,
            "location_pages": None,
            "blog_posts": None,
            "content_gap_terms": None,
        },
        "keywords": {"top3": None, "top10": None, "top100": None},
    },
    "local": {
        "rank": {"avg_pos": None, "pct_top3": None, "keywords_tracked": None},
        "citations": {
            "consistency": None,
            "dupes": None,
            "top_dirs_ok": None,
            "top_dirs_total": None,
        },
        "reviews": {
            "avg_rating": None,
            "count_total": None,
            "count_90d": None,
            "response_rate": None,
        },
        "gbp": {
            "primary_category": None,
            "secondary_categories": [],
            "photos_total": None,
            # engine-typed: None ⇒ "missing"
            "insights_calls": None,
            "insights_directions": None,
            "insights_website_clicks": None,
        },
    },
    "backlinks": {
        "ref_domains": None,
        "new_90d": None,
        "lost_90d": None,
        "dr": None,
        "anchor_brand_pct": None,
    },
    "provenance": {
        "ahrefs": False,
        "screamingfrog": False,
        "lighthouse": False,
        "brightlocal": False,
        "gbp_public": False,
        # engine-typed: False ⇒ "missing", True ⇒ "present"
        "gsc": False,
        "ga4": False,
        "leadsnap": False,
    },
}

# leaves whose engine value None serializes to the "missing" sentinel
_MISSING_SENTINEL_PATHS = (
    ("onsite", "cwv", "lcp_p75"),
    ("onsite", "cwv", "cls_p75"),
    ("onsite", "cwv", "inp_p75"),
    ("onsite", "cwv", "pass_rate"),
    ("local", "gbp", "insights_calls"),
    ("local", "gbp", "insights_directions"),
    ("local", "gbp", "insights_website_clicks"),
)
_PRESENCE_FLAG_PATHS = (
    ("provenance", "gsc"),
    ("provenance", "ga4"),
    ("provenance", "leadsnap"),
)


def empty_normalized(client: str, domain: str, run_date: str) -> dict:
    doc = deepcopy(_EMPTY)
    doc["meta"] = {"client": client, "domain": domain, "run_date": run_date}
    return doc


def _set_path(d: dict, path: tuple[str, ...], value) -> None:
    for k in path[:-1]:
        d = d[k]
    d[path[-1]] = value


def _get_path(d: dict, path: tuple[str, ...]):
    for k in path:
        d = d[k]
    return d


def to_reference_json(doc: dict) -> dict:
    """Serialize the engine-typed document to the reference's exact JSON
    shape: None → "missing" on the sentinel leaves, presence booleans →
    "present"/"missing" (src/schema.js:9,21-23,33-35; src/etl.js:441,447)."""
    out = deepcopy(doc)
    for path in _MISSING_SENTINEL_PATHS:
        if _get_path(out, path) is None:
            _set_path(out, path, "missing")
    for path in _PRESENCE_FLAG_PATHS:
        _set_path(out, path, "present" if _get_path(out, path) else "missing")
    return out
