"""Fuzzy column resolution (SURVEY §2.2 P1).

Schema resolution is driver metadata work over `df.columns` — cheap,
identical semantics at any scale (/root/reference/src/etl.js:44-72):
normalize every header (NBSP→space, collapse whitespace, trim, lowercase)
into two lookup maps (normalized, and no-space normalized); walk the
candidate list in priority order; first hit wins. Later duplicate headers
overwrite earlier ones in the maps, matching the reference's Map.set.
"""

from __future__ import annotations

import re

_NBSP = " "


def norm(s: str | None) -> str:
    s = "" if s is None else str(s)
    s = s.replace(_NBSP, " ")
    s = re.sub(r"\s+", " ", s)
    return s.strip().lower()


def norm_nospace(s: str | None) -> str:
    return re.sub(r"\s+", "", norm(s))


def pick_col(columns: list[str], candidates: list[str]) -> str | None:
    """Return the original column name matching the highest-priority
    candidate, or None."""
    lookup: dict[str, str] = {}
    lookup_nospace: dict[str, str] = {}
    for c in columns:
        lookup[norm(c)] = c
        lookup_nospace[norm_nospace(c)] = c
    for want in candidates:
        w, ws = norm(want), norm_nospace(want)
        if w in lookup:
            return lookup[w]
        if ws in lookup_nospace:
            return lookup_nospace[ws]
    return None
