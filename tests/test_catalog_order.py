"""Catalog-ordering contract test (process rule from round 2's verdict):
the external driver snapshots only the FIRST 50 entries of
queries/catalog.py for its rows+schema+hash CORRECTNESS check, so any
query that has never earned a green driver row MUST sit inside that
window. This test reads the repo's CORRECTNESS_r*.json history and fails
if an unverified query would silently escape the driver's gate — the
automated form of catalog.py's ordering rules."""

from __future__ import annotations

import json
from pathlib import Path

from seo_audit_etl_actor_spark.queries import QUERIES

REPO = Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50


def _driver_green_names() -> set[str]:
    green: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                green.add(name)
            elif (
                name in ROWS_ONLY_ALLOWED
                and row.get("err") == "no_oracle"
                and row.get("spark_rows")
            ):
                # deliberate rows-only entries can never earn a hash row;
                # a recorded driver execution is their strongest evidence
                green.add(name)
    return green


def test_unverified_queries_inside_driver_window():
    green = _driver_green_names()
    assert green, "CORRECTNESS history missing — cannot validate ordering"
    names = [q.name for q in QUERIES]
    escaped = [n for n in names[DRIVER_WINDOW:] if n not in green]
    assert not escaped, (
        f"queries with no green driver row sit below position {DRIVER_WINDOW} "
        f"and will never be checked: {escaped} — move them to the top of "
        "queries/catalog.py"
    )


# Deliberate rows-only entries: each name here must have a written
# justification in catalog.py AND a compensating local check.
#   approx_distinct_users_prod — HLL estimate only; values are
#     implementation-defined across engines so no hash oracle can exist.
#     Compensated by tests/test_plans.py (no-exact-distinct plan assertion)
#     and the hashed audit form approx_distinct_users.
ROWS_ONLY_ALLOWED = {"approx_distinct_users_prod"}


def test_catalog_names_unique_and_oracled():
    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names))
    # every entry ships oracle SQL (rows-only checks are a weaker signal;
    # adding one back must be a deliberate, visible, allowlisted choice)
    missing = [q.name for q in QUERIES if q.sql is None and q.name not in ROWS_ONLY_ALLOWED]
    assert not missing, f"oracle-less catalog entries: {missing}"
    stale_allow = [n for n in ROWS_ONLY_ALLOWED if n not in names]
    assert not stale_allow, f"allowlist names not in catalog: {stale_allow}"


def _latest_green_rounds() -> tuple[dict[str, int], int]:
    """(query -> latest green round, latest recorded round)."""
    latest: dict[str, int] = {}
    max_round = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        max_round = max(max_round, rnd)
        for name, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            )
            rows_only = (
                name in ROWS_ONLY_ALLOWED
                and row.get("err") == "no_oracle"
                and row.get("spark_rows")
            )
            if ok or rows_only:
                latest[name] = rnd
    return latest, max_round


def test_no_stale_evidence():
    """Staleness gate (r6 verdict task 4 — the rule that would have caught
    token_rarity_stats sitting on r3-only evidence at position 123):
    every catalog query must either sit INSIDE the driver window (so the
    upcoming round refreshes it) or have green evidence no older than the
    rotation period.

    r8 revision: the bound is CAPACITY-DERIVED. With Q catalog queries and
    a W-slot window, a perfect round-robin refreshes each query every
    ceil(Q/W) rounds, so the oldest below-window evidence a correct
    rotation can ever show — including immediately after a new
    CORRECTNESS file lands, which is when the judge runs pytest — is
    max_round - (period - 1). The r7 gate hard-coded a 2-round bound,
    which with Q=128 > 2*W=100 was unsatisfiable at exactly that moment
    (it fired the instant r7 landed, before any r8 rotation could exist).
    The gate still forces the rotation: skip a round and the below-window
    tail ages past the period."""
    latest, max_round = _latest_green_rounds()
    assert max_round >= 1
    period = -(-len(QUERIES) // DRIVER_WINDOW)  # ceil(Q/W)
    oldest_ok = max_round - (period - 1)
    names = [q.name for q in QUERIES]
    stale_escapees = [
        f"{n} (latest green r{latest.get(n, 0)})"
        for n in names[DRIVER_WINDOW:]
        if latest.get(n, 0) < oldest_ok
    ]
    assert not stale_escapees, (
        f"queries below position {DRIVER_WINDOW} whose evidence is older "
        f"than r{oldest_ok}: {stale_escapees} — rotate them into the "
        "window (run tools/rotate_catalog.py)"
    )


def _rotate_module():
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    import rotate_catalog

    return rotate_catalog


def _recorded_rounds() -> list[int]:
    return sorted(int(f.stem.split("_r")[1]) for f in REPO.glob("CORRECTNESS_r*.json"))


def _order_is_canonical(src: str) -> bool:
    """True if the committed order is canonical under the full CORRECTNESS
    history OR under the history minus the newest round. The second form
    is what a correct rotation looks like at judge time: the driver has
    just written an UNTRACKED CORRECTNESS_r{N}.json (which the committed
    order could not have seen), so the order that correctly SERVED the
    r{N} window is canonical w.r.t. r1..r{N-1} only. The r8 gate accepted
    only the full-history form and so failed by construction the instant
    every round ended (r8 verdict finding 1)."""
    mod = _rotate_module()
    rounds = _recorded_rounds()
    caps: list[int | None] = [None]
    if len(rounds) >= 2:
        caps.append(rounds[-2])
    return any(mod.rotate(src, max_round_cap=cap) == src for cap in caps)


def test_catalog_order_canonical():
    """The QUERIES order must be exactly what tools/rotate_catalog.py
    generates from the CORRECTNESS history — hand edits drift (r7's
    rotation was manual and left 28 stale escapees at judge time)."""
    mod = _rotate_module()
    src = mod.CATALOG.read_text()
    assert _order_is_canonical(src), (
        "queries/catalog.py order is not canonical under the CORRECTNESS "
        "history (with or without the newest round) — run tools/rotate_catalog.py"
    )


def test_catalog_order_survives_new_driver_round():
    """Judge-time robustness (r9 task 1): simulate the driver landing a
    brand-new CORRECTNESS file — all first-window names green in a round
    newer than anything committed — and assert the canonical-order gate
    still passes. This is the exact tree state in which the judge runs
    pytest every round."""
    mod = _rotate_module()
    src = mod.CATALOG.read_text()
    names = [q.name for q in QUERIES][:DRIVER_WINDOW]
    fake_round = _recorded_rounds()[-1] + 1
    fake = REPO / f"CORRECTNESS_r{fake_round:02d}.json"
    assert not fake.exists(), f"refusing to overwrite {fake}"
    payload = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": n not in ROWS_ONLY_ALLOWED,
            "spark_rows": 1,
            "oracle_rows": 1,
            "err": "no_oracle" if n in ROWS_ONLY_ALLOWED else None,
        }
        for n in names
    }
    fake.write_text(json.dumps(payload))
    try:
        assert _order_is_canonical(src), (
            "canonical-order gate fails when a new driver CORRECTNESS file "
            "lands — the judge-time fragility the r8 verdict flagged"
        )
    finally:
        fake.unlink()
