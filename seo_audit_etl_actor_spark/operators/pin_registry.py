"""Session-scoped registry of cache pins the near-dup pipelines create.

The LSH pipelines persist lean intermediate frames (exploded bands,
shingle sets) for the duration of the pair build and hand the matching
`unpersist` back through a `_spark_graft_release` attribute on the result
DataFrame. That attribute is fragile by construction: any transformation
a caller applies between the pipeline output and the consumer (a select,
filter, repartition, cache wrapper) produces a NEW DataFrame object and
silently drops the attribute — and with it the only reference to the
release, leaking the persisted corpus for the session (the exact
heap-OOM failure the r5 ladder hit and fixed).

This registry is the durable backstop: every pin is ALSO tracked here,
keyed by a monotonically increasing token, and each release is wrapped
idempotent-and-deregistering. Consumers keep using the attribute when it
survives (it releases precisely the pins of that one pipeline); harnesses
and long-lived sessions call `drain()` at a safe point (after the pair
frame is materialized/checkpointed, between catalog queries, per ladder
rung) to release anything whose attribute got dropped along the way.

Thread-safe; releasing through either path marks the pin done for both.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

_LOCK = threading.Lock()
_PINS: dict[int, Callable[[], None]] = {}
_NEXT_TOKEN = 0


def register(release: Callable[[], None]) -> Callable[[], None]:
    """Track `release` and return an idempotent wrapper that deregisters
    on first call. The wrapper is what pipelines should expose (attribute
    or return value); `drain()` covers pins whose wrapper was lost."""
    global _NEXT_TOKEN
    with _LOCK:
        token = _NEXT_TOKEN
        _NEXT_TOKEN += 1
        _PINS[token] = release

    def _release_once() -> None:
        with _LOCK:
            fn = _PINS.pop(token, None)
        if fn is not None:
            fn()

    return _release_once


def drain() -> int:
    """Release every still-registered pin; returns how many were live.
    Safe to call at any quiescent point — releases are idempotent and
    unpersist() on an already-released frame is a no-op."""
    with _LOCK:
        fns = list(_PINS.values())
        _PINS.clear()
    for fn in fns:
        fn()
    return len(fns)


def pinned_count() -> int:
    """Number of currently-live pins (for tests and leak assertions)."""
    with _LOCK:
        return len(_PINS)
