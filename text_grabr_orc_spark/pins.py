"""Bounded pin-sets for persisted intermediates that are not routed
through :mod:`opcache` (they are plan-local, not shared across
operators): each ``pin_frame`` call registers a persisted frame under
a named group and releases the oldest entries past the group's cap —
the round-8 ADVICE leak class (a long session accumulating one
corpus-sized storage entry per distinct input) bounded in one place.

Entries are deduped by the ANALYZED plan's ``semanticHash``: a
re-invocation of the same logical plan moves its entry to the back
instead of appending a duplicate handle — unpersisting a duplicate
would drop the cacheManager entry a live invocation shares.

Only pin frames whose recompute is DETERMINISTIC (pure projections /
joins / windows over deterministic inputs): an evicted pin's lazy
consumers recompute it, and that recompute must reproduce identical
content. Frames whose physical layout feeds collected driver state
must derive that layout from VALUES, not from sampled partitioners
(see ``distributed_prefix_cum``'s boundary design)."""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

_PINS: dict[str, "OrderedDict[tuple, DataFrame]"] = {}
_LOCK = threading.Lock()

#: fallback key counter for frames whose plan access fails — id(df) is
#: reusable after GC, so two distinct frames could alias one pin key
#: and the dedupe move would drop the older frame's handle WITHOUT
#: unpersisting it (the exact leak class this module bounds). A
#: monotonic counter never aliases; such frames simply never dedupe.
_FALLBACK_SEQ = [0]


def _plan_key(df: DataFrame) -> tuple:
    try:
        return ("plan", df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:  # noqa: BLE001 — plan access is best-effort
        with _LOCK:
            _FALLBACK_SEQ[0] += 1
            return ("seq", _FALLBACK_SEQ[0])


def pin_frame(df: DataFrame, group: str, max_n: int = 3) -> None:
    """Register persisted ``df`` under ``group``; release the oldest
    pins past ``max_n``."""
    key = _plan_key(df)
    with _LOCK:
        g = _PINS.setdefault(group, OrderedDict())
        g.pop(key, None)
        g[key] = df
        while len(g) > max_n:
            _, old = g.popitem(last=False)
            try:
                old.unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — session may be gone
                pass
