"""Vector math over ``array<float>`` embedding columns as pure
Catalyst expressions (``zip_with`` + ``aggregate``), so similarity
search's hot path stays inside whole-stage codegen with no Python.

All math is done in double after an exact float->double widening, with
strictly sequential summation — this makes results reproducible and
lets the DuckDB oracle (``list_dot_product`` on DOUBLE lists) agree to
the last ulp at test scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(vec: Column | str) -> Column:
    col = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs instead of NaN so a
    degenerate vector can't poison a top-k ranking.

    Evaluates BOTH norms per call — fine for per-row use, wrong inside
    a pair join: there, precompute ``l2_norm`` per side (one reduction
    per input row, not three per pair) and combine with
    ``cosine_from_parts``. The join boundary keeps each side's norm
    projection per-row — Catalyst never inlines one side's expressions
    into the pair expression above the join."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_from_parts(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a pair dot product and two PRECOMPUTED norms —
    identical doubles to ``cosine_similarity`` (same expression
    d / (sqrt * sqrt), just with the sqrts evaluated per row instead
    of per pair), so oracle agreement is unaffected."""
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
