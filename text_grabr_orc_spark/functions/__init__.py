"""Column-expression library. Everything here is a pure Catalyst
expression (JVM-side, codegen-able) — no Python UDFs in this package."""

from text_grabr_orc_spark.functions.text import (
    char_count,
    normalize_text,
    token_count,
    tokens,
    word_shingles,
)
from text_grabr_orc_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)

__all__ = [
    "tokens",
    "token_count",
    "char_count",
    "normalize_text",
    "word_shingles",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
