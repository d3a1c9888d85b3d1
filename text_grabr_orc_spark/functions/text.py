"""Text primitives with exact reference-parity semantics.

The reference's whole text pipeline is ``strings.Fields(text)`` and
``len()`` of the result (``/root/reference/main.go:192-197``):
Go ``strings.Fields`` splits around *runs* of Unicode whitespace and
returns an empty slice for empty/all-whitespace input. We replicate
that as a pure Catalyst expression so it runs inside whole-stage
codegen — never a Python UDF.

Parity notes (mirrored by golden tests, FIXTURES.md §B.4):
  ``""`` -> 0 tokens, ``"   "`` -> 0, ``"a\tb\nc\r\nd"`` -> 4,
  ``" leading trailing "`` -> 2, runs of spaces collapse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java regex for runs of Unicode whitespace. ``(?U)`` turns on
#: UNICODE_CHARACTER_CLASS so ``\s`` matches what Go's unicode.IsSpace
#: does (NBSP, ideographic space, ...), not just ASCII whitespace.
TOKEN_SPLIT_REGEX = r"(?U)\s+"

#: DuckDB/RE2 whitespace-run regex equal to Java's ``(?U)\s+`` (the
#: Unicode White_Space property = Go unicode.IsSpace) for ORACLE SQL.
#: RE2's bare ``\s`` is ASCII-only (and excludes \x0b), so oracles
#: built on it would disagree with a correct engine the moment a
#: fixture document contains NBSP / ideographic space / U+2028 —
#: this explicit class keeps oracle parity independent of fixture
#: content. [\t\n\v\f\r] ∪ {U+85} ∪ {U+2028,U+2029} ∪ \p{Zs} is
#: exactly White_Space.
ORACLE_WS_RUN = r"[\t\n\x0b\f\r\x{85}\x{2028}\x{2029}\p{Zs}]+"


def tokens(text: Column | str) -> Column:
    """``strings.Fields`` equivalent: array of non-empty tokens.

    ``split`` emits a leading "" when the string starts with whitespace
    and a single "" for the empty string; the ``filter`` drops those,
    matching Go exactly.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, TOKEN_SPLIT_REGEX), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    """``len(strings.Fields(text))`` — the reference's ``textCount``
    (``main.go:195``), as an int column."""
    return F.size(tokens(text))


#: Go unicode.IsSpace == the Unicode White_Space property, exactly.
#: NOT Python str.split()'s set: Python also treats the C0 separators
#: \x1c-\x1f as whitespace; Go and Java's (?U)\s do not.
GO_WHITE_SPACE = frozenset(
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def py_fields(s: str) -> list[str]:
    """Plain-Python ``strings.Fields`` (`main.go:195`) for the few
    places that must tokenize INSIDE a Python batch (the OCR
    mapInPandas stage) — everywhere else use the Catalyst ``tokens``.
    Split on runs of Unicode White_Space, no empty tokens; agrees
    with ``tokens()``/``token_count()`` on arbitrary Unicode (fuzzed
    in tests/test_text_functions.py), where ``str.split()`` does not."""
    out, cur = [], []
    for ch in s:
        if ch in GO_WHITE_SPACE:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def py_field_count(s: str) -> int:
    """``len(strings.Fields(s))`` in plain Python — the OCR stage's
    ``textCount`` with exact Go parity."""
    return len(py_fields(s))


def char_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace runs to single spaces, trim."""
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_SPLIT_REGEX, " "))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a pre-materialized token
    array column.

    Callers should project the token array in its OWN ``select`` first
    (``df.select(tokens(...).alias("t")).select(shingles_from_tokens(
    F.col("t")))``): the lambda below references the array many times,
    and Catalyst's CollapseProject deliberately refuses to inline a
    non-cheap expression (the regex split) into multiple references —
    so the two-step shape computes the split once per row, measured
    ~2x faster than the fused expression.
    """
    count = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(count - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built from token arrays with higher-order array functions —
    stays JVM-side. Documents shorter than ``n`` tokens yield their
    whole (joined) token sequence as a single shingle so no document
    silently disappears from dedup. Prefer the two-step
    ``shingles_from_tokens`` shape in hot paths (see its docstring).
    """
    return shingles_from_tokens(tokens(text), n)
