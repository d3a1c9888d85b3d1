"""Golden tests for `strings.Fields` tokenizer parity
(reference `main.go:195`; cases from FIXTURES.md §B.4, plus the
Unicode-whitespace cases the DuckDB oracle can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import (
    normalize_text,
    py_field_count,
    py_fields,
    token_count,
    tokens,
    word_shingles,
)

FIELDS_CASES = [
    ("", 0),
    ("   ", 0),
    ("a b c", 3),
    ("a\tb\nc\r\nd", 4),
    (" leading trailing ", 2),
    ("one", 1),
    ("x    y", 2),
    # Unicode whitespace — Go's unicode.IsSpace includes NBSP (U+00A0),
    # ideographic space (U+3000), NEL (U+0085).
    ("a b", 2),
    ("a　b", 2),
    ("ab", 2),
    (" 　", 0),
]


def test_token_count_fields_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(FIELDS_CASES)], "id int, s string"
    )
    got = {r["id"]: r["n"] for r in df.select("id", token_count("s").alias("n")).collect()}
    for i, (s, want) in enumerate(FIELDS_CASES):
        assert got[i] == want, f"case {s!r}: got {got[i]}, want {want}"


def test_tokens_values(spark):
    df = spark.createDataFrame([(" a\tbb  c ",)], "s string")
    assert df.select(tokens("s").alias("t")).collect()[0]["t"] == ["a", "bb", "c"]


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello\t WORLD\n",)], "s string")
    assert df.select(normalize_text("s").alias("t")).collect()[0]["t"] == "hello world"


@pytest.mark.parametrize(
    "text,n,want",
    [
        ("a b c d", 2, ["a b", "b c", "c d"]),
        ("a b c d", 3, ["a b c", "b c d"]),
        ("a b", 3, ["a b"]),  # shorter than n -> whole doc as one shingle
        ("", 3, []),
        ("a b a b a b", 2, ["a b", "b a"]),  # distinct shingles only
    ],
)
def test_word_shingles(spark, text, n, want):
    df = spark.createDataFrame([(text,)], "s string")
    assert df.select(word_shingles("s", n).alias("g")).collect()[0]["g"] == want


def test_token_count_stays_jvm_side(spark):
    """The hot path must be pure Catalyst — no BatchEvalPython/ArrowEval
    nodes (the reference's per-pixel Go loops become codegen, not UDFs)."""
    df = spark.createDataFrame([("a b",)], "s string").select(token_count("s"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# Property-based tokenizer parity (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

import pytest


# Go unicode.IsSpace == the Unicode White_Space property, exactly.
# NOT Python str.split()'s set: Python also treats the C0 separators
# \x1c-\x1f as whitespace; Go and Java's (?U)\s do not — the fuzzer
# caught that divergence on '\x1f'.
_GO_WHITE_SPACE = frozenset(
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def _go_fields(s: str) -> list[str]:
    """Reference semantics (`main.go:195` strings.Fields): split on
    runs of Unicode White_Space, no empty tokens."""
    out, cur = [], []
    for ch in s:
        if ch in _GO_WHITE_SPACE:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


if _HAVE_HYPOTHESIS:

    @pytest.mark.usefixtures("spark")
    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8",
                    # surrogates can't round-trip through Arrow/JVM strings
                    exclude_categories=("Cs",),
                ),
                max_size=60,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_tokens_match_go_fields_fuzz(spark, texts):
        """Batch the whole hypothesis example list into ONE Spark job:
        token arrays and counts must equal Go strings.Fields on
        arbitrary Unicode, including NBSP, ideographic space, control
        chars, and empty/whitespace-only strings."""
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        rows = (
            df.select("id", tokens("text").alias("toks"))
            .orderBy("id")
            .collect()
        )
        for r, t in zip(rows, texts):
            assert list(r.toks) == _go_fields(t), repr(t)
            # the Python-side tokenizer (used by the OCR mapInPandas
            # stage for textCount) must agree with the same reference
            assert py_fields(t) == _go_fields(t), repr(t)


def test_py_fields_diverges_from_str_split_where_go_does():
    # the documented C0-separator divergence: str.split() treats
    # \x1c-\x1f as whitespace, Go strings.Fields does not
    s = "a\x1fb \x1c c"
    assert py_fields(s) == ["a\x1fb", "\x1c", "c"]
    assert s.split() == ["a", "b", "c"]
    assert py_field_count(s) == 3


def test_ocr_textcount_uses_go_parity_tokenizer():
    # the OCR stage's Python path must route through py_field_count —
    # pin the divergence case end-to-end at the function level
    from text_grabr_orc_spark.functions.text import py_field_count as pfc

    assert pfc("OCRSTUB 4x2 deadbeef") == 3
    assert pfc("x\x1fy") == 1 and len("x\x1fy".split()) == 2


def test_hll_estimate_within_standard_error(spark, sf_dir):
    """Raw HLL with m=64 has relative standard error ~1.04/sqrt(64)
    = 13%; allow 3 sigma. Register invariants: none exceed the rank
    cap, empty+filled = m."""
    from text_grabr_orc_spark.operators.sketches import (
        _HLL_M,
        _HLL_MAX_RANK,
        hll_distinct_users,
    )

    row = hll_distinct_users(spark, sf_dir).collect()[0]
    assert row.m == _HLL_M
    assert row.register_sum <= _HLL_M * _HLL_MAX_RANK
    assert 0 <= row.empty_registers <= _HLL_M
    rel_err = abs(row.estimate - row.n_exact) / row.n_exact
    assert rel_err < 3 * 1.04 / (_HLL_M ** 0.5), (row.estimate, row.n_exact)
