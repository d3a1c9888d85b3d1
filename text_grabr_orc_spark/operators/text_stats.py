"""M0 — text statistics core (reference parity).

Reference ops #8/#9: whitespace tokenize + count + projection to the
``{text, textCount}`` result schema (``/root/reference/main.go:192-197``),
lifted from one-record-per-HTTP-request to whole-corpus DataFrames.

Scale notes: both queries are single narrow projections plus (for the
corpus rollup) one partial-aggregated groupBy on a low-cardinality key
(5 langs) — map-side combine makes the shuffle carry only
``langs x partitions`` rows, so this holds at 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.functions.text import ORACLE_WS_RUN, token_count
from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.tables import load_table

#: DuckDB equivalent of the `strings.Fields` token count — the
#: whitespace class mirrors Java's (?U)\s exactly (see
#: functions.text.ORACLE_WS_RUN), so the oracle agrees with the
#: engine even on non-ASCII whitespace.
_ORACLE_TOKEN_COUNT = (
    "len(list_filter(regexp_split_to_array({col}, '"
    + ORACLE_WS_RUN.replace("{", "{{").replace("}", "}}")
    + "'), t -> t <> ''))"
)


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           {_ORACLE_TOKEN_COUNT.format(col="text")} AS token_cnt,
           n_chars
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document ``textCount`` — the reference's entire text
    pipeline (`main.go:192-197`) as one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("bigint").alias("token_cnt"),
        "n_chars",
    )


@register(
    "corpus_stats_by_lang",
    oracle=f"""
    SELECT lang,
           count(*) AS doc_cnt,
           CAST(coalesce(sum({_ORACLE_TOKEN_COUNT.format(col="text")}), -1)
                AS BIGINT) AS total_tokens,
           round(avg({_ORACLE_TOKEN_COUNT.format(col="text")}), 2) AS avg_tokens,
           CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: corpus rollup by language over per-doc token counts."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang", token_count("text").cast("bigint").alias("tc"), "n_chars"
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.coalesce(F.sum("tc"), F.lit(-1)).cast("bigint")
        .alias("total_tokens"),
        F.round(F.avg("tc"), 2).alias("avg_tokens"),
        F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint")
        .alias("total_chars"),
    )


#: `strings.Fields` parity cases (FIXTURES.md §B.4) — ASCII subset so
#: the DuckDB oracle can replicate; Unicode cases live in pytest.
_PARITY_CASES = [
    ("empty", ""),
    ("spaces", "   "),
    ("simple", "a b c"),
    ("mixed_ws", "a\tb\nc\r\nd"),
    ("lead_trail", " leading trailing "),
    ("single", "one"),
    ("runs", "x    y"),
]


def _sql_str(s: str) -> str:
    """Render a python string as a DuckDB E'...' escaped literal."""
    esc = s.replace("\\", "\\\\").replace("'", "''")
    esc = esc.replace("\t", "\\t").replace("\r", "\\r").replace("\n", "\\n")
    return f"E'{esc}'"


@register(
    "tokenize_fields_parity",
    oracle=f"""
    SELECT name,
           {_ORACLE_TOKEN_COUNT.format(col="s")} AS token_cnt
    FROM (VALUES {", ".join(f"('{n}', {_sql_str(s)})" for n, s in _PARITY_CASES)}
         ) AS t(name, s)
    """,
)
def tokenize_fields_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden `strings.Fields` parity table (`main.go:195` semantics)."""
    df = spark.createDataFrame(_PARITY_CASES, "name string, s string")
    return df.select("name", token_count("s").cast("bigint").alias("token_cnt"))
