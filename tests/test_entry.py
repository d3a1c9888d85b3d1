"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql()
are consistent, every oracle parses in DuckDB."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from text_grabr_orc_spark.tables import TABLE_NAMES


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {
        "outcome", "n_docs", "total_tokens", "avg_quality"
    }


def test_every_oracle_key_has_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert qs, "no queries registered"


def test_oracles_parse_in_duckdb(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"oracle for {name} failed to parse/plan: {e}")


def test_queries_run_at_smoke_sf(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0


def test_repeated_contract_calls_are_stable():
    """The driver may call queries()/oracle_sql() any number of times;
    the registry must not double-register (it would raise) and the
    returned dicts must be equal and defensive copies."""
    q1, q2 = entrymod.queries(), entrymod.queries()
    o1, o2 = entrymod.oracle_sql(), entrymod.oracle_sql()
    assert set(q1) == set(q2) and o1 == o2
    q1.clear()  # mutating the returned dict must not affect the registry
    assert entrymod.queries()
