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
    # entry() runs corpus_build_flagship: ten attrition rows, one per
    # funnel stage, in a fixed schema/order.
    assert df.columns == [
        "stage_ord", "stage", "docs_in", "docs_out",
        "docs_removed", "tokens_out", "artifacts", "checksum",
    ]
    by_ord = {r.stage_ord: r for r in rows}
    assert sorted(by_ord) == list(range(10))
    assert [by_ord[i].stage for i in range(10)] == [
        "raw", "clean", "keep_best_neardup", "holdout_slice",
        "decon_ngram", "decon_bloom", "decon_semantic", "train_split",
        "pack_sequences", "shard_manifest",
    ]
    # funnel invariants: stage i's input is stage i-1's output, and
    # removed = in - out everywhere
    for i in range(1, 8):
        assert by_ord[i].docs_in == by_ord[i - 1].docs_out
        assert by_ord[i].docs_removed == by_ord[i].docs_in - by_ord[i].docs_out
    assert by_ord[0].docs_in > 0


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


def test_cache_tag_tracks_fixture_content(tmp_path):
    """Every derived /tmp cache keys by cache_tag: regenerating a
    fixture (new mtime/size) MUST change the tag, or a does-it-exist
    cache guard would silently serve the previous generation's rows
    (the round-1 json_roundtrip driver failure)."""
    import os
    import time

    from text_grabr_orc_spark.tables import cache_tag

    d = tmp_path / "sfx"
    d.mkdir()
    (d / "documents.parquet").write_bytes(b"gen-one")
    t1 = cache_tag(str(d))
    assert t1 == cache_tag(str(d))  # stable while content is stable
    time.sleep(0.01)
    (d / "documents.parquet").write_bytes(b"gen-two!")  # new size+mtime
    t2 = cache_tag(str(d))
    assert t2 != t1
    # same size, newer mtime (the nastiest regeneration case)
    time.sleep(0.01)
    (d / "documents.parquet").write_bytes(b"gen-2~~!")
    assert cache_tag(str(d)) not in (t1, t2)
    # adding a previously-absent table also changes the tag
    (d / "events.parquet").write_bytes(b"ev")
    t4 = cache_tag(str(d))
    assert t4 not in (t1, t2)


def test_all_derived_tmp_caches_key_by_cache_tag():
    """Static guard: every gettempdir()-based cache dir in the package
    must incorporate cache_tag (content fingerprint), never a bare
    sf-path tag."""
    import os
    import re

    import text_grabr_orc_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            src = open(path).read()
            if "gettempdir()" not in src:
                continue
            # session warehouse dir is per-process scratch, not a
            # fixture-derived cache
            if fn == "session.py":
                continue
            if "cache_tag" not in src:
                offenders.append(os.path.relpath(path, root))
    assert not offenders, f"caches without content fingerprint: {offenders}"


def test_overlap_chunks_cover_every_token_with_bounded_overlap(spark, sf_dir):
    """Sliding chunks: full coverage (union of [start, start+n) spans
    = [0, n_doc)), consecutive full chunks overlap by exactly
    size - stride, and no chunk is contained in its predecessor."""
    from text_grabr_orc_spark.operators.pipeline import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
        chunk_documents_overlap,
    )
    from text_grabr_orc_spark.functions.text import py_fields
    from text_grabr_orc_spark.tables import load_table

    by_doc: dict = {}
    for r in chunk_documents_overlap(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    n_toks = {
        r["doc_id"]: len(py_fields(r["text"]))
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        covered = set()
        for r in chunks:
            assert r.start_tok == r.chunk_idx * _CHUNK_STRIDE
            assert 1 <= r.n_tokens <= _CHUNK_TOKENS
            assert len(r.chunk_text.split(" ")) == r.n_tokens
            covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
        assert covered == set(range(n_toks[doc_id]))
        # the last chunk reaches the end; earlier chunks are full
        for r in chunks[:-1]:
            assert r.n_tokens == _CHUNK_TOKENS
