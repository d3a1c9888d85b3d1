"""The session-scoped operator-intermediate cache (opcache.cached_frame):
identity reuse, content-tag staleness, and eviction that actually frees
persisted blocks (the round-6 ADVICE finding: ``df.rdd.unpersist()`` on
a localCheckpointed frame was a no-op on the parent's storage — the
persist-based design makes eviction observable via ``storageLevel``)."""

from __future__ import annotations

import os
import shutil

import pytest

from text_grabr_orc_spark import opcache
from text_grabr_orc_spark.opcache import cache_clear, cached_frame


@pytest.fixture()
def clean_cache():
    cache_clear()
    yield
    cache_clear()


def _docs_fixture(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_same_key_returns_identical_frame(spark, tmp_path, clean_cache):
    d = _docs_fixture(spark, tmp_path, [(1, "a"), (2, "b")])
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    df1 = cached_frame(spark, d, "t_fam", build)
    df2 = cached_frame(spark, d, "t_fam", build)
    assert df1 is df2
    assert len(calls) == 1
    assert df1.storageLevel.useMemory  # persisted, not plain
    # distinct extras key -> distinct entry
    df3 = cached_frame(spark, d, "t_fam", build, 0.7)
    assert df3 is not df1 and len(calls) == 2


def test_content_change_is_a_new_entry(spark, tmp_path, clean_cache):
    d = _docs_fixture(spark, tmp_path, [(1, "a")])
    df1 = cached_frame(
        spark, d, "t_stale",
        lambda: spark.read.parquet(os.path.join(d, "documents.parquet")),
    )
    assert df1.count() == 1
    # regenerate the fixture with different content (mtime+size change)
    shutil.rmtree(os.path.join(d, "documents.parquet"))
    _docs_fixture(spark, tmp_path, [(1, "a"), (2, "bb"), (3, "ccc")])
    df2 = cached_frame(
        spark, d, "t_stale",
        lambda: spark.read.parquet(os.path.join(d, "documents.parquet")),
    )
    assert df2 is not df1
    assert df2.count() == 3


def test_eviction_unpersists_the_evicted_frame(spark, tmp_path, clean_cache):
    from pyspark.sql import functions as F

    d = _docs_fixture(spark, tmp_path, [(1, "a")])

    # distinct logical plan per entry: Spark's CacheManager dedupes
    # persisted frames BY PLAN, so identical plans would alias storage
    def build(i):
        return spark.read.parquet(
            os.path.join(d, "documents.parquet")
        ).withColumn("tag", F.lit(i))

    first = cached_frame(spark, d, "t_evict", lambda: build(0), 0)
    assert first.storageLevel.useMemory
    # fill past the bound; FIFO evicts the oldest entries
    for i in range(1, opcache._CACHE_MAX + 1):
        cached_frame(spark, d, "t_evict", lambda i=i: build(i), i)
    # the evicted frame's storage really was released (StorageLevel(NONE))
    assert not first.storageLevel.useMemory
    assert not first.storageLevel.useDisk
    # and a re-request rebuilds rather than serving the dropped object
    again = cached_frame(spark, d, "t_evict", lambda: build(0), 0)
    assert again is not first
    assert again.storageLevel.useMemory


def test_build_seconds_attributes_nested_builds_once(spark, sf_dir):
    """A build() that itself misses into cached_frame (flagship ->
    minhash pair set) must contribute its wall seconds ONCE — naive
    accumulation counted inner + outer and the attributed build time
    could exceed the query's own cold wall (round-8 review)."""
    import time as _time

    cache_clear()
    before = opcache.build_seconds()
    t0 = _time.time()

    def inner():
        _time.sleep(0.2)
        return spark.range(1)

    def outer():
        cached_frame(spark, sf_dir, "_t_nested_inner", inner)
        _time.sleep(0.2)
        return spark.range(2)

    cached_frame(spark, sf_dir, "_t_nested_outer", outer)
    wall = _time.time() - t0
    attributed = opcache.build_seconds() - before
    # double-counting would attribute ~wall + inner (>= wall + 0.2)
    assert attributed <= wall + 0.05
    assert attributed >= 0.4  # both sleeps are inside the outer build
    cache_clear()


def test_prefix_pin_set_is_bounded_and_plan_deduped(spark):
    """distributed_prefix_cum's bucketed persist goes through the
    shared bounded pin-set (round-8 ADVICE: it previously leaked one
    corpus-sized storage entry per distinct input): distinct inputs
    evict oldest-first past the cap, and a re-invocation of the SAME
    logical plan dedupes onto one entry instead of appending a
    duplicate handle (unpersisting a duplicate would drop the shared
    cacheManager entry). Eviction is recompute-safe because the
    bucket id is computed from collected boundary VALUES, never from
    a sampled partitioner (round-9 review)."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark import pins
    from text_grabr_orc_spark.operators import pipeline as pl

    with pins._LOCK:
        pins._PINS.pop("prefix_cum", None)
    for i in range(6):
        src = spark.range(40 + i).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        pl.distributed_prefix_cum(src, "k", "v").count()
    assert len(pins._PINS["prefix_cum"]) == 3

    with pins._LOCK:
        pins._PINS.pop("prefix_cum", None)
    src = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out1 = pl.distributed_prefix_cum(src, "k", "v")
    assert out1.count() == 50
    out2 = pl.distributed_prefix_cum(src, "k", "v")
    assert out2.count() == 50
    assert len(pins._PINS["prefix_cum"]) == 1
    # and the running sum stays correct after dedupe
    assert [r.cum for r in out2.orderBy("k").collect()] == list(
        range(1, 51)
    )


def test_prefix_cum_correct_after_pin_eviction(spark):
    """A consumer whose pinned bucket frame was EVICTED must still
    compute the correct running sum on recompute — the value-derived
    bucket id guarantees the collected offsets stay valid (the
    round-9 review scenario: repartitionByRange would re-sample with
    a fresh rdd.id here and could mis-assign offsets)."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark import pins
    from text_grabr_orc_spark.operators import pipeline as pl

    src = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    lazy = pl.distributed_prefix_cum(src, "k", "v")  # NOT materialized
    # evict its pin by pushing the group past its cap
    for i in range(4):
        other = spark.range(30 + i).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        pl.distributed_prefix_cum(other, "k", "v").count()
    rows = {r.k: r.cum for r in lazy.collect()}  # recompute after evict
    expect, run = {}, 0
    for k in range(200):
        run += k % 7 + 1
        expect[k] = run
    assert rows == expect
