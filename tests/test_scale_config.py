"""Scale-shaped session configs (round-10 verdict #5): the claims the
code makes about production partition counts, pinned where they
matter.

A 1000-executor cluster runs with ``spark.sql.shuffle.partitions`` in
the thousands, not the 8-32 the local gates use. Two classes of bug
only show up there:

- plans whose EXPRESSION size grows with the partition count (the old
  prefix-sum bucket id chained P-1 ``(col > lit)`` casts — a janino
  codegen size/depth hazard at P=2000; the round-10 rewrite claims
  O(1), pipeline.py:230);
- stateful streaming at a production state-store partition count
  (state partitions are fixed at query start from the conf).

These tests run the actual operators under those configs and assert
both the structural claim and the results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SCALE_PARTITIONS = "2000"


@pytest.fixture()
def shuffle_conf(spark):
    """Temporarily set a production-shaped shuffle partition count."""
    old = spark.conf.get("spark.sql.shuffle.partitions")

    def set_to(n: str):
        spark.conf.set("spark.sql.shuffle.partitions", n)

    yield set_to
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _prefix_out(spark, lo: int, hi: int):
    from text_grabr_orc_spark.operators.pipeline import (
        distributed_prefix_cum,
    )

    df = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("v")
    )
    return distributed_prefix_cum(df, "doc_id", "v")


def test_prefix_cum_expression_size_o1_in_partition_count(
    spark, shuffle_conf
):
    """The bucket-id expression must be STRUCTURALLY constant in P:
    same node counts (one when/otherwise inside one aggregate lambda)
    at P=8 and P=2000 — only the folded boundary-literal ARRAY grows,
    which lives in one constant object, not in generated code. The
    old chained-cast shape would show ~P 'CASE WHEN' nodes here."""

    def shape(df) -> tuple[int, int]:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("CASE WHEN"), plan.count("lambdafunction")

    shuffle_conf("8")
    # distinct id ranges per config: the boundary memo keys on the
    # analyzed plan, so identical frames would reuse cached bounds
    s8 = shape(_prefix_out(spark, 0, 4000))
    shuffle_conf(SCALE_PARTITIONS)
    s2000 = shape(_prefix_out(spark, 4000, 8000))
    assert s8 == s2000, f"expression shape grew with P: {s8} -> {s2000}"
    assert s2000[0] <= 4 and 1 <= s2000[1] <= 8


def test_prefix_cum_correct_at_2000_partitions(spark, shuffle_conf):
    """Execution (not just planning) at the scale config: codegen
    compiles, ~P real buckets materialize, and the running sum over a
    column of ones equals the global rank everywhere."""
    shuffle_conf(SCALE_PARTITIONS)
    out = _prefix_out(spark, 100_000, 106_000).persist()
    try:
        assert out.rdd.getNumPartitions() > 200  # genuinely fanned out
        n_bad = out.filter(
            F.col("cum") != F.col("doc_id") - F.lit(100_000) + 1
        ).count()
        assert n_bad == 0
        assert out.count() == 6_000
    finally:
        out.unpersist()


def test_flagship_funnel_at_2000_partitions(spark, sf_dir, shuffle_conf):
    """The corpus-build funnel under a production shuffle partition
    count: same rows out as at the dev config, and the pre-collect
    plan stays free of CartesianProduct (AQE + the broadcast
    discipline must not degrade when initial partitioning is 250x
    denser)."""
    from text_grabr_orc_spark import registry

    registry.load_all()
    fn = registry.QUERIES["corpus_build_flagship"]
    shuffle_conf("8")
    want = sorted(map(tuple, fn(spark, sf_dir).collect()))
    shuffle_conf(SCALE_PARTITIONS)
    got_df = fn(spark, sf_dir)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert sorted(map(tuple, got_df.collect())) == want


def test_streaming_state_store_at_production_partitions(
    spark, sf_dir, shuffle_conf
):
    """Stateful streaming with 200 state-store partitions (state
    partition count is fixed at query start from the conf): the
    windowed aggregate must init, checkpoint, and emit the same
    windows as at the dev config."""
    from text_grabr_orc_spark import registry

    registry.load_all()
    fn = registry.QUERIES["streaming_hourly_counts"]
    shuffle_conf("8")
    want = sorted(map(tuple, fn(spark, sf_dir).collect()))
    shuffle_conf("200")
    got = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert got == want and len(got) > 0
