"""Dump per-query `.explain("formatted")` files for the bench set.

Usage:  python tools/dump_plans.py OUTDIR SUFFIX [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for every bench query (or the
named subset) at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench
scale). The optimization rounds commit these as the judge-checkable
before/after plan evidence (plans/r13/...).
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
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or BENCH_QUERIES
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n{plan}\n")
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
