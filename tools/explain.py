"""Dump formatted physical plans for the headline queries — the
plan-iteration surface (`.explain("formatted")`) as a reviewable
artifact.

Usage: python tools/explain.py [query ...]   (default: bench set)
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
    names = sys.argv[1:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name in names:
        fn = registry.QUERIES[name]
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        try:
            print(formatted_plan(fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"(explain failed: {exc})")


if __name__ == "__main__":
    main()
