"""Bench-methodology timing for a subset of queries.

Usage: python tools/timeq.py [--runs N] query [query ...]

Times each named query exactly like bench.py does (cold first run,
steady = best of the remaining runs, `.count()` action) at
$SPARK_GRAFT_SF_DIR (default sf0.1), after a sf0.001 warm-up of the
same queries. Prints one JSON line. For isolating per-query wins
during optimization rounds without paying a full bench pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from text_grabr_orc_spark import registry
from text_grabr_orc_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    warm = "/root/testdata/sf0.001"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        registry.QUERIES[name](spark, warm).count()
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"cold": ts[0], "steady": min(ts[1:]) if len(ts) > 1 else ts[0], "all": ts}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
