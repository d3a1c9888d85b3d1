"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, schema (column
names + comparable types) and an order-insensitive value hash.

Modes:
  (default)   fetchall-based, 12-significant-digit float canon —
              fast iteration gate.
  --exact     driver-faithful: BOTH sides fetched through pandas
              (duckdb ``.df()`` / Spark ``.toPandas()``), full-repr
              cell canon, int/float dtype distinction preserved.
              This is stricter than the default and catches the
              class of bug where value equality holds but pandas
              dtype differs (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
              float64 while Spark emits int64 — every round-1
              driver hash miss was this).
  --vanilla   plain local[4] session + hostile TZ (driver rehearsal);
              composes with --exact.

Usage:  python tools/check.py [--exact] [--vanilla] [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from text_grabr_orc_spark.session import get_spark
from text_grabr_orc_spark.tables import TABLE_NAMES


def _canon(v) -> str:
    """Canonical string for a cell so Spark/DuckDB types compare equal."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # 12 significant digits: enough to catch real bugs, immune to
        # last-ulp engine noise.
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_exact(v) -> str:
    """Full-precision canonical string; keeps the int/float distinction
    (so a float64 3.0 does NOT equal an int64 3 — the driver's pandas
    comparator sees exactly that difference)."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NaN" if f != f else repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(int(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_exact(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_exact(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def _pandas_rows(df) -> tuple[list[str], list[tuple]]:
    """(cols, rows) from a pandas DataFrame, column dtypes preserved."""
    cols = list(df.columns)
    rows = [tuple(df[c].iloc[i] for c in cols) for i in range(len(df))]
    return cols, rows


def value_hash(cols: list[str], rows: list[tuple], canon=_canon) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    exact = "--exact" in args
    if exact:
        args.remove("--exact")
    canon = _canon_exact if exact else _canon
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    if vanilla:
        # driver rehearsal: a plain session with NONE of our tuning and
        # a hostile (non-UTC) process timezone — queries must not
        # depend on session defaults
        os.environ["TZ"] = "Asia/Kolkata"
        time.tzset()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]").appName("check-vanilla")
            .getOrCreate()
        )
    else:
        # full-registry sweeps accumulate ~240 queries of persist /
        # localCheckpoint blocks in one JVM — the workload that
        # measured 8g GC-thrashing (see session.py driver-memory note)
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
        spark = get_spark("check")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    selected = args or sorted(qs)
    failures = []
    for name in selected:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if exact:
                scols, srows = _pandas_rows(sdf.toPandas())
            else:
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            if exact:
                ocols, orows = _pandas_rows(rel.df())
            else:
                ocols = [d[0] for d in rel.description]
                orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems and value_hash(scols, srows, canon) != value_hash(
            ocols, orows, canon
        ):
            problems.append("value hash mismatch")
            so = sorted(
                ["|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows])
            oo = sorted(
                ["|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows])
            diffs = [(a, b) for a, b in zip(so, oo) if a != b][:3]
            for a, b in diffs:
                problems.append(f"  spark={a!r}\n  duck ={b!r}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(selected)-len(failures)}/{len(selected)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
