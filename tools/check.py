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

Artifact mode (round-9 verdict #1):
  --json-out PATH   write a machine-readable per-query record
                    {"pass": bool, "rows": int, "seconds": float,
                     "oracle": "exact"|"rows_only", "error": ...}
                    for every query run, plus run metadata (mode,
                    sf dir, git commit, totals) — the committed
                    SWEEP_r{N}.json full-registry evidence the judge
                    can diff without re-running.

Sampling mode (round-9 verdict #7 — cheap randomized out-of-sample
spot-checks):
  --sample N --seed R   run a seeded random subset of N queries drawn
                    from the selection (the full registry unless
                    query names were given; N clamped to its size).
                    Deterministic for a given (N, R, selection):
                    names are sorted before random.Random(R).sample.
                    Composes with --exact / --vanilla / --json-out.

Usage:  python tools/check.py [--exact] [--vanilla]
                              [--json-out PATH] [--sample N --seed R]
                              [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import subprocess
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


def _pop_opt(args: list[str], flag: str) -> str | None:
    """Remove ``flag VALUE`` from args, returning VALUE (or None)."""
    if flag not in args:
        return None
    i = args.index(flag)
    if i + 1 >= len(args) or args[i + 1].startswith("--"):
        raise SystemExit(f"{flag} requires a value")
    val = args[i + 1]
    del args[i : i + 2]
    return val


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    exact = "--exact" in args
    if exact:
        args.remove("--exact")
    json_out = _pop_opt(args, "--json-out")
    sample_n = _pop_opt(args, "--sample")
    seed = _pop_opt(args, "--seed")
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
    if sample_n is not None:
        # seeded random subset over the (sorted) selection — the full
        # registry unless queries were named explicitly — clamped to
        # the selection size; deterministic for a given (N, seed,
        # selection contents)
        rng = random.Random(int(seed) if seed is not None else 0)
        n = min(int(sample_n), len(selected))
        selected = sorted(rng.sample(sorted(selected), n))
    failures = []
    records: dict[str, dict] = {}
    for name in selected:
        t0 = time.time()
        rec = records[name] = {
            "pass": False,
            "rows": -1,
            "seconds": -1.0,
            "oracle": "exact" if name in oracles else "rows_only",
        }
        try:
            sdf = qs[name](spark, sf_dir)
            if exact:
                scols, srows = _pandas_rows(sdf.toPandas())
            else:
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            rec["error"] = f"spark: {e}"[:500]
            failures.append(name)
            continue
        rec["rows"] = len(srows)
        if name not in oracles:
            rec["pass"] = True
            rec["seconds"] = round(time.time() - t0, 3)
            print(f"ok?   {name}: rows-only check, {len(srows)} rows "
                  f"({rec['seconds']}s)")
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
            rec["error"] = f"duckdb: {e}"[:500]
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
        rec["seconds"] = round(time.time() - t0, 3)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            rec["error"] = "; ".join(problems)[:500]
            failures.append(name)
        else:
            rec["pass"] = True
            print(f"PASS  {name}: {len(srows)} rows ({rec['seconds']}s)")
    print(f"\n{len(selected)-len(failures)}/{len(selected)} passed")
    if json_out:
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            commit = "unknown"
        payload = {
            "mode": ("exact" if exact else "default")
            + ("+vanilla" if vanilla else ""),
            "sf_dir": sf_dir,
            "commit": commit,
            "n_selected": len(selected),
            "n_passed": len(selected) - len(failures),
            "failures": failures,
            "sample": (
                {"n": int(sample_n), "seed": int(seed or 0)}
                if sample_n is not None
                else None
            ),
            "queries": records,
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
