"""Calibration-normalized per-query bench comparison (round-10
verdict #4: cross-round perf claims should be a tool's output, not
prose).

Usage:  python tools/compare_bench.py OLD NEW [--threshold 1.5]
                                              [--json] [--cold]

OLD / NEW each accept any artifact this repo produces that carries a
full per-query payload:

- ``BENCH_FULL.jsonl``       every bench run's complete payload, one
                             JSON line per run (bench.py appends)
- ``BENCH_FULL_r{N}.json``   round-close bundle ``{"run1": full, ...}``
- ``BENCH_SUMMARY.json``     compact summary with the payload nested
                             under ``"full"``
- a raw full-payload JSON    (the penultimate stdout line of bench.py)

Multi-run inputs collapse to per-query MIN steady seconds (the same
best-of estimator bench.py itself uses within a run) and the MEDIAN
calibration probe across runs.

Normalization — TWO weather axes (round-11 verdict #1): the
shuffle+agg probe (bench.py `_calibration_probe`) measures the box's
CPU/shuffle speed, and the cache-hostile probe (`_membw_probe`,
``membw_sec_pre/post``) measures its memory latency/bandwidth — six
same-code r11 runs spanned 69–89 s while the CPU probe moved ≤1.4x,
so the memory axis is where "box weather" actually lives. For each
side, ``calib = mean(pre, post)`` per axis; each query gets BOTH
normalized ratios::

    norm_ratio = (new_s / old_s) / (calib_cpu_new / calib_cpu_old)
    norm_mem   = (new_s / old_s) / (membw_new / membw_old)

A query flags as a mover only when NEITHER axis explains it — i.e.
min(norm_ratio, norm_mem) > threshold (regression) or
max(norm_ratio, norm_mem) < 1/threshold (improvement). Artifacts
predating the memory probe fall back to CPU-only flagging (the
pre-r12 behavior), with ``mem_axis: false`` recorded. Exit code: 0
always — the tool reports, humans judge (a flagged mover can be a
legitimate algorithm change).
"""

from __future__ import annotations

import json
import statistics
import sys


def _is_full(d: dict) -> bool:
    return isinstance(d, dict) and "queries" in d and "calib_sec_pre" in d


def load_runs(path: str) -> list[dict]:
    """Every full per-query payload found in the artifact at ``path``."""
    runs: list[dict] = []
    with open(path) as fh:
        text = fh.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # JSONL: one payload per line
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if _is_full(d):
                runs.append(d)
        return runs
    if _is_full(doc):
        return [doc]
    if isinstance(doc, dict):
        if _is_full(doc.get("full", None)):
            return [doc["full"]]  # summary file: exactly one payload
        for v in doc.values():  # {"run1": full, ...} bundles
            if _is_full(v):
                runs.append(v)
            elif isinstance(v, dict) and _is_full(v.get("full", None)):
                runs.append(v["full"])
    return runs


def _axis_median(runs: list[dict], pre_key: str, post_key: str) -> float:
    vals_per_run: list[float] = []
    for r in runs:
        vals = [
            v
            for v in (r.get(pre_key), r.get(post_key))
            if isinstance(v, (int, float))
        ]
        if vals:
            vals_per_run.append(sum(vals) / len(vals))
    return statistics.median(vals_per_run) if vals_per_run else float("nan")


def collapse(runs: list[dict], kind: str) -> tuple[dict, float, float, int]:
    """(per-query seconds, cpu-calib seconds, membw seconds, n_runs) —
    MIN seconds per query across runs, MEDIAN calibration per axis
    (membw is NaN for artifacts predating the memory probe)."""
    if not runs:
        raise SystemExit("no full per-query payload found")
    qmap: dict[str, float] = {}
    for r in runs:
        for q, s in r.get(kind, {}).items():
            if q not in qmap or s < qmap[q]:
                qmap[q] = s
    calib = _axis_median(runs, "calib_sec_pre", "calib_sec_post")
    membw = _axis_median(runs, "membw_sec_pre", "membw_sec_post")
    return qmap, calib, membw, len(runs)


def main(argv: list[str]) -> int:
    as_json = "--json" in argv
    kind = "queries_cold" if "--cold" in argv else "queries"
    threshold = 1.5
    # single left-to-right pass: --threshold consumes its OPERAND by
    # position (matching by re-stringified float dropped the wrong or
    # no token — round-11 review)
    args: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--threshold":
            try:
                threshold = float(next(it))
            except (StopIteration, ValueError):
                print("--threshold needs a number")
                return 2
        elif not a.startswith("--"):
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        return 2
    old_q, old_c, old_m, old_n = collapse(load_runs(args[0]), kind)
    new_q, new_c, new_m, new_n = collapse(load_runs(args[1]), kind)
    box = new_c / old_c if old_c and old_c == old_c and new_c == new_c else 1.0
    # memory axis only exists when BOTH sides carry the membw probe
    mem_axis = old_m == old_m and new_m == new_m and bool(old_m)
    box_mem = new_m / old_m if mem_axis else 1.0

    rows = []
    for q in sorted(set(old_q) & set(new_q)):
        # bench.py rounds to 3 decimals, so a sub-ms measurement can
        # reach us as 0.0 — clamp to half the rounding quantum rather
        # than silently dropping the query (a 0 -> seconds regression
        # must still flag; round-11 review)
        raw = new_q[q] / max(old_q[q], 0.0005)
        norm = raw / box if box else raw
        norm_mem = raw / box_mem if box_mem else raw
        if mem_axis:
            # a mover must be beyond threshold on BOTH axes: weather
            # on either axis is an innocent explanation
            flag = (
                min(norm, norm_mem) > threshold
                or max(norm, norm_mem) < 1 / threshold
            )
        else:
            flag = norm > threshold or norm < 1 / threshold
        rows.append(
            {
                "query": q,
                "old_s": old_q[q],
                "new_s": new_q[q],
                "ratio": round(raw, 3),
                "norm_ratio": round(norm, 3),
                "norm_mem": round(norm_mem, 3) if mem_axis else None,
                "flag": flag,
            }
        )
    rows.sort(key=lambda r: -r["norm_ratio"])
    out = {
        "kind": kind,
        "old": {"file": args[0], "runs": old_n, "calib_sec": old_c,
                "membw_sec": old_m if old_m == old_m else None,
                "total_s": round(sum(old_q.values()), 3)},
        "new": {"file": args[1], "runs": new_n, "calib_sec": new_c,
                "membw_sec": new_m if new_m == new_m else None,
                "total_s": round(sum(new_q.values()), 3)},
        "box_speed_ratio": round(box, 3),
        "mem_axis": mem_axis,
        "box_mem_ratio": round(box_mem, 3) if mem_axis else None,
        "threshold": threshold,
        "only_old": sorted(set(old_q) - set(new_q)),
        "only_new": sorted(set(new_q) - set(old_q)),
        "movers": [r for r in rows if r["flag"]],
        "queries": rows,
    }
    if as_json:
        print(json.dumps(out, indent=1))
        return 0
    mem_note = (
        f"  mem x{out['box_mem_ratio']}" if mem_axis
        else "  (no mem axis)"
    )
    print(
        f"# {kind}: old={out['old']['total_s']}s ({old_n} run(s), "
        f"calib {old_c:.3f}s)  new={out['new']['total_s']}s "
        f"({new_n} run(s), calib {new_c:.3f}s)  box x{out['box_speed_ratio']}"
        + mem_note
    )
    if out["only_old"]:
        print(f"# removed: {', '.join(out['only_old'])}")
    if out["only_new"]:
        print(f"# added:   {', '.join(out['only_new'])}")
    print(
        f"{'query':<40} {'old_s':>8} {'new_s':>8} {'ratio':>7}"
        f" {'norm':>7} {'n_mem':>7}"
    )
    for r in rows:
        mark = "  <-- mover" if r["flag"] else ""
        nm = f"{r['norm_mem']:>7.3f}" if r["norm_mem"] is not None else "      -"
        print(
            f"{r['query']:<40} {r['old_s']:>8.3f} {r['new_s']:>8.3f}"
            f" {r['ratio']:>7.3f} {r['norm_ratio']:>7.3f} {nm}{mark}"
        )
    n_m = len(out["movers"])
    axes = "both axes" if mem_axis else "cpu axis only"
    print(
        f"# {n_m} mover(s) beyond {threshold}x"
        f" (calibration-normalized, {axes})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
