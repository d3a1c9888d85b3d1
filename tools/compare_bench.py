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

Normalization: the calibration probe (bench.py `_calibration_probe`,
a pinned CPU-bound micro-job) measures box weather. For each side,
``calib = mean(calib_sec_pre, calib_sec_post)``; the normalized ratio
divides out the box-speed ratio::

    norm_ratio = (new_s / old_s) / (calib_new / calib_old)

Raw AND normalized ratios are printed for every common query; movers
beyond the threshold (default 1.5x either direction, normalized) are
flagged. Exit code: 0 always — the tool reports, humans judge (a
flagged mover can be a legitimate algorithm change).
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


def collapse(runs: list[dict], kind: str) -> tuple[dict, float, int]:
    """(per-query seconds, calibration seconds, n_runs) — MIN seconds
    per query across runs, MEDIAN calibration."""
    if not runs:
        raise SystemExit("no full per-query payload found")
    qmap: dict[str, float] = {}
    calibs: list[float] = []
    for r in runs:
        for q, s in r.get(kind, {}).items():
            if q not in qmap or s < qmap[q]:
                qmap[q] = s
        pre, post = r.get("calib_sec_pre"), r.get("calib_sec_post")
        vals = [v for v in (pre, post) if isinstance(v, (int, float))]
        if vals:
            calibs.append(sum(vals) / len(vals))
    calib = statistics.median(calibs) if calibs else float("nan")
    return qmap, calib, len(runs)


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
    old_q, old_c, old_n = collapse(load_runs(args[0]), kind)
    new_q, new_c, new_n = collapse(load_runs(args[1]), kind)
    box = new_c / old_c if old_c and old_c == old_c and new_c == new_c else 1.0

    rows = []
    for q in sorted(set(old_q) & set(new_q)):
        # bench.py rounds to 3 decimals, so a sub-ms measurement can
        # reach us as 0.0 — clamp to half the rounding quantum rather
        # than silently dropping the query (a 0 -> seconds regression
        # must still flag; round-11 review)
        raw = new_q[q] / max(old_q[q], 0.0005)
        norm = raw / box if box else raw
        rows.append(
            {
                "query": q,
                "old_s": old_q[q],
                "new_s": new_q[q],
                "ratio": round(raw, 3),
                "norm_ratio": round(norm, 3),
                "flag": norm > threshold or norm < 1 / threshold,
            }
        )
    rows.sort(key=lambda r: -r["norm_ratio"])
    out = {
        "kind": kind,
        "old": {"file": args[0], "runs": old_n, "calib_sec": old_c,
                "total_s": round(sum(old_q.values()), 3)},
        "new": {"file": args[1], "runs": new_n, "calib_sec": new_c,
                "total_s": round(sum(new_q.values()), 3)},
        "box_speed_ratio": round(box, 3),
        "threshold": threshold,
        "only_old": sorted(set(old_q) - set(new_q)),
        "only_new": sorted(set(new_q) - set(old_q)),
        "movers": [r for r in rows if r["flag"]],
        "queries": rows,
    }
    if as_json:
        print(json.dumps(out, indent=1))
        return 0
    print(
        f"# {kind}: old={out['old']['total_s']}s ({old_n} run(s), "
        f"calib {old_c:.3f}s)  new={out['new']['total_s']}s "
        f"({new_n} run(s), calib {new_c:.3f}s)  box x{out['box_speed_ratio']}"
    )
    if out["only_old"]:
        print(f"# removed: {', '.join(out['only_old'])}")
    if out["only_new"]:
        print(f"# added:   {', '.join(out['only_new'])}")
    print(f"{'query':<40} {'old_s':>8} {'new_s':>8} {'ratio':>7} {'norm':>7}")
    for r in rows:
        mark = "  <-- mover" if r["flag"] else ""
        print(
            f"{r['query']:<40} {r['old_s']:>8.3f} {r['new_s']:>8.3f}"
            f" {r['ratio']:>7.3f} {r['norm_ratio']:>7.3f}{mark}"
        )
    n_m = len(out["movers"])
    print(f"# {n_m} mover(s) beyond {threshold}x (calibration-normalized)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
