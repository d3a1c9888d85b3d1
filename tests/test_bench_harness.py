"""Bench-harness contracts: a warm-up failure must surface in the
run's output instead of silently skewing cold numbers (round-5
verdict item 7), and the scale-curve fit must flag super-linear
growth."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench
from text_grabr_orc_spark import registry


def test_warmup_surfaces_persistent_failures(spark, sf_dir, monkeypatch):
    """A query that raises on BOTH warm-up attempts is returned (so
    main() records it in the JSON); a flaky one that succeeds on
    retry is not; a healthy one never appears."""
    calls = {"flaky": 0}

    def broken(s, d):
        raise RuntimeError("deliberate breakage")

    def flaky(s, d):
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient")
        return s.range(1)

    def healthy(s, d):
        return s.range(1)

    monkeypatch.setitem(registry.QUERIES, "_t_broken", broken)
    monkeypatch.setitem(registry.QUERIES, "_t_flaky", flaky)
    monkeypatch.setitem(registry.QUERIES, "_t_healthy", healthy)
    failed = bench._warmup(
        spark, ["_t_broken", "_t_flaky", "_t_healthy"], sf_dir
    )
    assert failed == ["_t_broken"]


def test_scale_curve_exponent_fit():
    """The power-law-plus-constant fit recovers known exponents
    EXACTLY from exact three-point data, with the overhead constant
    fitted rather than measured — the alarm threshold is meaningful."""
    c = 1.3  # fixed per-query overhead, never passed to the fit
    lin = [(5_000, c + 0.5), (50_000, c + 5.0), (150_000, c + 15.0)]
    assert abs(bench.fit_scale_exponent(lin) - 1.0) < 1e-6
    quad = [(5_000, c + 0.05), (50_000, c + 5.0), (150_000, c + 45.0)]
    assert abs(bench.fit_scale_exponent(quad) - 2.0) < 1e-6
    sqrt15 = [
        (2_000, c + 0.1),
        (20_000, c + 0.1 * 10**1.5),
        (60_000, c + 0.1 * 30**1.5),
    ]
    assert abs(bench.fit_scale_exponent(sqrt15) - 1.5) < 1e-6


def test_fit_degenerate_middle_point_reports_flat_or_bound():
    """Noise cases must not fabricate alarms: a middle point at or
    below the base (work still sub-noise) falls back gracefully, and
    a flat top (no growth at all) reports 0."""
    flat = [(5_000, 2.4), (50_000, 2.2), (150_000, 2.3)]
    assert bench.fit_scale_exponent(flat) < 0.1
    decreasing = [(5_000, 2.4), (50_000, 2.2), (150_000, 2.1)]
    assert bench.fit_scale_exponent(decreasing) == 0.0
    # +10% total over 30x rows with a dipping middle = noise on a
    # flat family, NOT exponent ~1.5 (the round-7 false alarm)
    jitter_flat = [(5_000, 2.678), (50_000, 2.506), (150_000, 2.955)]
    assert bench.fit_scale_exponent(jitter_flat) < 0.1
    # constant-dominated family whose top point grows 1.6x: p is
    # indeterminate, the report is the (sub-linear) raw slope, never
    # an assumed-noise-floor fabrication (measured 3.44 pre-fix)
    late_growth = [(2_000, 3.616), (20_000, 3.541), (60_000, 5.81)]
    assert bench.fit_scale_exponent(late_growth) < 0.2
    # a sub-noise POSITIVE middle increment (+0.11s on a 2s constant)
    # must not drive the bisection either (solved to p≈1.5 pre-fix)
    small_d21 = [(5_000, 2.02), (50_000, 2.133), (150_000, 2.625)]
    assert bench.fit_scale_exponent(small_d21) < 0.2
    # but a top point that REALLY grew (>2x) still reports
    # super-linear
    grew = [(5_000, 1.9), (50_000, 1.85), (150_000, 7.4)]
    assert bench.fit_scale_exponent(grew) > 1.3


def test_planted_quadratic_trips_the_alarm():
    """Round-6 verdict item 1: under the OLD methodology (raw log-log
    over a 4× span, overhead included) a quadratic operator hid
    beneath the per-query constant (measured exponents ~0.03 on
    linear families). Plant a quadratic whose work term is small next
    to the overhead at the base size and assert the NEW decade fit
    still measures it quadratic — while the same operator under the
    old methodology would NOT have tripped, which is exactly the
    blind spot the decade tier closes."""
    import math

    floor = 1.0
    work = lambda n: 2e-11 * n * n  # 0.0005s @5k, 0.05s @50k, 5s @500k
    pts = lambda sizes: [(n, floor + work(n)) for n in sizes]

    # NEW: base + x10 + x30 tier points (documents family sizing,
    # scaled up so the work term is visible at the upper points)
    new_fit = bench.fit_scale_exponent(pts([50_000, 500_000, 1_500_000]))
    assert abs(new_fit - 2.0) < 1e-6  # trips every family's bound

    # OLD: raw log-log over the 4x span, floor included
    old_pts = pts([5_000, 20_000])
    xs = [math.log(r) for r, _ in old_pts]
    ys = [math.log(t) for _, t in old_pts]
    mx, my = sum(xs) / 2, sum(ys) / 2
    old_fit = sum(
        (x - mx) * (y - my) for x, y in zip(xs, ys)
    ) / sum((x - mx) ** 2 for x in xs)
    assert old_fit < 0.1, old_fit  # the quadratic hid under the floor


def test_scale_families_declare_bounds():
    """Every scale family carries a driving table and a declared
    complexity bound the measured exponent is compared against."""
    # load the FULL registry: under the whole suite other test
    # modules' imports leave it partially populated, which made the
    # membership check flaky (registry non-empty but missing the
    # families whose modules no earlier test imported)
    registry.load_all()
    for name, spec in bench.SCALE_FAMILIES.items():
        assert name in registry.QUERIES, name
        assert spec["table"] in {"documents", "embeddings", "events"}
        assert 1.0 < spec["expected_max"] <= 2.5


def test_fit_kind_distinguishes_bounded_from_fitted():
    """Round-7 advice: a BOUNDED exponent (middle point inside noise,
    top grew >2x — p assumed from a 0.05s work term) must be labeled
    differently from a bisection FIT, and the alarm policy must gate
    bounded values on material absolute growth."""
    c = 1.3
    quad = [(5_000, c + 0.05), (50_000, c + 5.0), (150_000, c + 45.0)]
    p, kind = bench.fit_scale(quad)
    assert kind == "bisection" and abs(p - 2.0) < 1e-6
    assert bench._alarm(p, kind, quad, 1.2) is True

    flat = [(5_000, 2.4), (50_000, 2.2), (150_000, 2.1)]
    p, kind = bench.fit_scale(flat)
    assert kind == "flat" and p == 0.0
    assert bench._alarm(p, kind, flat, 1.2) is False

    jitter = [(5_000, 2.678), (50_000, 2.506), (150_000, 2.955)]
    p, kind = bench.fit_scale(jitter)
    assert kind == "raw_slope"
    assert bench._alarm(p, kind, jitter, 1.2) is False

    # bounded branch, SMALL absolute growth (0.4s -> 0.9s): the p
    # value clamps high but must not alarm — constant-scale jitter
    small = [(5_000, 0.4), (50_000, 0.42), (150_000, 0.9)]
    p, kind = bench.fit_scale(small)
    assert kind == "upper_bound"
    assert bench._alarm(p, kind, small, 1.2) is False

    # bounded branch, LARGE absolute growth (1.9s -> 7.4s): a real
    # super-linear work term the fit cannot resolve precisely — the
    # bound still alarms
    grew = [(5_000, 1.9), (50_000, 1.85), (150_000, 7.4)]
    p, kind = bench.fit_scale(grew)
    assert kind == "upper_bound" and p > 1.3
    assert bench._alarm(p, kind, grew, 1.2) is True


def test_upper_bound_alarm_relative_growth_gate():
    """Round-8 review: the absolute 2s growth gate alone would blind
    the alarm on fast families — a 0.1s base growing 19x to 1.9s is a
    real super-linear signal and must alarm; sub-5x relative growth
    under 2s absolute stays suppressed as constant-scale jitter."""
    fast_quad = [(5_000, 0.10), (50_000, 0.11), (150_000, 1.90)]
    p, kind = bench.fit_scale(fast_quad)
    assert kind == "upper_bound"
    assert bench._alarm(p, kind, fast_quad, 1.2) is True


def test_curve_suspicious_detects_interference_shapes():
    """Non-monotone / physically implausible point patterns must be
    flagged for fresh-JVM re-measurement even though no alarm fires
    (observed: concurrent load drove a x10 point to 61.7s with x30 at
    8.1s — fitted 'flat 0.0', silently wrong in both directions)."""
    # middle far above top (the observed minhash shape)
    assert bench._curve_suspicious([(5e3, 1.5), (5e4, 61.7), (15e4, 8.1)])
    # flat top but middle grew materially (the observed gemm shape)
    assert bench._curve_suspicious([(2e3, 0.75), (2e4, 12.76), (6e4, 12.49)])
    # top point below base
    assert bench._curve_suspicious([(2e3, 3.0), (2e4, 2.8), (6e4, 2.5)])
    # healthy monotone growth — not suspicious
    assert not bench._curve_suspicious([(2e3, 3.0), (2e4, 7.1), (6e4, 20.0)])
    # flat-family jitter (sub-second wiggle) — not suspicious
    assert not bench._curve_suspicious([(5e3, 2.4), (5e4, 2.6), (15e4, 2.5)])


def test_curve_suspicious_flags_clamped_low_fit():
    """An inflated MIDDLE point collapses the bisection to its 0.05
    clamp while staying monotone — overclaiming sub-linearity. With
    material top growth that shape must re-measure; a genuinely flat
    family (no top growth) must not."""
    inflated_mid = [(2e3, 3.31), (2e4, 14.25), (6e4, 19.88)]
    p, kind = bench.fit_scale(inflated_mid)
    assert p <= 0.051 and kind == "bisection"
    assert bench._curve_suspicious(inflated_mid, p, kind)
    # truly flat: tiny top increment — not suspicious
    flat = [(2e3, 2.0), (2e4, 2.3), (6e4, 2.4)]
    p2, k2 = bench.fit_scale(flat)
    assert not bench._curve_suspicious(flat, p2, k2)
    # raw_slope fallback on a constant-dominated family whose middle
    # dipped within noise: exp can honestly land <= 0.051 with >1s of
    # top growth — must NOT be flagged (round-8 review: the rule is
    # bisection-only, else flat-ish families loop to 'unstable')
    dip = [(2e3, 4.07), (2e4, 3.80), (6e4, 4.84)]
    p3, k3 = bench.fit_scale(dip)
    assert k3 == "raw_slope" and p3 <= 0.06
    assert not bench._curve_suspicious(dip, p3, k3)


def test_curve_entry_retry_fallback_semantics():
    """Pins _curve_entry_for (round-8 review #1/#3): suspect attempts
    stay visible after a clean re-measure; twice-implausible reports
    'unstable'; twice-alarmed-on-plausible-points stands as a real
    alarm; the in-process fallback suppresses alarms."""
    spec = {"expected_max": 1.2}
    clean = [(5_000, 1.0), (50_000, 3.0), (150_000, 7.0)]      # p = 1
    quad = [(5_000, 1.0), (50_000, 11.0), (150_000, 91.0)]     # p = 2
    junk = [(5_000, 1.5), (50_000, 61.7), (150_000, 8.1)]      # non-monotone

    def seq(*results):
        it = iter(results)
        return lambda: next(it)

    boom = lambda: (_ for _ in ()).throw(AssertionError("not called"))

    # clean first try: no remeasure bookkeeping
    e = bench._curve_entry_for(spec, seq(clean), boom)
    assert e["fresh_jvm"] and not e.get("remeasured") and not e.get("alarm")

    # junk then clean: remeasured=1 and the suspect points kept
    e = bench._curve_entry_for(spec, seq(junk, clean), boom)
    assert e["remeasured"] == 1
    assert e["sec_suspect_attempts"] == [[1.5, 61.7, 8.1]]
    assert not e.get("alarm") and not e.get("unstable")

    # junk twice: reported unstable, never presented as a clean fit
    e = bench._curve_entry_for(spec, seq(junk, junk), boom)
    assert e.get("unstable") and e["remeasured"] == 1

    # real quadratic twice: the alarm stands (plausible points)
    e = bench._curve_entry_for(spec, seq(quad, quad), boom)
    assert e["alarm"] and not e.get("unstable")

    # fresh measurement unavailable: in-process fallback labeled and
    # its alarm suppressed
    e = bench._curve_entry_for(spec, seq(None), lambda: quad)
    assert e["fresh_jvm"] is False
    assert e["alarm"] is False and e["alarm_suppressed_unconfirmed"]

    # fresh died on the RE-measure: first fresh entry kept, flagged
    e = bench._curve_entry_for(spec, seq(junk, None), boom)
    assert e["fresh_jvm"] and e["confirm_failed"]


def test_fit_entry_reports_spread_and_flags_weather_driven_fits():
    """Round-8 verdict #2: per-point timed attempts and their spread
    ride in the curve entry, and a fit whose DRIVING (top) point
    spread >2x is flagged — never alarmed."""
    spec = {"expected_max": 1.2}
    pts = [(5_000, 1.0), (50_000, 3.0), (150_000, 7.0)]
    e = bench._fit_entry(pts, spec, [[1.0, 1.2], [3.0, 3.4], [7.0, 21.0]])
    assert e["sec_attempts"][-1] == [7.0, 21.0]
    assert e["spread"] == [1.2, 1.13, 3.0]
    assert e["spread_flag"] and not e["alarm"]
    e2 = bench._fit_entry(pts, spec, [[1.0], [3.0], [7.0, 7.5]])
    assert not e2["spread_flag"]
    # points-only callers (attempts unavailable) stay valid
    e3 = bench._fit_entry(pts, spec)
    assert "spread" not in e3 and "spread_flag" not in e3


def test_fit_entry_time_divisor_normalizes_before_fitting():
    """A declared analytic factor (e.g. high-sim's r ~ log2 n band
    bits) divides out of the series before the fit; raw seconds stay
    reported."""
    pts = [(5_000, 0.5), (50_000, 50.0), (150_000, 450.0)]  # t = a·n²
    raw = bench._fit_entry(pts, {"expected_max": 1.2})
    assert raw["alarm"] and abs(raw["exponent"] - 2.0) < 0.01
    # divisor exactly n: the quadratic normalizes to a clean linear
    # family and the alarm clears against the same bound
    spec = {"expected_max": 1.2, "time_divisor": lambda r: float(r)}
    e = bench._fit_entry(pts, spec)
    assert e["sec"] == [0.5, 50.0, 450.0]  # raw stays visible
    assert e["sec_normalized"] == [0.5, 5.0, 15.0]
    assert abs(e["exponent"] - 1.0) < 0.05 and not e["alarm"]


def _payload(queries, calib, **over):
    base = {
        "metric": "headline_queries_total_wall",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "queries_cold": {k: v * 2 for k, v in queries.items()},
        "calib_sec_pre": calib,
        "calib_sec_post": calib,
        "sf": 0.1,
    }
    base.update(over)
    return base


def test_compare_bench_normalizes_and_flags(tmp_path):
    """tools/compare_bench.py: multi-run collapse (min seconds, median
    calib), calibration-normalized ratios, >threshold movers flagged,
    added/removed queries listed."""
    import json
    import os
    import sys

    tools_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import compare_bench

    # OLD: two runs in a jsonl history; q_fast best-of is run 2's 1.0
    old = tmp_path / "old.jsonl"
    old.write_text(
        json.dumps(_payload({"q_fast": 1.2, "q_slow": 4.0, "gone": 1.0},
                            0.30)) + "\n"
        + json.dumps(_payload({"q_fast": 1.0, "q_slow": 4.4, "gone": 1.1},
                              0.30)) + "\n"
    )
    # NEW: one run on a box measured 2x slower (calib 0.60): q_slow's
    # raw 2x regression normalizes away; q_fast's raw 4x stays a 2x
    # mover after normalization
    new = tmp_path / "new.json"
    new.write_text(
        json.dumps(
            {"run1": _payload({"q_fast": 4.0, "q_slow": 8.0, "added": 0.5},
                              0.60)}
        )
    )
    old_runs = compare_bench.load_runs(str(old))
    assert len(old_runs) == 2
    oq, oc, om, _ = compare_bench.collapse(old_runs, "queries")
    assert oq == {"q_fast": 1.0, "q_slow": 4.0, "gone": 1.0}
    assert oc == 0.30
    assert om != om  # NaN: these payloads predate the membw probe
    nq, nc, _, _ = compare_bench.collapse(
        compare_bench.load_runs(str(new)), "queries"
    )
    assert nc == 0.60

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = compare_bench.main([str(old), str(new), "--json"])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["box_speed_ratio"] == 2.0
    # pre-membw artifacts: the memory axis is honestly absent, the
    # CPU-only flagging semantics are unchanged
    assert out["mem_axis"] is False and out["box_mem_ratio"] is None
    by_q = {r["query"]: r for r in out["queries"]}
    assert by_q["q_slow"]["ratio"] == 2.0
    assert by_q["q_slow"]["norm_ratio"] == 1.0  # box weather, not code
    assert not by_q["q_slow"]["flag"]
    assert by_q["q_fast"]["norm_ratio"] == 2.0  # a real mover
    assert by_q["q_fast"]["flag"]
    assert out["only_old"] == ["gone"] and out["only_new"] == ["added"]
    # a summary file with the payload nested under "full" loads ONCE
    summ = tmp_path / "summary.json"
    summ.write_text(json.dumps({"note": "x", "full": _payload({"a": 1.0},
                                                              0.3)}))
    assert len(compare_bench.load_runs(str(summ))) == 1


def test_compare_bench_mem_axis_normalizes_tail_inflation(tmp_path):
    """Round-11 verdict #1 acceptance: a synthetic 2x memory-tail
    inflation (every query 2x slower, membw probe 2x slower, CPU probe
    UNCHANGED — exactly the six-same-code-run r11 signature) must
    normalize away on the memory axis instead of flagging 70 movers;
    a query that ALSO regressed beyond both axes still flags."""
    import contextlib
    import io
    import json
    import os
    import sys

    tools_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import compare_bench

    old = tmp_path / "old.json"
    old.write_text(json.dumps(_payload(
        {"q_a": 1.0, "q_b": 2.0, "q_real": 1.0}, 0.30,
        membw_sec_pre=0.40, membw_sec_post=0.40,
    )))
    # NEW box: memory tail 2x slower (membw 0.80), CPU probe identical
    # — q_a/q_b ride the weather at raw 2x; q_real is a true 6x code
    # regression that neither axis explains
    new = tmp_path / "new.json"
    new.write_text(json.dumps(_payload(
        {"q_a": 2.0, "q_b": 4.0, "q_real": 6.0}, 0.30,
        membw_sec_pre=0.80, membw_sec_post=0.80,
    )))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = compare_bench.main([str(old), str(new), "--json"])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["mem_axis"] is True
    assert out["box_mem_ratio"] == 2.0
    assert out["box_speed_ratio"] == 1.0
    by_q = {r["query"]: r for r in out["queries"]}
    # the inflated tail: raw 2x, mem-normalized 1.0 -> NOT a mover
    assert by_q["q_a"]["ratio"] == 2.0
    assert by_q["q_a"]["norm_mem"] == 1.0
    assert not by_q["q_a"]["flag"] and not by_q["q_b"]["flag"]
    # the real regression: 6x raw, 3x mem-normalized, 6x cpu-normalized
    assert by_q["q_real"]["flag"]
    assert [m["query"] for m in out["movers"]] == ["q_real"]
    # improvement direction: both axes must agree there too
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        compare_bench.main([str(new), str(old), "--json"])
    back = json.loads(buf2.getvalue())
    by_q2 = {r["query"]: r for r in back["queries"]}
    assert not by_q2["q_a"]["flag"]
    assert by_q2["q_real"]["flag"]
