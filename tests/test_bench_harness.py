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
    """The least-squares fit recovers a known exponent from synthetic
    (rows, sec) points — the alarm threshold is meaningful."""
    import math

    pts = [(500, 0.2), (5000, 2.0)]  # exactly linear
    xs = [math.log(r) for r, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / 2, sum(ys) / 2
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(slope - 1.0) < 1e-9
