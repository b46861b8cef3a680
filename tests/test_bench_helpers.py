"""bench.py helper pins (no Spark session needed).

Round-8 advice: ``srt[len(srt)//2]`` is the UPPER middle for even n —
with the heavy lane's n=2 the recorded "median" was actually the max.
These tests pin the true-median definition and the sf1 conditioning
gate's arithmetic so the statistics in bench_full.json stay honest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_MAX_RUNS, _median  # noqa: E402


def test_median_odd_is_middle():
    assert _median([1.0, 2.0, 9.0]) == 2.0
    assert _median([5.0]) == 5.0


def test_median_even_is_mean_of_middles():
    # the round-8 advice case: n=2 must NOT report the max
    assert _median([1.0, 9.0]) == 5.0
    assert _median([1.0, 2.0, 3.0, 10.0]) == 2.5


def test_median_rounding():
    assert _median([0.1234, 0.1236]) == 0.123


def test_gate_budget_sane():
    # the re-run gate must be able to add at least one pass past the
    # heavy lane's base n=2, and stay a small bounded budget
    assert 3 <= SF1_MAX_RUNS <= 9
