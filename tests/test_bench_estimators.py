"""Pure-python pins on the bench scaling-estimator helpers.

The round's gate (north_rule scaling >= 0.8) rests on these three
functions; they must stay conservative under every input shape. No
SparkSession needed — these run in milliseconds.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import given, strategies as st

import bench


# ---- _pair_passes: the 8c span must COVER the 2c span -------------------

def test_pair_passes_covers_2c_span():
    # ratio 3.2 -> 4 passes (round() would give 3 and leave a 2c-only tail)
    assert bench._pair_passes(28.7, 8.9) == 4
    assert bench._pair_passes(24.0, 8.0) == 3   # exact ratio stays exact
    assert bench._pair_passes(10.0, 20.0) == 1  # never below 1
    assert bench._pair_passes(30.0, 0.0) == 60  # degenerate warm8 floored


@given(st.floats(1.0, 500.0), st.floats(0.0, 500.0))
def test_pair_passes_property(warm2, warm8):
    k = bench._pair_passes(warm2, warm8)
    assert k >= 1
    # coverage: k passes at the 8c per-pass rate span at least the 2c wall
    assert k * max(warm8, 0.5) >= warm2 - 1e-6


# ---- _lower_median: conservative middle ---------------------------------

def test_lower_median_even_count_takes_lower():
    # the recorded round-5 run: 4 accepted pairs; upper-middle (0.9509)
    # would inflate the gated value
    assert bench._lower_median([0.9112, 0.9509, 0.9427, 0.9674]) == 0.9427
    assert bench._lower_median([1.0, 2.0]) == 1.0
    assert bench._lower_median([3.0]) == 3.0


@given(st.lists(st.floats(0.0, 2.0), min_size=1, max_size=20))
def test_lower_median_property(xs):
    m = bench._lower_median(xs)
    assert m in xs
    below = sum(1 for x in xs if x <= m)
    above = sum(1 for x in xs if x >= m)
    # never above the true median position
    assert below >= len(xs) // 2 or len(xs) == 1
    assert above >= len(xs) // 2


# ---- _confirmed_min: reproduced-or-fallback, never below raw min --------

@given(st.lists(st.floats(0.1, 1000.0), min_size=1, max_size=20))
def test_confirmed_min_properties(walls):
    est = bench._confirmed_min(walls)
    assert est in walls
    assert est >= min(walls)
    # the estimate is either confirmed by a second wall within 8%, or it
    # is the raw min (documented fallback when nothing confirms)
    ws = sorted(walls)
    confirmed = any(
        est == ws[i] and ws[i + 1] <= ws[i] * 1.08
        for i in range(len(ws) - 1)
    )
    assert confirmed or est == ws[0]
