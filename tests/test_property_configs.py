"""Hypothesis property tests over the generator's config space.

The golden test pins one canonical config; these pin the INVARIANTS
across the whole parameter vocabulary (every jitter/interval/density
combination, arbitrary ratios and sizes): monotone clocks, exact
achieved ratios, clamped gaps, schedule agreement between the exact
and vectorized paths.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from hypothesis import given, settings, strategies as st

from eventstream_benchmark_spark.generator import PatternConfig, StreamConfig, core

interval_dists = st.sampled_from(["fixed", "poisson", "geometric", "uniform"])
jitter_dists = st.sampled_from(["none", "uniform", "gaussian", "laplace"])


@st.composite
def stream_configs(draw):
    dist = draw(interval_dists)
    return StreamConfig(
        n_types=draw(st.integers(2, 12)),
        total_events=draw(st.integers(200, 3_000)),
        random_ratio=draw(
            st.floats(0.0, 1.0, allow_nan=False).map(lambda x: round(x, 3))
        ),
        seed=draw(st.integers(0, 2**31 - 1)),
        pattern_jitter=draw(jitter_dists),
        pattern_jitter_amount=draw(st.integers(0, 5)),
        rand_interval_dist=dist,
        rand_interval_base=draw(st.integers(1, 12)),
        rand_interval_low=draw(st.integers(1, 5)),
        rand_interval_high=draw(st.integers(5, 20)),
        rand_jitter=draw(jitter_dists),
        rand_jitter_amount=draw(st.integers(0, 4)),
        density_mode=draw(st.sampled_from(["none", "sin"])),
        density_period=draw(st.integers(1, 20_000)),
        density_amp=draw(st.floats(0.0, 0.95, allow_nan=False)),
        density_base_rate=draw(st.floats(0.2, 3.0, allow_nan=False)),
    )


@st.composite
def pattern_configs(draw):
    return PatternConfig(
        n_patterns=draw(st.integers(1, 10)),
        pattern_length=draw(st.integers(2, 12)),
        n_types=draw(st.integers(2, 12)),
        gap_dist=draw(interval_dists),
        gap_base=draw(st.integers(1, 9)),
        gap_low=draw(st.integers(1, 4)),
        gap_high=draw(st.integers(4, 12)),
        seed=draw(st.integers(0, 2**31 - 1)),
    )


@settings(max_examples=40, deadline=None)
@given(pcfg=pattern_configs(), scfg=stream_configs())
def test_stream_invariants_any_config(pcfg: PatternConfig, scfg: StreamConfig):
    types, gaps = core.build_patterns(pcfg)
    assert gaps.min() >= 1 and types.min() >= 0 and types.max() < pcfg.n_types

    scfg = dataclasses.replace(scfg, n_types=pcfg.n_types)
    ts_e, ty_e, lb_e = core.build_stream(scfg, types, gaps, rng=core.make_rng(scfg.seed))
    ts_f, ty_f, lb_f = core.build_stream_fast(scfg, types, gaps, rng=core.make_rng(scfg.seed))

    n = scfg.total_events
    target_random = int(round(n * scfg.random_ratio))
    for ts, ty, lb in ((ts_e, ty_e, lb_e), (ts_f, ty_f, lb_f)):
        assert ts.shape == (n,)
        assert (np.diff(ts) >= 0).all()
        assert int((~lb).sum()) == target_random
        assert ty.min() >= 0 and ty.max() < scfg.n_types
        tie = np.flatnonzero(np.diff(ts) == 0)
        # ties only at pattern starts (first event of an instance lands
        # on the incoming clock)
        assert all(lb[i + 1] for i in tie)
    # exact and fast paths share the deterministic slot schedule
    assert np.array_equal(lb_e, lb_f)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 5_000),
    length=st.integers(2, 15),
    ratio=st.floats(0.0, 1.0, allow_nan=False),
)
def test_slot_schedule_counts(n: int, length: int, ratio: float):
    slots, n_rand, n_inst = core.slot_schedule(n, length, ratio)
    assert n_rand == int((np.asarray(slots)).sum())
    assert n_rand + n_inst == slots.shape[0]
    # emitted events cover exactly n (pattern slots may overshoot then clip)
    emitted = n_rand + n_inst * length
    assert emitted >= n
    assert emitted - n < length  # overshoot bounded by one instance


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=200,
    )
)
def test_dyadic_ewma_fold_bit_identical_python_vs_duckdb(xs: list[float]):
    """The α=1/2 EWMA recurrence y ← (y + x)/2 must produce
    BIT-identical doubles in a Python float loop and DuckDB's
    list_reduce over the same ordered values — the determinism claim
    ``streaming_ewma_state``'s no-rounding oracle rests on, checked
    here on arbitrary (not just fixture) inputs."""
    import duckdb

    y = xs[0]
    for x in xs[1:]:
        y = (y + x) / 2
    # bind natively: a decimal LITERAL would be parsed as DECIMAL first
    # and lose ulps before the DOUBLE cast (measured — test artifact,
    # not an engine divergence)
    (dy,) = (
        duckdb.connect()
        .execute("SELECT list_reduce($1::DOUBLE[], (a, x) -> (a + x) / 2)", [xs])
        .fetchone()
    )
    assert y == dy, f"{y!r} != {dy!r}"
