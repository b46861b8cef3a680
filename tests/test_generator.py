"""Layer A generator tests (SURVEY §5.2.2-4).

The golden test runs the ACTUAL reference implementation (imported
from /root/reference with tqdm stubbed) against our NumPy exact mode
and asserts element-wise equality — the strongest possible parity
check. Property tests pin the §1.2 ordering semantics; Spark tests
cover the sharded scale path, the parquet cache, and the CSV/iterator
export surface.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

from eventstream_benchmark_spark.generator import (
    PatternConfig,
    StreamConfig,
    core,
    patterns_df,
    stream_df_cached,
    stream_df_exact,
    stream_df_pure,
    stream_df_sharded,
    stream_iter,
    to_numpy,
    write_csv,
)

PCFG = PatternConfig(n_patterns=8, pattern_length=10, n_types=6,
                     gap_dist="uniform", gap_low=3, gap_high=9, seed=137)
SCFG = StreamConfig(
    n_types=6, total_events=40_000, random_ratio=0.7, seed=2025,
    pattern_jitter="uniform", pattern_jitter_amount=2,
    rand_interval_dist="poisson", rand_interval_base=6,
    rand_interval_low=None, rand_interval_high=None,
    rand_jitter="uniform", rand_jitter_amount=1,
    density_mode="sin", density_period=8000, density_amp=0.6,
)


@pytest.fixture(scope="module")
def reference():
    """Import the read-only reference with its tqdm dependency stubbed."""
    class _Bar:
        def __init__(self, *a, **k):
            self.n = 0

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def update(self, n):
            self.n += n

    sys.modules.setdefault("tqdm", types.SimpleNamespace(tqdm=_Bar))
    spec = importlib.util.spec_from_file_location("ref_eventstream", "/root/reference/eventstream.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def golden(reference):
    pats = reference.generate_patterns(
        n_patterns=8, pattern_length=10, n_types=6,
        gap_dist="uniform", gap_low=3, gap_high=9, seed=137,
    )
    stream = reference.EventStream(
        patterns=pats, n_types=6, total_events=40_000, random_ratio=0.7,
        seed=2025, pattern_jitter="uniform", pattern_jitter_amount=2,
        rand_interval_dist="poisson", rand_interval_base=6,
        rand_interval_low=None, rand_interval_high=None,
        rand_jitter="uniform", rand_jitter_amount=1,
        density_mode="sin", density_period=8000, density_amp=0.6,
        density_base_rate=1.0, cache_dir=None,
    )
    return pats, stream


def test_golden_patterns_bit_equal(golden):
    pats, _ = golden
    types, gaps = core.build_patterns(PCFG)
    np.testing.assert_array_equal(types, pats.types)
    np.testing.assert_array_equal(gaps, pats.gaps)


def test_golden_stream_bit_equal(golden):
    _, ref_stream = golden
    types, gaps = core.build_patterns(PCFG)
    ts, ty, label = core.build_stream(SCFG, types, gaps)
    np.testing.assert_array_equal(ts, ref_stream.timestamps)
    np.testing.assert_array_equal(ty, ref_stream.types)
    np.testing.assert_array_equal(label, ref_stream.is_pattern)


def _invariants(ts: np.ndarray, ty: np.ndarray, label: np.ndarray, cfg: StreamConfig, L: int):
    n = ts.shape[0]
    assert n == cfg.total_events
    # timestamps never decrease (gap clamp >= 1 at every stage)
    assert (np.diff(ts) >= 0).all()
    # achieved random fraction is exact (closed-loop controller)
    assert int((~label).sum()) == int(round(n * cfg.random_ratio))
    # type codes in range
    assert ty.min() >= 0 and ty.max() < cfg.n_types
    # pattern instances are contiguous blocks of exactly L (last may truncate)
    changes = np.flatnonzero(np.diff(label.astype(np.int8)))
    bounds = np.concatenate(([0], changes + 1, [n]))
    runs = [(label[a], b - a) for a, b in zip(bounds[:-1], bounds[1:])]
    pat_runs = [r for flag, r in runs if flag]
    assert all(r % L == 0 for r in pat_runs[:-1])
    if pat_runs:
        assert pat_runs[-1] % L == 0 or runs[-1][0]  # truncation only at the stream end
    # ties only where a pattern block starts right after a random event
    tie_idx = np.flatnonzero(np.diff(ts) == 0)
    assert all((not label[i]) and label[i + 1] for i in tie_idx)


def test_golden_csv_byte_match(golden, spark, tmp_path):
    """SURVEY §5.2.2: the exported CSV byte-matches the reference's
    ``to_csv`` output — same header, same %d row formatting, same
    values, row for row."""
    import glob

    _, ref_stream = golden
    ref_csv = tmp_path / "ref.csv"
    ref_stream.to_csv(str(ref_csv))

    from eventstream_benchmark_spark.generator import stream_df_exact, write_csv

    ours = tmp_path / "ours_csv"
    write_csv(stream_df_exact(spark, PCFG, SCFG), str(ours))
    part = glob.glob(str(ours / "part-*.csv"))[0]

    with open(ref_csv) as f:
        ref_lines = f.read().splitlines()
    with open(part) as f:
        our_lines = f.read().splitlines()
    assert our_lines[0] == ref_lines[0] == "timestamp,event_type,is_pattern"
    assert our_lines == ref_lines


def test_exact_mode_invariants():
    types, gaps = core.build_patterns(PCFG)
    ts, ty, label = core.build_stream(SCFG, types, gaps)
    _invariants(ts, ty, label, SCFG, PCFG.pattern_length)


def test_interval_laws_match_numpy():
    """Distribution draws agree with NumPy's own samplers draw-for-draw."""
    rng_a, rng_b = core.make_rng(9), np.random.default_rng(9)
    for _ in range(200):
        assert core.interval(6, "poisson", rng_a) == max(1, int(rng_b.poisson(6.0)))
    rng_a, rng_b = core.make_rng(10), np.random.default_rng(10)
    for _ in range(200):
        assert core.interval(5, "geometric", rng_a) == int(rng_b.geometric(1 / 5))


def test_uniform_interval_validation():
    with pytest.raises(ValueError):
        core.interval(5, "uniform", core.make_rng(0), low=0, high=9)
    with pytest.raises(ValueError):
        PatternConfig(n_patterns=1, pattern_length=1, n_types=2)
    with pytest.raises(ValueError):
        StreamConfig(n_types=2, total_events=10, random_ratio=1.5)


def test_sharded_stream_invariants(spark):
    scfg = StreamConfig(
        n_types=6, total_events=8_000, random_ratio=0.7, seed=2025,
        pattern_jitter="uniform", pattern_jitter_amount=2,
        rand_interval_dist="poisson", rand_interval_base=6,
        rand_interval_low=None, rand_interval_high=None,
        density_mode="sin", density_period=8000, density_amp=0.6,
    )
    df = stream_df_sharded(spark, PCFG, scfg, n_shards=8)
    pdf = df.toPandas().sort_values(["shard", "event_id"])
    assert len(pdf) == scfg.total_events
    for shard, grp in pdf.groupby("shard"):
        ts = grp["ts"].to_numpy()
        assert (np.diff(ts) >= 0).all()
        frac = (~grp["is_pattern"]).mean()
        assert abs(frac - 0.7) < 0.01
    # different shards draw different streams
    s0 = pdf[pdf["shard"] == 0]["ts"].to_numpy()
    s1 = pdf[pdf["shard"] == 1]["ts"].to_numpy()
    assert not np.array_equal(s0[: min(len(s0), len(s1))], s1[: min(len(s0), len(s1))])


def test_puredf_stream_invariants(spark):
    """The pure-DataFrame mode satisfies the same §1.2 invariants as
    the NumPy paths, per shard: monotone clock, exact random ratio,
    type range, contiguous length-L pattern blocks, ties only at
    random->pattern boundaries."""
    from eventstream_benchmark_spark.generator.queries import (
        GOLDEN_PATTERNS,
        PUREDF_STREAM,
    )
    import dataclasses

    df = stream_df_pure(spark, GOLDEN_PATTERNS, PUREDF_STREAM, n_shards=8)
    pdf = df.toPandas().sort_values(["shard", "event_id"])
    assert len(pdf) == PUREDF_STREAM.total_events
    per_shard = dataclasses.replace(
        PUREDF_STREAM, total_events=PUREDF_STREAM.total_events // 8
    )
    for _shard, grp in pdf.groupby("shard"):
        _invariants(
            grp["ts"].to_numpy(),
            grp["event_type"].to_numpy(),
            grp["is_pattern"].to_numpy(),
            per_shard,
            GOLDEN_PATTERNS.pattern_length,
        )
    # shards draw different streams (hash keys include the shard)
    s0 = pdf[pdf["shard"] == 0]["ts"].to_numpy()
    s1 = pdf[pdf["shard"] == 1]["ts"].to_numpy()
    assert not np.array_equal(s0, s1)


def test_puredf_deterministic_and_seed_sensitive(spark):
    """Counter-based draws: same (config, seed, shards) -> identical
    output across independent builds; a different seed changes it."""
    import dataclasses

    cfg = StreamConfig(
        n_types=4, total_events=2_000, random_ratio=0.5, seed=77,
        rand_interval_dist="geometric", rand_interval_base=4,
        rand_jitter="uniform", rand_jitter_amount=1,
        pattern_jitter="uniform", pattern_jitter_amount=2,
        density_mode="none",
    )
    a = stream_df_pure(spark, PCFG, cfg, n_shards=4).toPandas().sort_values("event_id")
    b = stream_df_pure(spark, PCFG, cfg, n_shards=4).toPandas().sort_values("event_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    c = (
        stream_df_pure(spark, PCFG, dataclasses.replace(cfg, seed=78), n_shards=4)
        .toPandas()
        .sort_values("event_id")
    )
    assert not a["ts"].reset_index(drop=True).equals(c["ts"].reset_index(drop=True))


def test_puredf_rejects_non_closed_form_laws(spark):
    """poisson intervals and sin density have no closed-form column
    inverse -> the pure mode refuses them (the sharded path owns those
    configs). Gaussian/laplace jitters joined the closed-form lane in
    round 9 and are covered by their own KS law tests."""
    import dataclasses

    base = StreamConfig(
        n_types=4, total_events=100, random_ratio=0.5, seed=1,
        rand_interval_dist="fixed", rand_interval_base=3,
        rand_jitter="none", rand_jitter_amount=0,
        pattern_jitter="none", pattern_jitter_amount=0,
        density_mode="none",
    )
    for bad in (
        dataclasses.replace(base, rand_interval_dist="poisson"),
        dataclasses.replace(base, density_mode="sin"),
    ):
        with pytest.raises(ValueError):
            stream_df_pure(spark, PCFG, bad, n_shards=2)


def test_puredf_summary_constants_pinned(spark):
    """The generate_stream_dataframe oracle is a precomputed VALUES
    table; recompute it with a fresh run so an xxhash64/plan drift
    fails here before the driver hashes a stale constant."""
    from eventstream_benchmark_spark.generator.queries import (
        _PUREDF_SUMMARY_ROWS,
        generate_stream_dataframe,
    )

    got = tuple(
        tuple(int(v) for v in row)
        for row in generate_stream_dataframe(spark, "").collect()
    )
    assert got == _PUREDF_SUMMARY_ROWS


def test_puredf_jitter_summary_constants_pinned(spark):
    """Same pin for the round-9 jittered variant (gaussian noise +
    laplace pattern jitter through the closed-form samplers): a fresh
    run must reproduce the committed VALUES oracle exactly."""
    from eventstream_benchmark_spark.generator.queries import (
        _PUREDF_JITTER_SUMMARY_ROWS,
        generate_stream_dataframe_jittered,
    )

    got = tuple(
        tuple(int(v) for v in row)
        for row in generate_stream_dataframe_jittered(spark, "").collect()
    )
    assert got == _PUREDF_JITTER_SUMMARY_ROWS


def test_patterns_df_matches_numpy(spark):
    pdf = patterns_df(spark, PCFG).toPandas().sort_values("pattern_id")
    types, gaps = core.build_patterns(PCFG)
    for pid in range(PCFG.n_patterns):
        assert list(pdf.iloc[pid]["types"]) == list(types[pid])
        assert list(pdf.iloc[pid]["gaps"]) == list(gaps[pid])


def test_cache_roundtrip(spark, tmp_path):
    scfg = StreamConfig(n_types=4, total_events=2_000, random_ratio=0.5, seed=3,
                        rand_interval_dist="fixed", rand_interval_base=3)
    first = stream_df_cached(spark, PCFG, scfg, str(tmp_path), mode="exact").toPandas()
    again = stream_df_cached(spark, PCFG, scfg, str(tmp_path), mode="exact").toPandas()
    assert len(first) == 2_000
    assert first.sort_values("event_id").equals(again.sort_values("event_id"))


def test_csv_and_iterator_surface(spark, tmp_path):
    scfg = StreamConfig(n_types=4, total_events=500, random_ratio=0.4, seed=11,
                        rand_interval_dist="geometric", rand_interval_base=4)
    df = stream_df_exact(spark, PCFG, scfg)
    out = tmp_path / "stream_csv"
    write_csv(df, str(out))
    import glob

    files = glob.glob(str(out / "part-*.csv"))
    assert len(files) == 1
    with open(files[0]) as fh:
        header = fh.readline().strip()
        assert header == "timestamp,event_type,is_pattern"
        first = fh.readline().strip().split(",")
        assert all(tok.lstrip("-").isdigit() for tok in first)
    it = stream_iter(df)
    t0, e0, p0 = next(it)
    assert isinstance(t0, int) and isinstance(e0, int) and isinstance(p0, bool)
    # A9: [N,3] int array, bool upcast, same order as the iterator
    arr = to_numpy(df)
    assert arr.shape == (500, 3) and arr.dtype == np.int64
    assert (arr[0] == np.array([t0, e0, int(p0)])).all()
    assert set(np.unique(arr[:, 2])) <= {0, 1}
    assert (np.diff(arr[:, 0]) >= 0).all()


def test_exact_summary_oracle_constants_pinned():
    """The generate_stream_exact oracle is a precomputed VALUES table
    (a pure function of the golden config); recompute it from core so
    any NumPy/bit-stream drift fails here before the driver hashes a
    stale constant."""
    from eventstream_benchmark_spark.generator.queries import (
        GOLDEN_PATTERNS,
        GOLDEN_STREAM,
        _EXACT_SUMMARY_ROWS,
    )

    types, gaps = core.build_patterns(GOLDEN_PATTERNS)
    ts, ty, label = core.build_stream(GOLDEN_STREAM, types, gaps)
    got = {}
    for t, p in {(int(a), bool(b)) for a, b in zip(ty, label)}:
        sel = ts[(ty == t) & (label == p)]
        got[(t, str(p).lower())] = (
            len(sel), int(sel.min()), int(sel.max()), int(sel.sum())
        )
    want = {(t, p): (n, lo, hi, s) for t, p, n, lo, hi, s in _EXACT_SUMMARY_ROWS}
    assert got == want


def test_pattern_recovery_constants_pinned():
    """The pattern_recovery_scored oracle is a precomputed constant
    row (deterministic sharded generation + a deterministic matcher);
    recompute the whole score from core's NumPy path so any RNG or
    matcher drift fails here before the driver hashes a stale
    constant."""
    from eventstream_benchmark_spark.generator.queries import (
        GOLDEN_PATTERNS,
        PATTERN_RECOVERY_ROW,
        SCALE_SHARDS,
        SCALE_STREAM,
    )
    import dataclasses

    types, gaps = core.build_patterns(GOLDEN_PATTERNS)
    seq = types[0]
    L = len(seq)
    sizes = core.shard_sizes(SCALE_STREAM.total_events, SCALE_SHARDS)
    n_matches = n_true = n_pattern = 0
    for shard, n_events in enumerate(sizes):
        cfg = dataclasses.replace(SCALE_STREAM, total_events=n_events)
        rng = core.shard_rng(SCALE_STREAM.seed, shard)
        _ts, ty, label = core.build_stream_fast(cfg, types, gaps, rng=rng)
        n_pattern += int(label.sum())
        windows = np.lib.stride_tricks.sliding_window_view(ty, L)
        hits = (windows == seq).all(axis=1)
        n_matches += int(hits.sum())
        lab_win = np.lib.stride_tricks.sliding_window_view(label, L)
        n_true += int((hits & lab_win.all(axis=1)).sum())
    got = (n_matches, n_true, n_matches - n_true, n_pattern)
    assert got == PATTERN_RECOVERY_ROW


def test_pattern_rows_constants_pinned():
    """The generate_patterns_spark oracle is a precomputed VALUES table
    of the GOLDEN_PATTERNS set as scalar rows; recompute from core so
    RNG drift fails here before the driver hashes a stale constant."""
    from eventstream_benchmark_spark.generator.queries import (
        GOLDEN_PATTERNS,
        _PATTERN_ROWS,
    )

    types, gaps = core.build_patterns(GOLDEN_PATTERNS)
    got = tuple(
        (pid, pos, int(types[pid][pos]),
         int(gaps[pid][pos]) if pos < gaps.shape[1] else None)
        for pid in range(types.shape[0])
        for pos in range(types.shape[1])
    )
    assert got == _PATTERN_ROWS


def test_sharded_summary_constants_pinned():
    """The generate_stream_sharded oracle is a precomputed VALUES table
    of per-shard (n, n_pattern, span) summaries; recompute each
    shard from core's NumPy path (same SeedSequence spawning as the
    applyInPandas task) so RNG drift fails here first. n_pattern is an
    exact integer count — no rounding-mode dependence (Spark HALF_UP
    vs Python half-even) can split the test from the driver check."""
    import dataclasses

    from eventstream_benchmark_spark.generator.queries import (
        GOLDEN_PATTERNS,
        SCALE_SHARDS,
        SCALE_STREAM,
        _SHARDED_SUMMARY_ROWS,
    )

    types, gaps = core.build_patterns(GOLDEN_PATTERNS)
    sizes = core.shard_sizes(SCALE_STREAM.total_events, SCALE_SHARDS)
    got = []
    for shard, n_events in enumerate(sizes):
        cfg = dataclasses.replace(SCALE_STREAM, total_events=n_events)
        rng = core.shard_rng(SCALE_STREAM.seed, shard)
        ts, _ty, label = core.build_stream_fast(cfg, types, gaps, rng=rng)
        got.append(
            (shard, len(ts), int(label.sum()), int(ts.max()))
        )
    assert tuple(got) == _SHARDED_SUMMARY_ROWS


def test_compat_facade_bit_equal(golden, tmp_path):
    """The drop-in facade (compat.generate_patterns / compat.EventStream,
    reference signatures and defaults) reproduces the reference
    bit-for-bit through the same call shape a reference user writes —
    including to_numpy, the CSV format, and the stream() iterator —
    with no SparkSession attached."""
    from eventstream_benchmark_spark.generator import compat

    ref_pats, ref_stream = golden
    pats = compat.generate_patterns(
        n_patterns=8, pattern_length=10, n_types=6,
        gap_dist="uniform", gap_low=3, gap_high=9, seed=137,
    )
    np.testing.assert_array_equal(pats.types, ref_pats.types)
    np.testing.assert_array_equal(pats.gaps, ref_pats.gaps)
    assert (pats.n_patterns, pats.length, len(pats)) == (8, 10, 8)

    es = compat.EventStream(
        patterns=pats, n_types=6, total_events=40_000, random_ratio=0.7,
        seed=2025, pattern_jitter="uniform", pattern_jitter_amount=2,
        rand_interval_dist="poisson", rand_interval_base=6,
        rand_interval_low=None, rand_interval_high=None,
        rand_jitter="uniform", rand_jitter_amount=1,
        density_mode="sin", density_period=8000, density_amp=0.6,
        density_base_rate=1.0, cache_dir=None,
    )
    arr = es.to_numpy()
    np.testing.assert_array_equal(arr[:, 0], ref_stream.timestamps)
    np.testing.assert_array_equal(arr[:, 1], ref_stream.types)
    np.testing.assert_array_equal(arr[:, 2], ref_stream.is_pattern.astype(np.int64))
    first = next(es.stream())
    assert first == (int(ref_stream.timestamps[0]), int(ref_stream.types[0]),
                     bool(ref_stream.is_pattern[0]))
    out = tmp_path / "compat.csv"
    es.to_csv(str(out))
    ref_out = tmp_path / "ref_compat.csv"
    ref_stream.to_csv(str(ref_out))
    assert out.read_text().splitlines() == ref_out.read_text().splitlines()


def test_compat_sharded_df(spark, tmp_path):
    """Sharded compat mode: DataFrame surface + parquet config cache."""

    from eventstream_benchmark_spark.generator import compat

    pats = compat.generate_patterns(
        n_patterns=4, pattern_length=5, n_types=4, seed=11
    )
    cache = str(tmp_path / "compat_cache")  # pytest-managed, no leak
    es = compat.EventStream(
        patterns=pats, n_types=4, total_events=8_000, random_ratio=0.5,
        seed=7, spark=spark, mode="sharded", n_shards=8, cache_dir=cache,
    )
    assert es.df.count() == 8_000
    # cache hit: a second instance reads the parquet materialization
    es2 = compat.EventStream(
        patterns=pats, n_types=4, total_events=8_000, random_ratio=0.5,
        seed=7, spark=spark, mode="sharded", n_shards=8, cache_dir=cache,
    )
    assert es2.df.count() == 8_000
    assert es.to_numpy().shape == (8_000, 3)


def test_compat_exact_to_csv_single_file_even_with_spark(spark, tmp_path):
    """Round-4 advice: with a session attached, exact-mode to_csv must
    still produce the reference's single CSV FILE at ``path`` — not a
    Spark output directory — and byte-match the no-spark output."""
    from eventstream_benchmark_spark.generator import compat

    pats = compat.generate_patterns(n_patterns=4, pattern_length=5, n_types=4, seed=11)
    kw = dict(patterns=pats, n_types=4, total_events=5_000, random_ratio=0.5, seed=7)
    with_spark = tmp_path / "with_spark.csv"
    compat.EventStream(spark=spark, **kw).to_csv(str(with_spark))
    no_spark = tmp_path / "no_spark.csv"
    compat.EventStream(**kw).to_csv(str(no_spark))
    assert with_spark.is_file()
    assert with_spark.read_bytes() == no_spark.read_bytes()


def test_compat_sharded_to_csv_single_file(spark, tmp_path):
    from eventstream_benchmark_spark.generator import compat

    pats = compat.generate_patterns(n_patterns=4, pattern_length=5, n_types=4, seed=11)
    es = compat.EventStream(
        patterns=pats, n_types=4, total_events=5_000, random_ratio=0.5,
        seed=7, spark=spark, mode="sharded", n_shards=8,
    )
    out = tmp_path / "sharded.csv"
    es.to_csv(str(out))
    assert out.is_file()
    lines = out.read_text().splitlines()
    assert lines[0] == "timestamp,event_type,is_pattern"
    assert len(lines) == 5_001


def test_compat_exact_cache_without_spark(tmp_path, monkeypatch):
    """Round-4 advice: cache_dir must be honored in the no-spark exact
    path (the reference pickles and reloads). Second instance must
    answer from the npz without regenerating — proven by poisoning
    core.build_stream after the first materialization."""
    from eventstream_benchmark_spark.generator import compat, core

    pats = compat.generate_patterns(n_patterns=4, pattern_length=5, n_types=4, seed=11)
    kw = dict(patterns=pats, n_types=4, total_events=5_000, random_ratio=0.5,
              seed=7, cache_dir=str(tmp_path))
    first = compat.EventStream(**kw).to_numpy()
    assert any(p.suffix == ".npz" for p in tmp_path.iterdir())

    def boom(*a, **k):
        raise AssertionError("cache miss: build_stream re-ran")

    monkeypatch.setattr(core, "build_stream", boom)
    again = compat.EventStream(**kw).to_numpy()
    np.testing.assert_array_equal(first, again)
    # regenerate=True must bypass the cache (and hit the poison)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="cache miss"):
        compat.EventStream(**{**kw, "regenerate": True}).to_numpy()
