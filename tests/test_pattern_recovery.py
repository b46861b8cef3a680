"""End-to-end loop-closure: the engine's analytics recover the
generator's ground truth.

The reference exists to benchmark sequence learners on pattern-bearing
streams, with ``is_pattern`` as the built-in answer key (SURVEY §5.1).
Here the generator and the analytic layer meet: generate a stream,
detect pattern instances with a lead-chain matcher joined against the
broadcast pattern set (no labels used), then check every complete
embedded instance is found (recall 1.0 — instances are contiguous and
intact by construction, so a correct matcher cannot miss).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from eventstream_benchmark_spark.generator import (
    PatternConfig,
    StreamConfig,
    core,
    patterns_df,
    stream_df_exact,
)

PCFG = PatternConfig(n_patterns=6, pattern_length=5, n_types=8,
                     gap_dist="uniform", gap_low=2, gap_high=6, seed=41)
SCFG = StreamConfig(n_types=8, total_events=20_000, random_ratio=0.5,
                    seed=99, pattern_jitter="none",
                    rand_interval_dist="poisson", rand_interval_base=5,
                    rand_jitter="none")


def _true_starts(label: np.ndarray, length: int) -> set[int]:
    """Ground-truth instance start positions: within each contiguous
    pattern run, every L-th offset starts an instance (runs merge when
    instances are emitted back-to-back); truncated tails excluded."""
    starts: set[int] = set()
    n = label.shape[0]
    i = 0
    while i < n:
        if label[i]:
            run_start = i
            while i < n and label[i]:
                i += 1
            for s in range(run_start, i, length):
                if s + length <= i:
                    starts.add(s)
        else:
            i += 1
    return starts


def test_pattern_instances_fully_recovered(spark):
    L = PCFG.pattern_length
    stream = stream_df_exact(spark, PCFG, SCFG)
    pats = patterns_df(spark, PCFG)

    # lead-chain the next L-1 types over emission order, fold into an
    # array, and equi-join against the broadcast pattern set
    w = W.orderBy("event_id")
    df = stream.select("event_id", "event_type")
    for k in range(1, L):
        df = df.withColumn(f"t{k}", F.lead("event_type", k).over(w))
    window_types = F.array(F.col("event_type"), *[F.col(f"t{k}") for k in range(1, L)])
    detected = (
        df.withColumn("wt", window_types)
        .join(F.broadcast(pats), F.col("wt") == F.col("types"))
        .select("event_id", "pattern_id")
    )
    found = set(r.event_id for r in detected.collect())

    types, gaps = core.build_patterns(PCFG)
    ts, ty, label = core.build_stream(SCFG, types, gaps)
    truth = _true_starts(label, L)
    assert truth, "degenerate stream: no complete instances"

    missed = truth - found
    assert not missed, f"matcher missed {len(missed)}/{len(truth)} true instances"
    # noise can coincidentally spell a pattern, so precision < 1 is
    # expected — but detections must dominate the truth set
    assert len(found) < 3 * len(truth)
