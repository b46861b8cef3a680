"""Query-scoped persist registry.

Some operator functions persist intermediates where the barrier is
load-bearing, not a nicety (see the Catalyst higher-order-function
inlining note in ``dedup._doc_shingles``). But the functions return
lazy DataFrames, so the query itself can never unpersist — and across
an 85-query driver sweep inside one session, never-released persists
accumulate executor storage.

Contract: persist through :func:`scoped_persist`, and call
:func:`release_scoped_persists` at the ENTRY of every query function
that persists. During a sweep at most one query's intermediates occupy
storage at a time; harnesses (bench.py, tests) call the release once
more at the end so nothing outlives the sweep. ``unpersist`` never
invalidates a DataFrame — later actions just recompute — so releasing
a previous query's cache is always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query."""
    df.persist()
    _LIVE.append(df)
    return df


def release_scoped_persists() -> None:
    """Unpersist every registered intermediate (idempotent)."""
    while _LIVE:
        _LIVE.pop().unpersist()
