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

from collections.abc import Callable

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []

# (family, app_id, sf_dir) -> persisted DataFrame shared ACROSS queries
# of one family within a sweep (the graph family's co-purchase edge
# build is the motivating case: four queries each paid the same
# distinct + per-order self-join).  Deliberately NOT released by
# release_scoped_persists — harness boundaries (bench lane ends, test
# session teardown) call release_shared_persists instead.
_SHARED: dict[tuple, DataFrame] = {}


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query."""
    df.persist()
    _LIVE.append(df)
    return df


def release_scoped_persists() -> None:
    """Unpersist every registered intermediate (idempotent)."""
    while _LIVE:
        _LIVE.pop().unpersist()


def shared_persist(key: tuple, builder: Callable[[], DataFrame]) -> DataFrame:
    """Return the family-shared persisted DataFrame for ``key``,
    building it on first use. The key must include the Spark
    applicationId (a cached frame is useless to a later session) and
    the fixture directory (two fixtures must never share a build).

    If an external actor unpersisted the entry (e.g. a harness calling
    ``spark.catalog.clearCache()``), re-persist it — the frame stays
    valid either way (Spark recomputes lazily); re-persisting just
    restores the amortization."""
    df = _SHARED.get(key)
    if df is None:
        df = builder()
        _SHARED[key] = df
    if not df.is_cached:
        df.persist()
    return df


def shared_persist_atomic(
    keys: tuple[tuple, ...], builder: Callable[[], tuple[DataFrame, ...]]
) -> tuple[DataFrame, ...]:
    """All-or-nothing :func:`shared_persist` for artifacts that come
    out of ONE shared build plan (``builder`` returns one frame per
    key, in order). If ANY key is missing, every key in the group is
    dropped and the whole group rebuilt — a selective eviction (e.g.
    ``release_shared_families`` naming only one of the family tags)
    can therefore never leave one twin riding a stale upstream persist
    while a rebuild of the other materializes a duplicate of that same
    upstream (the r10 advisor's ``_collapse_family`` finding: the twin
    frames share a persisted ``groups`` aggregate, and a half-evicted
    group kept two copies of it in storage)."""
    if not all(k in _SHARED for k in keys):
        for k in keys:
            df = _SHARED.pop(k, None)
            if df is not None:
                df.unpersist()
        for k, df in zip(keys, builder(), strict=True):
            _SHARED[k] = df
    out = tuple(_SHARED[k] for k in keys)
    for df in out:
        if not df.is_cached:
            df.persist()
    return out


def release_shared_persists() -> None:
    """Unpersist every family-shared frame (harness boundaries only)."""
    while _SHARED:
        _SHARED.popitem()[1].unpersist()


def release_shared_families(prefixes: tuple[str, ...]) -> None:
    """Unpersist and drop only the shared frames whose family tag (the
    key's first element) is in ``prefixes`` — the bench uses this so a
    query that EMITS a shared artifact pays its own build on every
    measured pass without evicting other families' builds (e.g. the
    graph lane's edge aggregate mid-handoff)."""
    for key in [k for k in _SHARED if k[0] in prefixes]:
        _SHARED.pop(key).unpersist()
