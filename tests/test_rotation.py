"""Rotation bookkeeping is mechanized, not hand-counted.

Round 7's verdict caught the hand-maintained front list silently
overflowing its 50-slot driver window (51 names starved
``embed_quantize_int8`` for a round). These tests make that failure
mode structural: the literal ``_FRONT_OF_REGISTRY`` must equal the
staleness computation over the committed CORRECTNESS_r*.json history,
and can never exceed the window.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from eventstream_benchmark_spark import rotation
from eventstream_benchmark_spark.operators import (
    _CHANGED_THIS_ROUND,
    _FRONT_GENERATED_FROM_ROUND,
    _FRONT_OF_REGISTRY,
)

REPO_ROOT = Path(__file__).resolve().parent.parent


def _registry_names() -> list[str]:
    from eventstream_benchmark_spark.operators import all_queries

    return list(all_queries().keys())


def test_front_list_fits_driver_window():
    assert len(_FRONT_OF_REGISTRY) <= rotation.DRIVER_WINDOW, (
        f"{len(_FRONT_OF_REGISTRY)} names for a {rotation.DRIVER_WINDOW}-slot "
        "driver window — the overflow silently starves the tail entries "
        "(the round-7 embed_quantize_int8 failure)"
    )


def test_front_list_matches_computed_staleness():
    """The literal tuple equals compute_front over the CORRECTNESS
    history it was generated from (rounds 1.._FRONT_GENERATED_FROM_
    ROUND): never-sampled first, then stalest-first, alphabetical
    within a round. The `upto` pin keeps this green when the driver
    appends the NEXT round's file — regeneration (list + pin bump) is
    the next round's deliberate first act, not a test surprise."""
    if not list(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        pytest.skip("no CORRECTNESS artifacts in this checkout")
    names = _registry_names()
    computed = rotation.compute_front(
        names,
        REPO_ROOT,
        upto=_FRONT_GENERATED_FROM_ROUND,
        changed=_CHANGED_THIS_ROUND,
    )
    assert _FRONT_OF_REGISTRY == computed, (
        "front-of-registry drifted from the computed staleness order; "
        "regenerate it with rotation.compute_front(all_queries(), repo_root, "
        "upto=<latest round>) and bump _FRONT_GENERATED_FROM_ROUND"
    )


def test_front_names_exist_in_registry():
    names = set(_registry_names())
    missing = [n for n in _FRONT_OF_REGISTRY if n not in names]
    assert not missing


def test_latest_green_rounds_reads_history():
    latest = rotation.latest_green_rounds(REPO_ROOT)
    if not latest:
        pytest.skip("no CORRECTNESS artifacts in this checkout")
    # every recorded name that is still registered has a round >= 1
    assert all(r >= 1 for r in latest.values())
    # red rows don't count as green: a record with hash_match False or
    # an err must never bump the round
    assert rotation._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    )
    assert not rotation._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    )
    assert not rotation._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"}
    )
    # rows-only checks (hash_match None) still count
    assert rotation._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}
    )
