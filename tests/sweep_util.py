"""Shared plumbing for the seeded randomized oracle sweeps.

One spelling of the DuckDB-view + compare loop (and the dyadic value
grid) so the 12 sweep suites cannot drift from each other or from the
driver-contract comparison in ``oracle_harness.compare``.
"""

from __future__ import annotations

import random

import duckdb

import __spark_entry__ as _entry
from tests.oracle_harness import compare


def quarter(rng: random.Random, lo: int, hi: int) -> float:
    """A double from the quarter-unit grid in [lo, hi] — exactly
    representable in binary, so every sum of such values is exact and
    summation order cannot matter in either engine."""
    return rng.randint(lo * 4, hi * 4) / 4.0


def sweep_check(spark, sf: str, names, tables, seed: int) -> None:
    """Run each registry query in ``names`` against its DuckDB oracle
    on the parquet fixture dir ``sf`` (containing ``tables``) and
    assert exact parity, the driver's contract."""
    con = duckdb.connect()
    q, o = _entry.queries(), _entry.oracle_sql()
    try:
        for name in tables:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{sf}/{name}.parquet')"
            )
        for name in names:
            duck = con.execute(o[name]).df()
            issues = compare(q[name](spark, sf), duck)
            assert not issues, f"{name} seed={seed}: {issues}"
    finally:
        con.close()
