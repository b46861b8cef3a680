"""Local stand-in for the driver's DuckDB-oracle check.

Runs a Spark query and its DuckDB oracle on the same parquet fixtures
and compares row-count + schema + order-insensitive values, the same
contract described in ``__spark_entry__.py``. Used by
``tests/test_oracle_parity.py`` so every declared oracle is verified
locally before the driver ever sees it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from eventstream_benchmark_spark.io import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("int64")
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame, rel_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity).

    Default is EXACT float equality: the driver compares an exact value
    hash, so rounded outputs must be bit-identical across engines — a
    tolerance here would mask driver-level failures (it hid the round-1
    ``agg_stats_moments`` hash mismatch).
    """
    issues: list[str] = []
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_df)
    if list(s.columns) != list(d.columns):
        issues.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return issues
    if len(s) != len(d):
        issues.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return issues
    for col in s.columns:
        sv, dv = s[col], d[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sv_f = pd.to_numeric(sv, errors="coerce")
            dv_f = pd.to_numeric(dv, errors="coerce")
            both_nan = sv_f.isna() & dv_f.isna()
            close = both_nan | (
                (sv_f - dv_f).abs()
                <= rel_tol * (1.0 + sv_f.abs().combine(dv_f.abs(), max))
            )
            if not close.all():
                bad = (~close).idxmax()
                issues.append(
                    f"float col {col!r} differs at row {bad}: "
                    f"spark={sv_f[bad]!r} duck={dv_f[bad]!r}"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                issues.append(
                    f"col {col!r} differs at row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}"
                )
        if str(sv.dtype) != str(dv.dtype):
            issues.append(f"dtype col {col!r}: spark={sv.dtype} duck={dv.dtype}")
    return issues


def check_query(spark, sf_dir: str, name: str, query_fn, oracle: str) -> list[str]:
    con = duck_connect(sf_dir)
    try:
        duck_df = con.execute(oracle).fetchdf()
    finally:
        con.close()
    return compare(query_fn(spark, sf_dir), duck_df)
