from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "user_id" in df.columns and "n_sessions" in df.columns


def test_tables_load(spark, sf_small):
    from eventstream_benchmark_spark.io import TABLES, load_table

    for name in TABLES:
        df = load_table(spark, sf_small, name)
        assert df.count() > 0, name
