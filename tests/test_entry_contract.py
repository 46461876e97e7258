"""Driver-contract tests: every queries() entry runs; every oracle_sql()
entry produces identical (row count, column names, values) under DuckDB on
the same parquet tables — mimicking the driver's order-insensitive value
compare at sf0.001 (the driver itself runs sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F_sql

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


@pytest.fixture(scope="module")
def qmap():
    return entry_mod.queries()


def test_all_oracle_keys_have_queries(qmap):
    assert set(entry_mod.oracle_sql()) <= set(qmap)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_match(spark, qmap, name):
    sdf = qmap[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    ddf = _duck(entry_mod.oracle_sql()[name])
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False)]

    sc, sr = _norm_rows(spark_cols, spark_rows)
    dc, dr = _norm_rows(duck_cols, duck_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    mism = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mism, f"{name}: {len(mism)} row mismatches, first: {sr[mism[0]]} vs {dr[mism[0]]}"


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql())))
def test_rows_only_queries_run(spark, qmap, name):
    df = qmap[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_session_window_exact_gap_boundary(spark):
    """Pin Spark's session_window boundary semantics (ADVICE r01): an event
    at EXACTLY prev + gap still MERGES (the measured behavior — touching
    windows coalesce), so the DuckDB oracle must split only on strict >."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(minutes=30), 1.0),          # exact gap -> merges
        ("a", t0 + dt.timedelta(minutes=60, seconds=1), 1.0),  # > gap -> NEW
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = (
        df.groupBy(F_sql.session_window("ts", "30 minutes").alias("w"), "event_type")
        .count().orderBy("w.start").collect()
    )
    assert [r["count"] for r in got] == [2, 1]
    assert got[1]["w"]["start"] == t0 + dt.timedelta(minutes=60, seconds=1)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "cluster_id", "cluster_size"}
