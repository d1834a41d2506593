"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry and its DuckDB oracle at sf0.001 and compare
row count + column names + order-insensitive values exactly."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from aprs2influxdb_spark.queries import registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both sides round explicitly; this only canonicalizes -0.0/ints
        return repr(round(v, 9) + 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return repr(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(registry().keys()))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    builder, sql = registry()[name]
    sdf = builder(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(s_rows) >= 0  # rows-only check, mirrors driver
        return
    res = ddb.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    mism = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
    assert sc == dc, f"{name}: first mismatches {mism}"
