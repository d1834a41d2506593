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


_INT = {"TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}
_FLOAT = {"FLOAT", "DOUBLE", "REAL"}


def _kind(t):
    """Collapse an engine type name to a comparison kind.  The driver's
    hash compares pandas-rendered values, so what matters is the pandas
    dtype each engine lands on: HUGEINT/UBIGINT widen to float64 (so a
    Spark ``bigint`` twin hash-mismatches even when values agree) and is
    deliberately NOT mapped to "int" here."""
    t = str(t).upper()
    if t.endswith("[]") or t.startswith("ARRAY") or t.startswith("LIST"):
        return "list"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in _INT:
        return "int"
    if t in _FLOAT:
        return "float"
    if t in ("HUGEINT", "UBIGINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    if t in ("BLOB", "BINARY"):
        return "binary"
    return t


@pytest.mark.parametrize("name", sorted(registry().keys()))
def test_oracle_dtype_kinds(spark, sf_dir, ddb, name):
    """Schema-only sweep: every oracle's column type kinds must match the
    Spark result's, catching int-vs-float (e.g. DuckDB HUGEINT sums) and
    date-vs-timestamp contract drift before the driver's hash does."""
    builder, sql = registry()[name]
    if sql is None:
        pytest.skip("rows-only entry: no oracle to sweep")
    rel = ddb.sql(sql)
    d_kinds = {c.lower(): _kind(t) for c, t in zip(rel.columns, rel.types)}
    sdf = builder(spark, sf_dir)
    s_kinds = {f.name.lower(): _kind(f.dataType.simpleString()) for f in sdf.schema.fields}
    assert d_kinds == s_kinds, f"{name}: oracle kinds {d_kinds} vs spark kinds {s_kinds}"


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
