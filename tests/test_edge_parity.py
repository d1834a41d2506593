"""Edge-input parity regressions the sf fixtures cannot exercise
(they are ASCII-only with no zero vectors):

- non-ASCII text through ``edit_distance_pairs``: Spark's
  ``levenshtein`` counts code points, DuckDB's counts bytes — both
  sides must ASCII-project first or the oracle diverges on the first
  multi-byte character;
- all-zero vectors through ``quantize_embeddings``: the NULL q array
  must surface as NULL on both engines (Spark ``array_join`` would
  render it '' while DuckDB ``array_to_string`` returns NULL).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aprs2influxdb_spark.queries import registry

from tests.test_oracle_parity import _canon


def _run_both(spark, tmp_sf, name, views):
    con = duckdb.connect()
    for t in views:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_sf}/{t}.parquet'")
    builder, sql = registry()[name]
    sdf = builder(spark, str(tmp_sf))
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _canon(s_rows, s_cols) == _canon(d_rows, d_cols)
    return s_rows


def test_edit_distance_non_ascii_parity(spark, tmp_path):
    # share the (aaa,bbb,ccc,…) shingles so the pair is a candidate;
    # differ only in héllo/hallo — multi-byte on one side
    rows = [
        (1, "aaa bbb ccc ddd eee héllo"),
        (2, "aaa bbb ccc ddd eee hallo"),
        (3, "unrelated words entirely different text here"),
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows])}),
        tmp_path / "documents.parquet",
    )
    out = _run_both(spark, tmp_path, "edit_distance_pairs", ["documents"])
    pair = {(r[0], r[1]): r[2] for r in out}
    # projected: 'h?llo' vs 'hallo' -> distance 1 on both engines
    assert pair[(1, 2)] == 1


def test_quantize_zero_vector_parity(spark, tmp_path):
    vecs = [
        (1, [1.0, -2.0, 4.0, 0.5]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: NULL scale, NULL q
        (3, [0.25, 0.25, -0.25, 0.125]),
    ]
    pq.write_table(
        pa.table({"vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                  "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32()))}),
        tmp_path / "embeddings.parquet",
    )
    out = _run_both(spark, tmp_path, "quantize_embeddings", ["embeddings"])
    by_id = {r[0]: r for r in out}
    assert by_id[2][1] is None and by_id[2][2] is None
    assert by_id[1][2] == "32_-64_127_16"
