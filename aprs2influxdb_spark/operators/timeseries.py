"""Time-series downsampling operators (the dashboard-serving side of
SURVEY §1.3's query model: InfluxDB/Grafana render at most a few
hundred points per panel, so the server downsamples before shipping).

LTTB (largest-triangle-three-buckets, Steinarsson 2013) is the standard
perceptual downsampler: it keeps the points that preserve the visual
shape of the series — spikes survive where a mean/first-per-bucket
rollup flattens them.  Its selection is sequential per series (each
choice depends on the previously selected point), so it runs as
``applyInPandas`` per series key.  The sequential recurrence IS
SQL-expressible as a recursive CTE over precomputed buckets
(:func:`lttb_oracle_sql`), which is the DuckDB oracle for the
``lttb_downsample`` registry entry; correctness is additionally pinned
against the pure-Python reference below.

Cross-engine float discipline (see the dtype/rounding notes in
MEMORY/cross-engine-rounding-determinism): epoch-µs timestamps are
< 2^53 so their doubles are exact; bucket-mean numerators are summed as
a *left fold* on both sides (Python ``sum`` ↔ DuckDB ``list_reduce``
over a rn-ordered list) then converted-then-divided in the same order
(``float(sum)/span`` ↔ ``CAST(sum AS DOUBLE)/span``), and the triangle
area uses the identical operation order — every double op is
bit-identical across engines, so the argmax selection matches exactly.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_indices_py(ts: list, vs: list, n_out: int) -> list:
    """Reference LTTB: indices of the selected points.  First and last
    always kept; each middle bucket contributes the point forming the
    largest triangle with the previous selection and the next bucket's
    centroid.  Ties keep the earliest point (strict ``>``), making the
    selection fully deterministic."""
    n = len(ts)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    every = (n - 2) / (n_out - 2)
    idxs = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(math.floor(i * every)) + 1
        hi = min(int(math.floor((i + 1) * every)) + 1, n - 1)
        avg_lo = min(int(math.floor((i + 1) * every)) + 1, n - 1)
        avg_hi = min(int(math.floor((i + 2) * every)) + 1, n)
        span = max(avg_hi - avg_lo, 1)
        # float(sum)/span (not sum/span): int.__truediv__ rounds the exact
        # rational once, but the DuckDB oracle must CAST its bigint sum to
        # DOUBLE before dividing (two roundings) — mirror that here so the
        # argmax is bit-identical across engines.
        avg_t = float(sum(ts[avg_lo:avg_hi])) / span if avg_hi > avg_lo else float(ts[n - 1])
        avg_v = float(sum(vs[avg_lo:avg_hi])) / span if avg_hi > avg_lo else float(vs[n - 1])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (ts[a] - avg_t) * (vs[j] - vs[a]) - (ts[a] - ts[j]) * (avg_v - vs[a])
            )
            if area > best_area:
                best_area, best = area, j
        idxs.append(best)
        a = best
    idxs.append(n - 1)
    return idxs


def lttb_indices_np(ts: "np.ndarray", vs: "np.ndarray", n_out: int) -> list:
    """Vectorized twin of :func:`lttb_indices_py`, bit-identical by
    construction: bucket means keep the Python left-fold ``float(sum)``
    (numpy's pairwise summation would round differently), the candidate
    areas are elementwise numpy ops with the same IEEE op order as the
    scalar loop, and ``argmax`` keeps the first max exactly like the
    strict ``>`` loop.  ~20× faster per series; equality with the
    reference is pinned in tests (the pinned expectations are computed
    from lttb_indices_py)."""
    import numpy as np

    n = len(ts)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    ts_i = ts.tolist()  # python ints: exact fold sums below
    vs_l = vs.tolist()
    tsf = ts.astype("float64")  # < 2^53: exact conversion
    every = (n - 2) / (n_out - 2)
    idxs = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(math.floor(i * every)) + 1
        hi = min(int(math.floor((i + 1) * every)) + 1, n - 1)
        avg_lo = min(int(math.floor((i + 1) * every)) + 1, n - 1)
        avg_hi = min(int(math.floor((i + 2) * every)) + 1, n)
        span = max(avg_hi - avg_lo, 1)
        avg_t = float(sum(ts_i[avg_lo:avg_hi])) / span if avg_hi > avg_lo else float(ts_i[n - 1])
        avg_v = float(sum(vs_l[avg_lo:avg_hi])) / span if avg_hi > avg_lo else float(vs_l[n - 1])
        # elementwise mirror of: |(ts[a]-avg_t)*(vs[j]-vs[a]) - (ts[a]-ts[j])*(avg_v-vs[a])|
        areas = np.abs(
            (tsf[a] - avg_t) * (vs[lo:hi] - vs[a]) - (tsf[a] - tsf[lo:hi]) * (avg_v - vs[a])
        )
        best = lo + int(np.argmax(areas)) if hi > lo else lo
        idxs.append(best)
        a = best
    idxs.append(n - 1)
    return idxs


def lttb_downsample(
    events: DataFrame, n_out: int = 20, id_col: str = "user_id",
    ts_col: str = "ts", val_col: str = "value", tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Per-series LTTB downsampling to at most ``n_out`` points.

    Plan: one shuffle on the series key, each group sorted and reduced
    inside an Arrow-batched ``applyInPandas`` — the standard shape for
    sequential per-series algorithms (same as the stateful calibration
    twin).  Time enters the area computation as integer epoch
    microseconds so the arithmetic is engine- and zone-independent.
    ``tiebreak_col`` makes the per-group sort total under duplicate
    (series, ts) samples — without it the selection is partitioning-
    dependent; pass ``None`` only if (series, ts) is known unique.
    At 100 TB the series count provides the parallelism; a single
    pathological series is bounded by its own length, and the rendering
    use case caps that by time-range predicates pushed to the scan.
    SERIES-LENGTH CONTRACT (round 6): the Arrow group transfer is
    LINEAR (numpy LTTB, no quadratic accumulator) but one key's series
    must fit a pandas partition — ~32 bytes/event ⇒ keep per-key input
    under ~10⁷ events (pre-filter by time range past that), the same
    row-width class as ``holt_winters``'s collect_list."""
    out_schema = f"{id_col} long, {ts_col} timestamp, {val_col} double"
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    in_cols = [id_col, ts_col, val_col] + ([tiebreak_col] if tiebreak_col else [])

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        ts_us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
        vs = pdf[val_col].astype(float).to_numpy()
        keep = lttb_indices_np(ts_us, vs, n_out)
        return pdf.iloc[keep][[id_col, ts_col, val_col]]

    from aprs2influxdb_spark.functions.partitioning import spread_for_grouped_compute

    return (
        spread_for_grouped_compute(events.select(*in_cols), id_col)
        .groupBy(id_col)
        .applyInPandas(_group, out_schema)
    )


def lttb_oracle_sql(
    n_out: int = 20, table: str = "events", id_col: str = "user_id",
    ts_col: str = "ts", val_col: str = "value", tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`lttb_downsample`: the sequential bucket
    recurrence as a recursive CTE.  Buckets and their centroid means
    are precomputed (non-recursive); the recursion carries only the
    previously selected row number per series, and each step picks the
    candidate maximizing the triangle area via a correlated
    ORDER-BY-LIMIT-1 subquery (ties → smallest rn, matching the
    reference's strict ``>``).  All float ops mirror the Python
    reference's operation order exactly — see the module docstring."""
    ev = f"(({id_col}_n - 2) / {float(n_out - 2)!r})"
    return f"""
WITH RECURSIVE
lttb_base AS (
  SELECT {id_col}, {ts_col}, {val_col}, epoch_us({ts_col}) AS tus,
         row_number() OVER (PARTITION BY {id_col} ORDER BY {ts_col}, {tiebreak_col}) - 1 AS rn,
         count(*) OVER (PARTITION BY {id_col}) AS {id_col}_n
  FROM {table}
),
lttb_big AS (SELECT DISTINCT {id_col}, {id_col}_n FROM lttb_base WHERE {id_col}_n > {n_out}),
lttb_buckets AS (
  SELECT b.{id_col}, b.{id_col}_n, t.i,
         CAST(floor(t.i * {ev}) AS BIGINT) + 1 AS lo,
         least(CAST(floor((t.i + 1) * {ev}) AS BIGINT) + 1, b.{id_col}_n - 1) AS hi,
         least(CAST(floor((t.i + 1) * {ev}) AS BIGINT) + 1, b.{id_col}_n - 1) AS avg_lo,
         least(CAST(floor((t.i + 2) * {ev}) AS BIGINT) + 1, b.{id_col}_n) AS avg_hi
  FROM lttb_big b, range(0, {n_out - 2}) t(i)
),
lttb_avgs AS (
  SELECT b.{id_col}, b.i, b.lo, b.hi,
         CASE WHEN b.avg_hi > b.avg_lo
              THEN CAST(list_reduce(list(p.tus ORDER BY p.rn), (acc, x) -> acc + x) AS DOUBLE)
                   / (b.avg_hi - b.avg_lo)
              ELSE CAST(lastp.tus AS DOUBLE) END AS avg_t,
         CASE WHEN b.avg_hi > b.avg_lo
              THEN list_reduce(list(p.{val_col} ORDER BY p.rn), (acc, x) -> acc + x)
                   / (b.avg_hi - b.avg_lo)
              ELSE lastp.{val_col} END AS avg_v
  FROM lttb_buckets b
  LEFT JOIN lttb_base p
    ON p.{id_col} = b.{id_col} AND p.rn >= b.avg_lo AND p.rn < b.avg_hi
  JOIN lttb_base lastp
    ON lastp.{id_col} = b.{id_col} AND lastp.rn = b.{id_col}_n - 1
  GROUP BY b.{id_col}, b.i, b.lo, b.hi, b.avg_hi, b.avg_lo, lastp.tus, lastp.{val_col}
),
lttb_sel AS (
  SELECT {id_col}, -1 AS i, CAST(0 AS BIGINT) AS a_rn FROM lttb_big
  UNION ALL
  SELECT s.{id_col}, s.i + 1 AS i,
         (SELECT c.rn
          FROM lttb_base c, lttb_avgs v, lttb_base a
          WHERE v.{id_col} = s.{id_col} AND v.i = s.i + 1
            AND a.{id_col} = s.{id_col} AND a.rn = s.a_rn
            AND c.{id_col} = s.{id_col} AND c.rn >= v.lo AND c.rn < v.hi
          ORDER BY abs((a.tus - v.avg_t) * (c.{val_col} - a.{val_col})
                     - (a.tus - c.tus) * (v.avg_v - a.{val_col})) DESC, c.rn ASC
          LIMIT 1) AS a_rn
  FROM lttb_sel s
  WHERE s.i + 1 <= {n_out - 3}
),
lttb_keep AS (
  SELECT {id_col}, a_rn AS rn FROM lttb_sel
  UNION ALL SELECT {id_col}, {id_col}_n - 1 AS rn FROM lttb_big
  UNION ALL SELECT {id_col}, rn FROM lttb_base WHERE {id_col}_n <= {n_out}
)
SELECT b.{id_col}, b.{ts_col}, b.{val_col}
FROM lttb_base b JOIN lttb_keep k ON b.{id_col} = k.{id_col} AND b.rn = k.rn
"""
