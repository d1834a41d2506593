"""Time-series downsampling operators (the dashboard-serving side of
SURVEY §1.3's query model: InfluxDB/Grafana render at most a few
hundred points per panel, so the server downsamples before shipping).

LTTB (largest-triangle-three-buckets, Steinarsson 2013) is the standard
perceptual downsampler: it keeps the points that preserve the visual
shape of the series — spikes survive where a mean/first-per-bucket
rollup flattens them.  Its selection is sequential per series (each
choice depends on the previously selected point), so like DTW it has no
SQL/column-algebra form: it runs as ``applyInPandas`` per series key,
and correctness is pinned against the pure-Python reference below.
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
        avg_t = sum(ts[avg_lo:avg_hi]) / span if avg_hi > avg_lo else ts[n - 1]
        avg_v = sum(vs[avg_lo:avg_hi]) / span if avg_hi > avg_lo else vs[n - 1]
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


def lttb_downsample(
    events: DataFrame, n_out: int = 20, id_col: str = "user_id",
    ts_col: str = "ts", val_col: str = "value",
) -> DataFrame:
    """Per-series LTTB downsampling to at most ``n_out`` points.

    Plan: one shuffle on the series key, each group sorted and reduced
    inside an Arrow-batched ``applyInPandas`` — the standard shape for
    sequential per-series algorithms (same as the stateful calibration
    twin).  Time enters the area computation as integer epoch
    microseconds so the arithmetic is engine- and zone-independent.
    At 100 TB the series count provides the parallelism; a single
    pathological series is bounded by its own length, and the rendering
    use case caps that by time-range predicates pushed to the scan."""
    out_schema = f"{id_col} long, {ts_col} timestamp, {val_col} double"

    def _group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col]).reset_index(drop=True)
        ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()
        vs = pdf[val_col].astype(float).tolist()
        keep = lttb_indices_py(ts_us, vs, n_out)
        return pdf.iloc[keep][[id_col, ts_col, val_col]]

    return (
        events.select(id_col, ts_col, val_col)
        .groupBy(id_col)
        .applyInPandas(_group, out_schema)
    )
