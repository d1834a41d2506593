"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced to full execution with a count-style action
(``df.write.format("noop")`` would skip result decode; ``count`` after
a cache-free plan measures the real pipeline).  Queries cover every
operator family: scan+agg, multi-join, window, as-of, dedup ladder,
similarity, text analysis, serialization.
"""

from __future__ import annotations

import json
import os
import time

from aprs2influxdb_spark.queries import registry
from aprs2influxdb_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "top_orders",
    "topk_per_group",
    "rollup_revenue",
    "asof_calibration",
    "sessionize",
    "time_bucket_agg",
    "line_protocol",
    "dedup_exact",
    "dedup_fingerprint",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "simhash",
    "cosine_topk",
    "text_quality",
    "rolling_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # JVM/codegen warmup on the smallest SF so steady-state throughput
    # is measured, not first-query compilation
    warm = "/root/testdata/sf0.001"
    for name in ("pricing_summary", "cosine_topk"):
        reg[name][0](spark, warm).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        builder, _sql = reg[name]
        t0 = time.perf_counter()
        builder(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
