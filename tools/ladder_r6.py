"""Round-6 ladder (verdict-r5 items 1, 2, 4): third-decade rows for
the events/window/state family (sf100 events now exists), the
mmr_rerank stage decomposition (bm25 candidates vs pool assembly vs
greedy), and the re-measured windowed_pmi after the in-row rewrite.

Same harness as BASELINE.md's round-5 ladder: one warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10/sf100, noop sink,
persistent RDDs unpersisted between queries.

Usage: python tools/ladder_r6.py [names...]   # default: the r6 set
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from aprs2influxdb_spark.queries import MMR_POOL, registry
from aprs2influxdb_spark.session import get_spark

DIRS = [
    ("/root/testdata/sf0.1", 2),
    ("scaledata/sf1", 2),
    ("scaledata/sf10", 1),
    ("scaledata/sf100", 1),
]

NAMES = [
    "windowed_pmi",
    "ewma_segmented",
    "bm25_topk",
    "mmr_pool_stage",
    "mmr_rerank",
    "deadman_alerts",
    "holt_winters",
    "influx_cumulative",
    "session_components",
    "streaming_ttl_noop",
]


def mmr_pool_stage(spark, sf):
    """mmr_rerank's pool-assembly stage in isolation: bm25 candidates
    joined to embeddings, per-query max-normalized rel, collected into
    the per-query struct array — everything but the in-row greedy."""
    from aprs2influxdb_spark.operators import textanalysis as ta
    from aprs2influxdb_spark.queries import _t

    cand = ta.bm25_topk(_t(spark, sf, "documents"), k=MMR_POOL).select(
        "query_id", "doc_id", "bm25"
    )
    emb = _t(spark, sf, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x))
    wq = Window.partitionBy("query_id")
    return (
        cand.join(emb, "doc_id")
        .withColumn(
            "rel",
            F.coalesce(
                F.floor(
                    F.col("bm25") / F.nullif(F.max("bm25").over(wq), F.lit(0.0))
                    * 1e6 + 0.5
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("nrm", nrm)
        .groupBy("query_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("doc_id", "rel", "v", "nrm"))).alias("arr")
        )
        .select("query_id", F.size("arr").alias("n"))
    )


def streaming_ttl_noop(spark, sf):
    """The transformWithState TTL pipeline measured to a NOOP streaming
    sink: the registry twin funnels output through a memory sink (the
    driver-side comparison harness), which at sf100 serializes 100M
    rows to the driver and trips maxResultSize — a harness artifact,
    not an operator cost.  This measures the operator itself."""
    from aprs2influxdb_spark.streaming.bounded import (
        TTL_OUTPUT,
        _TtlCalibProcessor,
        _sentinel_events_stream,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="ttl_ladder_")
    try:
        out = (
            _sentinel_events_stream(spark, sf)
            .withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .transformWithStateInPandas(
                _TtlCalibProcessor(), TTL_OUTPUT, "Append", "EventTime"
            )
        )
        q = (
            out.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)  # GB-scale RocksDB state at sf100
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def main():
    spark = get_spark("ladder-r6")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "cosine_topk"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, dict[str, float]] = {}
    for sf_dir, reps in DIRS:
        times: dict[str, float] = {}
        for name in names:
            if name == "mmr_pool_stage":
                builder = mmr_pool_stage
            elif name == "streaming_ttl_noop":
                builder = streaming_ttl_noop
            else:
                builder = reg[name][0]
            best = float("inf")
            try:
                for _ in range(reps):
                    for rdd in list(
                        spark.sparkContext._jsc.getPersistentRDDs().values()
                    ):
                        rdd.unpersist()
                    t0 = time.perf_counter()
                    res = builder(spark, sf_dir)
                    if res is not None:
                        res.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # keep the ladder going; record the miss
                print(f"!! {name} @ {sf_dir}: {type(e).__name__}: {e}", flush=True)
                best = float("nan")
            times[name] = round(best, 3)
            print(f"{sf_dir:22s} {name:28s} {times[name]:10.3f}s", flush=True)
        out[sf_dir] = times
    print(json.dumps(out))


if __name__ == "__main__":
    main()
