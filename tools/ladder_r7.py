"""Round-7 ladder (verdict-r6 items 3 and 8): third-decade rows for
the RELATIONAL join family (scaledata/sf100 now carries the TPC-H-ish
tables: 600M lineitem rows), plus noop-sink rows for the stateful
streaming twins beyond TTL calibration (sessionize, sliding window,
Holt-Winters) with their RocksDB state metrics.

Same harness discipline as the r5/r6 ladders: ONE warm local[32]
session (SPARK_DRIVER_MEMORY=56g), best-of-2 at sf0.1/sf1, best-of-1
at sf10/sf100, noop sink, persistent RDDs unpersisted between
queries, never run concurrently with another Spark session.

The streaming twins are measured to a NOOP STREAMING sink (the
registry twins funnel through a memory sink for the driver's oracle
comparison, which at sf100 serializes the result to the driver and
trips maxResultSize — a harness artifact).  Each streaming leg also
prints the state-store metrics the verdict asked to cite
(numRowsUpdated / numRowsRemoved / final numRowsTotal).

Usage: python tools/ladder_r7.py [names...]   # default: the r7 set
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aprs2influxdb_spark.queries import registry
from aprs2influxdb_spark.session import get_spark

DIRS = [
    ("/root/testdata/sf0.1", 2),
    ("scaledata/sf1", 2),
    ("scaledata/sf10", 1),
    ("scaledata/sf100", 1),
]

REL_NAMES = [
    "region_revenue",
    "market_share",
    "big_orders",
    "returned_items",
    "waiting_supplier",
]
STREAM_NAMES = [
    "streaming_sessionize_noop",
    "streaming_sliding_window_noop",
    "streaming_holt_winters_noop",
]
NAMES = REL_NAMES + ["holt_winters_segmented"] + STREAM_NAMES

_LAST_STATE: dict | None = None


def _noop_stream(spark, stream_df, mode: str, rocksdb: bool = True) -> None:
    """Run a streaming DataFrame to exhaustion into the NOOP sink and
    stash the summed state-store metrics in _LAST_STATE."""
    global _LAST_STATE
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    ckpt = tempfile.mkdtemp(prefix="ladder_r7_")
    try:
        q = (
            stream_df.writeStream.format("noop")
            .outputMode(mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        updated = removed = 0
        total = None
        for p in q.recentProgress:
            d = json.loads(p.json)
            for so in d.get("stateOperators", []):
                updated += so.get("numRowsUpdated", 0)
                removed += so.get("numRowsRemoved", 0)
                if so.get("numRowsTotal") is not None:
                    total = so["numRowsTotal"]
        _LAST_STATE = {"updated": updated, "removed": removed, "total": total}
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)  # GB-scale RocksDB state at sf100
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def streaming_sessionize_noop(spark, sf):
    """session_window sessionization (append mode, watermark sentinel)
    to a noop sink — the per-user open-session state story."""
    from aprs2influxdb_spark.streaming.bounded import _sentinel_events_stream

    agg = (
        _sentinel_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    _noop_stream(spark, agg, "append")


def streaming_sliding_window_noop(spark, sf):
    """2h/1h hopping windows (append mode, watermark sentinel) to a
    noop sink — every event updates two window states."""
    from aprs2influxdb_spark.streaming.bounded import _sentinel_events_stream

    agg = (
        _sentinel_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    _noop_stream(spark, agg, "append")


def streaming_holt_winters_noop(spark, sf):
    """The keyed applyInPandasWithState Holt-Winters fold (26-double
    state per user) to a noop sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from aprs2influxdb_spark.streaming.bounded import (
        HW_OUTPUT,
        _hw_group,
        stream_events,
    )

    hw = (
        stream_events(spark, sf)
        .groupBy("user_id")
        .applyInPandasWithState(
            _hw_group,
            HW_OUTPUT,
            StructType(
                [
                    StructField("l", DoubleType(), True),
                    StructField("b", DoubleType(), True),
                    StructField("s", ArrayType(DoubleType()), True),
                    StructField("t", LongType(), True),
                ]
            ),
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    _noop_stream(spark, hw, "append")


LOCAL = {f.__name__: f for f in (
    streaming_sessionize_noop, streaming_sliding_window_noop,
    streaming_holt_winters_noop,
)}


def main():
    global _LAST_STATE
    spark = get_spark("ladder-r7")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "region_revenue"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, dict] = {}
    for sf_dir, reps in DIRS:
        times: dict[str, float] = {}
        states: dict[str, dict] = {}
        for name in names:
            builder = LOCAL.get(name) or reg[name][0]
            best = float("inf")
            try:
                for _ in range(reps):
                    for rdd in list(
                        spark.sparkContext._jsc.getPersistentRDDs().values()
                    ):
                        rdd.unpersist()
                    _LAST_STATE = None
                    t0 = time.perf_counter()
                    res = builder(spark, sf_dir)
                    if res is not None:
                        res.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # keep the ladder going; record the miss
                print(f"!! {name} @ {sf_dir}: {type(e).__name__}: {e}", flush=True)
                best = float("nan")
            times[name] = round(best, 3)
            msg = f"{sf_dir:22s} {name:32s} {times[name]:10.3f}s"
            if _LAST_STATE:
                states[name] = _LAST_STATE
                msg += (
                    f"  state: updated={_LAST_STATE['updated']}"
                    f" removed={_LAST_STATE['removed']}"
                    f" total={_LAST_STATE['total']}"
                )
            print(msg, flush=True)
        out[sf_dir] = {"times": times, "state": states}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
