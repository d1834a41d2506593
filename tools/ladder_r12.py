"""Round-12 ladder: decade rows for the plan shapes this round changed
— the sharded-state ingest gates (text/SRP/image/video + the drain
cycle) — plus the verdict-r11 item-8 re-check of bloom_decontaminate's
dense-bitset probe at sf1/sf10.

Same harness discipline as the r5-r11 ladders: ONE warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10, noop sink,
persistent RDDs unpersisted between queries, never run concurrently
with another Spark session.  Untimed per-sf prep (media stores) runs
before the timed region, exactly as bench.py stages its media.

Usage: python tools/ladder_r12.py [names...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aprs2influxdb_spark.queries import registry
from aprs2influxdb_spark.session import get_spark

DIRS = [
    ("/root/testdata/sf0.1", 2),
    ("scaledata/sf1", 2),
    ("scaledata/sf10", 1),
]

NAMES = [
    "streaming_lsh_near_dup",
    "streaming_lsh_gate_drained",
    "streaming_lsh_gate_cycle",
    "streaming_srp_gate",
    "streaming_video_near_dup",
    "streaming_video_gate_drained",
    "bloom_decontaminate",
]

#: sf10's streaming rows are minutes each; keep the decade check to the
#: family representative + the verdict item-8 entry
SF10_NAMES = {"streaming_lsh_near_dup", "bloom_decontaminate"}

VIDEO_NAMES = {"streaming_video_near_dup", "streaming_video_gate_drained"}


def _time_one(spark, build, reps: int):
    best = float("inf")
    for _ in range(reps):
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main():
    spark = get_spark("ladder-r12")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "cosine_topk"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    for sf_dir, reps in DIRS:
        sf_names = [
            n for n in names if reps > 1 or n in SF10_NAMES or len(names) <= 2
        ]
        if not sf_names:
            continue
        t0 = time.perf_counter()
        if VIDEO_NAMES & set(sf_names):
            from aprs2influxdb_spark.media_store import ensure_video_store

            ensure_video_store(spark, sf_dir)
        print(
            f"[prep] {sf_dir}: ready ({time.perf_counter() - t0:.1f}s, untimed)",
            flush=True,
        )
        for name in sf_names:
            try:
                t = _time_one(spark, lambda: reg[name][0](spark, sf_dir), reps)
            except Exception as e:  # keep the ladder going
                t = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[{sf_dir}] {name}: {t}", flush=True)


if __name__ == "__main__":
    main()
