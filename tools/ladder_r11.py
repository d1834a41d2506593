"""Round-11 ladder: decade rows for the verdict-r10 closers — the
video modality (near-dup, clusters, ingest gate + drained), the
drain-cycle gate, the embedding-space SRP gates, plus re-rows for the
two entries whose plans changed this round (the drained text/image
gates now probe the persisted BUCKETED index instead of a forced
broadcast, and rp_rerank_topk's projection materializes outside
whole-stage codegen).

Same harness discipline as the r5-r10 ladders: ONE warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10, noop sink,
persistent RDDs unpersisted between queries, never run concurrently
with another Spark session.  Untimed per-sf prep (video store, image
store, audio store) runs before the timed region, exactly as bench.py
stages its media.

No sf100 video row on purpose: the video store's SYNTHESIS pays ~15 ms
of JPEG encode per clip (4 × 64×64 frames), so 5M clips would cost
~40 min of untimed pure-Python encode CPU for one decode measurement —
the round-5 justification for skipping codec-encode sf100 applies
verbatim.  The sf10 row (500k clips, 2M real frames) already spans
three decades over the smallest scale.

Usage: python tools/ladder_r11.py [names...]
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
    "video_near_dup",
    "video_dup_clusters",
    "streaming_video_near_dup",
    "streaming_video_gate_drained",
    "streaming_lsh_gate_cycle",
    "streaming_srp_gate",
    "streaming_srp_gate_drained",
    # re-rows: plan changed this round
    "streaming_lsh_gate_drained",
    "streaming_image_gate_drained",
    "rp_rerank_topk",
]

VIDEO_NAMES = {
    "video_near_dup",
    "video_dup_clusters",
    "streaming_video_near_dup",
    "streaming_video_gate_drained",
}


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
    spark = get_spark("ladder-r11")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "cosine_topk"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    for sf_dir, reps in DIRS:
        t0 = time.perf_counter()
        if VIDEO_NAMES & set(names):
            from aprs2influxdb_spark.media_store import ensure_video_store

            ensure_video_store(spark, sf_dir)
        if "streaming_image_gate_drained" in names:
            from aprs2influxdb_spark.media_store import ensure_image_store

            ensure_image_store(spark, sf_dir)
        print(
            f"[prep] {sf_dir}: ready ({time.perf_counter() - t0:.1f}s, untimed)",
            flush=True,
        )
        for name in names:
            try:
                t = _time_one(spark, lambda: reg[name][0](spark, sf_dir), reps)
            except Exception as e:  # keep the ladder going
                t = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[{sf_dir}] {name}: {t}", flush=True)


if __name__ == "__main__":
    main()
