"""Round-10 ladder: decade rows for the verdict-r9 closers — the
vocab-scale BPE encoder entries, the state-bounded LSH gate, image
near-dup, and the corpus_diff consumers.

Same harness discipline as the r5-r9 ladders: ONE warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10, noop sink,
persistent RDDs unpersisted between queries, never run concurrently
with another Spark session.  Untimed per-sf prep (image store, prev
snapshot) runs before the timed region, exactly as bench.py stages
its media.

Usage: python tools/ladder_r10.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aprs2influxdb_spark.queries import registry
from aprs2influxdb_spark.session import get_spark

DIRS = [
    ("/root/testdata/sf0.1", 2),
    ("scaledata/sf1", 2),
    ("scaledata/sf10", 1),
]

NAMES = [
    "bpe_vocab_token_budget",
    "bpe_vocab_sequence_pack",
    "streaming_lsh_gate_drained",
    "image_near_dup",
    "incremental_corpus_update",
    "streaming_corpus_diff",
    # round-10b: the image-dedup family completion
    "image_dup_clusters",
    "streaming_image_near_dup",
    "streaming_image_gate_drained",
    "multimodal_dup_report",
    # round-10c: the audio modality
    "audio_near_dup",
]


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
    spark = get_spark("ladder-r10")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "corpus_diff"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    for sf_dir, reps in DIRS:
        t0 = time.perf_counter()
        if "image_near_dup" in names:
            from aprs2influxdb_spark.media_store import ensure_image_store

            ensure_image_store(spark, sf_dir)
        if {"incremental_corpus_update", "streaming_corpus_diff"} & set(names):
            from aprs2influxdb_spark.media_store import ensure_prev_snapshot

            ensure_prev_snapshot(spark, sf_dir)
        if "audio_near_dup" in names:
            from aprs2influxdb_spark.media_store import ensure_audio_store

            ensure_audio_store(spark, sf_dir)
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
