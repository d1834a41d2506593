"""Round-8 ladder (verdict-r7 missing #5 / next-round #8): decade rows
for the CODEC family — the four biggest bench lines — plus the round-8
additions (composed crawl pipeline, PDF extraction, URL/domain ops).

Two things changed since the r7 bench made these the biggest lines:

- the blob entries now READ persisted bytes (media_store), so their
  ladder rows measure DECODE-only — the media side table is built
  once per sf OUTSIDE the timed region (exactly what bench.py does);
- jpeg_progressive still synthesizes in-mapper (it is a pure codec
  benchmark, not an ingest path), so its row remains encode+decode —
  comparable to its r7 number.

Same harness discipline as the r5-r7 ladders: ONE warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10, noop sink,
persistent RDDs unpersisted between queries, never run concurrently
with another Spark session.  sf100 stays skipped for the codec family
with the round-5 justification (~100 min of single-node pure-Python
codec CPU tells us nothing new about plan shape; the per-doc cost is
constant and the sf10 row pins linearity).

Usage: python tools/ladder_r8.py [names...]   # default: the r8 set
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

# entries that read the media side table (built untimed, once per sf)
MEDIA_NAMES = [
    "warc_ingest",
    "multimodal_frames_mjpeg",
    "multimodal_av_mux",
    "crawl_to_corpus",
    "pdf_extract",
]
NAMES = MEDIA_NAMES + [
    "warc_binary_files",
    "multimodal_jpeg_progressive",
    "html_extract",
    "url_normalize",
    "domain_stats",
    "domain_cap_topk",
    # round-8b training-mix family
    "mixture_sample",
    "stratified_split",
    "doc_upsample_epochs",
    "sequence_pack",
    "pack_efficiency",
    "ridge_quality_model",
    "model_auc",
    "token_budget_select",
    "shard_assignment",
]


def main():
    spark = get_spark("ladder-r8")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "html_extract"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, dict] = {}
    for sf_dir, reps in DIRS:
        if any(n in MEDIA_NAMES for n in names):
            from aprs2influxdb_spark.media_store import ensure_media, ensure_warc_files

            t0 = time.perf_counter()
            ensure_media(spark, sf_dir)
            if "warc_binary_files" in names:
                ensure_warc_files(spark, sf_dir)
            print(
                f"[media] {sf_dir}: side tables ready "
                f"({time.perf_counter() - t0:.1f}s, untimed)",
                flush=True,
            )
        times: dict[str, float] = {}
        for name in names:
            builder = reg[name][0]
            best = float("inf")
            try:
                for _ in range(reps):
                    for rdd in list(
                        spark.sparkContext._jsc.getPersistentRDDs().values()
                    ):
                        rdd.unpersist()
                    t0 = time.perf_counter()
                    builder(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                times[name] = round(best, 2)
            except Exception as e:  # keep the ladder going
                times[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[{sf_dir}] {name}: {times[name]}", flush=True)
        out[sf_dir] = times
    import json

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
