"""Per-entry driver-build vs execution split for the headline bench.

For each headline entry, times (a) ``builder(spark, sf_dir)`` alone —
pure driver-side plan construction, py4j chatter, any in-builder
broadcast pulls — and (b) the noop-sink action on the returned frame.
Two passes each; the second (warm) pass is what matters, since the
bench's best-of-2 also measures warm builds.  Output: one JSON line per
entry to stdout, sorted recap at exit.

Usage::

    python tools/build_profile.py [--only name1,name2] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from aprs2influxdb_spark.queries import registry  # noqa: E402
from aprs2influxdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import bench

    spark = get_spark("build_profile")
    spark.sparkContext.setLogLevel("ERROR")
    names = bench.HEADLINE
    if args.only:
        wanted = {s.strip() for s in args.only.split(",")}
        names = [n for n in names if n in wanted]
    reg = registry()

    # same warmup + side-table setup as the bench
    warm = "/root/testdata/sf0.001"
    for n in ("pricing_summary", "cosine_topk"):
        bench._run(reg[n][0](spark, warm))
    from aprs2influxdb_spark import media_store as ms

    for fn in (
        ms.ensure_media, ms.ensure_warc_files, ms.ensure_crawl_files,
        ms.ensure_domain_dim, ms.ensure_prev_snapshot, ms.ensure_image_store,
        ms.ensure_audio_store, ms.ensure_video_store,
    ):
        fn(spark, args.sf)

    rows = []
    for name in names:
        builder, _sql = reg[name]
        best_b = best_e = float("inf")
        for _ in range(args.runs):
            bench._drop_leftover_blocks(spark)
            t0 = time.perf_counter()
            df = builder(spark, args.sf)
            t1 = time.perf_counter()
            bench._run(df)
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
        rows.append({"name": name, "build": round(best_b, 3), "exec": round(best_e, 3)})
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -(r["build"]))
    tb = sum(r["build"] for r in rows)
    te = sum(r["exec"] for r in rows)
    print(f"# total build {tb:.1f}s  exec {te:.1f}s  n={len(rows)}")
    for r in rows[:30]:
        print(f"# {r['build']:6.3f} build {r['exec']:6.3f} exec  {r['name']}")


if __name__ == "__main__":
    main()
