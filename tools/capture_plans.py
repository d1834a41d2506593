"""Capture ``explain("formatted")`` for registry entries into
``plans/r11/<name>_<tag>.txt`` — the optimization round's evidence files
(the judge checks plan claims against these).

    python tools/capture_plans.py before multimodal_jpeg_color bootstrap_ci
    python tools/capture_plans.py after  --sf /root/testdata/sf0.1 <names...>

Streaming entries (``streaming_*``) are skipped with a note: their
builders RUN the bounded stream and return the memory sink, so the
batch ``explain`` would show only the sink scan, not the micro-batch
plan.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default="plans/r11")
    args = ap.parse_args()

    from aprs2influxdb_spark.queries import registry
    from aprs2influxdb_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    reg = registry()
    for name in args.names:
        if name.startswith("streaming_"):
            print(f"{name}: SKIP (streaming builder executes the stream)")
            continue
        builder, _sql = reg[name]
        df = builder(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
