"""Capture the executed MICRO-BATCH physical plan of streaming gate
entries into ``plans/<outdir>/<name>_<tag>.txt`` — the streaming twin
of ``capture_plans.py`` (whose batch ``explain`` cannot see a stream's
plan).  Runs each builder to completion, then dumps
``LAST_BOUNDED_QUERY.explain()`` — the last executed micro-batch's
codegen-resolved plan, state operator and exchanges included."""

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
    ap.add_argument("--outdir", default="plans/r12")
    args = ap.parse_args()

    from aprs2influxdb_spark.queries import registry
    from aprs2influxdb_spark.session import get_spark
    from aprs2influxdb_spark.streaming import bounded

    spark = get_spark("capture-stream-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    reg = registry()
    for name in args.names:
        builder, _sql = reg[name]
        builder(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            bounded.LAST_BOUNDED_QUERY.explain()
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
