"""Round-9 ladder: decade rows for the two scale-safety rewrites
(stratified_split bucketed rank, sequence_pack scale-aware shards),
the changed token-budget plan, the new entries (bpe_token_budget_select,
domain_blocklist_join, streaming_crawl_to_corpus), and the codec
family's FIRST sf100 row (warc_ingest decode — verdict-r8 missing #3).

Same harness discipline as the r5-r8 ladders: ONE warm local[32]
session, best-of-2 at sf0.1/sf1, best-of-1 at sf10/sf100, noop sink,
persistent RDDs unpersisted between queries, never run concurrently
with another Spark session.  Untimed per-sf prep (crawl shard files,
domain dim, and — sf100 only — a WARC-only blob table) runs before
the timed region, exactly as bench.py stages its media.

The sf100 warc_ingest row reads a WARC-ONLY side table built here
untimed: the full media build would pay JPEG/MP4/PDF *encode* for 5M
docs (~100 min of pure-Python codec CPU, the round-5 justification for
skipping codec sf100), which the decode-only measurement doesn't need.
The timed region is the same parse_warc_gz mapper ``warc_ingest``
runs, over the same (doc_id, warc_gz) projection shape.

Usage: python tools/ladder_r9.py [names...]
"""

from __future__ import annotations

import json
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
SF100 = "scaledata/sf100"  # documents+embeddings only

NAMES = [
    "stratified_split",
    "sequence_pack",
    "pack_efficiency",
    "token_budget_select",
    "bpe_token_budget_select",
    "domain_blocklist_join",
    "streaming_crawl_to_corpus",
]
# docs-only entries that also get an sf100 row (5M docs)
SF100_NAMES = [
    "stratified_split",
    "sequence_pack",
    "pack_efficiency",
    "token_budget_select",
    "domain_blocklist_join",
]


def _ensure_warc_only_table(spark, sf_dir: str) -> str:
    """(doc_id, warc_gz) side table for the sf100 decode row —
    untimed, idempotent, atomic (the media-store discipline)."""
    from aprs2influxdb_spark.media_store import MEDIA_VERSION, _cache_root, _sf_key

    final = os.path.join(
        _cache_root(), f"v{MEDIA_VERSION}-{_sf_key(sf_dir)}", "warc_only"
    )
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("warc_gz", T.BinaryType(), True),
        ]
    )

    def _gen(batches):
        import pandas as pd

        from aprs2influxdb_spark.media_store import synth_warc_gz

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "warc_gz": [
                        synth_warc_gz(int(d), t)
                        for d, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    par = spark.sparkContext.defaultParallelism
    tmp = f"{final}.tmp{os.getpid()}"
    docs.repartition(par, "doc_id").mapInPandas(_gen, schema).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(tmp, final)
    return final


def _warc_decode_df(spark, table_path: str):
    """The warc_ingest decode map over a (doc_id, warc_gz) scan —
    the same mapper the registry entry runs."""
    from aprs2influxdb_spark.queries import _warc_ingest_mapper

    fn, out_schema = _warc_ingest_mapper()
    return spark.read.parquet(table_path).mapInPandas(fn, out_schema)


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
    spark = get_spark("ladder-r9")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = sys.argv[1:] or NAMES
    for wname in ("pricing_summary", "stratified_split"):  # warmup
        reg[wname][0](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, dict] = {}
    for sf_dir, reps in DIRS:
        t0 = time.perf_counter()
        if "streaming_crawl_to_corpus" in names:
            from aprs2influxdb_spark.media_store import ensure_crawl_files

            ensure_crawl_files(spark, sf_dir)
        if "domain_blocklist_join" in names:
            from aprs2influxdb_spark.media_store import ensure_domain_dim

            ensure_domain_dim(spark, sf_dir)
        print(
            f"[prep] {sf_dir}: ready ({time.perf_counter() - t0:.1f}s, untimed)",
            flush=True,
        )
        times: dict[str, object] = {}
        for name in names:
            try:
                times[name] = _time_one(
                    spark, lambda: reg[name][0](spark, sf_dir), reps
                )
            except Exception as e:  # keep the ladder going
                times[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[{sf_dir}] {name}: {times[name]}", flush=True)
        out[sf_dir] = times
    # ---- sf100: docs-only entries + the warc decode row
    times = {}
    sf100_names = [n for n in SF100_NAMES if n in names]
    run_warc_row = not sys.argv[1:] or "warc_ingest_sf100" in names
    if sf100_names or run_warc_row:
        t0 = time.perf_counter()
        from aprs2influxdb_spark.media_store import ensure_domain_dim

        if "domain_blocklist_join" in sf100_names:
            ensure_domain_dim(spark, SF100)
        warc_path = _ensure_warc_only_table(spark, SF100) if run_warc_row else None
        print(
            f"[prep] {SF100}: ready ({time.perf_counter() - t0:.1f}s, untimed)",
            flush=True,
        )
        for name in sf100_names:
            try:
                times[name] = _time_one(spark, lambda: reg[name][0](spark, SF100), 1)
            except Exception as e:
                times[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[{SF100}] {name}: {times[name]}", flush=True)
        if run_warc_row:
            try:
                times["warc_ingest(decode)"] = _time_one(
                    spark, lambda: _warc_decode_df(spark, warc_path), 1
                )
            except Exception as e:
                times["warc_ingest(decode)"] = f"ERR {type(e).__name__}: {e}"[:200]
            print(
                f"[{SF100}] warc_ingest(decode): {times['warc_ingest(decode)']}",
                flush=True,
            )
        out[SF100] = times
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
