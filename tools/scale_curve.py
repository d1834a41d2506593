"""Measure the 10x scale curve (round-3 verdict item 2): run the
top-15 most expensive headline queries at sf0.1 (driver data) and sf1
(tools/gen_scale.py data), best-of-2 each in one warm session, and
print per-query times + scaling factors.  A candidate-capped or
bucketed operator should land ~linear (factor ~10 on 10x rows, less
where fixed session overhead dominates); anything super-linear must
name its cause in BASELINE.md."""

import json
import sys
import time

from aprs2influxdb_spark.queries import registry
from aprs2influxdb_spark.session import get_spark

TOP15 = [
    "bootstrap_ci", "ngram_jaccard", "edit_distance_pairs", "rrf_fusion",
    "curate_corpus", "ngram_containment", "rp_rerank_topk", "semantic_dedup",
    "ts_dtw_topk", "ts_dtw_lsh_topk", "pagerank_knn", "region_revenue",
    "bm25_topk", "winnowing", "minhash_lsh_pairs",
]


def main():
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for name in ("pricing_summary", "cosine_topk"):  # warmup
        reg[name][0](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "scaledata/sf1"]
    out = {}
    for sf_dir in dirs:
        times = {}
        for name in TOP15:
            best = float("inf")
            for _ in range(2):
                for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                    rdd.unpersist()
                t0 = time.perf_counter()
                reg[name][0](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        out[sf_dir] = times
    a, b = (out[d] for d in dirs)
    print(f"{'query':28s} {dirs[0].split('/')[-1]:>8s} {dirs[1].split('/')[-1]:>8s} factor")
    for name in TOP15:
        print(f"{name:28s} {a[name]:8.3f} {b[name]:8.3f} {b[name]/a[name]:6.2f}x")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
