"""Round-12 adjudication A/B (verdict-r11 "Next round" #4): one quiet
paired run of the 12 entries the round-11 driver bench read >10% slower
— all on code that round did not touch — at the round-11 tree
(13fbdc3, checked out as a worktree) vs the current HEAD.

Protocol: ABAB — two full subset passes per tree, interleaved so any
slow machine window hits both trees; each pass is ``bench.py`` itself
(same warmup, same untimed media prep, same best-of-2 noop-sink
timing) restricted via ``SPARK_GRAFT_BENCH_ONLY``.  The per-tree
number reported is the min over its two passes (each itself a
best-of-2), i.e. best-of-4 per (tree, entry).  Runs are sequential —
never two Spark sessions at once.

Usage: python tools/ab_r12.py /root/wt_r11 /root/repo
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ENTRIES = [
    "ngram_jaccard",
    "session_components",
    "streaming_crawl_to_corpus",
    "centroid_assign",
    "ts_dtw_topk",
    "ts_dtw_lsh_topk",
    "ts_dtw_multiprobe_topk",
    "interp_bigram_logprob",
    "image_dup_clusters",
    "ivfpq_topk",
    "bpe_vocab_token_budget",
    "crawl_to_corpus",
]


def run_pass(tree: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(ENTRIES)
    subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        check=True, capture_output=True,
    )
    with open(os.path.join(tree, "BENCH.json")) as fh:
        return json.load(fh)["queries"]


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    passes: dict[str, list[dict[str, float]]] = {tree_a: [], tree_b: []}
    for tree in (tree_a, tree_b, tree_a, tree_b):  # ABAB
        passes[tree].append(run_pass(tree))
        print(f"pass done: {tree}: {passes[tree][-1]}", flush=True)
    print(f"\n{'entry':38s} {'r11':>7s} {'head':>7s} {'ratio':>6s}")
    for name in ENTRIES:
        a = min(p[name] for p in passes[tree_a])
        b = min(p[name] for p in passes[tree_b])
        print(f"{name:38s} {a:7.2f} {b:7.2f} {b / a:6.2f}")


if __name__ == "__main__":
    main()
