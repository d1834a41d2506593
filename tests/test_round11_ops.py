"""Round-11 operator tests: the drain CYCLE (verdict-r10 item 2 — the
one-shot median split becomes a repeatable stream→drain→resume loop
with per-cycle state reset), the gate-index merge rule, and the
persisted bucketed probe path.  Reference parity note: none of these
exist in the reference (aprs2influxdb/__main__.py has no analytics
path) — engine-extension scope per SURVEY.md §2.9."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _banded(docs):
    from aprs2influxdb_spark.functions.hashing import hashed_shingles
    from aprs2influxdb_spark.operators.dedup import (
        _signatures_from_shingles,
        banded_keys,
        tokens_col,
    )

    return banded_keys(
        _signatures_from_shingles(
            docs.select(
                "doc_id", hashed_shingles(tokens_col("text"), 3).alias("sh")
            ),
            "doc_id",
            16,
        ),
        "doc_id",
        16,
        4,
    )


class TestLshGateCycle:
    """≥2 drains in one corpus pass: state-store rows return to the
    CYCLE's own touched-bucket count after every drain (never
    cumulative), and anchors stay oracle-exact across every cycle
    boundary — including a duplicate whose original was hot-window
    state in the PREVIOUS cycle and reached the index only through
    ``merge_gate_index``."""

    def _write_corpus(self, spark, path, texts: dict[int, str]) -> str:
        spark.createDataFrame(
            [(i, t) for i, t in sorted(texts.items())], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{path}/documents.parquet")
        return str(path)

    def test_multi_drain_state_reset_and_cross_cycle_anchors(
        self, spark, tmp_path, monkeypatch
    ):
        from aprs2influxdb_spark.streaming import bounded

        monkeypatch.setenv("SPARK_GRAFT_MEDIA_CACHE", str(tmp_path / "cache"))
        texts = {
            0: "zero alpha beta gamma delta epsilon zeta eta theta iota",
            1: "the quick brown fox jumps over the lazy dog today",
            2: "two lorem ipsum dolor sit amet consectetur adipiscing elit sed",
            3: "three red orange yellow green blue indigo violet ultra deep",
            4: "the quick brown fox jumps over the lazy dog today",
            5: "five north south east west upper lower inner outer middle",
            6: "five north south east west upper lower inner outer middle",
            7: "seven one two three four six eight nine ten eleven",
            8: "eight maple oak pine birch cedar willow aspen elm fir",
            9: "nine river lake ocean stream pond creek delta bay lagoon",
            10: "ten copper iron silver gold nickel zinc cobalt tin lead",
            11: "ten copper iron silver gold nickel zinc cobalt tin lead",
        }
        sf_dir = self._write_corpus(spark, tmp_path, texts)
        # cycles=3 over doc_ids 0..11: bounds at 2, 5, 8 — epoch 0 is
        # docs 0-2; streamed intervals (2,5], (5,8], (8,11]; DRAINS
        # happen after every interval (3 total, ≥2 mid-run)
        out = {
            r["doc_id"]: r
            for r in bounded.streaming_lsh_gate_cycle(
                spark, sf_dir, cycles=3
            ).collect()
        }
        assert set(out) == {3, 4, 5, 6, 7, 8, 9, 10, 11}
        # cross-boundary anchor via the INITIAL index: 4 dups epoch-0's 1
        assert out[4]["dup_of"] == 1 and out[4]["is_dup"]
        # cross-CYCLE anchor via the FOLD: 6 dups 5, which was cycle-1
        # hot-window state and reached the index only via the drain
        assert out[6]["dup_of"] == 5 and out[6]["is_dup"]
        # in-cycle anchor via keyed state: 11 dups 10 (same interval)
        assert out[11]["dup_of"] == 10 and out[11]["is_dup"]
        assert out[3]["dup_of"] is None and not out[3]["is_dup"]
        # the full anchor map equals the batch closed form (the oracle
        # rule), computed independently here
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        banded = _banded(docs)
        left = banded.select("doc_id", "key")
        right = banded.select(F.col("doc_id").alias("r_id"), "key")
        expect = {
            r["doc_id"]: r["dup_of"]
            for r in left.join(right, "key", "left")
            .filter(F.col("r_id") < F.col("doc_id"))
            .groupBy("doc_id")
            .agg(F.min("r_id").alias("dup_of"))
            .collect()
        }
        for d in out:
            assert out[d]["dup_of"] == expect.get(d), (d, out[d], expect.get(d))
        # state RESETS at every drain: each cycle's final state-store
        # row count is that interval's OWN touched-bucket count, not a
        # running total
        per_cycle = [
            banded.filter(
                (F.col("doc_id") > lo) & (F.col("doc_id") <= hi)
            )
            .select("key")
            .distinct()
            .count()
            for lo, hi in [(2, 5), (5, 8), (8, 11)]
        ]
        assert bounded.GATE_CYCLE_STATE_ROWS == per_cycle, (
            bounded.GATE_CYCLE_STATE_ROWS,
            per_cycle,
        )
        # and each is O(interval), strictly below the whole corpus's
        # bucket count — the bound the cycle exists to hold forever
        all_buckets = banded.select("key").distinct().count()
        for n in bounded.GATE_CYCLE_STATE_ROWS:
            assert n < all_buckets

    def test_merge_equals_from_scratch_index(self, spark, tmp_path):
        """``merge_gate_index`` is content-equal to rebuilding the
        index from scratch over the union corpus — the ``epoch_merge``
        pinning discipline applied to the gate."""
        from aprs2influxdb_spark.streaming.bounded import (
            lsh_gate_index,
            merge_gate_index,
        )

        texts = {
            1: "one quick brown fox jumps over the lazy dog today",
            2: "two lorem ipsum dolor sit amet consectetur adipiscing elit sed",
            3: "one quick brown fox jumps over the lazy dog today",
            4: "four red orange yellow green blue indigo violet ultra deep",
        }
        sf_dir = self._write_corpus(spark, tmp_path, texts)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        merged = merge_gate_index(
            lsh_gate_index(docs.filter(F.col("doc_id") <= 2)),
            lsh_gate_index(docs.filter(F.col("doc_id") > 2)),
        )
        scratch = lsh_gate_index(docs)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, scratch.collect())
        )
