"""Round-6 operator tests: incremental contamination (probe-vs-full
equality), segmented EWMA registry shape, windowed_pmi in-row rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestIncrementalContamination:
    def test_rescreen_pairs_equal_full_pairs_restricted(self, spark, sf_dir):
        """The load-bearing claim: probe×index pair generation yields
        EXACTLY the full-run pair graph restricted to pairs touching
        the batch (orientation-normalized) — the property that makes
        the incremental entry's full-recompute oracle exact."""
        from aprs2influxdb_spark.operators import dedup as dd
        from aprs2influxdb_spark.queries import INC_NEW_MOD
        from aprs2influxdb_spark.functions.hashing import portable_hash64

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def is_new(c):
            return (
                F.pmod(
                    portable_hash64(F.concat(F.lit("inc_"), c.cast("string"))),
                    F.lit(INC_NEW_MOD),
                )
                == 0
            )

        probe = {
            (r["id_a"], r["id_b"])
            for r in dd.lsh_rescreen_pairs(docs, is_new).collect()
        }
        new_ids = {
            r["doc_id"]
            for r in docs.filter(is_new(F.col("doc_id"))).select("doc_id").collect()
        }
        full = dd.minhash_lsh_pairs(docs).collect()
        want = set()
        for r in full:
            a, b = r["id_a"], r["id_b"]
            if a in new_ids:
                want.add((a, b))
            if b in new_ids:
                want.add((b, a))
        assert probe == want and len(want) > 0

    def test_matches_full_report_on_shared_channels(self, spark, sf_dir):
        """ngram and lex channels must agree with contamination_report
        row-for-row on the batch (the sem channel is documented as
        symmetric-vs-asymmetric, so it is excluded)."""
        from aprs2influxdb_spark.queries import registry

        reg = registry()
        inc = {
            r["doc_id"]: r
            for r in reg["incremental_contamination"][0](spark, sf_dir).collect()
        }
        full = {
            r["doc_id"]: r
            for r in reg["contamination_report"][0](spark, sf_dir).collect()
        }
        assert set(inc) <= set(full) and len(inc) > 0
        for did, r in inc.items():
            f = full[did]
            assert (r["is_eval"], r["ngram_hits"], r["lex_dup"]) == (
                f["is_eval"], f["ngram_hits"], f["lex_dup"],
            ), f"doc {did}: incremental diverged from full on a shared channel"


class TestSegmentedEwma:
    def test_multi_segment_carries_exercised_at_gate_scale(self, spark, sf_dir):
        """The registry wrapper's L must actually split the gate
        corpus' series into >1 segment per key — otherwise the oracle
        never checks carry propagation (the vacuous-gate trap)."""
        from aprs2influxdb_spark.queries import EWMA_SEG_L

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        m = ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
        assert m > EWMA_SEG_L, (
            f"max series length {m} <= L={EWMA_SEG_L}: carries untested"
        )

    def test_matches_whole_series_fold(self, spark, sf_dir):
        """Segmented vs whole-series EWMA: identical at the house 6 dp
        on the real corpus (the affine-carry op order's ~1e-12 ulps
        must vanish under rounding here)."""
        from aprs2influxdb_spark.queries import registry

        reg = registry()
        a = reg["ewma_smooth"][0](spark, sf_dir).withColumnRenamed("ewma", "e1")
        b = reg["ewma_segmented"][0](spark, sf_dir).withColumnRenamed("ewma", "e2")
        j = a.join(b, ["user_id", "event_id"]).agg(
            F.count("*").alias("n"),
            F.sum((F.col("e1") != F.col("e2")).cast("int")).alias("ndiff"),
        ).collect()[0]
        assert j["n"] > 0 and j["ndiff"] == 0


class TestWindowedPmiRewrite:
    def test_no_join_before_pair_aggregate(self, spark, sf_dir):
        """The r6 rewrite's point: no join node may feed the (x, y)
        pair aggregate — pairs generate in-row from the document row.
        (Joins after the aggregate — marginals, totals — are fine.)"""
        from aprs2influxdb_spark.queries import registry

        df = registry()["windowed_pmi"][0](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the Generate (explode) feeding the first aggregate must sit
        # directly over the parquet scan: between any Join and the
        # deepest Generate there is no path in the rewritten plan
        gen = plan.rindex("Generate explode(flatten(")
        assert "Join" not in plan[gen:], "a join feeds the pair explosion"


class TestGopherRepetition:
    def test_hand_computed_fixture(self, spark):
        """A 32-token doc of one repeated token: both 16-word chunks
        identical (dup fraction 1/2) and the single bigram holds all
        31 occurrences (top fraction 1.0) — flagged.  A 32-token
        all-distinct doc: 0 and 1/31 — unflagged."""
        from aprs2influxdb_spark.queries import q_gopher_repetition
        import math

        docs = spark.createDataFrame(
            [
                (0, " ".join(["spam"] * 32)),
                (1, " ".join(f"w{i}" for i in range(32))),
            ],
            "doc_id long, text string",
        )

        import aprs2influxdb_spark.queries as Q
        orig = Q._t
        Q._t = lambda spark, sf, name: docs
        try:
            rows = {r["doc_id"]: r for r in q_gopher_repetition(spark, "x").collect()}
        finally:
            Q._t = orig
        assert rows[0]["n_words"] == 32 and rows[0]["n_chunks"] == 2
        assert rows[0]["dup_chunk_micro"] == 500000
        assert rows[0]["top_bigram_micro"] == 1000000
        assert rows[0]["rep_flagged"] == 1
        assert rows[1]["dup_chunk_micro"] == 0
        assert rows[1]["top_bigram_micro"] == math.floor(1 / 31 * 1e6 + 0.5)
        assert rows[1]["rep_flagged"] == 0

    def test_one_token_doc_has_no_bigrams(self, spark):
        """Review r6 regression: Spark sequence(0, -1) yields the
        DESCENDING [0, -1], which minted two phantom bigrams for a
        1-token doc (top fraction 1.0, flagged) where DuckDB's
        range(1,1) is empty — the guarded transform must emit none."""
        from aprs2influxdb_spark.queries import q_gopher_repetition

        import aprs2influxdb_spark.queries as Q
        docs = spark.createDataFrame([(0, "lonely")], "doc_id long, text string")
        orig = Q._t
        Q._t = lambda spark, sf, name: docs
        try:
            r = q_gopher_repetition(spark, "x").collect()[0]
        finally:
            Q._t = orig
        assert r["n_words"] == 1 and r["top_bigram_micro"] == 0
        assert r["rep_flagged"] == 0


class TestPiiRedact:
    def test_planted_pii_detected_and_redacted(self, spark, sf_dir):
        """Every 7th doc gets exactly one planted email, every 11th
        one IPv4; counts must match that arithmetic and the redacted
        text must contain the placeholder (spot-checked via length
        shrink: '<EMAIL>' is shorter than any planted address)."""
        from aprs2influxdb_spark.queries import q_pii_redact

        rows = q_pii_redact(spark, sf_dir).collect()
        assert all(
            r["n_emails"] == (1 if r["doc_id"] % 7 == 0 else 0) for r in rows
        )
        assert all(
            r["n_ipv4"] == (1 if r["doc_id"] % 11 == 0 else 0) for r in rows
        )
        assert sum(r["n_emails"] for r in rows) > 0
        assert sum(r["n_ipv4"] for r in rows) > 0


class TestHoltLinearSegmented:
    def test_matches_whole_series_fold(self, spark, sf_dir):
        from aprs2influxdb_spark.queries import registry

        reg = registry()
        a = (
            reg["holt_linear"][0](spark, sf_dir)
            .withColumnRenamed("level", "l1").withColumnRenamed("trend", "t1")
        )
        b = (
            reg["holt_linear_segmented"][0](spark, sf_dir)
            .withColumnRenamed("level", "l2").withColumnRenamed("trend", "t2")
        )
        j = a.join(b, ["user_id", "event_id"]).agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    (F.col("l1") != F.col("l2")) | (F.col("t1") != F.col("t2"))
                ).cast("int")
            ).alias("ndiff"),
        ).collect()[0]
        assert j["n"] > 0 and j["ndiff"] == 0

    def test_hot_key_1e6_vs_python_replica(self, spark):
        """1M-event single key through the segmented Holt path, every
        output pinned against a pure-Python replica of the same
        segmented op order (matrix carries composed with the identical
        fixed dot-product order, per-segment replay)."""
        import math

        import numpy as np

        from aprs2influxdb_spark.queries import holt_linear_segmented

        n, L, a_, bta = 1_000_000, 512, 0.5, 0.3
        df = spark.range(n).select(
            F.lit(3).cast("long").alias("user_id"),
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            (((F.col("id") * 2654435761) % 1000) / F.lit(7.0)).alias("value"),
        )
        got = holt_linear_segmented(df, L=L).orderBy("event_id").toPandas()
        assert len(got) == n

        xs = [((i * 2654435761) % 1000) / 7.0 for i in range(n)]
        segs = [xs[i : i + L] for i in range(0, n, L)]
        m11 = m12 = 1.0 - a_
        m21, m22 = bta * (1.0 - a_) - bta, bta * (1.0 - a_) + 1.0 - bta

        def step(l, b, x):
            ln = a_ * x + (1.0 - a_) * (l + b)
            bn = bta * (ln - l) + (1.0 - bta) * b
            return ln, bn

        # per-segment summaries
        summaries = []
        for s in segs:
            dl = db = 0.0
            for x in s:
                dl, db = step(dl, db, x)
            a11, a12, a21, a22 = 1.0, 0.0, 0.0, 1.0
            for _ in s:
                a11, a12, a21, a22 = (
                    m11 * a11 + m12 * a21, m11 * a12 + m12 * a22,
                    m21 * a11 + m22 * a21, m21 * a12 + m22 * a22,
                )
            summaries.append((dl, db, a11, a12, a21, a22))
        # carries: segment 0's exact tail, then the affine composition
        el, eb = segs[0][0], 0.0
        for x in segs[0][1:]:
            el, eb = step(el, eb, x)
        carries = [(el, eb)]
        for si in range(1, len(segs)):
            dl, db, a11, a12, a21, a22 = summaries[si]
            pl, pb = carries[-1]
            carries.append((a11 * pl + a12 * pb + dl, a21 * pl + a22 * pb + db))
        # per-segment replay
        exp_l, exp_b = [], []
        for si, s in enumerate(segs):
            if si == 0:
                l, b = s[0], 0.0
                exp_l.append(l); exp_b.append(b)
                rest = s[1:]
            else:
                l, b = carries[si - 1]
                rest = s
            for x in rest:
                l, b = step(l, b, x)
                exp_l.append(l); exp_b.append(b)
        r6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        assert np.array_equal(got["level"].to_numpy(), np.array([r6(v) for v in exp_l]))
        assert np.array_equal(got["trend"].to_numpy(), np.array([r6(v) for v in exp_b]))
