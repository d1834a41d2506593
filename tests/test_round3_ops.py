"""Round-3 operator properties that oracle parity alone doesn't pin:
pigeonhole completeness of the simhash blocking, Poisson-weight
calibration of the bootstrap, dominance exactness of the skyline,
funnel monotonicity, resampling determinism, salted-agg equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_simhash_blocking_finds_every_hamming3_pair(spark, sf_dir):
    """Pigeonhole completeness: the block-candidate join must recover
    EXACTLY the pairs a brute-force Hamming scan finds at radius
    blocks-1 — blocking is a pure optimization, never a recall
    trade at the designed radius."""
    from aprs2influxdb_spark.operators.dedup import simhash, simhash_hamming_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocked = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(docs, max_hamming=3).collect()
    }
    sigs = simhash(docs, bits=32).collect()
    brute = set()
    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            h = bin(a["simhash"] ^ b["simhash"]).count("1")
            if h <= 3:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                brute.add((lo, hi, h))
    assert blocked == brute and len(brute) > 0


def test_bootstrap_poisson_weights_are_calibrated(spark, sf_dir):
    """The integer threshold ladder must draw Poisson(1)-like
    multiplicities: mean weight within 2% of 1, and the CI must
    bracket the point estimate."""
    from aprs2influxdb_spark.operators.sketches import (
        BOOT_M,
        BOOT_POISSON_CUM,
        _poisson_weight,
        bootstrap_ci,
    )

    # ladder sanity on raw thresholds
    df = spark.range(0, BOOT_M, 97).select(F.col("id").alias("v"))
    w = df.select(_poisson_weight(F.col("v")).alias("w")).agg(
        F.avg("w").alias("m"), F.max("w").alias("mx")
    ).collect()[0]
    assert abs(w["m"] - 1.0) < 0.02 and w["mx"] <= len(BOOT_POISSON_CUM) - 1

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = bootstrap_ci(li, "l_extendedprice", ["l_orderkey", "l_linenumber"]).collect()[0]
    assert row["ci_lo"] <= row["point_mean"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]


def test_pareto_front_dominance_exactness(spark, sf_dir):
    """Every returned part is undominated, and every omitted part is
    dominated by some part — the skyline, exactly."""
    from aprs2influxdb_spark.queries import q_pareto_front

    front = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q_pareto_front(spark, sf_dir).collect()
    ]
    allp = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size").collect()
    ]
    front_keys = {k for k, _, _ in front}

    def dominated(p, q):  # q dominates p
        return (
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
        )

    for p in allp:
        is_dom = any(dominated(p, q) for q in allp if q[0] != p[0])
        if p[0] in front_keys:
            # a front row may only be "dominated" by an identical twin
            # with a lower key (the documented duplicate rule)
            twins = [
                q for q in allp
                if q[0] != p[0] and q[1] == p[1] and q[2] == p[2] and q[0] < p[0]
            ]
            assert not is_dom or twins == [], p
        else:
            assert is_dom, f"omitted but undominated: {p}"


def test_funnel_counts_are_monotone(spark, sf_dir):
    from aprs2influxdb_spark.queries import q_funnel_3stage

    r = q_funnel_3stage(spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] > 0
    assert 0.0 <= r["click_to_purchase"] <= 1.0


def test_gumbel_resample_is_deterministic_and_weight_biased(spark, sf_dir):
    """Two runs produce identical selections; and high-weight docs
    are overrepresented vs a weight-blind draw (the point of
    importance resampling)."""
    from aprs2influxdb_spark.operators.sampling import gumbel_topk_resample
    from aprs2influxdb_spark.operators.textanalysis import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wdf = dsir_weights(docs).localCheckpoint(eager=False)
    pick1 = {r["doc_id"] for r in gumbel_topk_resample(wdf, n=50).collect()}
    pick2 = {r["doc_id"] for r in gumbel_topk_resample(wdf, n=50).collect()}
    assert pick1 == pick2 and len(pick1) == 50
    med = wdf.agg(F.expr("percentile(dsir_w, 0.5)").alias("m")).collect()[0]["m"]
    above = wdf.filter(F.col("dsir_w") > med).count()
    picked_above = (
        wdf.filter(F.col("doc_id").isin(list(pick1))).filter(F.col("dsir_w") > med).count()
    )
    total = wdf.count()
    # selection rate among high-weight docs must beat the base rate
    assert picked_above / max(above, 1) > (len(pick1) / total)


def test_salted_counts_equal_plain_groupby(spark, sf_dir):
    from aprs2influxdb_spark.operators.skew import salted_counts

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = {
        (r["event_type"], r["n"])
        for r in salted_counts(e, "event_type", "event_id").collect()
    }
    plain = {
        (r["event_type"], r["n"])
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert salted == plain


def test_heaps_beta_plausible(spark, sf_dir):
    from aprs2influxdb_spark.queries import q_heaps_law_fit

    r = q_heaps_law_fit(spark, sf_dir).collect()[0]
    assert 0.0 < r["beta"] < 1.0
    assert r["n_points"] > 0


def test_feature_hash_vectors_preserve_token_mass(spark, sf_dir):
    """Bucket counts must sum to the document's token count — the
    hash trick loses collisions' identity, never mass."""
    from aprs2influxdb_spark.operators.textanalysis import feature_hash_vectors, token_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fh = feature_hash_vectors(docs).select(
        "doc_id",
        F.aggregate("fhv", F.lit(0).cast("long"), lambda a, x: a + x).alias("mass"),
    )
    tc = token_counts(docs).select("doc_id", F.col("ws_tokens"))
    bad = fh.join(tc, "doc_id").filter(F.col("mass") != F.col("ws_tokens")).count()
    assert bad == 0


def test_kmv_overlap_estimates_on_partial_overlap(spark):
    """On a constructed 3-way population (A-only / B-only / both) the
    sketch estimates land within ~15% of truth at k=256, and the
    estimate algebra is coherent (inter <= min(a, b), union >=
    max(a, b))."""
    from aprs2influxdb_spark.operators.sketches import kmv_set_overlap

    rows = (
        [(i, "view") for i in range(4000)]          # A: 0..3999
        + [(i, "purchase") for i in range(3000, 8000)]  # B: 3000..7999
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = kmv_set_overlap(df, k=1024).collect()[0]
    assert (r["exact_a"], r["exact_b"], r["exact_union"], r["exact_inter"]) == (
        4000, 5000, 8000, 1000
    )
    # intersection is the sketch's weak spot (few sample members when
    # the overlap is a small fraction of the union — ~128 at k=1024
    # here), hence the looser bound
    for est, exact, tol in [
        (r["est_a"], 4000, 0.15), (r["est_b"], 5000, 0.15),
        (r["est_union"], 8000, 0.15), (r["est_inter"], 1000, 0.4),
    ]:
        assert abs(est - exact) / exact < tol, (est, exact)
    assert r["est_inter"] <= min(r["est_a"], r["est_b"])
    assert r["est_union"] >= max(r["est_a"], r["est_b"])
