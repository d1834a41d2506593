"""Distributed graph operators (north star; no reference counterpart —
the reference pipeline, ``/root/reference/aprs2influxdb/__main__.py``,
has no graph stage at all).

Connected components is the workhorse of large-scale dedup: the
MinHash/LSH pair graph's components are the "keep one per near-dup
cluster" groups (Lee et al. 2022; Smith et al., web-dedup practice).
Plain min-label propagation converges in O(diameter) rounds — fatal
for chain-shaped components (a 10^6-long chain of pairwise near-dups
needs 10^6 rounds).  The implementation here adds POINTER JUMPING
(path doubling — Shiloach-Vishkin style, the same trick hash-to-min /
large-star contraction exploit): each round every vertex first takes
the min label over its neighbors, then re-reads the label OF its
label's vertex (``L(v) <- L(L(v))``).  The known-label horizon
roughly doubles per round, so convergence is O(log D) rounds — a
10^6 chain converges in ~20 rounds, each round two shuffling joins
plus one aggregation, all on vertex id.

Labels are always EXISTING vertex ids (the min over a set of vertex
ids), so the jump join is an inner join that cannot drop rows.
Lineage is truncated per round with an eager ``localCheckpoint`` —
without it the plan doubles per round and the driver OOMs compiling
round ~15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integer_pagerank(
    edges: DataFrame, iterations: int = 8,
    src_col: str = "id_a", dst_col: str = "id_b",
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list in pure int64 arithmetic
    (round 7): ranks in micro-units, seeded 1_000_000; per iteration

        contrib(u) = rank(u) DIV deg(u)
        rank'(v)   = 150_000 + (850 · Σ_{u∼v} contrib(u)) DIV 1000

    (damping 0.85 as the 850/1000 integer pair).  Float PageRank's
    per-node sums reorder between engines (Spark partial aggregation
    vs DuckDB's scan order), so parity would need rounding epsilons;
    the integer formulation is summation-order INDEPENDENT — the
    house integerize-before-aggregate convention applied to an
    iterative algorithm — and the oracle replays the identical
    recurrence exactly (unrolled CTEs, DuckDB ``//`` == Spark ``DIV``
    on the non-negative operands here).

    Plan: each iteration is one join onto the degree table plus one
    shuffle-aggregate on the destination; lineage truncated per round
    with eager ``localCheckpoint`` (the connected-components
    precedent) so the final plan stays O(1 round) deep.  At 100 TB
    ranks/deg are (id, int64) tables shuffled on the id — the classic
    Pregel-style superstep with nothing per-row Python anywhere.
    Output: (doc_id, deg, rank_micro) for every vertex of the graph."""
    ed = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).localCheckpoint(eager=False)
    # ed is consumed once per superstep: without the checkpoint the
    # whole upstream pair pipeline (LSH banding + verification) would
    # re-execute every round — measured 8x the entire entry cost
    deg = ed.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(
        eager=False
    )
    ranks = deg.select(
        F.col("src").alias("doc_id"), F.lit(1_000_000).cast("long").alias("rank")
    )
    for _ in range(iterations):
        contrib = ranks.join(deg, ranks.doc_id == deg.src).select(
            F.col("doc_id"), F.expr("rank DIV deg").alias("c")
        )
        summed = (
            ed.join(contrib, ed.src == contrib.doc_id)
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # LAZY checkpoint: truncates lineage for reuse but keeps the
        # whole run ONE job — at 8 supersteps the plan compiles fine
        # (connected_components needs eager only because its ~20
        # rounds OOM the driver at compile); eager was measured as
        # ~2 s of per-round job overhead at gate scale
        ranks = summed.select(
            F.col("dst").alias("doc_id"),
            (F.lit(150_000) + F.expr("(850 * s) DIV 1000")).cast("long").alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks.join(deg, ranks.doc_id == deg.src).select(
        "doc_id", "deg", F.col("rank").alias("rank_micro")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "vid",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label connected components with pointer jumping.

    ``vertices`` must carry every vertex id (isolated vertices become
    their own singleton component); ``edges`` is an UNDIRECTED edge
    list — symmetrized internally, so each pair need appear once in
    either orientation.  Returns ``(id_col, component_id)`` where
    ``component_id`` is the minimum vertex id of the component.

    Convergence: label spread distance at least doubles per round
    (neighbor-min moves one hop, the jump then teleports to the
    current best-known representative), so ``max_iter=25`` covers
    components of diameter ~2^25.  Raises ``RuntimeError`` when not
    converged — partial labels would silently split real clusters.

    Scale shape: each round is (1) an inner join labels x edges on
    vertex id + a min-aggregate on dst, (2) a left join back onto
    labels, (3) an inner self-join on the label value (the jump).
    All shuffles key on vertex id / label id — never on degree-skewed
    composites — and the edge list is checkpointed once up front so
    no round recomputes the candidate generation that produced it.
    """
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("label")
    )
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    ).localCheckpoint(eager=True)  # edge generation runs ONCE, not per round
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, labels.vid == sym.src)
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neighbor_min, labels.vid == neighbor_min.dst, "left")
            .select(
                "vid",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # Pointer jump: L(v) <- min(L(v), L(L(v))).  Every label is an
        # existing vid, so the inner join keeps every row.
        jump = stepped.select(F.col("vid").alias("jvid"), F.col("label").alias("jlabel"))
        jumped = (
            stepped.join(jump, stepped.label == jump.jvid)
            .select(
                "vid",
                "old",
                F.least(F.col("label"), F.col("jlabel")).alias("label"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage each round
        changed = jumped.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = jumped.drop("old")
        if changed == 0:
            return labels.select(F.col("vid").alias(id_col), F.col("label").alias("component_id"))
    raise RuntimeError(
        f"connected components did not converge in {max_iter} rounds — "
        "with pointer jumping that needs a component of diameter ~2^max_iter; "
        "raise max_iter"
    )


def session_components(
    events: DataFrame, gap_minutes: int = 30,
) -> DataFrame:
    """Sessionization REDERIVED as a graph problem: consecutive events
    of a user closer than ``gap_minutes`` apart are edges; connected
    components of that gap-graph ARE the sessions, labeled by their
    minimum event id.  Returns ``(session_root, n_events)`` per
    session.

    The point of the entry is the cross-paradigm oracle: the result
    must equal the lag+running-sum sessionizer (``q_sessionize``'s
    window plan) computed by DuckDB — two entirely different
    algorithms, one answer.  Sessions are chain-shaped components
    (each event links only to its predecessor), i.e. exactly the
    diameter-unfriendly topology plain label propagation cannot
    handle — a busy user's thousand-event session converges here in
    ~10 rounds instead of ~1000.
    """
    w = (
        F.expr("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")
    )
    prev_id = F.expr("lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)")
    base = events.select("event_id", "user_id", "ts").select(
        "event_id",
        prev_id.alias("prev_id"),
        (F.col("ts") - w).alias("gap"),
    )
    edges = base.filter(
        F.col("prev_id").isNotNull()
        & (F.col("gap") <= F.expr(f"INTERVAL '{int(gap_minutes)}' MINUTE"))
    ).select(F.col("prev_id").alias("src"), F.col("event_id").alias("dst"))
    labels = connected_components(
        events.select("event_id"), edges, id_col="event_id"
    )
    return labels.groupBy("component_id").agg(F.count("*").alias("n_events")).select(
        F.col("component_id").alias("session_root"), "n_events"
    )
