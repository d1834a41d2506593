"""Physical-plan audit helpers (SURVEY.md §4).

The reference has no planner (§4: hard-coded per-row control flow); in
this engine plan *shape* is a first-class correctness concern — a lost
pushdown or a surprise cartesian product is invisible at sf0.01 and an
incident at 100 TB.  These helpers turn `.explain` strings into
assertable predicates; tests/test_plans.py pins the invariants for
every headline query, and pipelines can call ``audit()`` as a
pre-flight gate before launching a large job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-initial) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_codegen(df: DataFrame) -> bool:
    """True when the topmost *operator* sits inside a whole-stage-
    codegen stage (``*(n)`` marker).  Expressions that break codegen
    (higher-order functions at the top, janino limits) silently fall
    back to interpreted eval — worth failing loudly in tests instead.

    AQE wraps shuffling plans in ``AdaptiveSparkPlan``, whose header
    carries no marker — skip wrapper lines and judge the first real
    operator.  (Before execution AQE shows the initial plan; stage
    markers inside exchanges may only materialize at runtime, so for
    shuffling queries prefer asserting on ``plan_stats``.)"""
    for line in executed_plan(df).splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if not s or s.startswith(("AdaptiveSparkPlan", "==", "ResultQueryStage")):
            continue
        return s.startswith("*(")
    return False


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` clause of the scan (empty string if
    no file scan present)."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line:
            return line.split("PushedFilters:", 1)[1].strip()
    return ""


def scan_schema(df: DataFrame) -> str:
    """The ``ReadSchema`` reaching the file scan — the column-pruning
    witness (a scan reading all columns for a 2-column projection is a
    bug)."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""


@dataclass
class PlanStats:
    shuffles: int
    broadcasts: int
    sort_merge_joins: int
    cartesian: int
    codegen_stages: int


def plan_stats(df: DataFrame) -> PlanStats:
    plan = executed_plan(df)
    return PlanStats(
        shuffles=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition"),
        broadcasts=plan.count("BroadcastExchange"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        cartesian=plan.count("CartesianProduct"),
        # distinct stage IDs, not marked-operator lines: every operator
        # in a stage shares the same "*(n)" prefix
        codegen_stages=len({s.split(")")[0] for s in plan.split("*(")[1:] if s[:1].isdigit()}),
    )


def audit(df: DataFrame, max_shuffles: int | None = None, allow_cartesian: bool = False) -> PlanStats:
    """Pre-flight gate: raise if the plan contains a cartesian product
    (unless allowed) or more shuffles than budgeted."""
    stats = plan_stats(df)
    if stats.cartesian and not allow_cartesian:
        raise ValueError(f"plan contains CartesianProduct:\n{executed_plan(df)[:2000]}")
    if max_shuffles is not None and stats.shuffles > max_shuffles:
        raise ValueError(
            f"plan has {stats.shuffles} shuffles (budget {max_shuffles}):\n{executed_plan(df)[:2000]}"
        )
    return stats
