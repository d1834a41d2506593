from aprs2influxdb_spark.plans.audit import (
    audit,
    executed_plan,
    has_codegen,
    plan_stats,
    pushed_filters,
    scan_schema,
)

__all__ = ["audit", "executed_plan", "has_codegen", "plan_stats", "pushed_filters", "scan_schema"]
