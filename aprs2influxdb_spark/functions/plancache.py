"""Session-lifetime LAZY plan-handle cache — ONE implementation of the
memoized-table-read discipline that ``queries._t``, ``queries._store_t``
and ``media_store.media_table`` each re-implemented inline (ADVICE r11).

What it caches: the unresolved DataFrame PLAN handle per (session, key)
— each ``spark.read.parquet`` costs ~85 ms of driver py4j/footer round
trips, and the bench's ~160 builders issue ~480 of them per run for
identical immutable inputs.  Nothing about results or data is memoized;
every action still scans the parquet inputs, which is exactly the bench
contract.  Keyed in ``spark.__dict__`` on the session OBJECT, so a new
session can never see a stale handle.

Invalidation (ADVICE r11 medium): a cached handle pins Spark's resolved
schema and file listing at first read, so a path that is REBUILT within
the same session (testdata regenerated, an ensure_* store recreated)
must call :func:`invalidate_path` before writing — the ensure_* writers
do this in their cold-build branch, making a stale-plan read of a
regenerated store impossible by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE_ATTR = "_aprs2_table_plan_cache"


def table_plan(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the cached lazy handle for ``key``, building (and
    caching) it with ``build()`` on first use."""
    cache = spark.__dict__.setdefault(_CACHE_ATTR, {})
    df = cache.get(key)
    if df is None:
        df = build()
        cache[key] = df
    return df


def invalidate_path(spark: SparkSession, path: str) -> None:
    """Drop every cached handle whose key mentions ``path`` — called by
    store writers that are about to (re)build files there, so later
    reads re-resolve schema and file listing instead of reading through
    a stale pre-build plan."""
    cache = spark.__dict__.get(_CACHE_ATTR)
    if not cache:
        return
    stale = [k for k in cache if any(p == path for p in k if isinstance(p, str))]
    for k in stale:
        del cache[k]
