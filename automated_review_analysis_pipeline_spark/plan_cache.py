"""Session cache-lifecycle convention for caches embedded in RETURNED
lazy plans.

Several operators cache an intermediate that feeds two branches of the
plan they return (shingle stagings, signature tables, simhash columns).
The operator cannot unpersist it -- the consumer has not acted yet -- so
without a convention those InMemoryRelations accumulate for the life of
the session and can substitute themselves into UNRELATED later plans
(Spark's cache manager matches on logical-plan equality), which both
grows memory and makes plan-shape assertions flaky.

Convention: operators register such caches through :func:`plan_cache`;
anything that runs plans in bulk (the bench harness, oracle sweeps, test
fixtures) calls :func:`release_plan_caches` once it is done ACTING on a
returned plan. Caches whose consuming action happens INSIDE the operator
keep unpersisting at the call site as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def plan_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for deferred release."""
    cached = df.cache()
    _live.append(cached)
    return cached


def release_plan_caches() -> int:
    """Unpersist every registered plan cache; returns how many."""
    n = 0
    while _live:
        df = _live.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
