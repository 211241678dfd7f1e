"""Scale-stress the event-time family: replicate the sf0.1 events table
1x/3x/10x with per-replica user_id shifts (sessionization/funnels
partition by user, so replica users are independent and OUTPUT grows
exactly linearly; tumbling windows keep the same window count with 10x
the rows per window) and time the representative operators.

Usage: python tools/scale_stress_events.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    events as ev,
)
from automated_review_analysis_pipeline_spark.plan_cache import (  # noqa: E402
    release_plan_caches,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

SCALES = (1, 3, 10)


def replicate(base: DataFrame, n_users_shift: int, n_events: int,
              factor: int) -> DataFrame:
    parts = [
        base.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_users_shift)).alias("user_id"),
            "event_type", "value", "props")
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).cache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-stress-events")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    ev0 = load_table(spark, sf_dir, "events")
    n_events = ev0.count()
    shift = (ev0.agg(F.max("user_id")).first()[0] or 0) + 1

    ops = {
        "tumbling 1h window agg": lambda e: ev.tumbling_window_agg(
            e, "1 hour"),
        "gap sessionization (30 min)": lambda e: ev.session_stats(
            e, gap_minutes=30),
        "conversion funnel": lambda e: ev.event_type_funnel(e),
        "ordered funnel (view<click<purchase)": lambda e:
            ev.ordered_funnel(e),
        "per-user EWMA": lambda e: ev.user_value_ewma(e),
    }

    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    rows_out: dict[str, dict[int, int]] = {k: {} for k in ops}
    for factor in SCALES:
        e = replicate(ev0, shift, n_events, factor)
        e.count()
        for name, fn in ops.items():
            best, nrows = 1e9, -1
            for _ in range(2):
                release_plan_caches()
                t0 = time.perf_counter()
                nrows = fn(e).count()
                best = min(best, time.perf_counter() - t0)
            results[name][factor] = round(best, 2)
            rows_out[name][factor] = nrows
            print(f"  {factor}x {name}: {best:.2f}s ({nrows} rows)",
                  flush=True)
        e.unpersist()

    print(f"\nevents at 1x: {n_events}\n")
    print("| operator | 1x | 3x | 10x | t(10x)/t(1x) | rows@10x |")
    print("|---|---|---|---|---|---|")
    for name in ops:
        r = results[name]
        ratio = round(r[10] / r[1], 1) if r[1] else float("inf")
        print(f"| {name} | {r[1]} s | {r[3]} s | {r[10]} s | {ratio}x "
              f"| {rows_out[name][10]} |")
    spark.stop()


if __name__ == "__main__":
    main()
