"""Scale stress for the round-10 join operators: replicate the events
corpus 1x/3x/10x (decorrelated per replica: ids and timestamps shift so
sessions/matches don't just duplicate) and time

  * asof_join  (clicks enriched with the most recent purchase) -- the
    claim under test is near-linear scaling: one shuffle on the by-key
    plus a per-key sorted window, no pairwise expansion;
  * interval_overlap_join (sessions x 10-min error windows, W = 10 min)
    -- near-linear in the EXPLODED row count; the output pair count
    itself grows ~quadratically in corpus density (more sessions overlap
    more windows), so the reported pair counts contextualize the time.

Usage: python tools/scale_stress_joins.py [sf_dir]
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
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

SCALES = (1, 3, 10)
MIN10 = 600_000_000


def replicate(base: DataFrame, n_users: int, n_events: int,
              factor: int) -> DataFrame:
    reps = []
    for i in range(factor):
        reps.append(base.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
            # shift each replica by a few minutes so timelines decorrelate
            (F.col("ts") + F.expr(f"INTERVAL {i * 7} MINUTES")).alias("ts"),
            "event_type", "value"))
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    n_users = base.agg(F.max("user_id")).first()[0] + 1
    n_events = base.count()

    print("| op | scale | input rows | output rows | wall s |")
    print("|---|---|---|---|---|")
    for factor in SCALES:
        e = replicate(base, n_users, n_events, factor) \
            .localCheckpoint(eager=True)
        us = F.unix_micros(F.col("ts"))

        clicks = e.where(F.col("event_type") == "click").select(
            "event_id", "user_id", us.alias("t"), "value")
        purch = (e.where(F.col("event_type") == "purchase")
                 .groupBy("user_id", us.alias("t"))
                 .agg(F.max("value").alias("pv")))
        t0 = time.time()
        n_out = ev.asof_join(clicks, purch, on="t", by="user_id").count()
        wall = time.time() - t0
        print(f"| asof_join | {factor}x | {n_events * factor} "
              f"| {n_out} | {wall:.2f} |")

        sessions = (ev.sessionize(e).groupBy("user_id", "session_id")
                    .agg(F.min(us).alias("s_start"),
                         (F.max(us) + 1).alias("s_end")))
        errors = e.where(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"), us.alias("e_start"),
            (us + MIN10).alias("e_end"))
        t0 = time.time()
        n_out = ev.interval_overlap_join(
            sessions, errors, "s_start", "s_end", "e_start", "e_end",
            bin_width=MIN10).count()
        wall = time.time() - t0
        print(f"| interval_overlap_join | {factor}x "
              f"| {n_events * factor} | {n_out} | {wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
