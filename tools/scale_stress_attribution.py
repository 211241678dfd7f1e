"""Hot-user stress for multi_touch_attribution: one bot account with
N clicks and N purchases, against the grid-binned rewrite. The claim
under test: the pair expansion (and the wall clock) tracks the
IN-WINDOW pair count -- the output-size floor -- not
n_clicks x n_purchases across all time. Two shapes per N:

* spread: the bot's activity spans ~6 months (one event per ~26 min at
  N=10^4), so most click-purchase pairs are farther apart than the
  7-day window. The naive user-key join still expands N^2 (10^8 pairs
  at N=10^4) before the range filter; the binned join only expands
  within window-sized cells.
* burst: all activity inside ONE window -- every pair genuinely
  matches, the expansion IS the output, and no rewrite can beat it
  (the irreducible case, reported for honesty).

Usage: python tools/scale_stress_attribution.py
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators.events import (  # noqa: E402
    multi_touch_attribution,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402

SPREAD_US = 180 * 86_400_000_000  # ~6 months
BURST_US = 6 * 86_400_000_000     # inside one 7-day window
BASE_US = 1_700_000_000_000_000


def bot_events(spark, n: int, span_us: int):
    """n clicks + n purchases for user 1, evenly interleaved over
    span_us, plus one normal user so the frame isn't degenerate."""
    ids = spark.range(n)
    step = max(span_us // max(n, 1), 1)
    clicks = ids.select(
        (F.col("id") * 2 + 10).alias("event_id"),
        F.lit(1).alias("user_id"),
        F.timestamp_micros(F.lit(BASE_US) + F.col("id") * step)
        .alias("ts"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"))
    purch = ids.select(
        (F.col("id") * 2 + 11).alias("event_id"),
        F.lit(1).alias("user_id"),
        F.timestamp_micros(F.lit(BASE_US) + F.col("id") * step
                           + step // 2).alias("ts"),
        F.lit("purchase").alias("event_type"),
        F.lit(2.0).alias("value"))
    other = spark.createDataFrame(
        [(1, 2, "click", 1.0), (2, 2, "purchase", 3.0)],
        "event_id long, user_id long, event_type string, value double"
    ).select("event_id", "user_id",
             F.timestamp_micros(F.lit(BASE_US)).alias("ts"),
             "event_type", "value")
    return clicks.unionByName(purch).unionByName(other)


def main() -> None:
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    print("| shape | n per side | naive pairs | out rows | wall s |")
    print("|---|---|---|---|---|")
    for shape, span in (("spread", SPREAD_US), ("burst", BURST_US)):
        for n in (1_000, 10_000):
            ev = bot_events(spark, n, span).localCheckpoint(eager=True)
            t0 = time.time()
            out = multi_touch_attribution(ev, window_days=7).count()
            wall = time.time() - t0
            print(f"| {shape} | {n:,} | {n * n:,} | {out:,} "
                  f"| {wall:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
