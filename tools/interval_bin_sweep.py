"""Bin-width sweep for interval_overlap_join: the W knob trades explode
fan-out (W too small -> each interval touches many cells) against
per-cell cross-product size (W too big -> every cell is a mini
cartesian). Runs the session_error_overlap registry shape at sf0.1 for
a range of widths and reports wall seconds + exploded row counts; the
result row set is identical at every W (asserted).

Usage: python tools/interval_bin_sweep.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    events as ev,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

MIN = 60_000_000  # one minute in microseconds


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sessions = (ev.sessionize(e).groupBy("user_id", "session_id")
                .agg(F.min(us).alias("s_start"),
                     (F.max(us) + 1).alias("s_end"))
                .localCheckpoint(eager=True))
    errors = (e.where(F.col("event_type") == "error")
              .select(F.col("event_id").alias("err_id"),
                      us.alias("e_start"),
                      (us + 600_000_000).alias("e_end"))
              .localCheckpoint(eager=True))

    def fanout(df, s, en, w):
        return df.select(
            (F.floor((F.col(en) - 1) / w) - F.floor(F.col(s) / w) + 1)
            .alias("n")).agg(F.sum("n")).first()[0]

    base = None
    print("| bin width | exploded rows (L+R) | wall s | pairs |")
    print("|---|---|---|---|")
    for w in (MIN, 10 * MIN, 60 * MIN, 24 * 60 * MIN, 7 * 24 * 60 * MIN):
        t0 = time.time()
        pairs = sorted(map(tuple, ev.interval_overlap_join(
            sessions, errors, "s_start", "s_end", "e_start", "e_end",
            bin_width=w).select("user_id", "session_id",
                                "err_id").collect()))
        wall = time.time() - t0
        rows = fanout(sessions, "s_start", "s_end", w) + \
            fanout(errors, "e_start", "e_end", w)
        if base is None:
            base = pairs
        assert pairs == base, f"result changed at W={w}"
        print(f"| {w // MIN} min | {rows} | {wall:.2f} | {len(pairs)} |")

    # the auto pick (median interval length) must land on the flat part
    w_auto = ev.auto_bin_width(sessions, errors, "s_start", "s_end",
                               "e_start", "e_end")
    t0 = time.time()
    pairs = sorted(map(tuple, ev.interval_overlap_join(
        sessions, errors, "s_start", "s_end", "e_start", "e_end",
        bin_width=None).select("user_id", "session_id",
                               "err_id").collect()))
    wall = time.time() - t0
    assert pairs == base, "auto width changed the result"
    rows = fanout(sessions, "s_start", "s_end", w_auto) +         fanout(errors, "e_start", "e_end", w_auto)
    print(f"| auto ({w_auto / MIN:.1f} min) | {rows} | {wall:.2f} "
          f"| {len(pairs)} |")
    spark.stop()


if __name__ == "__main__":
    main()
