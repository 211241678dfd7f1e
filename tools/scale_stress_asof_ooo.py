"""Scale stress for the out-of-order streaming as-of: wall clock and
PEAK STATE ROWS across scale factors, on the same whole-corpus-disorder
fixture shape the registry uses. The claim under test: state stays
O(pending clicks within the watermark horizon + purchases above it),
never O(history) -- and with the registry's worst-case delay (= the
full corpus span) state peaks at ~|clicks into the horizon| and drops
after the heartbeat flush.

Usage: python tools/scale_stress_asof_ooo.py
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)
from automated_review_analysis_pipeline_spark.streaming.stateful import (  # noqa: E402
    streaming_asof_enrich_ooo,
)


def main() -> None:
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    print("| sf | events | out rows | wall s | peak state rows "
          "| final batch state rows |")
    print("|---|---|---|---|---|---|")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        events = load_table(spark, f"/root/testdata/{sf}", "events") \
            .select("event_id", "user_id", "ts", "event_type", "value")
        n = events.count()
        mn, mx = events.agg(F.unix_micros(F.min("ts")),
                            F.unix_micros(F.max("ts"))).first()
        span_minutes = (mx - mn) // 60_000_000 + 2
        work = tempfile.mkdtemp(prefix=f"arap_ooo_stress_{sf}_")
        src = os.path.join(work, "src")
        os.makedirs(src)
        parts = [events.where(
            F.pmod(F.xxhash64("event_id"), F.lit(3)) == i)
            for i in range(3)]
        hb_us = mx + span_minutes * 60_000_000 + 10**7
        hb = spark.createDataFrame(
            [(-1, 0, "heartbeat", None)],
            "event_id long, user_id long, event_type string, "
            "value double").select(
            "event_id", "user_id",
            F.timestamp_micros(F.lit(hb_us)).alias("ts"),
            "event_type", "value")
        now = time.time()
        for i, part in enumerate(parts + [hb]):
            d = os.path.join(work, f"p{i}")
            part.coalesce(1).write.parquet(d)
            dst = os.path.join(src, f"{chr(97 + i)}_{i}.parquet")
            shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], dst)
            os.utime(dst, (now - 100 + i,) * 2)

        stream = (spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double")
            .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_asof_enrich_ooo(
            stream, delay=f"{span_minutes} minutes")
        t0 = time.time()
        q = (out.writeStream.format("memory")
             .queryName(f"ooo_{sf.replace('.', '_')}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
        states = [p["stateOperators"][0]["numRowsTotal"]
                  for p in q.recentProgress if p["stateOperators"]]
        nout = spark.table(f"ooo_{sf.replace('.', '_')}").count()
        print(f"| {sf} | {n} | {nout} | {wall:.2f} "
              f"| {max(states) if states else 0} "
              f"| {states[-1] if states else 0} |")
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
