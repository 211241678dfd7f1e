"""Mini-bench: time a named subset of registry queries exactly like
bench.py (same session, warmup at sf0.001, count() action, min of N
samples, plan caches released between queries).

Usage: SPARK_GRAFT_SF_DIR=... [MINI_SAMPLES=3] python tools/mini_bench.py <name> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_review_analysis_pipeline_spark.registry import QUERIES  # noqa: E402
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_samples = max(1, int(os.environ.get("MINI_SAMPLES", "3")))
    spark = get_spark(app_name="arap-mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from automated_review_analysis_pipeline_spark.plan_cache import (
        release_plan_caches,
    )

    for name in names:
        try:
            QUERIES[name](spark, WARMUP_SF_DIR).count()
        except Exception as e:  # noqa: BLE001
            print(f"warmup {name} failed: {e}", file=sys.stderr)
        release_plan_caches()

    timings: dict[str, float] = {}
    for _ in range(n_samples):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            release_plan_caches()
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3),
                      "samples": n_samples, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
