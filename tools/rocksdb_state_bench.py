"""State-store provider side-by-side for the stateful streaming lane:
drain streaming_dedup (first-touch keyed dedup state) and
streaming_finalized_sessions (applyInPandasWithState session state with
timers) under (a) the default HDFS-backed in-memory provider and (b)
RocksDBStateStoreProvider, timing the drain and measuring the on-disk
checkpoint/state footprint. Results must be identical across providers
(asserted); the numbers are the 100 TB state story -- RocksDB keeps
state off the executor heap, which is what survives when keyed state
stops fitting in memory.

Usage: python tools/rocksdb_state_bench.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from automated_review_analysis_pipeline_spark.registry import (  # noqa: E402
    QUERIES,
)
from automated_review_analysis_pipeline_spark.session import (  # noqa: E402
    get_spark,
)

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()

    results: dict[tuple[str, str], list] = {}
    print("| query | provider | wall s (drain) | state+chk bytes |")
    print("|---|---|---|---|")
    for qname in ("streaming_dedup", "streaming_finalized_sessions"):
        for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider)
            # two drains; report the second (the first pays one-time
            # fixture builds + JVM/codegen warmup, biasing whichever
            # provider runs first)
            for attempt in range(2):
                chk_root = tempfile.mkdtemp(prefix=f"arap_{label}_chk_")
                spark.conf.set("spark.sql.streaming.checkpointLocation",
                               chk_root)
                t0 = time.time()
                rows = sorted(map(tuple, QUERIES[qname](spark, sf_dir)
                                  .collect()))
                wall = time.time() - t0
                size = du(chk_root)
            results[(qname, label)] = rows
            print(f"| {qname} | {label} | {wall:.2f} | {size} |")
        assert results[(qname, "hdfs")] == results[(qname, "rocksdb")], \
            f"{qname}: provider changed results"
    print("providers agree on all rows")
    spark.stop()


if __name__ == "__main__":
    main()
