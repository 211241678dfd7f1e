"""10x file-count stress for sorted_export's parquet manifest: the
driver-side cost of a fixed-size positional slice read must stay FLAT
as the number of exported files grows 10x (the old monolithic-JSON
manifest parsed O(n_files) on every read; the parquet manifest +
arithmetic slice pruning must not).

Usage: python tools/sorted_manifest_stress.py [sf_dir]
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    partitioning as pt,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars"))
    n = d.count()
    print(f"corpus rows: {n}")
    print("| rows/file | n_files | slice wall s (100 rows) "
          "| range wall s |")
    print("|---|---|---|---|")
    for rpf in (256, 64, 8):  # ~n/256 -> ~n/8 files: 32x span
        out = tempfile.mkdtemp(prefix=f"arap_sorted_stress_{rpf}_")
        manifest = pt.sorted_export(d, out, ["n_chars", "doc_id"],
                                    rows_per_file=rpf)
        n_files = manifest.count()
        # warm the reader path once, then time the driver+scan work of
        # a FIXED-size slice (the resuming-loader op)
        pt.read_sorted_slice(spark, out, 1, 1).count()
        t0 = time.time()
        assert pt.read_sorted_slice(spark, out, n // 2,
                                    n // 2 + 99).count() == 100
        slice_wall = time.time() - t0
        t1 = time.time()
        pt.read_sorted_range(spark, out, 100, 120).count()
        range_wall = time.time() - t1
        print(f"| {rpf} | {n_files} | {slice_wall:.2f} "
              f"| {range_wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
