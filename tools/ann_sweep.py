"""(m, ksub, n_probe, rerank) sweep for the residual IVF-PQ serving
path at sf0.1 -- the defaults-justification table for PERF.md. For
each configuration: build the index once, then measure mean recall@5
(vs exact brute force) and probe wall for the plain ADC probe and the
exact-reranked probe.

Usage: python tools/ann_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
Prints a markdown table for PERF.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    similarity as sim,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402
from automated_review_analysis_pipeline_spark.sources.tables import (  # noqa: E402
    load_table,
)

K = 5
N_QUERIES = 10


def mean_recall(report) -> float:
    r = report.agg(F.avg("recall")).first()[0]
    return float(r) if r is not None else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    e = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    q = e.where(F.col("vec_id") < N_QUERIES)
    exact = sim.cosine_topk(e, q, k=K).localCheckpoint(eager=True)

    print(f"corpus = {e.count():,} vectors ({sf_dir})")
    print("| m | ksub | n_probe | rerank | recall@5 | probe wall s |")
    print("|---|---|---|---|---|---|")
    for m, ksub in ((16, 16), (32, 16), (32, 32), (16, 256), (32, 256)):
        store = tempfile.mkdtemp(prefix="arap_ann_sweep_")
        try:
            sim.build_ivfpq_index(e, store, n_centroids=16,
                                  train_iterations=2, m=m, ksub=ksub,
                                  encode="residual")
            for n_probe in (4, 8):
                for rerank in (0, 20, 50):
                    t0 = time.time()
                    if rerank:
                        approx = sim.ivfpq_rerank(
                            spark, store, q, k=K, rerank=rerank,
                            n_probe=n_probe, embeddings=e)
                    else:
                        approx = sim.ivfpq_probe(
                            spark, store, q, k=K, n_probe=n_probe)
                    rec = mean_recall(
                        sim.ann_recall_report(e, q, k=K, approx=approx))
                    wall = time.time() - t0
                    print(f"| {m} | {ksub} | {n_probe} | {rerank} "
                          f"| {rec:.3f} | {wall:.2f} |", flush=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
