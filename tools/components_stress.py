"""Delta-cost scaling of the incremental components store: append a
FIXED-size edge delta to stores built from growing edge histories and
compare the append wall against the one-shot star recompute over the
full (history + delta) union. The claim under test: components_append
cost tracks |delta| (star rounds run over the contracted label graph
only), while the one-shot recompute tracks |history|.

Usage: python tools/components_stress.py [max_scale]
"""

from __future__ import annotations

import random
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from automated_review_analysis_pipeline_spark.operators import (  # noqa: E402
    similarity as sim,
)
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402


def edges_of(n_nodes: int, n_edges: int, seed: int) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    out = set()
    while len(out) < n_edges:
        a, b = rnd.randrange(n_nodes), rnd.randrange(n_nodes)
        if a != b:
            out.add((max(a, b), min(a, b)))
    return sorted(out)


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark()
    delta_edges = 2_000
    rows = []
    scale = 1
    while scale <= max_scale:
        hist_n = 50_000 * scale
        hist = spark.createDataFrame(
            edges_of(hist_n * 2, hist_n, seed=1), "a long, b long")
        delta = spark.createDataFrame(
            edges_of(hist_n * 2, delta_edges, seed=2), "a long, b long")
        store = "/tmp/arap_comp_stress/store"
        shutil.rmtree("/tmp/arap_comp_stress", ignore_errors=True)
        sim.build_components_store(hist, store)
        t0 = time.time()
        appended = sim.components_append(spark, store, delta)
        n_labels = appended.count()
        w_append = time.time() - t0
        # the round-14 delta layout's write-size claim: the appended
        # version holds only touched labels, the base holds them all
        from automated_review_analysis_pipeline_spark import fsio

        b_delta = fsio.dir_bytes(spark, store + "/labels/v1")
        b_base = fsio.dir_bytes(spark, store + "/labels/v0")
        t0 = time.time()
        oneshot, _ = sim.star_connected_components(hist.unionByName(delta))
        n_one = oneshot.count()
        w_oneshot = time.time() - t0
        rows.append((hist_n, delta_edges, w_append, w_oneshot,
                     n_labels, n_one, b_delta, b_base))
        scale *= 4
    print("\n| history edges | delta edges | append wall s | "
          "one-shot recompute s | labels | append KiB | base KiB |")
    print("|---|---|---|---|---|---|---|")
    for h, d, wa, wo, nl, no, bd, bb in rows:
        assert nl == no, (nl, no)
        print(f"| {h} | {d} | {wa:.2f} | {wo:.2f} | {nl} "
              f"| {bd // 1024} | {bb // 1024} |")
    first, last = rows[0], rows[-1]
    print(f"\nhistory grew {last[0] // first[0]}x: append wall "
          f"{last[2] / first[2]:.2f}x, one-shot {last[3] / first[3]:.2f}x, "
          f"bytes-per-append {last[6] / max(first[6], 1):.2f}x "
          f"(base snapshot {last[7] / max(first[7], 1):.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
