"""Dump .explain("formatted") for registry queries to plans/r16/.

Usage: python tools/explain_dump.py <suffix> [names...]
  suffix: e.g. "before" or "after" -> plans/r16/<name>_<suffix>.txt
  names : query names; default = a curated hot list.

Streaming-drain queries return the post-drain batch frame; their plan
file records that serving read (the drain itself is measured separately
with tools/profile_phases.py). Each dump also runs the query once to a
noop sink first so AQE's final plan (not the pre-execution estimate) is
what executed -- the committed file keeps the static formatted plan,
which is the deterministic, diffable artifact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_review_analysis_pipeline_spark.registry import QUERIES  # noqa: E402
from automated_review_analysis_pipeline_spark.session import get_spark  # noqa: E402

HOT = [
    "set_similarity_pairs", "set_similarity_rs", "quality_classifier",
    "ivf_trained_topk", "sorted_export_manifest", "prototype_prune",
    "basket_rules", "dedup_representatives", "curate_corpus_tokens",
    "near_dup_components", "snapshot_drift_depth", "leakage_safe_split",
    "ngram_jaccard", "q2_min_cost_supplier", "curate_corpus",
    "incremental_minhash_pairs", "tokenizer_fertility",
    "index_stats_simjoin", "streaming_components",
    "streaming_set_similarity", "streaming_embedding_drift",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="arap-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        joins = [ln.strip() for ln in plan.splitlines()
                 if "Join" in ln and ln.strip().startswith(("*", "+", ":", "-"))]
        print(f"{name}: Exchange x{n_ex}, "
              f"BatchEvalPython x{plan.count('BatchEvalPython')}, "
              f"ArrowEvalPython x{plan.count('ArrowEvalPython')} -> {p}")
    spark.stop()


if __name__ == "__main__":
    main()
