"""Measure BPE train+encode at realistic merge counts on sf0.1.

Usage: python tools/bpe_merge_sweep.py [sf_dir] [counts...]
Prints one JSON line per merge count: train time (batch=64), encode time
(kernel strategy), tokens emitted, merges actually learned (the corpus
pair vocabulary may exhaust below the requested count -- recorded, not
hidden).
"""
from __future__ import annotations

import json
import sys
import time

from automated_review_analysis_pipeline_spark.session import get_spark
from automated_review_analysis_pipeline_spark.operators import (
    textanalysis as ta,
)
from automated_review_analysis_pipeline_spark import plan_cache

args = [a for a in sys.argv[1:] if a != "--stress"]
stress = "--stress" in sys.argv[1:]
sf_dir = args[0] if args else "/root/testdata/sf0.1"
counts = [int(c) for c in args[1:]] or [1000, 8000, 32000]

spark = get_spark("bpe-merge-sweep", master="local[16]",
                  extra_confs={"spark.ui.enabled": "false"})
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

if stress:
    # The synthetic documents text has 31 distinct words -- its BPE pair
    # vocabulary exhausts at ~113 merges (693 with md5'd words), far
    # below a production tokenizer's 8k-32k. To measure the MECHANICS at
    # those counts (driver round-trips, broadcast size, kernel
    # throughput) on the same table, deterministically re-derive each
    # word occurrence as md5(word:position): same doc/word structure,
    # but a position-diversified ~20k-word vocabulary of 32-hex-char
    # words whose merge vocabulary runs past 32k.
    from pyspark.sql import functions as F
    from automated_review_analysis_pipeline_spark.operators.textanalysis import (  # noqa: E501
        tokens,
    )
    docs = docs.select(
        "doc_id",
        F.concat_ws(" ", F.transform(
            tokens(F.lower(F.col("text"))),
            lambda w, i: F.md5(F.concat_ws(":", w, i.cast("string"))),
        )).alias("text"))

for n in counts:
    t0 = time.time()
    learned = ta._train_merges(docs, n, "text", batch=64)
    t_train = time.time() - t0
    t0 = time.time()
    enc = ta.bpe_encode(docs, merges=learned, strategy="kernel")
    n_docs, n_tokens = enc.selectExpr(
        "count(*) c", "sum(n_bpe_tokens) t").collect()[0]
    t_enc = time.time() - t0
    plan_cache.release_plan_caches()
    print(json.dumps({
        "requested_merges": n, "learned_merges": len(learned),
        "train_sec": round(t_train, 1), "encode_sec": round(t_enc, 1),
        "docs": n_docs, "bpe_tokens": int(n_tokens),
    }), flush=True)
    if len(learned) < n:
        print(json.dumps({"note": "pair vocabulary exhausted",
                          "ceiling": len(learned)}), flush=True)
        break
