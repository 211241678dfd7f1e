"""Ad-hoc sanity: batched training progress + strategy equivalence."""
import time

from automated_review_analysis_pipeline_spark.session import get_spark
from automated_review_analysis_pipeline_spark.operators import (
    textanalysis as ta,
)

spark = get_spark("bpe-sanity", master="local[8]")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

t0 = time.time()
exact = ta._train_merges(docs, 20, "text", batch=1)
t1 = time.time()
batched = ta._train_merges(docs, 20, "text", batch=8)
t2 = time.time()
print(f"exact 20 merges: {t1-t0:.1f}s; batched(8): {t2-t1:.1f}s")
print("exact  :", [(m[1], m[2]) for m in exact[:8]])
print("batched:", [(m[1], m[2]) for m in batched[:8]])

lit = ta.bpe_encode(docs, merges=exact, strategy="literal").collect()
ker = ta.bpe_encode(docs, merges=exact, strategy="kernel").collect()
assert len(lit) == len(ker), (len(lit), len(ker))
bad = [(a, b) for a, b in zip(lit, ker) if a != b]
print("strategy equal rows:", len(lit) - len(bad), "/", len(lit),
      "mismatches:", bad[:3])
assert not bad

# batched merges, both strategies also agree with each other
lit_b = ta.bpe_encode(docs, merges=batched, strategy="literal").collect()
ker_b = ta.bpe_encode(docs, merges=batched, strategy="kernel").collect()
assert lit_b == ker_b
print("batched-merge strategies agree:", len(lit_b), "rows")
print("OK")
