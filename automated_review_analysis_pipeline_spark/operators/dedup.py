"""Deduplication operators for a training-data pipeline (SURVEY.md §2B):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
* exact dedup is a single hash shuffle on the key (or a window if a
  deterministic survivor matters);
* MinHash/LSH never compares all pairs -- signatures are per-row column
  math, candidate generation is a groupBy on (band, bucket-hash), and only
  bucket-mates are verified. Buckets are the classic b-bands x r-rows
  construction, so the shuffle volume is O(rows x bands), not O(rows^2);
* the hash family is md5(salt || shingle) -- portable (identical in DuckDB
  for the oracle) and deterministic across runs/executors, unlike
  hash()/xxhash64 whose seeds are engine-specific... md5 IS slower than
  xxhash64; swap via ``hash_expr`` for production, keep md5 for oracles;
* SimHash is numpy inside a vectorized pandas UDF (bit-majority over token
  hashes is genuinely awkward as column math) -- Arrow-batched, linear.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, keys: list[str],
                order_by: list[str] | None = None) -> DataFrame:
    """Keep one row per key. With ``order_by``, the survivor is the first
    row in that order (deterministic, oracle-friendly); without, it is
    dropDuplicates (cheaper: partial dedup map-side before the shuffle)."""
    if order_by is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_stats(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per-key multiplicity for keys occurring more than once."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .orderBy(*keys)
    )


# ---------------------------------------------------------------------------
# shingles + portable MinHash
# ---------------------------------------------------------------------------

def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of lowercased text. len<k -> the whole text
    as one shingle (so short docs still participate)."""
    toks = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(
        F.when(n >= k, shingled).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )


def minhash_value(shingles: Column, salt: str) -> Column:
    """One MinHash coordinate: min over md5(salt||shingle). Lexicographic
    min over a cryptographic hash == a uniform random permutation min."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(salt), s)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16,
                      salt_prefix: str = "mh") -> Column:
    return F.array(*[
        minhash_value(shingles, f"{salt_prefix}{i}:") for i in range(num_hashes)
    ])


def add_minhash(df: DataFrame, text_col: str = "text", k: int = 3,
                num_hashes: int = 16) -> DataFrame:
    """documents + (shingles, minhash signature). Staged select so the
    shingle array is computed once, not once per hash coordinate."""
    out = df.withColumn("__shingles", word_shingles(F.col(text_col), k))
    return out.withColumn(
        "minhash", minhash_signature(F.col("__shingles"), num_hashes)
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    num_hashes/bands rows; docs sharing any band bucket are candidates.

    Emits distinct (id_a < id_b) pairs. The only shuffles are the
    explode-groupBy on bucket keys and the final distinct -- no cross join
    anywhere. Requires ``minhash`` column (see add_minhash)."""
    rows_per_band = num_hashes // bands
    band_keys = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[
                F.col("minhash")[b * rows_per_band + r]
                for r in range(rows_per_band)
            ])).alias("bucket"),
        )
        for b in range(bands)
    ])
    buckets = (
        df.select(F.col(id_col), F.explode(band_keys).alias("bk"))
        .select(id_col, "bk.band", "bk.bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def minhash_near_dup_pairs(documents: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 3,
                           num_hashes: int = 16, bands: int = 4,
                           threshold: float = 0.7) -> DataFrame:
    """MinHash -> LSH banding -> exact-Jaccard verification of candidates.

    Returns (id_a, id_b, jaccard_sim) for verified near-duplicate pairs.
    The verify join ships only (id, shingles) for candidate ids -- at scale
    add a broadcast threshold or bucketed join on id."""
    with_sig = add_minhash(documents, text_col, k, num_hashes)
    shingle_map = with_sig.select(F.col(id_col), F.col("__shingles"))
    cands = lsh_candidate_pairs(with_sig, id_col, num_hashes, bands)
    a = shingle_map.alias("sa")
    b = shingle_map.alias("sb")
    return (
        cands.join(a, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(b, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a", "id_b",
            F.round(jaccard(F.col("sa.__shingles"), F.col("sb.__shingles")), 6)
            .alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(documents: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.1,
                        block_on: list[str] | None = None) -> DataFrame:
    """Blocked exact n-gram Jaccard: join within ``block_on`` groups (or a
    cheap derived block), compute exact Jaccard on word-shingle sets.

    This is the SQL-oracle-friendly near-dup variant -- deterministic,
    no hashing family, DuckDB-expressible with list_intersect."""
    block_on = block_on or []
    d = documents.select(
        F.col(id_col),
        *[F.col(c) for c in block_on],
        word_shingles(F.col(text_col), k).alias("shingles"),
    )
    a, b = d.alias("a"), d.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_on:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("a.shingles"), F.col("b.shingles")), 6)
            .alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SimHash (pandas-UDF kernel; rows-only oracle check)
# ---------------------------------------------------------------------------

def add_simhash(documents: DataFrame, text_col: str = "text",
                bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-token md5 -> bit-majority.

    Bit-majority over token hashes is per-row vectorizable but awkward as
    column math (64 nested aggregates), so it runs as an Arrow-batched
    pandas UDF -- numpy does (tokens x 64) popcount in C. Deterministic
    (md5), so tests can assert exact values; not SQL-portable, so the
    driver gets a rows-only check."""
    import pandas as pd  # local import: executors only
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            toks = str(t).lower().split()
            if not toks:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                h = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                for bit in range(bits):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            v = 0
            for bit in range(bits):
                if acc[bit] > 0:
                    v |= 1 << bit
            out[i] = np.int64(np.uint64(v).astype(np.int64))
        return pd.Series(out)

    return documents.withColumn("simhash", simhash64(F.col(text_col)))


def simhash_near_dup_pairs(documents: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup: block on 16-bit chunks (a pair within hamming
    distance 3 shares at least one of 4 chunks; wider distances use more
    chunks), verify with exact popcount hamming distance."""
    d = add_simhash(documents, text_col).select(id_col, "simhash")
    chunks = F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                 .alias("val"))
        for i in range(4)
    ])
    blocked = d.select(id_col, "simhash", F.explode(chunks).alias("c")) \
               .select(id_col, "simhash", "c.chunk", "c.val")
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("id_a", "id_b")
    )
