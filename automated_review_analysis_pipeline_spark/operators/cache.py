"""Classification cache as a join (reference C7, survey_analysis.py:145-165,
251-273) -- the reference's single most important efficiency mechanism.

The reference memoizes (industry, question, answer) -> (sentiment,
category) in a JSON dict, consulted before every classifier call and
flushed every 200 new entries. On the bundled data that's a ~7.4x
reduction in classifier invocations (2 071 non-filler cells -> 278
distinct). Catalyst will never dedup UDF inputs on its own, so the engine
reproduces the effect as a plan rewrite:

    distinct(keys) --left-anti join--> cache table   = misses
    misses --classifier--> results --append--> cache (atomic parquet part)
    df --left join (broadcast cache)--> classified columns

Idempotence comes free: a re-run anti-joins everything away and classifies
zero rows (the reference needed incremental flushing for crash-resume; an
atomic append of the miss partition subsumes it).

At 100 TB the cache table is big but still tiny relative to the corpus
(distinct answers, not rows); the final join broadcasts when it fits and
falls back to a shuffle hash join when it does not -- both are single-pass.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CACHE_SCHEMA = ("industry string, question string, answer string, "
                "sentiment string, category string")

KEY_COLS = ["industry", "question", "answer"]
VAL_COLS = ["sentiment", "category"]

# classifier(distinct_keys_df) -> df with KEY_COLS + VAL_COLS
CacheClassifier = Callable[[DataFrame], DataFrame]


def load_cache(spark: SparkSession, path: str) -> DataFrame:
    """Parquet cache table; missing/empty -> empty frame (the reference
    tolerates a missing/corrupt cache file the same way,
    survey_analysis.py:145-153).

    Keys are deduplicated on read: two concurrent runs over an empty
    cache can both classify the same miss set and both append (the
    reference's JSON dict could never hold duplicate keys; the
    append-only parquet design can), and a duplicated key would fan out
    every later broadcast join. One row per key survives, arbitrarily --
    the same last-write-wins outcome as concurrent reference processes
    overwriting each other's JSON."""
    try:
        _recover_interrupted_compaction(path)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return spark.read.parquet(path).dropDuplicates(KEY_COLS)
    except OSError:
        pass
    return spark.createDataFrame([], CACHE_SCHEMA)


def _recover_interrupted_compaction(path: str) -> None:
    """If a compact_cache run crashed between its two renames, the only
    complete copy of the cache sits at ``path + ".compact.old"`` while
    ``path`` itself is gone -- and every later run would silently
    re-classify from scratch. Restore it: the .old directory is, by
    construction, the pre-compaction live table."""
    old = path + ".compact.old"
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)


def import_json_cache(spark: SparkSession, json_path: str,
                      cache_path: str) -> int:
    """Migrate the reference's JSON memo cache into the parquet cache
    table, so a porting user keeps every classification they already paid
    for. The reference format (survey_analysis.py:145-165) is one object:
    ``{"industry|||question|||answer": [sentiment, category], ...}`` --
    keys split on the literal ``|||`` delimiter (answer may itself
    contain anything except the delimiter, same contract as the
    reference's cache_key). Already-imported keys are skipped (anti-join
    idempotence, like every other cache write). Returns the number of
    newly imported entries."""
    import json

    with open(json_path, encoding="utf-8") as f:
        raw = json.load(f)
    rows = []
    for key, val in raw.items():
        parts = key.split("|||", 2)
        if len(parts) != 3 or not isinstance(val, (list, tuple)) \
                or len(val) < 2:
            continue  # tolerate corrupt entries like the reference loader
        rows.append((parts[0], parts[1], parts[2], str(val[0]), str(val[1])))
    if not rows:
        return 0
    incoming = spark.createDataFrame(rows, CACHE_SCHEMA).distinct()
    fresh = incoming.join(load_cache(spark, cache_path), KEY_COLS,
                          "left_anti").cache()
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(cache_path)
    fresh.unpersist()
    return n


def export_json_cache(spark: SparkSession, cache_path: str,
                      json_path: str) -> int:
    """Inverse of :func:`import_json_cache`: write the parquet cache
    table back out in the reference's memo format
    (``{"industry|||question|||answer": [sentiment, category]}``,
    survey_analysis.py:154-161, ensure_ascii=False like its save_cache)
    so a user can carry classifications BACK to the reference script.
    An ``industry`` or ``question`` containing the ``|||`` delimiter is
    unrepresentable in that format (the importer splits with
    maxsplit=2) and is skipped, counted out of the return value; the
    ANSWER may contain the delimiter freely -- everything after the
    second separator round-trips verbatim. This is a bounded driver
    collect -- bounded by DISTINCT classifications (industry x question
    x distinct answer), not by survey rows; in practice
    thousands-to-low-millions of short strings (the bundled survey's
    2,071 cells collapse to 278 keys), the same in-memory-dict scale
    the reference itself holds (survey_analysis.py:145-165). A cache
    too big to collect would also be too big for the reference's JSON
    format this function exists to emit -- keep such caches in parquet
    and skip the export."""
    import json

    rows = load_cache(spark, cache_path).collect()
    out = {}
    for r in rows:
        if any("|||" in (r[c] or "") for c in ("industry", "question")):
            continue
        key = f"{r['industry']}|||{r['question']}|||{r['answer']}"
        out[key] = [r["sentiment"], r["category"]]
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False)
    return len(out)


def compact_cache(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 << 20) -> int:
    """Rewrite the append-only cache directory as few-files,
    one-row-per-key parquet. Every run appends one miss partition set
    (classify_with_cache / analyze_wide_cached), so a long-lived cache
    accumulates small files whose footer reads eventually dominate
    load_cache planning -- the standard small-files tax, fixed the
    standard way: periodic compaction (same sizing rule as
    partitioning.compact_files -- ceil(on-disk bytes / target), one
    coalesce, no shuffle) plus the dedup-on-key rewrite load_cache
    applies on read, made durable.

    Crash-safe swap: the compacted table lands in a sibling ``.tmp``
    directory first, the live directory moves aside, the tmp renames
    in, and only then is the old data deleted -- a crash at any point
    leaves a complete copy on disk (``path`` or ``path + ".compact.old"``),
    and load_cache/compact_cache automatically restore a stranded
    ``.compact.old`` on their next run. Returns the output file count
    (0 = nothing to compact). Idempotent: re-running compacts the
    already-compact table to itself.

    Concurrent appenders are tolerated, not required to stop: the
    compaction reads an explicit SNAPSHOT of the parquet files present
    at entry, and any file that lands in ``path`` afterwards -- whether
    it was swept into ``.compact.old`` by the first rename or appended
    into a recreated ``path`` between the renames -- is moved back into
    the live directory before the old copy is deleted. Nothing a
    concurrent run paid for is ever dropped; the duplicate-key rows a
    concurrent append can introduce are collapsed by load_cache's
    dedup-on-read, same as always.
    """
    import glob
    import shutil

    _recover_interrupted_compaction(path)
    snapshot = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else []
    if not snapshot:
        return 0
    # read exactly the snapshot files: appends racing the write job must
    # not be half-included (they are reconciled by filename below)
    live = spark.read.parquet(*snapshot).dropDuplicates(KEY_COLS)
    total = sum(os.path.getsize(f) for f in snapshot)
    n_files = max(1, -(-total // target_file_bytes))
    tmp, old = path + ".compact.tmp", path + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    live.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        # an append between the renames recreated ``path``: keep those
        # fresh files, then fill in the compacted table around them
        for f in glob.glob(os.path.join(tmp, "*")):
            dst = os.path.join(path, os.path.basename(f))
            if not os.path.exists(dst):
                os.rename(f, dst)
        shutil.rmtree(tmp, ignore_errors=True)
    # files swept into .old that were NOT in the snapshot are concurrent
    # appends -- move them back into the live table before deleting
    snap_names = {os.path.basename(f) for f in snapshot}
    for f in glob.glob(os.path.join(old, "*.parquet")):
        if os.path.basename(f) not in snap_names:
            dst = os.path.join(path, os.path.basename(f))
            if not os.path.exists(dst):
                os.rename(f, dst)
    shutil.rmtree(old)
    return int(n_files)


def classify_with_cache(
    keys: DataFrame,
    classifier: CacheClassifier,
    spark: SparkSession,
    cache_path: str | None = None,
    max_parallelism: int | None = None,
) -> DataFrame:
    """Classify distinct (industry, question, answer) keys, consulting and
    extending the cache table. Returns KEY_COLS + VAL_COLS for every input
    key. ``keys`` may contain duplicates; they are collapsed first.

    ``max_parallelism`` bounds API-mode concurrency: the miss set is
    repartitioned to that many partitions before the classifier UDF, so at
    most that many concurrent request streams hit the endpoint (the
    reference's single sequential loop, survey_analysis.py:189-217, is the
    rate-limit precedent -- ``max_parallelism=1`` reproduces it; None
    leaves the shuffle-parallelism default)."""
    distinct_keys = keys.select(*KEY_COLS).distinct()
    cache = (
        load_cache(spark, cache_path)
        if cache_path
        else spark.createDataFrame([], CACHE_SCHEMA)
    )

    misses = distinct_keys.join(cache, KEY_COLS, "left_anti")
    if max_parallelism is not None:
        misses = misses.repartition(max_parallelism)
    computed = classifier(misses).select(*KEY_COLS, *VAL_COLS)

    if cache_path:
        # Atomic append of the miss partition (replaces the reference's
        # flush-every-200); re-runs then classify zero rows. Read back
        # through load_cache so concurrently-appended duplicate keys
        # collapse to one row before the join-back.
        computed.write.mode("append").parquet(cache_path)
        computed = load_cache(spark, cache_path).join(
            distinct_keys, KEY_COLS, "left_semi")
        return computed

    return cache.join(distinct_keys, KEY_COLS, "left_semi").unionByName(computed)


def classify_column_with_cache(
    df: DataFrame,
    industry: str,
    question: str,
    answer_col: str,
    classifier: CacheClassifier,
    cache_path: str | None = None,
    max_parallelism: int | None = None,
) -> DataFrame:
    """Attach (sentiment, category) for one answer column via the cache
    rewrite. The join back is a broadcast when the distinct-answer table
    fits (the common case -- it is bounded by distinct answers, not rows)."""
    spark = df.sparkSession
    keyed = df.withColumn("industry", F.lit(industry)) \
              .withColumn("question", F.lit(question)) \
              .withColumn("answer", F.col(answer_col))
    results = classify_with_cache(
        keyed.select(*KEY_COLS), classifier, spark, cache_path,
        max_parallelism=max_parallelism)
    return (
        keyed.join(F.broadcast(results), KEY_COLS, "left")
        .drop("industry", "question", "answer")
    )
