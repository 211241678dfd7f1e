"""Streaming near-duplicate detection over a document stream.

The incremental-dedup shape a continuous ingestion pipeline needs: every
micro-batch's documents are MinHash-signed and LSH-banded, candidate
pairs are generated against BOTH the batch itself and the persisted
signature store (all previously seen documents), verified with exact
Jaccard, and appended to a results table; the batch's signatures then
append to the store. Old-vs-old pairs are excluded by construction
(earlier batches already emitted them), so after the stream drains the
accumulated pair set equals the one-shot batch recompute EXACTLY -- every
pair (a, b) is found precisely once, when its later-arriving member's
batch runs. That equivalence gives this streaming operator a full
value-level SQL oracle (the batch MinHash oracle), rare for streaming.

Scale: the store grows as O(corpus signatures) -- (id, shingles, 16
int64s) per doc, a small fraction of the raw text -- and each batch's
work is (batch x store) banded candidates, never store x store. The
parquet-append store stands in for a real table format; swap the
directory for Delta/Iceberg and the plan is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.dedup import (
    add_minhash,
    jaccard_with_sizes,
    lsh_candidate_pairs,
)

SIG_SCHEMA = ("doc_id long, __shingles array<string>, __n int, "
              "minhash array<long>")


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int | None = None
                          ) -> DataFrame:
    """Parquet-directory stream of documents; schema pinned from a batch
    probe of the same path (footer-only), like read_events_stream."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def streaming_minhash_pairs(spark: SparkSession, docs_path: str,
                            work_dir: str,
                            max_files_per_trigger: int | None = None,
                            k: int = 3, num_hashes: int = 16,
                            bands: int = 4,
                            threshold: float = 0.0) -> DataFrame:
    """Drain ``docs_path`` with availableNow, incrementally detecting
    near-duplicate pairs (see module docstring); returns the accumulated
    verified pair set, which equals the batch minhash_near_dup_pairs
    result on the same corpus.

    Replay note: a replayed (at-least-once) micro-batch appends
    duplicate signature and pair ROWS, but never changes the returned
    SET -- candidates and results are both value-duplicates that the
    final ``dropDuplicates`` collapses, so no batch-id guard is needed
    here (unlike the simjoin/profile lanes, whose stores are
    fold-sensitive)."""
    store_dir = os.path.join(work_dir, "sig_store")
    results_dir = os.path.join(work_dir, "results")
    chk = os.path.join(work_dir, "_chk")

    def has_parquet(path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_sig = (
            add_minhash(batch_df.select("doc_id", "text"), "text",
                        k, num_hashes)
            .select("doc_id", "__shingles",
                    F.size("__shingles").cast("int").alias("__n"), "minhash")
        ).cache()
        store = (spark.read.parquet(store_dir) if has_parquet(store_dir)
                 else spark.createDataFrame([], SIG_SCHEMA))
        allsig = (
            new_sig.withColumn("__new", F.lit(True))
            .unionByName(store.withColumn("__new", F.lit(False)))
        ).cache()
        cands = lsh_candidate_pairs(allsig, "doc_id", num_hashes, bands,
                                    flag_col="__new")
        sides = allsig.select("doc_id", "__shingles", "__n")
        a, b = sides.alias("sa"), sides.alias("sb")
        verified = (
            cands.join(a, F.col("id_a") == F.col("sa.doc_id"))
            .join(b, F.col("id_b") == F.col("sb.doc_id"))
            .select(
                "id_a", "id_b",
                F.round(jaccard_with_sizes(
                    F.col("sa.__shingles"), F.col("sb.__shingles"),
                    F.col("sa.__n"), F.col("sb.__n")), 6)
                .alias("jaccard_sim"))
            .where(F.col("jaccard_sim") >= threshold)
        )
        verified.write.mode("append").parquet(results_dir)
        new_sig.select("doc_id", "__shingles", "__n", "minhash") \
            .write.mode("append").parquet(store_dir)
        allsig.unpersist()
        new_sig.unpersist()

    stream = read_documents_stream(spark, docs_path, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    q.awaitTermination()
    if not has_parquet(results_dir):
        return spark.createDataFrame(
            [], "id_a long, id_b long, jaccard_sim double")
    return (spark.read.parquet(results_dir)
            .dropDuplicates(["id_a", "id_b"])
            .orderBy("id_a", "id_b"))


def _maybe_refreeze(spark: SparkSession, store_dir: str,
                    ratio: float) -> bool:
    """The CLOSED maintenance loop for streaming simjoin lanes: read
    the store's drift trigger (metadata-only -- the per-append
    candidate-density records simjoin_append keeps anyway) and run
    simjoin_refreeze inline when it trips. Safe here because
    foreachBatch serializes micro-batches: the stream IS the store's
    single writer, so maintenance between batches cannot race an
    append; the refreeze also resets the records, re-arming the
    trigger against the new order."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        simjoin_refreeze,
        simjoin_store_stats,
    )

    st = simjoin_store_stats(spark, store_dir,
                             drift_threshold=ratio).first()
    if not st["refreeze_recommended"]:
        return False
    simjoin_refreeze(spark, store_dir)
    return True


def _maybe_compact_simjoin(spark: SparkSession, store_dir: str,
                           max_files_per_bucket: int) -> bool:
    """Inline OPTIMIZE trigger for the streaming simjoin lanes,
    keyed on prefix bucket health (files per bucket == appends since
    the last compaction). Single-writer-safe between micro-batches,
    like the refreeze trigger."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E501
        bucket_file_counts,
        index_compact,
    )

    buckets = bucket_file_counts(spark, store_dir + "/prefix")
    if not buckets or max(buckets.values()) <= max_files_per_bucket:
        return False
    index_compact(spark, store_dir)
    return True


def streaming_set_similarity(spark: SparkSession, docs_path: str,
                             work_dir: str,
                             max_files_per_trigger: int | None = None,
                             threshold: float = 0.5,
                             k: int = 3,
                             auto_refreeze_ratio: float | None = None,
                             auto_compact_files_per_bucket:
                             int | None = None) -> DataFrame:
    """Streaming EXACT set-similarity detection: the zero-false-negative
    twin of :func:`streaming_minhash_pairs`. The persisted exact-simjoin
    store (operators.dedup.build_simjoin_index) is initialized EMPTY --
    freezing the degenerate all-df-0 order, i.e. plain token-string
    order, which is still a valid shared total order (prefix-filter
    completeness needs ANY shared order; frequencies only minimize
    candidates) -- and every micro-batch simjoin_appends: only
    (batch x seen-so-far) prefix candidates are joined, each qualifying
    pair is found exactly once (when its later member arrives), and the
    drained pair set equals the one-shot batch recompute EXACTLY, so
    the batch exact-Jaccard oracle carries over verbatim.

    ``auto_refreeze_ratio`` closes the maintenance loop: after each
    append the store's drift trigger is read (metadata-only) and a
    :func:`~..operators.dedup.simjoin_refreeze` runs inline past the
    ratio -- the long-running ingestion service keeps its own prefix
    selectivity healthy with no operator in the loop. Pair sets are
    refreeze-invariant, so the drained result (and its oracle) is
    unchanged whether or not maintenance fired (pytest drives a
    drift-mid-stream fixture through the trigger)."""
    import shutil

    from automated_review_analysis_pipeline_spark.operators.dedup import (
        build_simjoin_index,
        simjoin_append,
    )

    store_dir = os.path.join(work_dir, "simjoin_store")
    chk = os.path.join(work_dir, "_chk")
    shutil.rmtree(store_dir, ignore_errors=True)
    empty = spark.read.parquet(docs_path).limit(0)
    build_simjoin_index(empty, store_dir, threshold=threshold, k=k)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # batch_id makes a replayed (at-least-once) micro-batch a
        # no-op instead of a duplicate append -- see simjoin_append
        simjoin_append(spark, store_dir,
                       batch_df.select("doc_id", "text"),
                       batch_id=batch_id)
        if auto_refreeze_ratio is not None:
            _maybe_refreeze(spark, store_dir, auto_refreeze_ratio)
        if auto_compact_files_per_bucket is not None:
            _maybe_compact_simjoin(spark, store_dir,
                                   auto_compact_files_per_bucket)

    stream = read_documents_stream(spark, docs_path, max_files_per_trigger)
    q = (stream.writeStream.foreachBatch(process)
         .trigger(availableNow=True)
         .option("checkpointLocation", chk)
         .start())
    q.awaitTermination()
    return (spark.read.parquet(store_dir + "/pairs")
            .orderBy("a_id", "b_id"))


def streaming_components(spark: SparkSession, docs_path: str,
                         work_dir: str,
                         max_files_per_trigger: int | None = None,
                         threshold: float = 0.5,
                         k: int = 3,
                         auto_refreeze_ratio: float | None = None,
                         auto_compact_files_per_bucket:
                         int | None = None) -> DataFrame:
    """CONTINUOUSLY-FRESH dedup clusters: the full incremental dedup
    lifecycle as one streaming lane. Every micro-batch (a) folds into
    the persisted exact-simjoin store (delta-only candidate + verify
    work, zero false negatives -- :func:`streaming_set_similarity`'s
    discipline), then (b) feeds EXACTLY the pairs that append
    discovered into the persisted components store, where star rounds
    run over the contracted <= 2x|batch pairs| label graph -- so after
    the drain, cluster labels over the whole corpus are already
    sitting in the store, no one-shot clustering pass anywhere.

    The per-batch pair DELTA is recovered by file-listing diff against
    a FOLDED-FILES watermark (parquet part names are job-unique;
    metadata-only): ``folded_pairs.json`` records which pairs files
    the components store has absorbed, and advances only AFTER the
    fold commits. A crash between the simjoin commit and the
    components fold therefore re-folds that batch's files on replay --
    and re-folding is IDEMPOTENT by contraction (edges whose endpoints
    already share a component collapse to nothing before the star
    rounds), so labels stay exact end to end across the two stores
    under at-least-once replay, with no cross-store transaction
    needed. The simjoin store keeps its own batch_id guard + staged-
    append rollback.

    Maintenance interplay, documented: ``index_compact`` on the
    simjoin store REWRITES the pairs files, so the next micro-batch's
    listing diff sees them all as new and re-folds the full pair set
    once -- labels stay exact (contraction no-op again), at an O(all
    pairs) one-time fold cost; run compaction in the same maintenance
    window as a components_compact and the watermark re-bases with
    it. The watermark file itself is one name per pairs part file --
    compaction is also what keeps THAT bounded.

    Drained labels equal the one-shot recompute over the full corpus
    (labels are minima of exact-Jaccard reachability), so the batch
    recursive-CTE oracle carries over verbatim. Returns (doc_id,
    component) for every document that participates in >= 1 pair."""
    import shutil

    from automated_review_analysis_pipeline_spark import fsio
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        build_simjoin_index,
        simjoin_append,
    )
    from automated_review_analysis_pipeline_spark.operators.similarity import (
        build_components_store,
        components_append,
        components_read,
    )

    store_dir = os.path.join(work_dir, "simjoin_store")
    comp_dir = os.path.join(work_dir, "comp_store")
    chk = os.path.join(work_dir, "_chk")
    shutil.rmtree(store_dir, ignore_errors=True)
    shutil.rmtree(comp_dir, ignore_errors=True)
    fsio.delete(spark, os.path.join(work_dir, "folded_pairs.json"))
    empty = spark.read.parquet(docs_path).limit(0)
    build_simjoin_index(empty, store_dir, threshold=threshold, k=k)
    pairs_dir = store_dir + "/pairs"

    folded_p = os.path.join(work_dir, "folded_pairs.json")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        simjoin_append(spark, store_dir,
                       batch_df.select("doc_id", "text"),
                       batch_id=batch_id)
        folded = set(fsio.read_json(spark, folded_p)) \
            if fsio.exists(spark, folded_p) else set()
        listing = [f for f in fsio.list_files(spark, pairs_dir)
                   if f.endswith(".parquet")]
        new_files = [pairs_dir + "/" + f for f in listing
                     if f not in folded]
        if new_files:
            new_pairs = spark.read.parquet(*new_files)
            if not fsio.exists(spark, fsio.join(comp_dir, "meta.json")):
                build_components_store(new_pairs, comp_dir,
                                       a_col="a_id", b_col="b_id")
            else:
                components_append(spark, comp_dir, new_pairs,
                                  a_col="a_id", b_col="b_id")
        # watermark advances ONLY after the fold committed: a crash
        # above re-folds these files on replay, which contraction
        # makes a label no-op
        fsio.write_json(spark, folded_p, sorted(listing))
        if auto_refreeze_ratio is not None:
            # refreeze rewrites prefix/dfreq only -- the pairs files
            # (and so the folded watermark) are untouched
            _maybe_refreeze(spark, store_dir, auto_refreeze_ratio)
        if auto_compact_files_per_bucket is not None \
                and _maybe_compact_simjoin(spark, store_dir,
                                           auto_compact_files_per_bucket):
            # compaction rewrote the pairs files: re-anchor the
            # watermark to the new names NOW (the folded pair SET is
            # unchanged), so the next batch does not pay the
            # documented full re-fold that an EXTERNAL compaction
            # still triggers
            fsio.write_json(
                spark, folded_p,
                sorted(f for f in fsio.list_files(spark, pairs_dir)
                       if f.endswith(".parquet")))

    stream = read_documents_stream(spark, docs_path, max_files_per_trigger)
    q = (stream.writeStream.foreachBatch(process)
         .trigger(availableNow=True)
         .option("checkpointLocation", chk)
         .start())
    q.awaitTermination()
    if not fsio.exists(spark, fsio.join(comp_dir, "meta.json")):
        return spark.createDataFrame([], "doc_id long, component long")
    return (components_read(spark, comp_dir)
            .select(F.col("node").alias("doc_id"), "component")
            .orderBy("doc_id"))


def streaming_embedding_drift(spark: SparkSession, vectors_path: str,
                              ivfpq_store: str, work_dir: str,
                              max_files_per_trigger: int | None = None,
                              vec_col: str = "embedding"
                              ) -> DataFrame:
    """Streaming embedding-drift monitor, wired to the index it
    guards: every micro-batch of new vectors (a) raises a per-batch
    ALARM row -- the cosine between the batch's mean vector and the
    persisted IVF-PQ index's TRAINING-snapshot mean (build_ivfpq_index
    persists the training corpus's per-dim stats as ``dimstats/``) --
    and (b) folds its decimal-exact per-dim sums into a versioned
    state store (the profile-store discipline: batch_id-guarded,
    meta flipped last), so after the drain the ACCUMULATED report
    equals the one-shot ``embedding_drift(training snapshot, whole
    streamed corpus)`` EXACTLY (decimal addition is associative; batch
    boundaries cannot change the finalized means) -- the batch oracle
    carries over verbatim.

    Returns the finalized drift report; per-batch alarm rows land in
    ``work_dir/alerts`` (batch_id, cos_means) for the pytest that a
    shifted batch drops the cosine while identity batches stay ~1."""
    import shutil

    from automated_review_analysis_pipeline_spark import fsio
    from automated_review_analysis_pipeline_spark.operators.quality import (
        drift_from_stats,
        embedding_dim_stats,
        merge_dim_stats,
    )

    state_dir = os.path.join(work_dir, "drift_state")
    alerts_dir = os.path.join(work_dir, "alerts")
    chk = os.path.join(work_dir, "_chk")
    shutil.rmtree(state_dir, ignore_errors=True)
    shutil.rmtree(alerts_dir, ignore_errors=True)
    if not fsio.exists(spark, fsio.join(ivfpq_store, "dimstats")):
        raise FileNotFoundError(
            f"{ivfpq_store} has no dimstats/ -- the store predates the "
            f"round-13 training-snapshot stats; rebuild it with "
            f"build_ivfpq_index to enable drift monitoring")
    train_stats = spark.read.parquet(ivfpq_store + "/dimstats")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        meta_p = fsio.join(state_dir, "meta.json")
        meta = fsio.read_json(spark, meta_p) \
            if fsio.exists(spark, meta_p) else {"version": -1}
        if batch_id <= meta.get("last_batch_id", -1):
            return  # at-least-once replay: already folded
        batch_stats = embedding_dim_stats(batch_df, vec_col) \
            .localCheckpoint(eager=True)
        # per-batch alarm vs the index's training snapshot
        (drift_from_stats(train_stats, batch_stats)
         .agg(F.min("cos_means").alias("cos_means"))
         .select(F.lit(batch_id).alias("batch_id"), "cos_means")
         .write.mode("append").parquet(alerts_dir))
        if meta["version"] >= 0:
            old = spark.read.parquet(
                fsio.join(state_dir, f"stats/v{meta['version']}"))
            merged = merge_dim_stats(old, batch_stats)
        else:
            merged = batch_stats
        nxt = meta["version"] + 1
        merged.write.mode("overwrite").parquet(
            fsio.join(state_dir, f"stats/v{nxt}"))
        fsio.write_json(spark, meta_p,
                        {"version": nxt, "last_batch_id": batch_id})
        # a drained year of micro-batches must not keep a dir per batch
        from automated_review_analysis_pipeline_spark.operators.quality import (  # noqa: E501
            vacuum_versions,
        )
        vacuum_versions(spark, fsio.join(state_dir, "stats"), nxt,
                        keep=2)

    stream = read_documents_stream(spark, vectors_path,
                                   max_files_per_trigger)
    q = (stream.writeStream.foreachBatch(process)
         .trigger(availableNow=True)
         .option("checkpointLocation", chk)
         .start())
    q.awaitTermination()
    meta_p = fsio.join(state_dir, "meta.json")
    if not fsio.exists(spark, meta_p):  # empty stream: no new snapshot
        acc = spark.createDataFrame([], "dim int, s decimal(38,9), n long")
    else:
        meta = fsio.read_json(spark, meta_p)
        acc = spark.read.parquet(
            fsio.join(state_dir, f"stats/v{meta['version']}"))
    return drift_from_stats(train_stats, acc).orderBy("dim")


def _maybe_compact_bm25(spark: SparkSession, store_dir: str,
                        max_files_per_bucket: int) -> bool:
    """Inline OPTIMIZE trigger for the streaming BM25 lane: when any
    postings bucket has accumulated more than ``max_files_per_bucket``
    files (== appends since the last compaction; each append writes
    <= 1 file per bucket), fold the store with index_compact.
    Metadata-only check (file-name listing)."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (  # noqa: E501
        bucket_file_counts,
        index_compact,
    )

    buckets = bucket_file_counts(spark, store_dir + "/postings")
    if not buckets or max(buckets.values()) <= max_files_per_bucket:
        return False
    index_compact(spark, store_dir)
    return True


def streaming_bm25_index(spark: SparkSession, docs_path: str,
                         work_dir: str,
                         query_terms: tuple[str, ...],
                         max_files_per_trigger: int | None = None,
                         k: int = 20,
                         auto_compact_files_per_bucket: int | None = None
                         ) -> DataFrame:
    """Maintain a persisted BM25 inverted index under a document
    stream: the index starts EMPTY and every micro-batch
    bm25_index_appends (delta-only postings/doclen appends + exact
    counter bumps, batch_id-guarded so at-least-once replays fold
    once). Because search derives idf/avgdl from the ACCUMULATED state
    at query time, the drained search equals the one-shot
    :func:`~..operators.textanalysis.bm25_search` over the whole
    corpus EXACTLY -- the batch scoring oracle carries over verbatim.
    The freshness shape a continuously-ingesting retrieval service
    needs: each increment pays its own tokenization only.

    ``auto_compact_files_per_bucket`` closes the small-file loop the
    way ``auto_refreeze_ratio`` closes the selectivity one: each
    append adds <= 1 file per postings bucket, so files-per-bucket
    counts appends since the last OPTIMIZE; past the bound the lane
    runs ``index_compact`` inline (single-writer-safe -- foreachBatch
    serializes micro-batches) and the index folds back to one file
    per bucket. Scores are compaction-invariant (pytest-pinned)."""
    import shutil

    from automated_review_analysis_pipeline_spark.operators.textanalysis import (  # noqa: E501
        bm25_index_append,
        bm25_index_search,
        build_bm25_index,
    )

    store_dir = os.path.join(work_dir, "bm25_store")
    chk = os.path.join(work_dir, "_chk")
    shutil.rmtree(store_dir, ignore_errors=True)
    empty = spark.read.parquet(docs_path).limit(0)
    build_bm25_index(empty.select("doc_id", "text"), store_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bm25_index_append(spark, store_dir,
                          batch_df.select("doc_id", "text"),
                          batch_id=batch_id)
        if auto_compact_files_per_bucket is not None:
            _maybe_compact_bm25(spark, store_dir,
                                auto_compact_files_per_bucket)

    stream = read_documents_stream(spark, docs_path, max_files_per_trigger)
    q = (stream.writeStream.foreachBatch(process)
         .trigger(availableNow=True)
         .option("checkpointLocation", chk)
         .start())
    q.awaitTermination()
    return bm25_index_search(spark, store_dir, query_terms, k=k)


def streaming_profile_stats(spark: SparkSession, docs_path: str,
                            work_dir: str,
                            max_files_per_trigger: int | None = None
                            ) -> DataFrame:
    """Streaming ANALYZE: maintain the incremental profile store
    (operators.quality.build_profile_store) under a document stream --
    every micro-batch folds ONLY its own rows into the persisted
    <= k x 513-row register state (profile_append), old versions are
    vacuumed down to 2 as the drain proceeds, and the drained stats
    equal the one-shot column_stats of the whole corpus EXACTLY (the
    register/count/bound merge law is associative and commutative, so
    batch boundaries cannot change the result) -- the batch hll oracle
    carries over verbatim. The profile a 100 TB ingest keeps current
    at the cost of each increment's scan."""
    import shutil

    from automated_review_analysis_pipeline_spark.operators.quality import (
        build_profile_store,
        profile_append,
        profile_stats,
        profile_vacuum,
    )

    store_dir = os.path.join(work_dir, "profile_store")
    chk = os.path.join(work_dir, "_chk")
    shutil.rmtree(store_dir, ignore_errors=True)
    empty = spark.read.parquet(docs_path).limit(0)
    build_profile_store(empty, store_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch is at-least-once: the batch_id guard makes a
        # replayed micro-batch a no-op, so the fold stays exactly-once
        # (profile_append's version flip is atomic, so even a crash
        # MID-append replays cleanly)
        profile_append(spark, store_dir, batch_df, batch_id=batch_id)
        profile_vacuum(spark, store_dir, keep=2)

    stream = read_documents_stream(spark, docs_path, max_files_per_trigger)
    q = (stream.writeStream.foreachBatch(process)
         .trigger(availableNow=True)
         .option("checkpointLocation", chk)
         .start())
    q.awaitTermination()
    return profile_stats(spark, store_dir)
