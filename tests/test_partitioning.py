"""Bucketing eliminates join shuffles; salting preserves aggregate
semantics; partitioned writes prune. Proven on executed plans, not
documentation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark.operators.partitioning import (
    bucketed_join,
    partitioned_write,
    salted_aggregate,
    write_bucketed,
)
from automated_review_analysis_pipeline_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed(orders, "b_orders", ["o_orderkey"], 4,
                       sort_by=["o_orderkey"])
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", ["o_orderkey"], 4, sort_by=["o_orderkey"])
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually returns the right number of rows
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_layout_skips_in_both_dimensions(spark, sf_dir, tmp_path):
    """The data-skipping claim itself: after zorder_write on
    (o_custkey, order-day), EVERY output file's min/max range must be
    narrow in BOTH dimensions simultaneously (~sqrt scaling of the
    Z-curve), which is what lets parquet row-group stats prune scans
    filtered on EITHER column. A 1-D sort by custkey gives narrow custkey
    ranges but full-width date ranges -- asserted as the contrast."""
    import glob

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        zorder_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day"))
    full_cust = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey"))).first()[0]
    full_day = orders.agg((F.max("day") - F.min("day"))).first()[0]

    def file_spans(path):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            stats = spark.read.parquet(f).agg(
                F.min("o_custkey"), F.max("o_custkey"),
                F.min("day"), F.max("day")).first()
            spans.append(((stats[1] - stats[0]) / full_cust,
                          (stats[3] - stats[2]) / full_day))
        return spans

    z_path = str(tmp_path / "zorder")
    zorder_write(orders, z_path, "o_custkey", "day", n_files=16)
    z = file_spans(z_path)
    assert len(z) == 16
    # every z-ordered file is narrow in BOTH dimensions at once
    avg_cust = sum(c for c, _ in z) / len(z)
    avg_day = sum(d for _, d in z) / len(z)
    assert avg_cust < 0.45 and avg_day < 0.45, (avg_cust, avg_day)

    # contrast: 1-D sort by custkey leaves the day dimension full-width
    s_path = str(tmp_path / "sorted1d")
    (orders.repartitionByRange(16, "o_custkey")
     .sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(s_path))
    s = file_spans(s_path)
    s_avg_day = sum(d for _, d in s) / len(s)
    assert s_avg_day > 0.9  # no skipping possible on day
    assert avg_day < s_avg_day / 2


def test_compact_files_reduces_count_preserves_rows(spark, sf_dir, tmp_path):
    """64 tiny files -> byte-budgeted few files, zero row loss, and the
    rewrite plan is shuffle-free (coalesce, not repartition)."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        compact_files,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = compact_files(spark, src, out, target_file_bytes=1 << 20)
    produced = glob.glob(f"{out}/*.parquet")
    assert len(produced) == n < 64
    assert spark.read.parquet(out).count() == docs.count()
    # content equality, not just counts
    assert (spark.read.parquet(out).select("doc_id").exceptAll(
        docs.select("doc_id")).count() == 0)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Source-level schema evolution: two parquet generations with
    different columns read back as ONE union schema via mergeSchema --
    how a long-lived ingestion directory keeps old files readable after
    a column is added."""
    spark.createDataFrame([(1, "a")], "id long, old_col string") \
        .write.parquet(str(tmp_path / "t"), mode="append")
    spark.createDataFrame([(2, "b", 9.5)],
                          "id long, old_col string, new_col double") \
        .write.parquet(str(tmp_path / "t"), mode="append")
    merged = spark.read.option("mergeSchema", "true") \
        .parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "old_col", "new_col"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["new_col"] is None      # backfilled null for old files
    assert rows[2]["new_col"] == 9.5


def test_salted_aggregate_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
             .alias("s"))
        .collect()
    }
    salted = salted_aggregate(
        li, ["l_returnflag"],
        aggs=[F.count(F.lit(1)).alias("pn"),
              F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("ps")],
        merge_aggs=[F.sum("pn").alias("n"),
                    F.sum("ps").cast("double").alias("s")],
    )
    got = {(r["l_returnflag"],): (r["n"], round(r["s"], 2))
           for r in salted.collect()}
    assert got == direct


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    partitioned_write(docs, out, ["lang"])
    scan = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert scan.count() == docs.where(F.col("lang") == "en").count()


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join handling must actually fire on a pathologically
    skewed sort-merge join: with the skew thresholds lowered, the
    executed adaptive plan reports the skewed partition split
    (isSkew=true / skew=true marker), and results stay correct. This is
    the runtime half of the skew story (operators/partitioning.py's
    salting is the plan-time half)."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 50k rows of key 0 vs ~100 of everything else: one partition
        # dwarfs the rest
        left = spark.range(0, 60000).select(
            F.when(F.col("id") < 50000, 0).otherwise(F.col("id") % 100)
            .alias("k"), F.col("id").alias("v"))
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = left.join(right, "k")
        # execute THIS frame (count() would spawn its own QueryExecution
        # and leave joined's adaptive plan unfinalized)
        rows = joined.collect()
        assert len(rows) == 60000  # every left row matches one right key
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "isSkew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_assign_global_ids_matches_single_window_and_shards(spark, sf_dir):
    """Two-pass bucket-offset ids == the naive single-partition
    row_number, on an ordering key with heavy duplicates (n_chars) --
    and the executed plan contains NO single-partition exchange: the
    window is partitioned by the range bucket."""
    from pyspark.sql import Window

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        assign_global_ids,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars"))
    got = assign_global_ids(d, ["n_chars", "doc_id"], n_buckets=8) \
        .select("doc_id", "global_id")
    naive = d.withColumn(
        "global_id",
        F.row_number().over(Window.orderBy("n_chars", "doc_id"))
    ).select("doc_id", "global_id")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in final, final[:2000]
    assert "Window" in final and "__gid_bucket" in final

    # ids are contiguous 1..N
    n = d.count()
    ids = [r[0] for r in got.select("global_id").collect()]
    assert sorted(ids) == list(range(1, n + 1))


def test_assign_global_ids_start_empty_and_constant_key(spark):
    """start offset honored; empty input keeps the schema; an all-equal
    leading key (every row in one bucket) still yields a total order via
    the tiebreak column."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        assign_global_ids,
    )

    df = spark.createDataFrame(
        [(5, "c"), (5, "a"), (5, "b")], "k int, name string")
    out = assign_global_ids(df, ["k", "name"], n_buckets=4, start=100)
    assert [(r["name"], r["global_id"])
            for r in out.orderBy("global_id").collect()] == \
        [("a", 100), ("b", 101), ("c", 102)]

    empty = assign_global_ids(df.where("k > 99"), ["k", "name"])
    assert empty.count() == 0
    assert "global_id" in empty.columns


def test_assign_global_ids_adversarial_key_shapes(spark):
    """Shapes that break naive range bucketing: negative keys, one
    huge outlier (all other rows collapse into bucket 0), heavy
    duplicates, a single row, and a two-row extreme span -- ids must
    equal the total-order rank in every case."""
    import random

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        assign_global_ids,
    )

    rng = random.Random(7)
    shapes = [
        [(-5, "a"), (-5, "b"), (0, "c"), (3, "d")],           # negatives+dups
        [(1, f"r{i}") for i in range(50)] + [(10**12, "big")],  # outlier
        [(rng.randrange(-100, 100), f"x{i}") for i in range(200)],
        [(42, "only")],                                        # single row
        [(-(2**40), "lo"), (2**40, "hi")],                     # extreme span
    ]
    for rows in shapes:
        df = spark.createDataFrame(rows, "k long, name string")
        got = {(r["k"], r["name"]): r["global_id"]
               for r in assign_global_ids(df, ["k", "name"],
                                          n_buckets=7).collect()}
        want = {kv: i + 1
                for i, kv in enumerate(sorted(rows))}
        assert got == want, rows[:5]


def test_assign_global_ids_tie_skew_spreads_buckets(spark):
    """A CONSTANT leading key (the worst tie skew: every row shares the
    modal value) must still spread across bucket partitions via the
    tiebreak column -- the range partitioner splits on the FULL tuple.
    Verified on the actual per-bucket window partition sizes, not just
    the final ids."""
    from pyspark.sql import Window

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        assign_global_ids,
    )

    n = 4000
    df = spark.range(n).select(
        F.lit(7).alias("k"), F.col("id").alias("name"))
    out = assign_global_ids(df, ["k", "name"], n_buckets=8)
    ids = [r[0] for r in out.select("global_id").collect()]
    assert sorted(ids) == list(range(1, n + 1))

    # direct measurement of the bucket spread the window will see
    spread = (df.repartitionByRange(8, F.col("k"), F.col("name"))
              .groupBy(F.spark_partition_id().alias("b")).count())
    sizes = [r["count"] for r in spread.collect()]
    assert len(sizes) >= 4, sizes          # not collapsed into one bucket
    assert max(sizes) < n * 0.5, sizes     # no bucket holds half the rows

    # ids follow the tiebreak order exactly
    got = {r["name"]: r["global_id"] for r in out.collect()}
    assert got == {i: i + 1 for i in range(n)}


def test_assign_global_ids_null_leading_keys(spark):
    """NULLs in the leading order column neither crash the offset pass
    nor drop rows: they sort FIRST (Spark ASC NULLS FIRST) consistently
    in the range partitioner and the rank window."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        assign_global_ids,
    )

    rows = [(None, "n2"), (3, "c"), (None, "n1"), (1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "k int, name string")
    out = assign_global_ids(df, ["k", "name"], n_buckets=4)
    got = [(r["k"], r["name"])
           for r in out.orderBy("global_id").collect()]
    assert got == [(None, "n1"), (None, "n2"), (1, "a"), (2, "b"), (3, "c")]
    assert sorted(r["global_id"] for r in out.collect()) == [1, 2, 3, 4, 5]


def test_exclusive_prefix_sum_matches_window_and_handles_edges(spark):
    """Two-pass exclusive prefix sum == the naive single-partition
    running total, on duplicates, NULL values (count as 0), a constant
    order key (tie skew), and empty input -- and the executed plan has
    no single-partition exchange."""
    from pyspark.sql import Window

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        exclusive_prefix_sum,
    )

    rows = [(i % 17, f"r{i}", (i * 7) % 23 if i % 9 else None)
            for i in range(500)]
    df = spark.createDataFrame(rows, "k int, name string, v int")
    got = {r["name"]: r["off"]
           for r in exclusive_prefix_sum(df, ["k", "name"], "v",
                                         n_buckets=8,
                                         out_name="off").collect()}
    w = (Window.orderBy("k", "name")
         .rowsBetween(Window.unboundedPreceding, -1))
    want = {r["name"]: r["off"] for r in df.withColumn(
        "off", F.coalesce(
            F.sum(F.coalesce(F.col("v"), F.lit(0))).over(w),
            F.lit(0))).collect()}
    assert got == want

    const = spark.createDataFrame(
        [(1, f"r{i}", 2) for i in range(100)], "k int, name string, v int")
    out = exclusive_prefix_sum(const, ["k", "name"], "v", n_buckets=4)
    offs = sorted(r["offset"] for r in out.collect())
    assert offs == [2 * i for i in range(100)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan.split("== Initial Plan ==")[0]

    empty = exclusive_prefix_sum(const.where("k > 9"), ["k", "name"], "v")
    assert empty.count() == 0 and "offset" in empty.columns


def test_sorted_export_range_read_prunes_files(spark, sf_dir, tmp_path):
    """sorted_export writes deterministic fixed-size sorted runs whose
    manifest a range read prunes against: the pruned plan reads ONLY the
    overlapping file directories (verified on the scan's file listing),
    rows inside each run are sorted, and the pruned result equals the
    unpruned filter exactly. Empty ranges read nothing."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        read_sorted_range,
        sorted_export,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars"))
    out = str(tmp_path / "export")
    manifest = sorted_export(d, out, ["n_chars", "doc_id"],
                             rows_per_file=64).collect()
    n = d.count()
    assert sum(r["n_rows"] for r in manifest) == n
    assert [r["min_gid"] for r in manifest] == \
        [64 * i + 1 for i in range(len(manifest))]
    # key ranges tile the sorted order
    for a, b in zip(manifest, manifest[1:]):
        assert a["max_key"] <= b["min_key"]

    # per-file sort order
    import glob

    f0 = glob.glob(out + "/data/file_id=0/*.parquet")[0]
    rows0 = spark.read.parquet(f0).select("n_chars", "doc_id").collect()
    assert rows0 == sorted(rows0, key=lambda r: (r[0], r[1]))

    # range read: prunes to overlapping files only, result == full filter
    lo, hi = manifest[2]["min_key"], manifest[3]["max_key"]
    pruned = read_sorted_range(spark, out, lo, hi)
    want = sorted((r["n_chars"], r["doc_id"])
                  for r in d.where(F.col("n_chars").between(lo, hi))
                  .collect())
    got = sorted((r["n_chars"], r["doc_id"]) for r in pruned.collect())
    assert got == want and got
    scan_files = {r[0] for r in pruned.withColumn(
        "f", F.input_file_name()).select("f").distinct().collect()}
    overlapping = {m["file_id"] for m in manifest
                   if not (hi < m["min_key"] or lo > m["max_key"])}
    assert len(overlapping) < len(manifest)  # pruning actually happened
    for f in scan_files:
        fid = int(f.split("file_id=")[1].split("/")[0])
        assert fid in overlapping, (fid, sorted(overlapping))

    # empty range
    empty = read_sorted_range(spark, out, 10**9, 10**9 + 5)
    assert empty.count() == 0

    # rebuild determinism: same corpus -> identical manifest
    out2 = str(tmp_path / "export2")
    again = sorted_export(d, out2, ["n_chars", "doc_id"],
                          rows_per_file=64).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in manifest]


def test_read_sorted_slice_positional_resume(spark, sf_dir, tmp_path):
    """Positional gid-slice reads open only the arithmetic-overlapping
    files and return exactly the requested contiguous rank range, in
    order across file boundaries."""
    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        read_sorted_slice,
        sorted_export,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars"))
    out = str(tmp_path / "export")
    manifest = sorted_export(d, out, ["n_chars", "doc_id"],
                             rows_per_file=64).collect()

    lo, hi = 100, 240  # spans files 1..3 (64-row files)
    sl = read_sorted_slice(spark, out, lo, hi)
    gids = sorted(r["global_id"] for r in sl.collect())
    assert gids == list(range(lo, hi + 1))
    files = {r[0] for r in sl.withColumn(
        "f", F.input_file_name()).select("f").distinct().collect()}
    fids = {int(f.split("file_id=")[1].split("/")[0]) for f in files}
    assert fids == {1, 2, 3}, fids
    assert len(fids) < len(manifest)

    # out-of-range slice reads nothing
    assert read_sorted_slice(spark, out, 10**7, 10**7 + 9).count() == 0


def test_sorted_export_string_key_empty_input_and_parquet_manifest(
        spark, sf_dir, tmp_path):
    """The manifest is a PARQUET TABLE whose min/max key columns take
    the leading order column's own type (here: string), an empty input
    exports an empty typed manifest that both readers handle, and the
    readers prune via the manifest table, never a monolithic JSON."""
    import os

    from automated_review_analysis_pipeline_spark.operators.partitioning import (
        read_sorted_range,
        read_sorted_slice,
        sorted_export,
    )
    from automated_review_analysis_pipeline_spark.sources.tables import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("n_chars"))
    out = str(tmp_path / "export_str")
    manifest = sorted_export(d, out, ["lang", "doc_id"], rows_per_file=64)
    assert manifest.schema["min_key"].dataType.simpleString() == "string"
    assert os.path.isdir(out + "/manifest")  # the scale-path index
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == d.count()

    got = sorted((r["lang"], r["doc_id"])
                 for r in read_sorted_range(spark, out, "de", "en")
                 .collect())
    want = sorted((r["lang"], r["doc_id"])
                  for r in d.where(F.col("lang").between("de", "en"))
                  .collect())
    assert got == want and got

    # empty input: typed empty manifest, readers return typed empties
    empty_out = str(tmp_path / "export_empty")
    m0 = sorted_export(d.where(F.lit(False)), empty_out,
                       ["lang", "doc_id"], rows_per_file=64)
    assert m0.count() == 0
    assert m0.schema["min_key"].dataType.simpleString() == "string"
    r0 = read_sorted_range(spark, empty_out, "a", "z")
    assert r0.count() == 0
    assert r0.schema["lang"].dataType.simpleString() == "string"
    assert read_sorted_slice(spark, empty_out, 1, 10).count() == 0


def test_simjoin_store_side_candidate_join_no_exchange(
        spark, sf_dir, tmp_path):
    """Round-13 scale fix, plan-gated: the persisted simjoin store's
    /prefix is BUCKETED by tok, so (a) the one-shot candidate
    self-join shuffles NEITHER side on the join key, and (b) a delta
    append shuffles ONLY the |delta| prefix -- the store side reads
    pre-partitioned (Bucketed: true) with no Exchange. Before this,
    every append (and every streaming micro-batch) re-shuffled the
    whole accumulated store."""
    from pyspark.sql import functions as F

    from automated_review_analysis_pipeline_spark import fsio
    from automated_review_analysis_pipeline_spark.operators import dedup

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "text")
        store = str(tmp_path / "sj")
        dedup.build_simjoin_index(docs.where(F.col("doc_id") % 2 == 0),
                                  store, threshold=0.5)
        nb = fsio.read_json(spark, store + "/meta.json")["n_buckets"]
        pref = dedup._register_prefix_table(spark, store, nb)

        # (a) one-shot self-join: zero exchanges on the join key
        p_self = (dedup._simjoin_candidates(pref, pref, 0.5)
                  ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in p_self, p_self
        assert p_self.count("Exchange hashpartitioning(tok#") == 0, p_self

        # (b) delta append join: exactly ONE tok exchange (delta side)
        delta = docs.where(F.col("doc_id") % 2 == 1)
        toks = (delta.select(F.col("doc_id").alias("id"), "text")
                .withColumn("__toks", dedup.shingle_tokens(F.col("text")))
                .select("id", F.explode(dedup.word_shingles_from_tokens(
                    F.col("__toks"), 3)).alias("tok")))
        dfreq = spark.read.parquet(store + "/dfreq")
        new_prefix = dedup._simjoin_prefix(toks, dfreq, 0.5) \
            .localCheckpoint(eager=True)
        p_delta = (dedup._cross_candidates_canonical(new_prefix, pref, 0.5)
                   ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in p_delta, p_delta
        assert p_delta.count("Exchange hashpartitioning(tok#") == 1, \
            p_delta
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
