"""Data-quality expectations: declarative row-level rules evaluated in
ONE pass, plus uniqueness checks -- the contract-enforcement layer a
pipeline runs before publishing a table (the Delta Live Tables /
Great Expectations shape, rebuilt on plain DataFrame ops).

Row rules compile to ``sum(rule violated)`` aggregates inside a single
hash aggregation: one scan, map-side partials, no per-rule jobs.
Uniqueness rules need their own groupBy (a shuffle per distinct key set)
-- that cost is inherent to the check, so they are listed separately and
the single-pass guarantee is kept honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame,
                        rules: dict[str, Column],
                        unique: dict[str, list[str]] | None = None
                        ) -> DataFrame:
    """Evaluate named expectations and return one row per rule:
    (rule, n_violations, violation_rate).

    ``rules`` maps rule name -> BOOLEAN Column that is True when the row
    SATISFIES the expectation (NULL counts as a violation -- an
    expectation that cannot be evaluated is not met). ``unique`` maps
    rule name -> key column list; its violation count is the number of
    EXTRA rows beyond one per key (0 = key is unique).
    """
    if not rules and not unique:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
            .alias(name))
    base = df.agg(*aggs).collect()[0]
    n_rows = base["__n"]
    out_rows = [(name, int(base[name])) for name in rules]

    for name, keys in (unique or {}).items():
        extra = (
            df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("x"))
            .collect()[0]["x"])
        out_rows.append((name, int(extra)))

    spark = df.sparkSession
    res = spark.createDataFrame(out_rows, "rule string, n_violations long")
    denom = float(n_rows) if n_rows else 1.0
    return (
        res.select(
            "rule", "n_violations",
            F.round(F.col("n_violations") / F.lit(denom), 6)
            .alias("violation_rate"))
        .orderBy("rule")
    )


def table_fingerprint(df: DataFrame, group_cols: list[str],
                      cols: list[str] | None = None) -> DataFrame:
    """Cross-engine, order-independent content fingerprint per group:
    the backfill/migration validation primitive -- run it on both sides
    of a copy (engines, clusters, formats) and compare (n_rows,
    fingerprint) per partition group instead of shipping either dataset.

    Each row canonicalizes to md5(concat_ws(US, <cols as strings>))
    with NULL -> a sentinel (so NULL and the string 'null' differ);
    the group fingerprint is the BIT_XOR of the first-12-hex-digit
    integers of those hashes -- commutative (row order never matters),
    overflow-free at any row count, and identical arithmetic on any
    engine with md5 + xor (the same portability discipline as the
    split/quota/HLL operators). One hash aggregate with map-side
    partials: at 100 TB this runs at scan parallelism and shuffles one
    (group, 8-byte xor, count) triple per group.
    """
    use_cols = cols if cols is not None else [
        c for c in df.columns if c not in group_cols]
    canon = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
             for c in use_cols]
    row_h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *canon)), 1, 12), 16, 10
    ).cast("long")
    return (
        df.select(*group_cols, row_h.alias("__h"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__h)").alias("fingerprint"),
        )
        .orderBy(*group_cols)
    )


def _row_canon_hash(cols: list[str]) -> Column:
    """64-bit row hash over the table_fingerprint canonical form
    (US-joined, NULL-sentineled string casts -- hashing the CANONICAL
    STRING, not the raw columns, keeps ('x', NULL) distinct from
    (NULL, 'x'): Spark's multi-arg xxhash64 skips NULL columns, which
    would collide those). xxhash64 stays JVM-native with no string
    slicing; the diff hash never crosses engines (the oracle compares
    full values), so portability is not a constraint here, unlike
    table_fingerprint's cross-engine md5 fold."""
    canon = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
             for c in cols]
    return F.xxhash64(F.concat_ws("\x1f", *canon))


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Snapshot diff: one row per key that was ADDED, REMOVED, or
    CHANGED between two versions of a table -- the migration/backfill
    validation primitive one step finer than
    :func:`table_fingerprint` (which says WHETHER a group diverged;
    this says WHICH keys and HOW).

    Each side reduces to (key, row_hash) before the full outer join, so
    the shuffle carries two longs per row, never the payload; unchanged
    keys (the overwhelming majority in any real diff) are filtered
    post-join with no further work. At 100 TB bucket both snapshots by
    the key for an exchange-free sort-merge. Output: key columns +
    ``diff_status`` in {'added','removed','changed'}, sorted by key.

    The hash comparison is probabilistic BY DESIGN: a changed key whose
    old/new payloads collide under the 64-bit xxhash64 row hash reports
    as unchanged with probability ~2^-64 per changed key -- the
    standard diff tradeoff (shuffling two longs instead of the payload).
    The DuckDB oracle compares full values, which is strictly stronger;
    any divergence would surface there first."""
    use_cols = compare_cols if compare_cols is not None else [
        c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, _row_canon_hash(use_cols).alias("__old_h"))
    n = new.select(*key_cols, _row_canon_hash(use_cols).alias("__new_h"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
    )
    return (
        joined.withColumn("diff_status", status)
        .where(F.col("diff_status").isNotNull())
        .select(*key_cols, "diff_status")
        .orderBy(*key_cols)
    )


def psi_drift(documents: DataFrame, value_col: str = "n_chars",
              n_bins: int = 10, bin_width: int = 200) -> DataFrame:
    """Population Stability Index between the train and test splits of a
    corpus -- the standard production drift monitor: bucketize a numeric
    signal into equi-width bins, compare the two bin-share distributions,
    and report each bin's contribution psi = (p - q) * ln(p / q). Total
    PSI (sum of terms) > 0.2 conventionally flags actionable drift; here
    the reference/current populations are the deterministic hash splits
    (so on an UNSHIFTED corpus PSI ~ 0, a self-test of the split's
    uniformity), and retargeting ``documents`` to two time windows or
    snapshot versions monitors real drift with the same plan.

    Add-half smoothing ((n + 0.5) / (N + 0.5 * B)) keeps empty bins
    finite without dropping them, and the output always carries the FULL
    0..n_bins-1 spine (a static n_bins-row frame left-joined with the
    observed counts), so the emitted p/q shares sum to 1 and total PSI
    equals the standard all-bins formula even when some bins are empty
    in both splits. Values below 0 (or NULL) clamp into bin 0, values
    past the last edge into bin n_bins-1. Plan: one narrow projection
    (split hash + bin), one hash aggregate pivoting both sides via
    conditional sums, a broadcast join against the tiny spine, then
    per-bin arithmetic against broadcast totals -- one shuffle on the
    bin key regardless of corpus size. Terms round to 9dp for the
    cross-engine oracle.
    """
    from automated_review_analysis_pipeline_spark.operators.curation import (
        split_label,
    )

    binned = documents.select(
        split_label("doc_id").alias("split"),
        F.greatest(
            F.lit(0),
            F.least(F.lit(n_bins - 1),
                    F.floor(F.coalesce(F.col(value_col), F.lit(0))
                            / bin_width)))
        .cast("int")
        .alias("bin"),
    ).where(F.col("split").isin("train", "test"))
    spine = documents.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin"))
    counts = (
        spine.join(
            binned.groupBy("bin").agg(
                F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
                .alias("n_ref"),
                F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
                .alias("n_cur"),
            ),
            "bin", "left")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    totals = counts.agg(F.sum("n_ref").alias("__tr"),
                        F.sum("n_cur").alias("__tc"))
    p = ((F.col("n_ref") + 0.5)
         / (F.col("__tr") + 0.5 * n_bins))
    q = ((F.col("n_cur") + 0.5)
         / (F.col("__tc") + 0.5 * n_bins))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bin", "n_ref", "n_cur",
            F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
        )
        .orderBy("bin")
    )


def column_stats(df: DataFrame) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE pass: for every
    column, (n_rows, n_nulls, n_distinct exact, min/max) -- the stats
    table every optimizer, data-quality monitor, and "what is in this
    100 TB table" first-look needs. All columns aggregate in a single
    wide SELECT (one scan, one partial+final aggregate -- never one
    job per column), then the one result row melts to long form with
    ``stack``.

    min/max land in TYPED slots so no engine-specific string
    formatting can diverge: numerics (and timestamps, as unix micros)
    fill ``min_num/max_num``; strings fill ``min_str/max_str``;
    booleans count as numeric 0/1; other types (arrays, structs,
    binary) report counts only. n_distinct is EXACT (count_distinct;
    the approx lane for 100 TB is the portable-HLL operator family)."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    kinds: dict[str, str] = {}
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType,
                      (TimestampType, TimestampNTZType, DateType)):
            num = F.unix_micros(c.cast("timestamp")).cast("double")
            kinds[f.name] = "num"
        elif isinstance(f.dataType, BooleanType):
            num = c.cast("int").cast("double")
            kinds[f.name] = "num"
        elif isinstance(f.dataType, NumericType):
            num = c.cast("double")
            kinds[f.name] = "num"
        elif isinstance(f.dataType, StringType):
            num = None
            kinds[f.name] = "str"
        else:
            num = None
            kinds[f.name] = "other"
        aggs.append(F.count(F.when(c.isNull(), 1))
                    .alias(f"__nulls_{f.name}"))
        # maps are not comparable -- count_distinct would throw; report
        # NULL ndv for them instead of failing the whole profile
        from pyspark.sql.types import MapType

        if isinstance(f.dataType, MapType):
            aggs.append(F.lit(None).cast("long").alias(f"__nd_{f.name}"))
        else:
            aggs.append(F.count_distinct(c).alias(f"__nd_{f.name}"))
        if kinds[f.name] == "num":
            aggs.append(F.min(num).alias(f"__min_{f.name}"))
            aggs.append(F.max(num).alias(f"__max_{f.name}"))
        elif kinds[f.name] == "str":
            aggs.append(F.min(c).alias(f"__min_{f.name}"))
            aggs.append(F.max(c).alias(f"__max_{f.name}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for f in df.schema.fields:
        k = kinds[f.name]
        structs.append(F.struct(
            F.lit(f.name).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__nulls_{f.name}").cast("long").alias("n_nulls"),
            F.col(f"__nd_{f.name}").cast("long").alias("n_distinct"),
            (F.round(F.col(f"__min_{f.name}"), 6) if k == "num"
             else null_d).alias("min_num"),
            (F.round(F.col(f"__max_{f.name}"), 6) if k == "num"
             else null_d).alias("max_num"),
            (F.col(f"__min_{f.name}") if k == "str"
             else null_s).alias("min_str"),
            (F.col(f"__max_{f.name}") if k == "str"
             else null_s).alias("max_str"),
        ))
    return (one.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.*").orderBy("column"))


def parquet_footer_stats(spark, paths: list[str]) -> DataFrame:
    """Distributed parquet FOOTER introspection -- the manifest-building
    primitive: given a file list, executors read each footer with
    pyarrow (metadata-only -- no data pages touched) and emit one row
    per (file, row group, column) with value counts, null counts, and
    compressed/uncompressed byte sizes. At 100 TB this is how a layout
    audit or a table-format manifest bootstrap runs: millions of
    footers fan out across the cluster, ~KBs read per file.

    Cross-engine pinned by pytest against DuckDB's parquet_metadata()
    on the same files (path-bound table functions sit outside the
    registry's view-only oracle harness, so the full-value check lives
    in tests)."""
    import os

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for path in b["path"]:
                md = pq.ParquetFile(path).metadata
                fname = os.path.basename(path)
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for c in range(rg.num_columns):
                        col = rg.column(c)
                        st = col.statistics
                        rows.append((
                            fname, g, rg.num_rows, col.path_in_schema,
                            col.num_values,
                            None if st is None or not st.has_null_count
                            else st.null_count,
                            col.total_compressed_size,
                            col.total_uncompressed_size,
                            str(col.compression),
                        ))
            yield pd.DataFrame(rows, columns=[
                "file_name", "row_group_id", "n_rows", "column",
                "n_values", "n_nulls", "compressed_bytes",
                "uncompressed_bytes", "compression"])

    files = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(min(len(paths), 64))
    return files.mapInPandas(
        read_footers,
        "file_name string, row_group_id int, n_rows long, column string, "
        "n_values long, n_nulls long, compressed_bytes long, "
        "uncompressed_bytes long, compression string"
    ).orderBy("file_name", "row_group_id", "column")
