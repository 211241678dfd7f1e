"""Deterministic, mergeable frequency sketches as relational plans.

Count-min (Cormode/Muthukrishnan 2005): d hash rows x w buckets of
counters; point estimate = min over rows of the key's bucket counter.
Spark-first reading: the counter table IS a groupBy aggregate -- partial
aggregation collapses each executor's contribution to <= d*w rows before
the shuffle, which is exactly the sketch's mergeability property (the
reason a 1000-executor build ships KBs, not the keys). The hash family is
the portable md5 convention (cf. operators/dedup.py), so the DuckDB
oracle rebuilds the identical counters and the estimate check is exact,
not statistical.

Spark's own ``count_min_sketch`` aggregate exists but its binary sketch
is not comparable across engines; building the counters relationally
keeps the operator oracle-checkable and the plan transparent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CMS_PRIME = 2_147_483_647


def _cms_hash(key: Column, row_i: int, w: int) -> Column:
    """Row-``row_i`` bucket of ``key``: md5 of a salted rendering -> int32
    -> mod w. Independent rows come from the salt, not from coefficient
    families -- md5 already mixes."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row_i}:"),
                                   key.cast("string"))), 1, 8),
        16, 10).cast("long")
    return (h % CMS_PRIME) % F.lit(w)


def count_min_counters(df: DataFrame, key_col: str,
                       d: int = 4, w: int = 1024) -> DataFrame:
    """The d x w counter table: (row_i, bucket, n). One wide aggregate;
    the explode multiplies rows by d but partial hash aggregation bounds
    what crosses the wire at d*w per map task."""
    key = F.col(key_col)
    buckets = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 _cms_hash(key, i, w).alias("bucket"))
        for i in range(d)
    ])
    return (
        df.select(F.explode(buckets).alias("b"))
        .groupBy(F.col("b.row_i").alias("row_i"),
                 F.col("b.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_report(df: DataFrame, key_col: str,
                     d: int = 4, w: int = 1024) -> DataFrame:
    """Per-key exact count vs count-min estimate: (key, exact_n, cms_n,
    over_n). cms_n >= exact_n always (the sketch only over-counts);
    over_n shows the collision error the w/d choice buys.

    The counter table is at most d*w rows -- broadcast to the probe join
    regardless of the input's size. The input is scanned twice (counters
    + exacts); at scale both are one-pass partial aggregates over the
    same scan, and AQE/exchange reuse dedupes the scan when the plans
    canonicalize identically."""
    key = F.col(key_col)
    counters = count_min_counters(df, key_col, d, w)
    exact = df.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n"))
    probe_buckets = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 _cms_hash(F.col("key"), i, w).alias("bucket"))
        for i in range(d)
    ])
    probed = (
        exact.select("key", "exact_n", F.explode(probe_buckets).alias("b"))
        .select("key", "exact_n", "b.row_i", "b.bucket")
        .join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("n").alias("cms_n"))
    )
    return (
        probed.select(
            F.col("key"), "exact_n", "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("over_n"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# portable HyperLogLog (cross-engine bit-identical registers)
# ---------------------------------------------------------------------------
#
# Spark's hll_sketch_agg / approx_count_distinct carry engine-private
# binary sketches (rows-only checkable); this variant builds the HLL
# registers RELATIONALLY from the portable md5 hash convention, so the
# DuckDB oracle reproduces every register and the estimate check is
# exact, not statistical. Same merge property as count-min: the register
# table is a partial-aggregated groupBy max -- each executor ships at
# most m rows per group.
#
# Layout: 60-bit hash (15 md5 hex chars -- stays inside signed int64 on
# both engines); top HLL_B bits pick the register, rho = leading-zero
# count of the remaining 51 bits + 1 via binary-string length (Spark
# conv(x,10,2) / DuckDB bin(x) agree for positive ints), clamped at
# HLL_RHO_CLAMP so the 2^-reg sum can be computed as an EXACT integer
# sum of 2^(CLAMP-reg) -- no float-summation-order divergence between
# engines. Bias correction follows Flajolet et al. 2007: linear counting
# below 2.5m with V empty registers.

HLL_B = 9                      # 2^9 = 512 registers
HLL_M = 1 << HLL_B
HLL_W_BITS = 60 - HLL_B        # value bits per hash
HLL_RHO_CLAMP = 50
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, group_expr: Column,
                  key_col: str) -> DataFrame:
    """(grp, bucket, reg) register table: one partial-aggregated groupBy
    max. Mergeable by construction -- the union of two sketches is the
    per-bucket max of their registers, which is just further max
    aggregation over unioned register tables.

    The md5+conv hash is STAGED in its own projection (one evaluation
    per row); bucket and rho both reference the staged attribute, which
    CollapseProject declines to inline because it is expensive and
    multi-referenced (same discipline as dedup.stage_shingles -- without
    it the hash ran 3x per row)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"),
                                   F.col(key_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    staged = df.select(group_expr.alias("grp"), h.alias("__h"))
    hc = F.col("__h")
    bucket = F.shiftrightunsigned(hc, HLL_W_BITS)
    w = hc.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    rho = F.least(
        F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
            F.lit(HLL_W_BITS + 1) - F.length(F.conv(w, 10, 2))),
        F.lit(HLL_RHO_CLAMP))
    return (
        staged.select("grp", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(grp, hll_users) from a register table: integer-exact 2^-reg sum
    + Flajolet bias correction, pure column math."""
    scale = float(1 << HLL_RHO_CLAMP)
    return (
        regs.groupBy("grp")
        .agg(
            # shiftleft's python API wants a literal shift; the SQL form
            # takes a column
            F.sum(F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST({HLL_RHO_CLAMP} - reg AS INT))")).alias("s_int"),
            F.count(F.lit(1)).alias("observed"),
        )
        .withColumn("v_zero", F.lit(HLL_M) - F.col("observed"))
        .withColumn(
            "total",
            F.col("s_int").cast("double") / F.lit(scale)
            + F.col("v_zero").cast("double"))
        .withColumn(
            "e_raw",
            F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.col("total"))
        .withColumn(
            "hll_users",
            F.round(
                F.when(
                    (F.col("e_raw") <= F.lit(2.5 * HLL_M))
                    & (F.col("v_zero") > 0),
                    F.lit(float(HLL_M))
                    * F.log(F.lit(float(HLL_M))
                            / F.col("v_zero").cast("double")),
                ).otherwise(F.col("e_raw")), 4))
    )


def portable_hll_report(df: DataFrame, group_col: str,
                        key_col: str) -> DataFrame:
    """Per-group exact distinct count vs the portable-HLL estimate:
    (group, exact_users, hll_users, rel_err). The register build is one
    partial-aggregated groupBy max; the estimate is pure column math over
    the <= m-row-per-group register table."""
    per_group = hll_estimate(hll_registers(df, F.col(group_col), key_col))
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).alias("exact_users"))
    return (
        exact.join(per_group.select("grp", "hll_users"), "grp")
        .select(
            F.col("grp").alias(group_col), "exact_users", "hll_users",
            F.round(F.abs(F.col("hll_users") - F.col("exact_users"))
                    / F.col("exact_users"), 4).alias("rel_err"))
        .orderBy(group_col)
    )


def portable_rolling_hll_users(events: DataFrame,
                               window_days: int = 7,
                               ts_col: str = "ts",
                               key_col: str = "user_id") -> DataFrame:
    """Rolling N-day distinct users from the PORTABLE HLL: per-day
    register tables (persistable -- yesterday's registers never
    recompute), each day's registers fan out to the <= N windows they
    belong to, and the window union is a per-bucket MAX -- the
    mergeability property made literal as a second groupBy max over the
    tiny register table, never over the facts. Same shape as
    events.rolling_distinct_users_sketch but with cross-engine
    bit-identical registers, so the DuckDB oracle checks VALUES, not just
    row counts. Output: (day_us, hll_users)."""
    MICROS_PER_DAY = 86_400_000_000
    day_us = F.unix_micros(F.date_trunc("day", F.col(ts_col)))
    daily = hll_registers(events, day_us, key_col)
    fan = daily.select(
        F.explode(F.sequence(
            F.col("grp"),
            F.col("grp") + F.lit((window_days - 1) * MICROS_PER_DAY),
            F.lit(MICROS_PER_DAY))).alias("w_day"),
        "bucket", "reg")
    merged = (
        fan.select(F.col("w_day").alias("grp"), "bucket", "reg")
        .groupBy("grp", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    return (
        hll_estimate(merged)
        .select(F.col("grp").alias("day_us"), "hll_users")
        .orderBy("day_us")
    )


def _hll_fields_sql(key_expr: str) -> tuple[str, str]:
    """(bucket SQL, rho SQL) -- the DuckDB twin of _hll_fields."""
    h = (f"CAST(('0x' || substr(md5('hll:' || CAST({key_expr} AS VARCHAR))"
         f", 1, 15)) AS BIGINT)")
    w = f"({h} & {(1 << HLL_W_BITS) - 1})"
    bucket = f"({h} >> {HLL_W_BITS})"
    rho = (f"least(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1} "
           f"ELSE {HLL_W_BITS + 1} - length(bin({w})) END, "
           f"{HLL_RHO_CLAMP})")
    return bucket, rho


def _hll_estimate_sql(regs_cte: str, out_col: str) -> str:
    """est CTE body over a (grp, bucket, reg) CTE -- DuckDB twin of
    hll_estimate."""
    return f"""
  SELECT grp,
         round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M!r} / total
                         <= {2.5 * HLL_M!r} AND v_zero > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                               / v_zero::DOUBLE)
                    ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / total END,
               4) AS {out_col}
  FROM (
    SELECT grp,
           sum(CAST(1 AS BIGINT) << ({HLL_RHO_CLAMP} - reg))::DOUBLE
             / {float(1 << HLL_RHO_CLAMP)!r}
             + ({HLL_M} - count(*))::DOUBLE AS total,
           {HLL_M} - count(*) AS v_zero
    FROM {regs_cte} GROUP BY grp)
"""


def portable_rolling_hll_sql(table: str = "events",
                             window_days: int = 7,
                             ts_expr: str = "ts",
                             key_expr: str = "user_id") -> str:
    """DuckDB twin of portable_rolling_hll_users."""
    bucket, rho = _hll_fields_sql(key_expr)
    mpd = 86_400_000_000
    return f"""
WITH daily AS (
  SELECT epoch_us(date_trunc('day', {ts_expr})) AS grp,
         {bucket} AS bucket, max({rho}) AS reg
  FROM {table} GROUP BY 1, 2
), fan AS (
  SELECT unnest(range(grp, grp + {(window_days - 1) * mpd + 1},
                      {mpd})) AS grp2, bucket, reg
  FROM daily
), merged AS (
  SELECT grp2 AS grp, bucket, max(reg) AS reg FROM fan GROUP BY 1, 2
), est AS ({_hll_estimate_sql('merged', 'hll_users')})
SELECT grp AS day_us, hll_users FROM est ORDER BY day_us
"""


def portable_hll_sql(table: str, group_expr: str, key_expr: str) -> str:
    """DuckDB twin generated from the same constants: identical registers,
    identical integer 2^(CLAMP-reg) sum, identical estimate math."""
    return f"""
WITH hashed AS (
  SELECT {group_expr} AS grp,
         CAST(('0x' || substr(md5('hll:' || CAST({key_expr} AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM {table}
), fields AS (
  SELECT grp, h >> {HLL_W_BITS} AS bucket,
         least(CASE WHEN (h & {(1 << HLL_W_BITS) - 1}) = 0
                    THEN {HLL_W_BITS + 1}
                    ELSE {HLL_W_BITS + 1}
                         - length(bin(h & {(1 << HLL_W_BITS) - 1})) END,
               {HLL_RHO_CLAMP}) AS rho
  FROM hashed
), regs AS (
  SELECT grp, bucket, max(rho) AS reg FROM fields GROUP BY grp, bucket
), per_group AS (
  SELECT grp,
         sum(CAST(1 AS BIGINT) << ({HLL_RHO_CLAMP} - reg))::DOUBLE
           / {float(1 << HLL_RHO_CLAMP)!r}
           + ({HLL_M} - count(*))::DOUBLE AS total,
         {HLL_M} - count(*) AS v_zero
  FROM regs GROUP BY grp
), est AS (
  SELECT grp,
         round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M!r} / total
                         <= {2.5 * HLL_M!r} AND v_zero > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r}
                                               / v_zero::DOUBLE)
                    ELSE {HLL_ALPHA * HLL_M * HLL_M!r} / total END,
               4) AS hll_users
  FROM per_group
), exact AS (
  SELECT {group_expr} AS grp,
         CAST(count(DISTINCT {key_expr}) AS BIGINT) AS exact_users
  FROM {table} GROUP BY 1
)
SELECT e.grp AS {group_expr}, e.exact_users, s.hll_users,
       round(abs(s.hll_users - e.exact_users) / e.exact_users, 4)
         AS rel_err
FROM exact e JOIN est s USING (grp) ORDER BY 1
"""


# ---------------------------------------------------------------------------
# portable sample-based quantiles (deterministic md5-ordered sample)
# ---------------------------------------------------------------------------

def portable_sample_quantiles(df: DataFrame, group_col: str,
                              value_col: str, id_col: str,
                              qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
                              sample_n: int = 256) -> DataFrame:
    """Approximate per-group quantiles from a DETERMINISTIC bounded
    sample: the md5-lowest ``sample_n`` rows per group (the same portable
    deterministic-sampling convention as lang_quota_sample), then exact
    linear-interpolation quantiles over the sorted sample. Rank error is
    O(1/sqrt(sample_n)) like any sample quantile, but unlike GK/t-digest
    sketches every intermediate is plain relational math, so the DuckDB
    twin reproduces the VALUES exactly -- the cross-engine-checkable
    member of the approx-percentile family (the engine-native
    approx_percentile stays rows-only by nature). Per group the state is
    <= sample_n values; the sample selection is one window over the
    group shuffle."""
    w = Window.partitionBy("grp").orderBy("__ord", id_col)
    sampled = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("double").alias("x"),
            F.col(id_col),
            F.md5(F.col(id_col).cast("string")).alias("__ord"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= sample_n)
    )
    agged = sampled.groupBy("grp").agg(
        F.array_sort(F.collect_list("x")).alias("xs"),
        F.count(F.lit(1)).alias("n_sample"))

    def interp(q: float):
        m = F.col("n_sample")
        h = (m - 1).cast("double") * F.lit(q)
        lo = F.floor(h).cast("int")
        frac = h - lo.cast("double")
        x_lo = F.col("xs")[lo]
        x_hi = F.col("xs")[F.least(lo + 1, m.cast("int") - 1)]
        return F.round(x_lo + frac * (x_hi - x_lo), 6)

    cols = [interp(q).alias(f"p{int(q * 100)}") for q in qs]
    return (
        agged.select(F.col("grp").alias(group_col), *cols, "n_sample")
        .orderBy(group_col)
    )


def portable_sample_quantiles_sql(table: str, group_expr: str,
                                  value_expr: str, id_expr: str,
                                  qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                           0.9),
                                  sample_n: int = 256) -> str:
    """DuckDB twin: identical md5 sample, identical interpolation order
    of operations."""
    def interp(q: float) -> str:
        h = f"((n_sample - 1)::DOUBLE * {q!r})"
        lo = f"CAST(floor({h}) AS INT)"
        frac = f"({h} - floor({h}))"
        x_lo = f"xs[{lo} + 1]"
        x_hi = f"xs[least({lo} + 1, CAST(n_sample AS INT) - 1) + 1]"
        return (f"round({x_lo} + {frac} * ({x_hi} - {x_lo}), 6) "
                f"AS p{int(q * 100)}")

    sel = ", ".join(interp(q) for q in qs)
    return f"""
WITH sampled AS (
  SELECT grp, x FROM (
    SELECT {group_expr} AS grp, CAST({value_expr} AS DOUBLE) AS x,
           row_number() OVER (
             PARTITION BY {group_expr}
             ORDER BY md5(CAST({id_expr} AS VARCHAR)), {id_expr}) AS rn
    FROM {table}) WHERE rn <= {sample_n}
), agged AS (
  SELECT grp, list_sort(list(x)) AS xs,
         CAST(count(*) AS BIGINT) AS n_sample
  FROM sampled GROUP BY grp
)
SELECT grp AS {group_expr}, {sel}, n_sample
FROM agged ORDER BY 1
"""


def count_min_sql(table: str, key_expr: str, d: int = 4,
                  w: int = 1024) -> str:
    """DuckDB twin, generated from the same salts/width so the counters
    are bit-identical."""
    def h(i: int, key: str) -> str:
        return (f"(CAST(('0x' || substr(md5('cms{i}:' || "
                f"CAST({key} AS VARCHAR)), 1, 8)) AS UBIGINT)::BIGINT "
                f"% {CMS_PRIME}) % {w}")

    return f"""
WITH counters AS (
  SELECT t.row_i, CASE t.row_i
      {' '.join(f"WHEN {i} THEN {h(i, key_expr)}" for i in range(d))}
    END AS bucket, CAST(count(*) AS BIGINT) AS n
  FROM {table} CROSS JOIN (
      SELECT unnest(range({d})) AS row_i) t
  GROUP BY 1, 2
), exact AS (
  SELECT {key_expr} AS key, CAST(count(*) AS BIGINT) AS exact_n
  FROM {table} GROUP BY 1
), probed AS (
  SELECT e.key, e.exact_n, min(c.n) AS cms_n
  FROM exact e
  CROSS JOIN (SELECT unnest(range({d})) AS row_i) r
  JOIN counters c ON c.row_i = r.row_i AND c.bucket = CASE r.row_i
      {' '.join(f"WHEN {i} THEN {h(i, 'e.key')}" for i in range(d))}
    END
  GROUP BY 1, 2
)
SELECT key, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
       CAST(cms_n - exact_n AS BIGINT) AS over_n
FROM probed ORDER BY key
"""


# --- KMV (k minimum values / bottom-k theta) distinct sketches -------------
#
# The set-OPERATION sketch the HLL family lacks: two KMV sketches support
# union (k smallest of the merged registers) and intersection (the
# fraction rho of the union's registers present in BOTH input sketches
# estimates |A inter B| / |A union B|) -- Beyer et al., "On Synopses for
# Distinct-Value Estimation Under Multiset Operations" (SIGMOD 2007).
# Registers are the k smallest md5-48bit hashes of the DISTINCT keys:
# fully deterministic, so the DuckDB oracle rebuilds bit-identical
# registers and the estimates compare EXACTLY, the same portability
# discipline as the HLL/quantile sketches above.

KMV_K = 64
KMV_SPACE = float(1 << 48)


def _kmv_hash(key: Column) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), key.cast("string"))),
                    1, 12), 16, 10).cast("long")


def kmv_registers(df: DataFrame, group_col: str, key_col: str,
                  k: int = KMV_K, n_salts: int = 32) -> DataFrame:
    """(group, h) register rows: the k smallest distinct key hashes per
    group. Exact k-smallest WITHOUT sorting each group's full distinct
    set on one task: rank within (group, hash-salt) shards first (every
    shard sorts in parallel, survivors <= k per shard), then rank the
    <= k * n_salts survivors per group. Salting affects parallelism
    only, never the result."""
    base = (df.select(F.col(group_col).alias("g"),
                      _kmv_hash(F.col(key_col)).alias("h"))
            .distinct())
    w_salt = Window.partitionBy("g", F.pmod(F.col("h"), F.lit(n_salts))) \
        .orderBy("h")
    w_g = Window.partitionBy("g").orderBy("h")
    return (
        base.withColumn("__r", F.row_number().over(w_salt))
        .where(F.col("__r") <= k)
        .withColumn("__r", F.row_number().over(w_g))
        .where(F.col("__r") <= k)
        .select("g", "h")
    )


def kmv_estimate_from_registers(regs: DataFrame, k: int = KMV_K,
                                group_name: str = "g") -> DataFrame:
    """(group, n_regs, est_distinct) from a register table (g, h) --
    shared by the batch report and the streaming merge (the estimate is
    a pure function of the registers)."""
    return (regs.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n_regs"),
                 F.max("h").alias("hk"))
            .select(
                F.col("g").alias(group_name),
                F.col("n_regs").cast("long").alias("n_regs"),
                F.when(F.col("n_regs") < k,
                       F.col("n_regs").cast("double"))
                .otherwise(F.round(
                    F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("hk"),
                    4)).alias("est_distinct"))
            .orderBy(group_name))


def kmv_distinct_report(df: DataFrame, group_col: str, key_col: str,
                        k: int = KMV_K) -> DataFrame:
    """Per group: KMV distinct estimate next to the exact count --
    (group, n_regs, est_distinct, exact_distinct). With fewer than k
    registers the sketch IS the distinct set (estimate exact by
    construction); otherwise est = (k-1) * SPACE / h_(k)."""
    regs = kmv_registers(df, group_col, key_col, k)
    est = kmv_estimate_from_registers(regs, k)
    exact = (df.groupBy(F.col(group_col).alias("g"))
             .agg(F.count_distinct(F.col(key_col)).alias("exact_distinct")))
    return (est.join(exact, "g")
            .select(F.col("g").alias(group_col), "n_regs", "est_distinct",
                    "exact_distinct")
            .orderBy(group_col))


def kmv_set_report(df: DataFrame, group_col: str, key_col: str,
                   k: int = KMV_K) -> DataFrame:
    """Pairwise set-operation estimates between every two groups from
    their KMV sketches alone: (g_a, g_b, est_union, est_intersection,
    rho). Union registers = k smallest of the two register sets merged;
    rho = fraction of those present in BOTH sketches (a union register
    in A-inter-B is necessarily in both sketches' bottom-k, so the flags
    are computable from registers, never the raw sets). est_inter =
    rho * est_union -- the estimator HLL cannot provide without
    inclusion-exclusion error blowup."""
    regs = kmv_registers(df, group_col, key_col, k)
    groups = regs.select("g").distinct()
    pairs = (groups.select(F.col("g").alias("g_a"))
             .join(groups.select(F.col("g").alias("g_b")),
                   F.col("g_a") < F.col("g_b")))
    merged = (
        pairs.join(regs, (F.col("g") == F.col("g_a"))
                   | (F.col("g") == F.col("g_b")))
        .groupBy("g_a", "g_b", "h")
        .agg(F.max((F.col("g") == F.col("g_a")).cast("int")).alias("in_a"),
             F.max((F.col("g") == F.col("g_b")).cast("int")).alias("in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("h")
    union_regs = merged.withColumn("__r", F.row_number().over(w)) \
        .where(F.col("__r") <= k)
    agg = (union_regs.groupBy("g_a", "g_b")
           .agg(F.count(F.lit(1)).alias("k_u"),
                F.max("h").alias("uk"),
                F.sum((F.col("in_a") * F.col("in_b"))).alias("n_both")))
    est_u = F.when(F.col("k_u") < k, F.col("k_u").cast("double")) \
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("uk"))
    rho = F.col("n_both").cast("double") / F.col("k_u")
    return (agg.select(
        "g_a", "g_b",
        F.round(est_u, 4).alias("est_union"),
        F.round(rho * est_u, 4).alias("est_intersection"),
        F.round(rho, 6).alias("rho"))
        .orderBy("g_a", "g_b"))


def _kmv_hash_sql(key: str) -> str:
    return (f"CAST(('0x' || substring(md5('kmv:' || "
            f"CAST({key} AS VARCHAR)), 1, 12)) AS BIGINT)")


def kmv_distinct_sql(table: str, group_expr: str, key_expr: str,
                     k: int = KMV_K, include_exact: bool = True) -> str:
    """DuckDB twin of :func:`kmv_distinct_report` (plain rank over the
    distinct hashes -- bit-identical registers, identical estimate
    arithmetic). ``include_exact=False`` emits the sketch-only columns
    -- the streaming merge's output, which cannot carry an exact count."""
    if not include_exact:
        return f"""
WITH base AS (
  SELECT DISTINCT {group_expr} AS g, {_kmv_hash_sql(key_expr)} AS h
  FROM {table}
), regs AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
    FROM base) WHERE r <= {k}
)
SELECT g AS {group_expr}, CAST(count(*) AS BIGINT) AS n_regs,
       CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
            ELSE round({k - 1}::DOUBLE * {int(KMV_SPACE)}::DOUBLE / max(h), 4)
       END AS est_distinct
FROM regs GROUP BY g ORDER BY 1
"""
    return f"""
WITH base AS (
  SELECT DISTINCT {group_expr} AS g, {_kmv_hash_sql(key_expr)} AS h
  FROM {table}
), regs AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
    FROM base) WHERE r <= {k}
), est AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_regs,
         CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
              ELSE round({k - 1}::DOUBLE * {int(KMV_SPACE)}::DOUBLE / max(h), 4)
         END AS est_distinct
  FROM regs GROUP BY g
), exact AS (
  SELECT {group_expr} AS g,
         CAST(count(DISTINCT {key_expr}) AS BIGINT) AS exact_distinct
  FROM {table} GROUP BY 1
)
SELECT est.g AS {group_expr}, n_regs, est_distinct, exact_distinct
FROM est JOIN exact USING (g) ORDER BY 1
"""


def kmv_set_sql(table: str, group_expr: str, key_expr: str,
                k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_set_report`."""
    return f"""
WITH base AS (
  SELECT DISTINCT {group_expr} AS g, {_kmv_hash_sql(key_expr)} AS h
  FROM {table}
), regs AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
    FROM base) WHERE r <= {k}
), pairs AS (
  SELECT a.g AS g_a, b.g AS g_b
  FROM (SELECT DISTINCT g FROM regs) a
  JOIN (SELECT DISTINCT g FROM regs) b ON a.g < b.g
), merged AS (
  SELECT p.g_a, p.g_b, r.h,
         max(CASE WHEN r.g = p.g_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN r.g = p.g_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN regs r ON r.g = p.g_a OR r.g = p.g_b
  GROUP BY 1, 2, 3
), union_regs AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS r
    FROM merged) WHERE r <= {k}
), agg AS (
  SELECT g_a, g_b, CAST(count(*) AS BIGINT) AS k_u, max(h) AS uk,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM union_regs GROUP BY 1, 2
)
SELECT g_a, g_b,
       round(CASE WHEN k_u < {k} THEN k_u::DOUBLE
                  ELSE {k - 1}::DOUBLE * {int(KMV_SPACE)}::DOUBLE / uk END, 4)
         AS est_union,
       round((n_both::DOUBLE / k_u) *
             CASE WHEN k_u < {k} THEN k_u::DOUBLE
                  ELSE {k - 1}::DOUBLE * {int(KMV_SPACE)}::DOUBLE / uk END, 4)
         AS est_intersection,
       round(n_both::DOUBLE / k_u, 6) AS rho
FROM agg ORDER BY g_a, g_b
"""
