"""Event-time operators over the `events` table (SURVEY.md §2B).

Batch forms here (SQL-oracle-checkable); the Structured Streaming variants
with watermarks live in streaming/events_stream.py.

Cross-engine discipline: all time arithmetic runs on epoch MICROSECONDS as
int64 (unix_micros / epoch_us) -- second-granularity unix_timestamp would
truncate sub-second gaps differently than the oracle, and emitting raw
timestamps makes the value-hash depend on each engine's timestamp unit.

Scale notes: tumbling windows are a plain groupBy on a derived column (one
shuffle, partial agg first); sessionization is the lag/gap/cumsum window
idiom -- one shuffle on user_id, then per-partition sorts; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp"))


def tumbling_window_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per (window-start, event_type): count + exact-decimal value sum.
    window_start is epoch-micros int64 (unit-stable across engines)."""
    unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}.get(duration)
    if unit is None:
        bucket = F.window("ts", duration).getField("start")
    else:
        bucket = F.date_trunc(unit, F.col("ts"))
    return (
        events.groupBy(_us(bucket).alias("window_start_us"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4)
            .alias("sum_value"),
        )
        .orderBy("window_start_us", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes`` (lag -> boundary flag ->
    running sum). Returns one row per event with its session_id."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(_us(F.col("ts"))).over(by_user)
    is_new = (
        prev_us.isNull()
        | (_us(F.col("ts")) - prev_us > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    return events.withColumn("session_id", F.sum(is_new).over(by_user))


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per (user, session): event count, span in microseconds, value sum."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(_us(F.col("ts"))) - F.min(_us(F.col("ts"))))
            .alias("span_us"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4)
            .alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def extract_props(events: DataFrame, key: str = "k") -> DataFrame:
    """JSON property extraction from the `props` column -- stays JVM-side
    via get_json_object (no Python json.loads row loop)."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", f"$.{key}").cast("long").alias("prop_k"),
    ).orderBy("event_id")


def event_type_funnel(events: DataFrame) -> DataFrame:
    """Per user: did they view -> click -> purchase (order-insensitive
    presence funnel; conditional aggregation, single shuffle)."""
    has = lambda t: F.max((F.col("event_type") == t).cast("int"))  # noqa: E731
    return (
        events.groupBy("user_id")
        .agg(
            has("view").alias("viewed"),
            has("click").alias("clicked"),
            has("purchase").alias("purchased"),
        )
        .orderBy("user_id")
    )


def asof_last_click(events: DataFrame) -> DataFrame:
    """As-of join, window-form: for every purchase event, the timestamp of
    the SAME USER's most recent prior click (strictly earlier rows).

    Spark has no native as-of join; the classic distributed form is a
    conditional running max over the user's timeline -- one shuffle on
    user_id, no self-join, no range explosion. (A union-merge as-of between
    two tables reduces to the same shape after a unionByName.)"""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_us = F.when(F.col("event_type") == "click", _us(F.col("ts")))
    return (
        events.withColumn("last_click_us", F.max(click_us).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            _us(F.col("ts")).alias("purchase_us"),
            "last_click_us",
            (_us(F.col("ts")) - F.col("last_click_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id",
              value_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance: Column | None = None,
              prefix: str = "r_") -> DataFrame:
    """General two-table as-of join (pandas merge_asof / DuckDB ASOF
    JOIN, distributed): every left row picks the single right row with
    the greatest ``on`` <= left's ``on`` (direction="backward",
    inclusive) or the smallest ``on`` >= left's (direction="forward")
    within the same ``by`` key, carrying the right PAYLOAD columns --
    the point-in-time enrichment primitive (price as of trade time,
    last config before an event).

    Spark has no native as-of join, and the naive forms collapse at
    scale: an inequality theta-join is a per-key cross product, and a
    "latest snapshot" subquery re-shuffles per query. This is the
    union-merge form instead: tag sides, unionByName, ONE shuffle on
    the by-key, and a single running last_value(ignorenulls) window
    pass carries the most recent right payload forward onto each left
    row -- per-key timeline merge, no pairwise expansion, the same
    plan shape at 10 rows or 10^11. All carried columns come from ONE
    Window node (same spec), so the sort happens once.

    Semantics pinned by the oracle: ties on ``on`` match (inclusive,
    like DuckDB's ``l.ts >= r.ts``); a left row with no candidate gets
    NULLs (left join); ``tolerance`` (a positive interval/numeric
    Column in ``on``'s algebra) NULLs a match farther than tolerance
    away rather than searching past it -- pandas merge_asof tolerance
    semantics, since the nearest candidate is the only candidate. The
    right side must be unique per (by, on): pre-aggregate it (the
    registry query does), or which duplicate wins is tie-broken by
    engine sort stability, same as DuckDB's unspecified choice.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in (by, on)]
    lcols = left.columns
    rtypes = dict(right.dtypes)
    l_aligned = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}")
          for c in value_cols])
    ltypes = dict(left.dtypes)
    r_aligned = right.select(
        F.col(by), F.col(on),
        *[F.lit(None).cast(ltypes[c]).alias(c)
          for c in lcols if c not in (by, on)],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    u = l_aligned.unionByName(r_aligned)

    # at equal `on`, the right row must be visible to the left row:
    # backward orders the right side (0) first, forward orders it last
    # under the reversed scan
    if direction == "backward":
        w = (Window.partitionBy(by)
             .orderBy(F.col(on).asc(), F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(by)
             .orderBy(F.col(on).desc(), F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # the whole right payload rides in ONE struct: the struct is
    # non-null for every right row even when its FIELDS are null, so a
    # matched row's NULL value stays NULL (per-column last(ignorenulls)
    # would skip it and wrongly inherit an OLDER right row's value) --
    # and all carried columns share one Window expression, so the sort
    # happens once
    payload = F.struct(
        F.col(on).alias("__on"),
        *[F.col(f"__r_{c}").alias(c) for c in value_cols])
    matched = F.last(
        F.when(F.col("__side") == 0, payload), ignorenulls=True).over(w)
    out = u.select("*", matched.alias("__m")) \
        .where(F.col("__side") == 1)

    m_on = F.col("__m.__on")
    if tolerance is not None:
        in_tol = (
            m_on >= F.col(on) - tolerance
            if direction == "backward"
            else m_on <= F.col(on) + tolerance)
    else:
        in_tol = F.lit(True)
    keep = F.col("__m").isNotNull() & in_tol
    sel = [F.col(c) for c in lcols]
    sel.append(F.when(keep, m_on).alias(f"{prefix}{on}"))
    sel += [F.when(keep, F.col(f"__m.{c}")).alias(f"{prefix}{c}")
            for c in value_cols]
    return out.select(*sel)


def auto_bin_width(left: DataFrame, right: DataFrame,
                   l_start: str, l_end: str,
                   r_start: str, r_end: str,
                   sample_rows: int = 100_000) -> int:
    """Derive an interval-join grid width from the data: the LARGER of
    the two sides' median interval lengths (approx quantile, 1% error,
    on a bounded sample per side). Per-side medians, then max -- a
    pooled median is poisoned when one side is degenerate-heavy (e.g.
    single-event sessions of length 1 us next to 10-minute error
    windows: the pooled median says W=1 us, which explodes every error
    window into millions of grid cells); the max keeps W at the
    natural scale of the LONGER population, whose explode W would
    otherwise multiply. The PERF.md sweep shows the cost curve is flat
    within ~2x of that scale and punishes only the far ends. Affects
    performance only, never the result set."""
    def med(df: DataFrame, s: str, e: str) -> int:
        lens = (df.select((F.col(e) - F.col(s)).alias("len"))
                .where(F.col("len") > 0).limit(sample_rows))
        q = lens.approxQuantile("len", [0.5], 0.01)
        return int(q[0]) if q else 1

    return max(1, med(left, l_start, l_end), med(right, r_start, r_end))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_width: int | None = None) -> DataFrame:
    """KEYLESS overlap join of two interval tables (half-open
    ``[start, end)`` in the same int64 units): emit every (left, right)
    pair whose intervals intersect. Spark's only native plan for the
    pure inequality predicate is a broadcast-nested-loop / cartesian
    product -- |L| x |R| comparisons; this is the standard interval
    BINNING form instead:

    1. each interval explodes to the grid cells it touches
       (floor(start/W) .. floor((end-1)/W), ~len/W + 1 rows);
    2. equi-join on the cell -- a plain hash shuffle, so only intervals
       sharing a cell ever meet;
    3. keep a pair only in the ONE cell containing its overlap start
       (floor(max(l_start, r_start)/W)) -- exactly-once without a
       DISTINCT shuffle over the pair set.

    Pick ``bin_width`` near the typical interval length: too small
    multiplies the explode fan-out, too big turns every cell into a
    mini cross product (both ends are measured in
    tools/interval_bin_sweep.py -- the cost is per-cell
    |L_cell| x |R_cell|, so W tunes the classic grid-join tradeoff).
    With ``bin_width=None`` the width derives from the data via
    :func:`auto_bin_width` (median interval length -- the sweep shows
    that sits on the flat part of the cost curve). Empty/degenerate
    intervals (end <= start) cannot overlap anything and are dropped.
    Left/right column names must be disjoint."""
    if bin_width is None:
        bin_width = auto_bin_width(left, right, l_start, l_end,
                                   r_start, r_end)
    lb = left.where(F.col(l_end) > F.col(l_start)).withColumn(
        "__cell", F.explode(F.sequence(
            F.floor(F.col(l_start) / bin_width),
            F.floor((F.col(l_end) - 1) / bin_width))))
    rb = right.where(F.col(r_end) > F.col(r_start)).withColumn(
        "__cell", F.explode(F.sequence(
            F.floor(F.col(r_start) / bin_width),
            F.floor((F.col(r_end) - 1) / bin_width))))
    overlap_start = F.greatest(F.col(l_start), F.col(r_start))
    return (
        lb.join(rb, "__cell")
        .where((F.col(l_start) < F.col(r_end))
               & (F.col(r_start) < F.col(l_end))
               & (F.col("__cell") == F.floor(overlap_start / bin_width)))
        .drop("__cell")
    )


def value_range_join(events: DataFrame, bucket_width: int = 100) -> DataFrame:
    """Range join against a bucket dimension (value in [lo, hi)). The dim
    is tiny -> broadcast nested-loop with a range predicate. At scale with
    a regular grid the standard rewrite is binning both sides to
    floor(value/width) and equi-joining -- same result, hash join."""
    spark = events.sparkSession
    buckets = spark.range(0, 10).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * bucket_width).cast("double").alias("lo"),
        ((F.col("id") + 1) * bucket_width).cast("double").alias("hi"),
    )
    return (
        events.join(
            F.broadcast(buckets),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("bucket_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4)
            .alias("sum_value"),
        )
        .orderBy("bucket_id")
    )


def sliding_window_agg(events: DataFrame, window_minutes: int = 60,
                       slide_minutes: int = 30) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping windows. Uses Spark's native window() generator; emits
    epoch-micros starts so the oracle can reproduce it with an unnest of
    the same arithmetic."""
    return (
        events.groupBy(
            F.window("ts", f"{window_minutes} minutes",
                     f"{slide_minutes} minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type", "n_events",
        )
        .orderBy("window_start_us", "event_type")
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: cohort = the week of each user's first
    event; for every (cohort week, week offset), the count of users from
    that cohort active in that week.

    Scale shape: distinct (user, week) first -- collapses the fact table
    to at most |users| x |weeks| rows BEFORE any join; the cohort frame
    derives from the same distinct set, and the join back is on user_id
    (both sides already hash-partitioned by user_id from their aggs, so
    the join reuses the partitioning instead of a fresh shuffle). The
    week offset divides two week-truncated epoch-micro values -- an exact
    multiple of 604800000000, so the double division is exact.
    """
    wk = _us(F.date_trunc("week", F.col("ts")))
    act = events.select("user_id", wk.alias("act_wk_us")).distinct()
    cohort = act.groupBy("user_id").agg(
        F.min("act_wk_us").alias("cohort_wk_us"))
    return (
        act.join(cohort, "user_id")
        .select(
            "cohort_wk_us",
            ((F.col("act_wk_us") - F.col("cohort_wk_us"))
             / F.lit(604_800_000_000)).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_wk_us", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_wk_us", "week_offset")
    )


HOUR_US = 3_600_000_000


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Dense hourly resample per event_type: every (hour, type) cell from
    the global min to max hour appears, zero-filled where no events landed.

    The standard time-series densification (reporting and
    feature-windowing break on sparse series). Plan shape: the hourly agg
    is one shuffle with map-side combine; the grid is generated
    DISTRIBUTED (sequence+explode over a 1-row bounds aggregate crossed
    with the distinct types), never a driver loop; the fill join
    broadcasts the aggregate side, which is bounded by hours x types
    regardless of input row count -- so the whole fill costs O(grid) at
    any scale.
    """
    hour_us = _us(F.date_trunc("hour", F.col("ts")))
    hourly = (
        events.groupBy(hour_us.alias("window_start_us"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4)
            .alias("sum_value"),
        ))
    bounds = events.agg(F.min(hour_us).alias("__lo"), F.max(hour_us).alias("__hi"))
    types = events.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(F.sequence("__lo", "__hi", F.lit(HOUR_US)))
            .alias("window_start_us"),
            "event_type",
        ))
    return (
        grid.join(F.broadcast(hourly), ["window_start_us", "event_type"], "left")
        .select(
            "window_start_us", "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("window_start_us", "event_type")
    )


DAY_US = 86_400_000_000


def rolling_user_value(events: DataFrame, days: int = 7) -> DataFrame:
    """Per-user daily totals plus a trailing ``days``-day rolling sum/avg.

    The RANGE frame is keyed on an integer DAY INDEX (epoch-days), not a
    timestamp, so the frame bounds are unit-exact in every engine. Two
    stages: one shuffle for the daily pre-aggregation (map-side combined,
    collapses cardinality from events to user x day), then one window
    shuffle on user_id. The rolling sums stay decimal-exact; doubles
    appear only in the output.
    """
    day_idx = (_us(F.col("ts")) / F.lit(DAY_US)).cast("long")
    daily = (
        events.groupBy(F.col("user_id"), day_idx.alias("day_idx"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("__day_sum")))
    w = (Window.partitionBy("user_id").orderBy("day_idx")
         .rangeBetween(-(days - 1), 0))
    return daily.select(
        "user_id", "day_idx",
        F.round(F.col("__day_sum").cast("double"), 4).alias("day_value"),
        F.round(F.sum("__day_sum").over(w).cast("double"), 4)
        .alias("rolling_sum"),
        F.round((F.sum("__day_sum").over(w)
                 / F.count(F.lit(1)).over(w)).cast("double"), 6)
        .alias("rolling_avg_per_active_day"),
    ).orderBy("user_id", "day_idx")


def hourly_anomalies(events: DataFrame, z_thresh: float = 2.0) -> DataFrame:
    """Hours whose event count deviates >= ``z_thresh`` sigma from the
    per-type mean, computed over the DENSE hourly series (gap_fill_hourly
    composed underneath -- silent-hour anomalies are invisible on the
    sparse series).

    The per-type moments use integer counts summed as DECIMAL(38,0) --
    exact at any scale (s^2 overflows int64 around 1e9 events/type) --
    and collapse to one tiny broadcast row per type, so detection costs
    one broadcast join over the bounded grid.
    """
    dense = gap_fill_hourly(events)
    n_ = F.count(F.lit(1)).cast("decimal(38,0)")
    s_ = F.sum(F.col("n_events").cast("decimal(38,0)"))
    ss_ = F.sum((F.col("n_events") * F.col("n_events")).cast("decimal(38,0)"))
    stats = dense.groupBy("event_type").agg(
        n_.alias("__n"), s_.alias("__s"), ss_.alias("__ss"))
    n, s, ss = F.col("__n"), F.col("__s"), F.col("__ss")
    mean = (s / n).cast("double")
    var = ((n * ss - s * s) / (n * (n - F.lit(1)))).cast("double")
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        dense.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) >= z_thresh)
        .select("window_start_us", "event_type", "n_events",
                F.round(mean, 4).alias("mean_events"),
                F.round(z, 4).alias("zscore"))
        .orderBy("window_start_us", "event_type")
    )


def extract_props_struct(events: DataFrame) -> DataFrame:
    """Typed JSON struct extraction: parse the whole `props` document once
    with from_json into a typed struct, instead of one get_json_object
    pass per key (each of which re-parses the JSON at 100 TB).

    Emits null for rows whose JSON is missing/corrupt -- the permissive
    contract a firehose needs. Same result surface as extract_props (the
    oracle is shared); what changes is the PLAN: one JSON parse total
    instead of one per extracted key.
    """
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return events.select(
        "event_id",
        "event_type",
        parsed.getField("k").alias("prop_k"),
    ).orderBy("event_id")


def user_event_intervals(events: DataFrame) -> DataFrame:
    """SCD2-style validity intervals: each event row becomes
    [ts, next-event ts) for its user -- the lead-window snapshot builder
    behind slowly-changing-dimension tables and point-in-time joins.
    Open intervals (the user's latest event) get NULL valid_to.

    One shuffle (the per-user window); interval arithmetic on
    epoch-microsecond int64 keeps the oracle unit-stable.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(_us(F.col("ts"))).over(w)
    return events.select(
        "user_id", "event_id", "event_type",
        _us(F.col("ts")).alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        (nxt - _us(F.col("ts"))).alias("duration_us"),
    ).orderBy("user_id", "valid_from_us", "event_id")


# Fixed x-origin for trend regression (shared with the oracle SQL):
# near the testdata's epoch so centered seconds stay small.
TREND_EPOCH_BASE = 1_700_000_000


def user_value_trend(events: DataFrame, min_events: int = 5) -> DataFrame:
    """Per-user linear trend of `value` over time: OLS slope (value per
    hour) and correlation from EXACT decimal moment sums -- the same
    partial+final-safe discipline as lineitem_stats, so the only float
    ops are the final divisions and one sqrt (identical IEEE on both
    engines).

    x = epoch seconds CENTERED on a fixed base (slope and correlation are
    shift-invariant in x, and centering kills the catastrophic
    cancellation in n*Sxx - Sx^2 that raw 1.7e9-magnitude epochs cause),
    y = value (decimal(18,6)).
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), scaled to per-hour.
    Users with < min_events or zero time variance are dropped (their
    slope is undefined).
    """
    # floor() then cast: Spark's `/` is float division and a straight
    # decimal cast would ROUND the sub-second fraction where the oracle's
    # integer `//` truncates. floor on a double is exact here (us < 2^53).
    x = (F.floor(_us(F.col("ts")) / F.lit(1_000_000))
         - F.lit(TREND_EPOCH_BASE)).cast("decimal(12,0)")
    y = F.col("value").cast("decimal(18,6)")
    m = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(x).alias("__sx"),
            F.sum(y).alias("__sy"),
            F.sum(x * x).alias("__sxx"),
            F.sum(y * y).alias("__syy"),
            F.sum(x * y).alias("__sxy"),
        )
        .where(F.col("n_events") >= min_events)
    )
    n = F.col("n_events").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return (
        m.where(var_x > 0)
        .select(
            "user_id", "n_events",
            F.round(cov / var_x * 3600.0, 6).alias("slope_per_hour"),
            F.when(var_y > 0, F.round(cov / F.sqrt(var_x * var_y), 6))
            .otherwise(F.lit(None).cast("double")).alias("corr_tv"),
        )
        .orderBy("user_id")
    )


def user_value_ewma(events: DataFrame, alpha: float = 0.2,
                    min_events: int = 3) -> DataFrame:
    """Final exponentially-weighted moving average of `value` per user
    (events ordered by ts, event_id) -- the custom grouped kernel path:
    EWMA is a per-row RECURSION (e_i = a*v_i + (1-a)*e_{i-1}), which no
    window frame can express, so this is the canonical applyInPandas
    (grouped-map) operator: one shuffle on user_id, then an Arrow-batched
    pandas fold per group.

    Determinism discipline: the fold runs in explicit (ts, event_id)
    order with LITERAL coefficients on both engines (computing 1-alpha at
    runtime can differ in the last ulp from a 0.8 literal), and rounding
    happens in Spark AFTER the kernel (Python's round() is banker's,
    Spark/DuckDB round half-up).
    """
    import pandas as pd

    beta = {0.2: 0.8}.get(alpha, 1.0 - alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        e = None
        for v in pdf["value"]:
            e = v if e is None else alpha * v + beta * e
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "ewma_raw": [e],
        })

    out = events.select("user_id", "ts", "event_id", "value") \
        .groupBy("user_id") \
        .applyInPandas(fold, "user_id long, n_events long, ewma_raw double")
    return (
        out.where(F.col("n_events") >= min_events)
        .select("user_id", "n_events",
                F.round(F.col("ewma_raw"), 6).alias("ewma"))
        .orderBy("user_id")
    )


def debounce_events(events: DataFrame, gap_seconds: int = 60) -> DataFrame:
    """Leading-edge debounce: keep only the FIRST event of each (user,
    type) burst, where a burst chains events separated by <=
    ``gap_seconds`` from their PREDECESSOR (so a retry storm ticking
    every few seconds stays one burst however long it lasts) -- the
    telemetry-cleaning op for retry storms and double-clicks.

    A burst head is exactly a row whose lag-gap exceeds the threshold,
    so the keep-filter and the burst numbering (running sum of heads)
    come from two stacked windows over ONE (user, type) shuffle. The
    alternative "throttle" semantics (gap measured from the last KEPT
    row, re-emitting inside a long burst) is a per-key recursion -- the
    user_value_ewma_partitioned carry-fold pattern, not a window."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = _us(F.col("ts"))
    prev_us = F.lag(us).over(w)
    is_new = (
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000)
    ).cast("long")
    burst = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("__new", is_new)
        .withColumn("__burst", burst)
        .where(F.col("__new") == 1)
        .select("event_id", "user_id", "event_type",
                us.alias("ts_us"), F.col("__burst").alias("burst_id"))
        .orderBy("event_id")
    )


def event_dow_chi2(events: DataFrame) -> DataFrame:
    """Chi-square independence report between event_type and day-of-week:
    per-cell observed count, expected count under independence
    (row_total x col_total / grand_total), and the cell's chi2 term --
    the screening stat for "does behavior differ by weekday".

    Day index is days-since-epoch mod 7 (pure integer math, identical
    across engines -- named weekday functions disagree on 0- vs 1-based
    and week start). One fact-table aggregate to the |types| x 7
    contingency grain; the marginals are windows over that tiny frame,
    not extra scans."""
    day_idx = (_us(F.col("ts")) / F.lit(86_400_000_000)).cast("long") % 7
    cells = events.groupBy(
        F.col("event_type"), day_idx.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_obs"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    expected = (
        F.sum("n_obs").over(w_row).cast("double")
        * F.sum("n_obs").over(w_col).cast("double")
        / F.sum("n_obs").over(w_all).cast("double")
    )
    return (
        cells.select(
            "event_type", "dow", "n_obs",
            F.round(expected, 6).alias("expected"),
            F.round(
                (F.col("n_obs").cast("double") - expected)
                * (F.col("n_obs").cast("double") - expected) / expected, 6)
            .alias("chi2_term"),
        )
        .orderBy("event_type", "dow")
    )


def user_value_ewma_partitioned(events: DataFrame, alpha: float = 0.2,
                                min_events: int = 3) -> DataFrame:
    """user_value_ewma's production form: identical recursion and literal
    coefficients, but ONE Python invocation per partition instead of one
    per group.

    applyInPandas pays Arrow round-trip + pandas-frame setup PER GROUP --
    the many-small-groups trap (thousands of users, tens of rows each,
    ~2 s at sf0.1 where this runs in ~0.4 s). Here the frame is hash-
    partitioned on user_id and sorted (user_id, ts, event_id) WITHIN
    partitions, so each user is one contiguous run; mapInPandas streams
    whole Arrow batches and a carry tuple bridges a run that straddles a
    batch boundary. Same shuffle count as the grouped form (exactly one),
    same arithmetic to the last ulp (asserted equal in tests).
    """
    import pandas as pd

    beta = {0.2: 0.8}.get(alpha, 1.0 - alpha)

    def fold_partition(batches):
        cur_id = None
        cur_e = 0.0
        cur_n = 0
        for b in batches:
            out_ids: list[int] = []
            out_ns: list[int] = []
            out_es: list[float] = []
            for u, v in zip(b["user_id"].to_numpy(),
                            b["value"].to_numpy()):
                if u != cur_id:
                    if cur_id is not None:
                        out_ids.append(cur_id)
                        out_ns.append(cur_n)
                        out_es.append(cur_e)
                    cur_id, cur_e, cur_n = u, v, 1
                else:
                    cur_e = alpha * v + beta * cur_e
                    cur_n += 1
            if out_ids:
                yield pd.DataFrame({
                    "user_id": pd.Series(out_ids, dtype="int64"),
                    "n_events": pd.Series(out_ns, dtype="int64"),
                    "ewma_raw": pd.Series(out_es, dtype="float64"),
                })
        if cur_id is not None:
            yield pd.DataFrame({
                "user_id": pd.Series([cur_id], dtype="int64"),
                "n_events": pd.Series([cur_n], dtype="int64"),
                "ewma_raw": pd.Series([cur_e], dtype="float64"),
            })

    out = (
        events.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(fold_partition,
                     "user_id long, n_events long, ewma_raw double")
    )
    return (
        out.where(F.col("n_events") >= min_events)
        .select("user_id", "n_events",
                F.round(F.col("ewma_raw"), 6).alias("ewma"))
        .orderBy("user_id")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order transition counts between consecutive event types per
    user -- the Markov-chain view of user journeys (what follows a click?).

    One shuffle (the per-user lag window), then a small pair-count agg
    with map-side partials. Each user's first event has no predecessor
    and contributes nothing.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        events.select(prev.alias("from_type"), F.col("event_type").alias("to_type"))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


def top_session_paths(events: DataFrame, gap_minutes: int = 30,
                      k: int = 20) -> DataFrame:
    """Most common session journeys: the ordered event-type sequence of
    each session, rendered 'view>click>purchase', counted across all
    sessions; top-k by frequency (ties broken by path string).

    The ordered list aggregation is sort_array(collect_list(struct(ts,
    event_id, type))) -- collect_list alone is partition-order dependent,
    so the sort key struct (with the unique event_id as tiebreak) is what
    makes the path deterministic and the result oracle-comparable. One
    shuffle to session grain (bounded rows per session), one small path
    count; the top-k is a TakeOrdered, not a global sort.
    """
    s = sessionize(events, gap_minutes)
    ordered = F.sort_array(F.collect_list(F.struct(
        _us(F.col("ts")).alias("us"),
        F.col("event_id"),
        F.col("event_type"),
    )))
    path = F.array_join(
        F.transform(ordered, lambda x: x["event_type"]), ">")
    per_sess = s.groupBy("user_id", "session_id").agg(path.alias("path"))
    return (
        per_sess.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def daily_rollup_partials(events: DataFrame) -> DataFrame:
    """Day-grain MERGEABLE partial aggregate: count + exact decimal sum
    (algebraic, so partials from disjoint slices re-aggregate without
    error). The building block for incremental materialized-view
    maintenance -- see merge_rollups."""
    return (
        events.groupBy(_us(F.date_trunc("day", F.col("ts"))).alias("day_us"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__sum"),
        )
    )


def merge_partials(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two day-grain partial aggregates (count + exact decimal sum)
    into one -- still a partial, so merges chain (batch N's state + batch
    N+1's delta). The decimal is pinned to (38,6) so repeated merges do
    not walk Spark's sum-precision widening into a different type each
    round (state written to parquet must be schema-stable)."""
    return (
        base.unionByName(delta)
        .groupBy("day_us")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__sum").cast("decimal(38,6)").alias("__sum"),
        )
    )


def finalize_rollup(partials: DataFrame) -> DataFrame:
    """Finalize day-grain partials for presentation: one double
    conversion + rounding, after all merging is done."""
    return (
        partials.select(
            "day_us", "n_events",
            F.round(F.col("__sum").cast("double"), 4).alias("sum_value"),
        )
        .orderBy("day_us")
    )


def merge_rollups(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental view maintenance: merge a persisted day-grain partial
    aggregate with the partials of newly-arrived events -- union +
    re-aggregate touches only |days| rows of state, never the history
    fact table. At 100 TB this is the difference between an append-only
    daily job over the new partition and a full-table recompute; the
    oracle for correctness IS the full recompute. Finalization (rounding)
    happens after the merge, so partials stay exact."""
    return finalize_rollup(merge_partials(base, delta))


def ordered_funnel(events: DataFrame) -> DataFrame:
    """Time-ORDERED conversion funnel view -> click -> purchase: a step
    counts only if it happens strictly after the user completed the
    previous step (first view, then first click after that view, then
    first purchase after that click). Complements event_type_funnel,
    which only tests presence.

    Three chained min-over-window passes share ONE partitioning
    (user_id), so Catalyst plans a single Exchange + sort with stacked
    Window nodes -- per-user timeline scans, no self-joins. Output is one
    row per user with the microsecond timestamp each stage was reached
    (null = never reached), so downstream can both count stage
    conversion and measure stage latency.
    """
    w = Window.partitionBy("user_id")
    us = _us(F.col("ts"))
    t_view = F.min(F.when(F.col("event_type") == "view", us)).over(w)
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (us > F.col("t_view_us")),
               us)).over(w)
    t_purchase = F.min(
        F.when((F.col("event_type") == "purchase")
               & (us > F.col("t_click_us")), us)).over(w)
    return (
        events
        .withColumn("t_view_us", t_view)
        .withColumn("t_click_us", t_click)
        .withColumn("t_purchase_us", t_purchase)
        .groupBy("user_id")
        .agg(
            F.first("t_view_us").alias("t_view_us"),
            F.first("t_click_us").alias("t_click_us"),
            F.first("t_purchase_us").alias("t_purchase_us"),
        )
        .orderBy("user_id")
    )


def dau_wau_stickiness(events: DataFrame) -> DataFrame:
    """Daily active users and the rolling 7-day active-user count, with
    the DAU/WAU stickiness ratio -- the standard engagement report.

    The fact table collapses to distinct (day, user) FIRST (bounded by
    users x days); the 7-day window then counts distinct users via a
    day-level RANGE frame over that collapsed frame. The rolling distinct
    needs the (day, user) grain -- counting over pre-aggregated daily
    totals would double-count multi-day users -- so the window partitions
    by user first (presence runs), then a day-level aggregate finishes.
    Implementation: a user is WAU-active on day d if they have an event in
    [d-6, d]; equivalently sum over the 7 days of their daily-presence
    flags > 0. One distinct + two bounded aggregates, no self-join.
    """
    day_us = _us(F.date_trunc("day", F.col("ts")))
    day_user = events.select(
        day_us.alias("day_us"), F.col("user_id")).distinct()
    # every (day, user) pair fans out to the 7 days it keeps the user
    # WAU-active for; distinct again because consecutive activity overlaps
    MICROS_PER_DAY = 86_400_000_000
    fan = day_user.select(
        F.explode(F.sequence(
            F.col("day_us"),
            F.col("day_us") + F.lit(6 * MICROS_PER_DAY),
            F.lit(MICROS_PER_DAY))).alias("day_us"),
        "user_id",
    ).distinct()
    dau = day_user.groupBy("day_us").agg(
        F.count(F.lit(1)).alias("dau"))
    wau = fan.groupBy("day_us").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day_us")
        .select(
            "day_us", "dau", "wau",
            F.round(F.col("dau").cast("double")
                    / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("day_us")
    )


def ab_value_report(events: DataFrame) -> DataFrame:
    """Welch two-sample t report per event_type: users split A/B by md5
    parity (deterministic, engine-portable -- never split on raw id
    parity, which correlates with signup order), then mean `value`
    difference tested with unequal-variance t and Welch-Satterthwaite df.

    ONE aggregate: both arms come from conditional decimal moment sums in
    the same groupBy (no second shuffle, no self-join). Float ops happen
    only AFTER the exact decimal sums -- the user_value_trend discipline
    -- so Spark and the oracle agree bit-for-bit through the final
    round()."""
    arm = (
        F.conv(F.substring(F.md5(F.concat(
            F.lit("ab:"), F.col("user_id").cast("string"))), 1, 8),
            16, 10).cast("long") % 2
    )
    y = F.col("value").cast("decimal(18,6)")
    m = (
        events.groupBy("event_type")
        .agg(
            F.count(F.when(arm == 0, 1)).alias("n_a"),
            F.count(F.when(arm == 1, 1)).alias("n_b"),
            F.sum(F.when(arm == 0, y)).alias("__sy_a"),
            F.sum(F.when(arm == 1, y)).alias("__sy_b"),
            F.sum(F.when(arm == 0, y * y)).alias("__syy_a"),
            F.sum(F.when(arm == 1, y * y)).alias("__syy_b"),
        )
        .where((F.col("n_a") > 1) & (F.col("n_b") > 1))
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sya, syb = F.col("__sy_a").cast("double"), F.col("__sy_b").cast("double")
    syya = F.col("__syy_a").cast("double")
    syyb = F.col("__syy_b").cast("double")
    mean_a, mean_b = sya / na, syb / nb
    var_a = (na * syya - sya * sya) / (na * (na - 1))
    var_b = (nb * syyb - syb * syb) / (nb * (nb - 1))
    va, vb = var_a / na, var_b / nb
    t = (mean_a - mean_b) / F.sqrt(va + vb)
    df_w = (va + vb) * (va + vb) / (
        va * va / (na - 1) + vb * vb / (nb - 1))
    return (
        m.select(
            "event_type", "n_a", "n_b",
            F.round(mean_a, 6).alias("mean_a"),
            F.round(mean_b, 6).alias("mean_b"),
            F.round(t, 6).alias("t_welch"),
            F.round(df_w, 4).alias("df_welch"),
        )
        .orderBy("event_type")
    )


def cdc_apply(events: DataFrame) -> DataFrame:
    """CDC log compaction: read events as a change stream keyed by
    user_id -- 'error' rows are tombstones (delete), every other type
    upserts (event_type, value) -- and materialize the latest-wins
    snapshot. Keys whose LAST change is a tombstone vanish.

    One window over one (user_id) shuffle picks the winner; ties on ts
    break by event_id (the change log's sequence number), which makes the
    snapshot deterministic under replay -- the property that lets a
    1000-executor backfill reprocess any subrange idempotently."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            _us(F.col("ts")).alias("last_ts_us"),
            F.col("event_id").alias("last_event_id"),
        )
        .orderBy("user_id")
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each change
    (user_id, ts, event_type, value) opens a validity interval that the
    NEXT change for the same key closes -- valid_from/valid_to via one
    lead() window over one (user_id) shuffle; the open interval carries
    valid_to NULL and is_current true. Tombstones ('error' type) CLOSE
    the running interval without opening one (the deleted state is
    simply absent afterwards), the standard SCD2 delete treatment.

    Ties on ts break by event_id like cdc_apply, so replay is
    deterministic. This is the dimension-table build a warehouse runs on
    every CDC batch; at scale the window is partition-local after the
    key shuffle and the output appends to the dimension partitioned by
    is_current."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    nxt_ts = F.lead(_us(F.col("ts"))).over(w)
    return (
        events.withColumn("valid_to_us", nxt_ts)
        .where(F.col("event_type") != "error")   # tombstones close only
        .select(
            "user_id",
            F.col("event_type").alias("state_type"),
            F.round("value", 6).alias("state_value"),
            _us(F.col("ts")).alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


def rolling_distinct_users_sketch(events: DataFrame,
                                  window_days: int = 7,
                                  lg_k: int = 14) -> DataFrame:
    """Rolling N-day distinct users via MERGEABLE HLL sketches -- the
    100 TB replacement for dau_wau_stickiness' exact (day, user) fan-out:
    one fixed-size sketch per day (persistable; yesterday's sketches are
    never recomputed), and each rolling window is a UNION of N daily
    sketches followed by one estimate. State is |days| x ~2^lg_k bytes,
    independent of user cardinality; the exact variant's (day, user)
    distinct grows with users x days.

    Day fan-out happens on the |days|-row SKETCH table, not the fact
    table. Output (day_us, approx_users) is rows-only at the driver
    (sketch internals are engine-specific); the error bound vs the exact
    rolling distinct is pytest-pinned.
    """
    MICROS_PER_DAY = 86_400_000_000
    day_us = F.unix_micros(F.date_trunc("day", F.col("ts")))
    daily = (
        events.select(day_us.alias("day_us"), "user_id")
        .groupBy("day_us")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"))
    )
    # each daily sketch contributes to the window ending on days
    # [day, day + N-1]; fan out the tiny sketch table, not the facts
    fan = daily.select(
        F.explode(F.sequence(
            F.col("day_us"),
            F.col("day_us") + F.lit((window_days - 1) * MICROS_PER_DAY),
            F.lit(MICROS_PER_DAY))).alias("w_day_us"),
        "sk",
    )
    return (
        fan.groupBy("w_day_us")
        .agg(F.hll_sketch_estimate(
            F.hll_union_agg("sk")).alias("approx_users"))
        .select(F.col("w_day_us").alias("day_us"), "approx_users")
        .orderBy("day_us")
    )


def extract_props_variant(events: DataFrame) -> DataFrame:
    """Open-schema JSON extraction through Spark 4's VARIANT type:
    ``parse_json`` encodes the document once into the binary VARIANT
    form, then ``variant_get`` does typed path extraction from the
    encoded bytes. This is the third point on the semi-structured
    spectrum the engine offers -- get_json_object (re-parses the string
    per key, extract_props), from_json into a FIXED struct
    (extract_props_struct), and VARIANT (parse once, schema-free, typed
    access per read -- the shape for event streams whose property keys
    drift over time). Same result surface as the other two, so all
    three share one oracle; what differs is the encoding strategy.
    ``try_parse_json``-style permissiveness comes from variant_get
    returning NULL on missing paths."""
    return (
        events.select(
            "event_id", "event_type",
            F.parse_json(F.col("props")).alias("__v"))
        .select(
            "event_id", "event_type",
            F.variant_get(F.col("__v"), "$.k", "long").alias("prop_k"))
        .orderBy("event_id")
    )


def multi_touch_attribution(events: DataFrame,
                            window_days: int = 7) -> DataFrame:
    """Multi-touch attribution: every purchase distributes credit over
    the SAME USER's clicks in the ``window_days`` before it (inclusive
    of the purchase instant), under the three standard models at once
    -- first-touch (all credit to the earliest click), last-touch (the
    latest), and linear (1/n to each). Emits one row per click that
    influenced anything: (click_id, user_id, n_purchases, n_first,
    n_last, linear_credit).

    Shape: both sides PRE-BIN to window-sized grid cells
    (interval_overlap_join's rewrite) and equi-join on
    (user_id, cell) -- each purchase replicates into exactly the two
    cells a qualifying click can live in (floor(p/win)-1 and
    floor(p/win), since p-win <= c <= p), each qualifying pair arises
    in exactly ONE cell (the click's own), and the residual range
    predicate finishes the window. The join key carries the TIME CELL,
    so a heavy user (a bot with 10^4 clicks and 10^4 purchases spread
    over months) expands per (user, 7-day cell), not per user: the
    blow-up tracks the user's IN-WINDOW pair count -- which is the
    output size, the irreducible floor -- instead of n_clicks x
    n_purchases across all time (hot-user stress:
    tools/scale_stress_attribution.py, PERF.md). Never a cartesian
    (plan-gated). Per-purchase touch counts and first/last picks are
    one window over the pair table; ties inside a model break on
    (ts, event_id), mirrored in the oracle."""
    win_us = window_days * 86_400_000_000
    us = F.unix_micros(F.col("ts"))
    clicks = (events.where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      "user_id", us.alias("c_us"),
                      F.floor(us / F.lit(win_us)).alias("cell")))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", us.alias("p_us"),
                         F.explode(F.array(
                             F.floor(us / F.lit(win_us)) - 1,
                             F.floor(us / F.lit(win_us))))
                         .alias("cell")))
    pairs = (clicks.join(purchases, ["user_id", "cell"])
             .where((F.col("c_us") <= F.col("p_us"))
                    & (F.col("c_us") >= F.col("p_us") - win_us)))
    w = Window.partitionBy("purchase_id")
    w_ord = w.orderBy("c_us", "click_id")
    scored = (pairs
              .withColumn("n_touches", F.count(F.lit(1)).over(w))
              .withColumn("touch_rank", F.row_number().over(w_ord)))
    return (scored.groupBy("click_id", "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"),
                 F.sum(F.when(F.col("touch_rank") == 1, 1).otherwise(0))
                 .cast("long").alias("n_first"),
                 F.sum(F.when(F.col("touch_rank") == F.col("n_touches"),
                              1).otherwise(0))
                 .cast("long").alias("n_last"),
                 F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 6)
                 .alias("linear_credit"))
            .orderBy("click_id"))
