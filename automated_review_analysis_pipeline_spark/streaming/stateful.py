"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations cover tumbling/sliding/session shapes;
anything with bespoke per-key state (running profiles, cross-batch
counters, custom eviction) drops to applyInPandasWithState: state is a
per-key tuple the engine checkpoints between micro-batches, the UDF sees
Arrow batches of that key's new rows and decides what to emit.

Here: a running per-user activity profile (event count, value sum, last
event time) maintained across micro-batches -- the "user feature store"
shape of a training-data pipeline. Emits the updated profile every time a
batch touches the user (update output mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
                 "last_event_us long")
# value accumulates as integer micro-units (value * 1e6, rounded): a double
# running sum is order-dependent and can flip the 4th decimal vs the exact
# decimal SQL oracle; integer micros make the fold exact and commutative.
STATE_SCHEMA = "n long, s_us long, last_us long"


def _update_profile(key, pdf_iter, state: GroupState):
    import numpy as np
    import pandas as pd

    (user_id,) = key
    n, s_us, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            # round half AWAY from zero to match the oracle's
            # CAST(value AS DECIMAL(18,6)) semantics -- pandas .round()
            # is half-to-even and would diverge on exact .5 micro-units
            v = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
            micros = np.sign(v) * np.floor(np.abs(v) * 1_000_000 + 0.5)
            s_us += int(micros.sum())
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, s_us, last_us))
    # micro-units -> 4dp HALF-AWAY (python round() is half-to-even and
    # diverges from the oracle's DECIMAL semantics at 50-micro sums)
    sum_4dp = (-1 if s_us < 0 else 1) * ((abs(s_us) + 50) // 100) / 10_000
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [sum_4dp],
        "last_event_us": [last_us],
    })


SESSION_OUT_SCHEMA = ("user_id long, session_start_us long, "
                      "session_end_us long, n_events long")
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _session_finalizer(gap_us: int):
    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        done: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # watermark passed last_event + gap with no new data: the
            # open session is final -- emit and EVICT the key's state
            start_us, last_us, n = state.get
            done.append((start_us, last_us, n))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdf_iter:
                ts.extend(int(v) for v in pdf["ts_us"])
            ts.sort()
            start_us, last_us, n = (state.get if state.exists
                                    else (None, None, 0))
            for t in ts:
                if last_us is not None and t - last_us > gap_us:
                    done.append((start_us, last_us, n))   # closed in-data
                    start_us, n = None, 0
                if start_us is None:
                    start_us = t
                n += 1
                last_us = t
            state.update((start_us, last_us, n))
            # event-time timeout in MILLISECONDS: fires once the
            # watermark passes the open session's last event + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        yield pd.DataFrame({
            "user_id": pd.Series([user_id] * len(done), dtype="int64"),
            "session_start_us": pd.Series([d[0] for d in done],
                                          dtype="int64"),
            "session_end_us": pd.Series([d[1] for d in done],
                                        dtype="int64"),
            "n_events": pd.Series([d[2] for d in done], dtype="int64"),
        })

    return fn


def finalized_sessions(events_stream: DataFrame,
                       gap_minutes: int = 30) -> DataFrame:
    """Gap-sessionization as a CUSTOM stateful operator with event-time
    TIMEOUT EVICTION: each key's open session lives in the state store;
    a session is emitted either when an in-stream event arrives more than
    ``gap_minutes`` after its last event (closed in-data) or when the
    WATERMARK passes last_event + gap with no new data -- the
    applyInPandasWithState timeout path, which is also what bounds state:
    idle keys are evicted, so state is O(active users), not O(all users
    ever seen). The built-in session_window covers plain windowed aggs;
    this is the shape for bespoke per-session logic (custom merge rules,
    early triggers, enrichment at finalization).

    Emits FINALIZED sessions only (append mode). With a 0-second
    watermark delay over a drained time-ordered stream, the accumulated
    output equals batch gap-sessionization minus each user's still-open
    trailing session -- an exactly-characterizable (and SQL-oracle-able)
    result."""
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    prepped = (
        events_stream.select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withColumn("ts_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", "0 seconds")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_finalizer(gap_us),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """Per-user running profile over an event stream. State lives in the
    state store (checkpointed, recoverable); each micro-batch updates only
    the touched keys."""
    from pyspark.sql import functions as F

    prepped = events_stream.select(
        "user_id",
        F.col("value"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUT_SCHEMA = ("event_id long, user_id long, click_us long, "
                   "value double, p_us long, p_value double")
# has_p is the explicit "a purchase exists" flag: a -1-in-last_us
# sentinel would swallow legitimate pre-1970 (negative unix_micros)
# purchases, and last_val stays Optional so a NULL purchase value is
# carried as NULL (the batch asof_join / DuckDB ASOF semantics), never
# coerced to 0.0
ASOF_STATE_SCHEMA = "has_p boolean, last_us long, last_value double"


def _asof_enricher(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    has_p, last_us, last_val = (state.get if state.exists
                                else (False, 0, None))
    pdfs = [p for p in pdf_iter if len(p)]
    outs = []
    if pdfs:
        rows = pd.concat(pdfs, ignore_index=True)
        # purchases first at equal ts (inclusive as-of), then event id
        rows["side"] = (rows["event_type"] != "purchase").astype(int)
        rows = rows.sort_values(["ts_us", "side", "event_id"])
        for r in rows.itertuples(index=False):
            if r.side == 0:  # purchase: advance the per-key state
                v = None if r.value != r.value else float(r.value)
                if has_p and last_us == r.ts_us:
                    # = the batch MAX(value) at this ts; SQL MAX skips
                    # NULLs, so only non-NULL values compete
                    if v is not None:
                        last_val = v if last_val is None \
                            else max(last_val, v)
                else:
                    has_p, last_us, last_val = True, int(r.ts_us), v
            else:            # click: emit enriched row
                cv = None if r.value != r.value else float(r.value)
                outs.append((int(r.event_id), user_id, int(r.ts_us),
                             cv, last_us if has_p else None,
                             last_val if has_p else None))
    state.update((has_p, last_us, last_val))
    if outs:
        yield pd.DataFrame(outs, columns=[
            "event_id", "user_id", "click_us", "value", "p_us", "p_value"])


def streaming_asof_enrich(events_stream: DataFrame) -> DataFrame:
    """Streaming AS-OF enrichment (the stateful twin of
    operators.events.asof_join): one interleaved stream of clicks and
    purchases, keyed by user; per-key state is just the MOST RECENT
    purchase (ts, max value at that ts), and every click emits enriched
    with it -- constant state per key, the streaming shape of
    point-in-time feature lookup. Ties (purchase at the click's exact
    ts) match inclusively, same as the batch operator and DuckDB ASOF.

    Correctness contract: equals the batch as-of join when micro-batches
    arrive in event-time order (the availableNow file-ordered fixture);
    within a batch rows are sorted by (ts, purchase-first, event_id), so
    only CROSS-batch reordering can misenrich -- the same in-order
    delivery assumption the incremental rollup documents.

    PREFER :func:`streaming_asof_enrich_ooo` for real sources. Kafka
    (and any partitioned/redelivered transport) does NOT guarantee
    cross-partition event-time order, and
    test_streaming_asof_ooo_corrects_cross_batch_disorder proves this
    lane mis-enriches on exactly that shape. This in-order lane remains
    for strictly ordered replays (single sorted file feed, log-shipped
    archives), where it is cheaper: O(1) state per key with no
    watermark buffering or timeout machinery."""
    from pyspark.sql import functions as F

    base = (events_stream
            .where(F.col("event_type").isin("click", "purchase"))
            .select("event_id", "user_id",
                    F.unix_micros(F.col("ts")).alias("ts_us"),
                    "event_type", "value"))
    return base.groupBy("user_id").applyInPandasWithState(
        _asof_enricher, ASOF_OUT_SCHEMA, ASOF_STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)


ASOF_OOO_STATE_SCHEMA = ("c_ids array<long>, c_ts array<long>, "
                         "c_vals array<double>, p_ts array<long>, "
                         "p_vals array<double>")


def _asof_ooo_enricher(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        c_ids, c_ts, c_vals, p_ts, p_vals = (list(x) for x in state.get)
    else:
        c_ids, c_ts, c_vals, p_ts, p_vals = [], [], [], [], []
    for pdf in pdf_iter:
        for r in pdf.itertuples(index=False):
            v = None if r.value != r.value else float(r.value)
            if r.event_type == "purchase":
                p_ts.append(int(r.ts_us))
                p_vals.append(v)
            elif r.event_type == "click":
                c_ids.append(int(r.event_id))
                c_ts.append(int(r.ts_us))
                c_vals.append(v)
            # anything else (punctuation/heartbeat rows) only advances
            # the watermark upstream; it enters no one's state

    wm_ms = state.getCurrentWatermarkMs()
    # no watermark yet (first batch): nothing is final
    wm_us = wm_ms * 1000 if wm_ms > 0 else None

    outs = []
    if wm_us is not None:
        # purchases sorted once; per finalized click, the as-of match is
        # the latest purchase ts <= click ts, value = MAX of the
        # non-NULL values at that ts (batch MAX semantics)
        psorted = sorted(range(len(p_ts)), key=lambda i: p_ts[i])
        sts = [p_ts[i] for i in psorted]
        svs = [p_vals[i] for i in psorted]
        import bisect

        if c_ids:
            emit_idx = [i for i in range(len(c_ids)) if c_ts[i] <= wm_us]
            for i in sorted(emit_idx, key=lambda i: (c_ts[i], c_ids[i])):
                pos = bisect.bisect_right(sts, c_ts[i])
                if pos == 0:
                    m_ts, m_val = None, None
                else:
                    m_ts = sts[pos - 1]
                    lo = bisect.bisect_left(sts, m_ts)
                    vals = [v for v in svs[lo:pos] if v is not None]
                    m_val = max(vals) if vals else None
                outs.append((c_ids[i], user_id, c_ts[i], c_vals[i],
                             m_ts, m_val))
            keep = [i for i in range(len(c_ids)) if c_ts[i] > wm_us]
            c_ids = [c_ids[i] for i in keep]
            c_ts = [c_ts[i] for i in keep]
            c_vals = [c_vals[i] for i in keep]
        # prune purchases: keep every entry at the LATEST ts <= wm
        # (max-at-ts semantics needs all of them) + everything > wm.
        # UNCONDITIONALLY -- a purchase-only user (no pending clicks)
        # must still shed finalized purchases, or a long-running stream
        # accumulates every purchase forever (the documented state
        # bound is O(rate x delay) + one latest group)
        older = [t for t in sts if t <= wm_us]
        cutoff = older[-1] if older else None
        kept = [(t, v) for t, v in zip(p_ts, p_vals)
                if t > wm_us or (cutoff is not None and t == cutoff)]
        p_ts = [t for t, _ in kept]
        p_vals = [v for _, v in kept]

    if not c_ids and not p_ts:
        if state.exists:
            state.remove()
    else:
        state.update((c_ids, c_ts, c_vals, p_ts, p_vals))
        if c_ids:
            # fire when the watermark passes the earliest pending click
            # (strictly above the current watermark by construction:
            # anything <= wm was just emitted). Clamp to >= 1 ms: a
            # pre-1970 click's negative epoch would be rejected (Spark
            # requires timeout > watermark, and the watermark never
            # goes below 0) -- such clicks fire as soon as ANY
            # watermark exists, then wait in state until it passes them
            state.setTimeoutTimestamp(max(1, min(c_ts) // 1000 + 1))
        elif wm_us is None or any(t > wm_us for t in p_ts):
            # purchases not yet finalized and no pending click to piggy-
            # back on: schedule a prune so the state shrinks to the one
            # latest-<=-wm group even if the user never sends another
            # row. Once only that group remains, no timeout -- stable
            # O(1) state per user (the keyed-state floor).
            state.setTimeoutTimestamp(max(1, max(p_ts) // 1000 + 1))
    if outs:
        yield pd.DataFrame(outs, columns=[
            "event_id", "user_id", "click_us", "value", "p_us", "p_value"])


def streaming_asof_enrich_ooo(events_stream: DataFrame,
                              delay: str = "10 minutes") -> DataFrame:
    """OUT-OF-ORDER-robust streaming as-of enrichment: unlike
    :func:`streaming_asof_enrich` (which assumes micro-batches arrive
    in event-time order and keeps only the most recent purchase), this
    lane BUFFERS clicks in state until the WATERMARK passes their
    event time, and applies every purchase -- including ones arriving
    in LATER batches than the clicks they must enrich -- before a
    click is finalized. Standard watermark semantics: disorder within
    ``delay`` is corrected exactly (output equals the batch
    asof_join); rows later than that may be dropped or mis-enriched,
    which is the contract every watermarked operator (including
    Spark's own stream-stream joins) makes.

    State per user is bounded: the pending clicks inside the watermark
    horizon + purchases newer than the watermark + ONE latest purchase
    at-or-below it (the only one any future click can still match) --
    O(rate x delay), not O(history). Clicks flush either when a data
    batch advances the watermark or via event-time TIMEOUT (the
    no-new-data path); a stream can carry punctuation rows (any
    event_type other than click/purchase, e.g. 'heartbeat') that
    advance the watermark without entering anyone's state -- the
    KERNEL skips them rather than a pre-filter, because Catalyst
    pushes an event_type filter below the EventTimeWatermark node into
    the parquet scan, and a scan-filtered punctuation row never
    reaches the watermark node at all (observed: the drain's watermark
    then never advances and nothing flushes)."""
    from pyspark.sql import functions as F

    base = (events_stream
            .select("event_id", "user_id",
                    F.col("ts").cast("timestamp").alias("ts"),
                    "event_type", "value")
            .withWatermark("ts", delay)
            # keep the watermarked ts column itself: event-time timeout
            # requires the watermark attribute to reach the stateful op
            .select("event_id", "user_id", "ts",
                    F.unix_micros(F.col("ts")).alias("ts_us"),
                    "event_type", "value"))
    return base.groupBy("user_id").applyInPandasWithState(
        _asof_ooo_enricher, ASOF_OUT_SCHEMA, ASOF_OOO_STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.EventTimeTimeout)
