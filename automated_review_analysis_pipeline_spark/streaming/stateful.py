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
            # vectorized gap fold (optimization guide §4.2): sessions are
            # maximal runs of sorted ts with consecutive gaps <= gap_us;
            # the carried open session continues into the first run iff
            # the first new event is within gap of its last event.
            # Identical to the scalar per-event fold (same oracle).
            import numpy as np

            arrs = [p["ts_us"].to_numpy(dtype=np.int64)
                    for p in pdf_iter if len(p)]
            ts = np.sort(np.concatenate(arrs)) if arrs \
                else np.empty(0, dtype=np.int64)
            start_us, last_us, n = (state.get if state.exists
                                    else (None, None, 0))
            if len(ts):
                brk = np.flatnonzero(np.diff(ts) > gap_us) + 1
                bounds = np.concatenate(([0], brk, [len(ts)]))
                if last_us is not None and ts[0] - last_us > gap_us:
                    done.append((start_us, last_us, n))  # closed in-data
                    start_us, n = None, 0
                nseg = len(bounds) - 1
                for k in range(nseg):
                    a, b = int(bounds[k]), int(bounds[k + 1])
                    s = start_us if (k == 0 and start_us is not None) \
                        else int(ts[a])
                    cnt = (n if k == 0 else 0) + (b - a)
                    if k < nseg - 1:
                        done.append((s, int(ts[b - 1]), cnt))
                    else:  # trailing run stays open in state
                        start_us, last_us, n = s, int(ts[b - 1]), cnt
            state.update((start_us, last_us, n))
            # event-time timeout in MILLISECONDS: fires once the
            # watermark passes the open session's last event + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if done:
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
    # Vectorized kernel (optimization guide §4.2) -- EXACT emulation of
    # the scalar fold over rows sorted by (ts, purchase-first, id),
    # including the in-order lane's DOCUMENTED cross-batch-disorder
    # behavior (pytest-pinned): a click before the batch's first
    # purchase matches the carried state even if the state's ts is
    # newer than the click; a batch purchase at a ts other than the
    # state's RESETS the state (even backward); a first-group purchase
    # at exactly the state's ts merges via max-of-non-NULLs.
    import numpy as np
    import pandas as pd

    (user_id,) = key
    has_p, last_us, last_val = (state.get if state.exists
                                else (False, 0, None))
    pdfs = [p for p in pdf_iter if len(p)]
    outs = []
    if pdfs:
        if len(pdfs) == 1:
            rows = pdfs[0]
        else:
            rows = pd.concat(pdfs, ignore_index=True)
        ts_a = rows["ts_us"].to_numpy(dtype=np.int64)
        id_a = rows["event_id"].to_numpy(dtype=np.int64)
        v_a = rows["value"].to_numpy(dtype=np.float64, na_value=np.nan)
        is_p = (rows["event_type"] == "purchase").to_numpy()

        p_order = np.lexsort((id_a[is_p], ts_a[is_p]))
        pts = ts_a[is_p][p_order]
        pvs = v_a[is_p][p_order]
        if len(pts):
            # running max of non-NULLs within each equal-ts group
            # (np.fmax skips NaN); the group containing the batch's
            # FIRST purchase additionally folds the carried state value
            # iff that group's ts == the carried state ts
            gmax = pvs.copy()
            for i in range(1, len(gmax)):
                if pts[i] == pts[i - 1]:
                    gmax[i] = np.fmax(gmax[i], gmax[i - 1])
            if has_p and pts[0] == last_us:
                seedv = np.nan if last_val is None else last_val
                first_grp = pts == pts[0]
                gmax[first_grp] = np.fmax(gmax[first_grp], seedv)

        cm = ~is_p
        if cm.any():
            c_order = np.lexsort((id_a[cm], ts_a[cm]))
            cts = ts_a[cm][c_order]
            cids = id_a[cm][c_order]
            cvs = v_a[cm][c_order]
            pos = np.searchsorted(pts, cts, side="right") if len(pts) \
                else np.zeros(len(cts), dtype=np.int64)
            for j in range(len(cts)):
                cv = None if cvs[j] != cvs[j] else float(cvs[j])
                p = pos[j]
                if p == 0:  # no batch purchase at-or-before: carried state
                    m_us = last_us if has_p else None
                    m_val = last_val if has_p else None
                else:
                    m_us = int(pts[p - 1])
                    mv = gmax[p - 1]
                    m_val = None if mv != mv else float(mv)
                outs.append((int(cids[j]), user_id, int(cts[j]),
                             cv, m_us, m_val))
        if len(pts):
            has_p = True
            last_us = int(pts[-1])
            mv = gmax[-1]
            last_val = None if mv != mv else float(mv)
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
    # Vectorized kernel (optimization guide §4.2): batch ingestion via
    # column masks and emission via np.searchsorted instead of the
    # row-at-a-time itertuples/bisect loop. Semantics are IDENTICAL to
    # the scalar version (same oracle): NaN value -> None, as-of match =
    # latest purchase ts <= click ts, value = MAX of non-NULL values at
    # that ts, emission ordered by (click ts, click id).
    import numpy as np
    import pandas as pd

    (user_id,) = key
    if state.exists:
        c_ids, c_ts, c_vals, p_ts, p_vals = (list(x) for x in state.get)
    else:
        c_ids, c_ts, c_vals, p_ts, p_vals = [], [], [], [], []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        et = pdf["event_type"].to_numpy()
        ts_a = pdf["ts_us"].to_numpy()
        id_a = pdf["event_id"].to_numpy()
        v_a = pdf["value"].to_numpy(dtype=np.float64, na_value=np.nan)
        pm = et == "purchase"
        cm = et == "click"
        # anything else (punctuation/heartbeat rows) only advances
        # the watermark upstream; it enters no one's state
        if pm.any():
            p_ts.extend(int(t) for t in ts_a[pm])
            p_vals.extend(None if v != v else float(v) for v in v_a[pm])
        if cm.any():
            c_ids.extend(int(i) for i in id_a[cm])
            c_ts.extend(int(t) for t in ts_a[cm])
            c_vals.extend(None if v != v else float(v) for v in v_a[cm])

    wm_ms = state.getCurrentWatermarkMs()
    # no watermark yet (first batch): nothing is final
    wm_us = wm_ms * 1000 if wm_ms > 0 else None

    outs = []
    if wm_us is not None:
        # purchases sorted once; per finalized click, the as-of match is
        # the latest purchase ts <= click ts, value = MAX of the
        # non-NULL values at that ts (batch MAX semantics)
        sts_a = np.asarray(p_ts, dtype=np.int64)
        svs_a = np.asarray(
            [np.nan if v is None else v for v in p_vals], dtype=np.float64)
        order = np.argsort(sts_a, kind="stable")
        sts_a = sts_a[order]
        svs_a = svs_a[order]
        # running max of non-NULL values within each equal-ts group:
        # groupmax[i] = max non-NULL value among entries with ts ==
        # sts_a[i] up to i (NaN if none) -- evaluated at the LAST entry
        # of a ts group it is exactly the scalar loop's max-at-ts
        if len(sts_a):
            # np.fmax treats NaN as missing: max of the non-NULLs,
            # NaN only when every value in the ts group is NULL
            gmax = svs_a.copy()
            for i in range(1, len(gmax)):
                if sts_a[i] == sts_a[i - 1]:
                    gmax[i] = np.fmax(gmax[i], gmax[i - 1])
        if c_ids:
            cid_a = np.asarray(c_ids, dtype=np.int64)
            cts_a = np.asarray(c_ts, dtype=np.int64)
            emit = cts_a <= wm_us
            if emit.any():
                e_ids = cid_a[emit]
                e_ts = cts_a[emit]
                e_vals = [v for v, m in zip(c_vals, emit) if m]
                eorder = np.lexsort((e_ids, e_ts))
                pos = np.searchsorted(sts_a, e_ts, side="right")
                for j in eorder:
                    p = pos[j]
                    if p == 0:
                        m_ts, m_val = None, None
                    else:
                        m_ts = int(sts_a[p - 1])
                        mv = gmax[p - 1]
                        m_val = None if mv != mv else float(mv)
                    outs.append((int(e_ids[j]), user_id, int(e_ts[j]),
                                 e_vals[j], m_ts, m_val))
            keepm = ~emit
            c_ids = [i for i, m in zip(c_ids, keepm) if m]
            c_ts = [t for t, m in zip(c_ts, keepm) if m]
            c_vals = [v for v, m in zip(c_vals, keepm) if m]
        # prune purchases: keep every entry at the LATEST ts <= wm
        # (max-at-ts semantics needs all of them) + everything > wm.
        # UNCONDITIONALLY -- a purchase-only user (no pending clicks)
        # must still shed finalized purchases, or a long-running stream
        # accumulates every purchase forever (the documented state
        # bound is O(rate x delay) + one latest group)
        older = sts_a[sts_a <= wm_us]
        cutoff = int(older[-1]) if len(older) else None
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
