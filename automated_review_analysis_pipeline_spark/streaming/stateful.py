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
STATE_SCHEMA = "n long, s double, last_us long"


def _update_profile(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, s, last_us))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [round(s, 4)],
        "last_event_us": [last_us],
    })


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
