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
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [round(s_us / 1_000_000, 4)],
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
