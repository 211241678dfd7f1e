"""Arbitrary-stateful streaming via transformWithStateInPandas --
Spark 4's successor API to applyInPandasWithState (SPARK-46815,
"State API v2" / transformWithState, public since Spark 4.0).

Where applyInPandasWithState checkpoints ONE opaque tuple per key,
transformWithState gives the processor TYPED, independently-updatable
state primitives (ValueState / ListState / MapState, optional TTL,
timers) backed by the RocksDB state store. The profile below keeps a
ValueState for the running (count, micro-unit sum) and a MapState for
the set of distinct event types -- the composite "user feature store"
shape that needed awkward tuple packing under the old API.

Numeric discipline matches streaming/stateful.py: values accumulate as
integer micro-units (round half away from zero) so the fold is exact
and commutative, and the emitted sum matches a DECIMAL(18,6)-cast batch
aggregate bit-for-bit -- which is exactly what the SQL oracle computes.
Over a single-file availableNow drain (one micro-batch) update mode
emits one row per user, so the accumulated output IS the batch
aggregate.

ENVIRONMENT NOTE: transformWithState's Python worker speaks protobuf to
the JVM state server (`google.protobuf` import inside
pyspark.sql.streaming.proto); this container ships no protobuf, so the
engine path cannot execute here and the operator is NOT in the query
registry. tests/test_stateful_streaming.py covers the processor kernel
directly against a fake handle (always) and the full RocksDB drain
(skip-unless-protobuf), the same honest-partial convention as the VADER
branch and the media codecs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_OUT_SCHEMA = ("user_id long, n_events long, n_types int, "
                      "sum_value double")


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile: event count + micro-exact value sum in
    a ValueState, distinct event types in a MapState (set semantics:
    type -> 1)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n LONG, s_us LONG")
        self._types = handle.getMapState("types", "t STRING", "one INT")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np
        import pandas as pd

        n, s_us = 0, 0
        prev = self._agg.get()
        if prev is not None:
            n, s_us = int(prev[0]), int(prev[1])
        for pdf in rows:
            v = pdf["value"].to_numpy(dtype="float64")
            # round half AWAY from zero into integer micro-units: the
            # same exact-fold discipline as stateful._update_profile
            micros = np.sign(v) * np.floor(np.abs(v) * 1_000_000 + 0.5)
            n += len(pdf)
            s_us += int(micros.sum())
            for t in pdf["event_type"].unique():
                if not self._types.containsKey((str(t),)):
                    self._types.updateValue((str(t),), (1,))
        self._agg.update((n, s_us))
        n_types = sum(1 for _ in self._types.keys())
        # integer micro-units -> 4dp with HALF-AWAY rounding (Python's
        # round() is half-to-even on binary floats and diverges from the
        # batch F.round / DECIMAL cast when the sum lands on a 50-micro
        # boundary)
        sign = -1 if s_us < 0 else 1
        sum_4dp = sign * ((abs(s_us) + 50) // 100) / 10_000
        yield pd.DataFrame({
            "user_id": [int(key[0])],
            "n_events": [n],
            "n_types": [int(n_types)],
            "sum_value": [sum_4dp],
        })

    def close(self) -> None:
        pass


def user_profiles_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running profile through transformWithStateInPandas.
    Requires the RocksDB state store provider (set by the caller or
    session config -- transformWithState does not run on the HDFS-backed
    default provider)."""
    prepped = events_stream.select("user_id", "event_type", "value")
    return prepped.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=PROFILE_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
