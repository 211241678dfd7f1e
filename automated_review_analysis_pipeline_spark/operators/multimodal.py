"""Multimodal column plumbing (SURVEY.md §2B).

Images/audio/video are opaque `binary` columns with a typed metadata
struct. The Spark-side plumbing -- schema, partition sizing, mapInPandas
batch shape, UDF signatures -- is real and tested; the actual codec calls
are stubbed behind ``decoder`` callables (the image/audio libraries are
not in this container) with a deterministic fake used by tests.

Plan shape at 100 TB: binary payloads dominate partition size, so the
operators repartition by byte budget BEFORE any decode (a 128 MB parquet
partition of 4 MB images is ~32 rows -- Arrow batches must be bounded by
bytes, not rows), and every decode is mapInPandas so one Python worker
handles a whole Arrow batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, "
    "duration_ms long, source string"
)

FEATURE_SCHEMA = "media_id long, mime string, n_bytes long, features array<float>"

Decoder = Callable[[bytes, str], list[float]]


def deterministic_fake_decoder(payload: bytes, mime: str) -> list[float]:
    """Stand-in for a real codec: 8 deterministic float features derived
    from the byte content (so tests assert exact values). Replace with a
    real image/audio decode when the libraries exist."""
    if payload is None:
        return [0.0] * 8
    n = len(payload)
    head = payload[:8].ljust(8, b"\0")
    return [float(n)] + [float(b) for b in head[:7]]


def real_decoder(payload: bytes, mime: str) -> list[float]:
    """The production decode hook. Container has no PIL/ffmpeg -> explicit
    NotImplementedError rather than a silent fake."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "environment; inject deterministic_fake_decoder or a real codec")


def attach_media_features(media: DataFrame,
                          decoder: Decoder = deterministic_fake_decoder,
                          target_bytes_per_partition: int = 256 << 20,
                          approx_row_bytes: int | None = None) -> DataFrame:
    """binary payload -> feature vector via mapInPandas.

    Repartitions by a byte budget first when ``approx_row_bytes`` is given
    -- with multi-MB payloads the default row-count-oriented partitioning
    makes Arrow batches blow past executor memory."""
    if approx_row_bytes:
        n_rows = media.count()
        parts = max(1, (n_rows * approx_row_bytes) // target_bytes_per_partition)
        media = media.repartition(int(parts))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                decoder(p, m) for p, m in zip(b["payload"], b["mime"])
            ]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "mime": b["mime"],
                "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                "features": feats,
            })

    return media.mapInPandas(decode_batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decoder: Decoder = deterministic_fake_decoder) -> DataFrame:
    """Frame-sampling shape for video payloads: one output row per sampled
    timestamp. The codec is stubbed; the explode/fan-out plumbing is real."""
    with_frames = media.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1,
                           F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )

    def decode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decoder(p, m) for p, m in zip(b["payload"], b["mime"])]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "frame_ts_ms": b["frame_ts_ms"],
                "features": feats,
            })

    return with_frames.select("media_id", "frame_ts_ms", "payload", "mime") \
        .mapInPandas(decode_frames,
                     "media_id long, frame_ts_ms long, features array<float>")
