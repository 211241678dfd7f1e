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

from automated_review_analysis_pipeline_spark.plan_cache import plan_cache

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


Encoder = Callable[[bytes, int, int], bytes]


def deterministic_fake_encoder(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Stand-in for a real thumbnail re-encode: a deterministic byte-count
    function of the target dims (prefix of the source payload, floor of
    pixels/64, min 1 byte) so tests and the oracle can assert exact output
    sizes. Replace with PIL/libvips when the codecs exist."""
    if payload is None:
        return b""
    return payload[:max(1, (new_w * new_h) // 64)]


def resize_media(media: DataFrame, max_w: int = 224, max_h: int = 224,
                 encoder: Encoder = deterministic_fake_encoder) -> DataFrame:
    """Aspect-preserving thumbnail resize: the dimension math (scale =
    min(max_w/w, max_h/h, 1), floor, never upscale, min 1px) is pure JVM
    column arithmetic -- only the per-payload re-encode crosses into
    Python, as a mapInPandas batch call. At 100 TB the dims projection
    prunes to metadata columns for planning while payload bytes stream
    through the encode stage once."""
    s = F.least(
        F.lit(float(max_w)) / F.col("width").cast("double"),
        F.lit(float(max_h)) / F.col("height").cast("double"),
        F.lit(1.0),
    )
    sized = media.withColumn(
        "new_width",
        F.greatest(F.floor(F.col("width") * s), F.lit(1)).cast("int"),
    ).withColumn(
        "new_height",
        F.greatest(F.floor(F.col("height") * s), F.lit(1)).cast("int"),
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [
                encoder(p, w, h)
                for p, w, h in zip(b["payload"], b["new_width"],
                                   b["new_height"])
            ]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "mime": b["mime"],
                "width": b["width"],
                "height": b["height"],
                "new_width": b["new_width"],
                "new_height": b["new_height"],
                "payload": out,
            })

    cols = ("media_id", "mime", "width", "height", "new_width",
            "new_height", "payload")
    return sized.select(*cols).mapInPandas(
        encode_batches,
        "media_id long, mime string, width int, height int, "
        "new_width int, new_height int, payload binary")


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


def media_ahash(media: DataFrame, grid: int = 64) -> DataFrame:
    """64-bit average-hash (aHash) per media payload: the byte stream is
    resampled into ``grid`` equal buckets, bit_i = (bucket mean >= global
    mean). On a real image decode the buckets are the 8x8 downsampled
    grayscale pixels -- the classic perceptual hash; on the byte stream it
    is the same algorithm over the 1-D signal, deterministic and robust
    to small local edits (one changed byte flips at most one bucket bit).

    numpy does the whole Arrow batch: one reduceat per payload -- no
    per-byte Python. Returns (media_id, mime, n_bytes, ahash long)."""
    import numpy as np

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for p in b["payload"]:
                if p is None or len(p) == 0:
                    out.append(0)
                    continue
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                idx = (np.arange(grid) * len(arr)) // grid
                sums = np.add.reduceat(arr, idx)
                counts = np.diff(np.append(idx, len(arr)))
                means = sums / np.maximum(counts, 1)
                bits = means >= arr.mean()
                val = np.uint64(0)
                for i in range(grid):
                    if bits[i]:
                        val |= np.uint64(1) << np.uint64(i)
                out.append(int(val.astype(np.int64)))
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "mime": b["mime"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in b["payload"]],
                "ahash": pd.Series(out, dtype="int64"),
            })

    return media.select("media_id", "mime", "payload").mapInPandas(
        hash_batches, "media_id long, mime string, n_bytes long, ahash long")


def media_near_dup_pairs(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Perceptual near-duplicate media pairs: aHash signatures + the
    shared 16-bit chunk-blocking / popcount-verify join (same machinery
    as SimHash text dedup -- dedup.hamming_block_pairs). The image-dedup
    stage of a multimodal training pipeline: re-encodes and minor edits
    keep small hamming distance while distinct media do not."""
    from automated_review_analysis_pipeline_spark.operators.dedup import (
        hamming_block_pairs,
    )

    d = plan_cache(media_ahash(media).select("media_id", "ahash"))
    return hamming_block_pairs(d, "media_id", "ahash", max_hamming)
