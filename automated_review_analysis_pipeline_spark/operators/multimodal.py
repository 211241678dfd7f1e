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


def decode_image(payload: bytes):
    """Dependency-free pixel decode for the two classic uncompressed
    raster formats -> (H, W, 3) uint8 numpy array:

    - binary PPM (P6, maxval <= 255; header comments/whitespace per the
      netpbm spec)
    - uncompressed 24-bit BI_RGB Windows BMP (BITMAPINFOHEADER,
      bottom-up or top-down, 4-byte row padding, BGR -> RGB)

    Anything else (all genuinely-compressed formats: JPEG/PNG/WebP/...)
    raises NotImplementedError -- those need real codec libraries this
    container does not ship."""
    import numpy as np

    if payload is None or len(payload) < 2:
        raise NotImplementedError("empty or truncated payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "only uncompressed PPM (P6) and 24-bit BI_RGB BMP decode here; "
        "compressed formats require codec libraries not present in this "
        "environment -- inject deterministic_fake_decoder or a real codec")


def _decode_ppm(payload: bytes):
    import numpy as np

    # netpbm header: 'P6', width, height, maxval -- tokens separated by
    # whitespace, '#' comments to end-of-line, then EXACTLY ONE
    # whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise NotImplementedError("truncated PPM header")
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) \
                    and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raster = payload[pos:pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise NotImplementedError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    import struct

    import numpy as np

    if len(payload) < 54:
        raise NotImplementedError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only uncompressed 24-bit BI_RGB BMP supported")
    h, bottom_up = abs(h_raw), h_raw > 0
    stride = ((w * 3 + 3) // 4) * 4
    raster = payload[data_off:data_off + stride * h]
    if len(raster) != stride * h:
        raise NotImplementedError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    return img[::-1] if bottom_up else img


def encode_ppm(img) -> bytes:
    """(H, W, 3) uint8 -> canonical binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def resize_image_nearest(img, new_w: int, new_h: int):
    """Deterministic nearest-neighbor resample (floor index mapping:
    src_i = (dst_i * src_len) // dst_len) -- exact, library-free, and
    cheap enough to stay vectorized inside the Arrow batch."""
    import numpy as np

    h, w = img.shape[:2]
    rows = (np.arange(new_h) * h) // new_h
    cols = (np.arange(new_w) * w) // new_w
    return img[rows][:, cols]


def real_decoder(payload: bytes, mime: str) -> list[float]:
    """The production decode hook, REAL for uncompressed raster formats:
    PPM (P6) and 24-bit BMP payloads decode to pixels via
    :func:`decode_image` and yield 8 deterministic pixel-statistics
    features (width, height, mean R/G/B, global mean/min/max).
    Compressed formats still raise NotImplementedError -- their codecs
    are not in this container."""
    img = decode_image(payload)
    f = img.astype("float64")
    return [
        float(img.shape[1]), float(img.shape[0]),
        float(f[:, :, 0].mean()), float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(f.mean()), float(f.min()), float(f.max()),
    ]


def real_encoder(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Real thumbnail re-encode for uncompressed raster payloads:
    decode (PPM/BMP) -> nearest-neighbor resize -> canonical P6 PPM
    bytes, exact pixels. Compressed formats raise NotImplementedError."""
    return encode_ppm(resize_image_nearest(decode_image(payload),
                                           new_w, new_h))


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

    def safe_decode(p, m):
        # per-row tolerance: one NULL / truncated / compressed payload
        # (real_decoder raises NotImplementedError on JPEG/PNG, ValueError
        # on corrupt headers) must null ITS features, not fail the whole
        # corpus-scale job
        try:
            return decoder(p, m)
        except Exception:
            return None

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                safe_decode(p, m) for p, m in zip(b["payload"], b["mime"])
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

    def safe_encode(p, w, h):
        # same per-row tolerance as attach_media_features: an
        # undecodable/compressed payload nulls its thumbnail only
        try:
            return encoder(p, w, h)
        except Exception:
            return None

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [
                safe_encode(p, w, h)
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
