"""Codec throughput table for PERF.md: single-threaded decode of the
round-7 reference shapes (512x512 RGB; JPEG q8 smooth/noise). The scale
path is Arrow-batch parallelism across payloads; this table tracks the
per-payload Python cost the parallelism multiplies.

Usage: python tools/codec_bench.py
"""
from __future__ import annotations

import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402,E501
    _decode_jpeg,
    _decode_png,
    decode_image,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_ppm,
)


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png_filtered(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter img with the given per-row filter cycle and wrap
    as a PNG (spec-side golden writer, same as the pytest helper)."""
    h, w = img.shape[:2]
    bpp = 3
    flat = img.reshape(h, w * bpp).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        a = np.zeros(w * bpp, np.int32)
        a[bpp:] = line[:-bpp]
        c = np.zeros(w * bpp, np.int32)
        c[bpp:] = prev[:-bpp]
        if f == 0:
            pred = np.zeros(w * bpp, np.int32)
        elif f == 1:
            pred = a
        elif f == 2:
            pred = prev
        elif f == 3:
            pred = (a + prev) // 2
        else:
            pa = np.abs(prev - c)
            pb = np.abs(a - c)
            pc = np.abs(a + prev - 2 * c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
        raw.append(f)
        raw.extend(((line - pred) & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return b"".join([b"\x89PNG\r\n\x1a\n", _png_chunk(b"IHDR", ihdr),
                     _png_chunk(b"IDAT", zlib.compress(bytes(raw))),
                     _png_chunk(b"IEND", b"")])


def _t(fn, *args, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (512, 512, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:512, 0:512]
    smooth = np.stack([(yy // 4) % 256, (xx // 4) % 256,
                       ((yy + xx) // 8) % 256], axis=2).astype(np.uint8)

    rows = []
    ppm = encode_ppm(noise)
    rows.append(("PPM (P6)", len(ppm), _t(decode_image, ppm)))
    p0 = encode_png(noise)
    rows.append(("PNG filter-0", len(p0), _t(_decode_png, p0)))
    p1 = _png_filtered(smooth, [1])
    rows.append(("PNG filter-1 (Sub)", len(p1), _t(_decode_png, p1)))
    p134 = _png_filtered(smooth, [1, 3, 4])
    rows.append(("PNG filters 1/3/4", len(p134), _t(_decode_png, p134)))
    p4 = _png_filtered(noise, [4])
    rows.append(("PNG filter-4 noise", len(p4), _t(_decode_png, p4)))
    js = encode_jpeg(smooth, quant=8)
    rows.append(("JPEG q8 smooth", len(js), _t(_decode_jpeg, js)))
    jn = encode_jpeg(noise, quant=8)
    rows.append(("JPEG q8 noise (worst case)", len(jn), _t(_decode_jpeg, jn)))
    jps = encode_jpeg_progressive(smooth, quant=8)
    rows.append(("progressive JPEG q8 smooth", len(jps),
                 _t(_decode_jpeg, jps)))
    jpn = encode_jpeg_progressive(noise, quant=8)
    rows.append(("progressive JPEG q8 noise", len(jpn),
                 _t(_decode_jpeg, jpn)))
    assert np.array_equal(_decode_jpeg(jpn), _decode_jpeg(jn))

    # correctness spot-check rides along: filters must stay pixel-exact
    assert np.array_equal(_decode_png(p134), smooth)
    assert np.array_equal(_decode_png(p4), noise)

    print("| codec | payload | decode |")
    print("|---|---|---|")
    for name, size, sec in rows:
        ps = (f"{size // 1024} KiB" if size >= 1024 else f"{size} B")
        ds = f"{sec * 1000:.1f} ms" if sec < 1 else f"{sec:.2f} s"
        print(f"| {name} | {ps} | {ds} |")


if __name__ == "__main__":
    main()
