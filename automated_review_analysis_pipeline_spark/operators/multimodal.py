"""Multimodal column plumbing (SURVEY.md §2B).

Images/audio/video are opaque `binary` columns with a typed metadata
struct. The Spark-side plumbing -- schema, partition sizing, mapInPandas
batch shape, UDF signatures -- is real and tested. Codecs are injected
``decoder`` callables; the built-in :func:`real_decoder` genuinely
decodes PPM (P6), uncompressed 24/32-bit BMP, PNG incl. 16-bit and
Adam7-interlaced (DEFLATE via the stdlib zlib), GIF (LZW is pure
dictionary logic), baseline JPEG (Huffman + IDCT in numpy), lossless
WebP (VP8L, all four transforms; webp.py), baseline TIFF
(uncompressed/LZW/PackBits/new-style-JPEG, strips or tiles, both
endians), and RIFF/WAVE audio (integer/float PCM, G.711 a-law/mu-law,
MS/IMA ADPCM). Formats needing codec libraries this container lacks
(lossy-VP8 WebP, old-style TIFF JPEG, AVIF, mp3-in-WAV) raise
NotImplementedError; a
deterministic fake decoder remains the SQL-expressible oracle path.

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
    """Stand-in decoder: 8 deterministic float features derived from
    the byte content (so tests and the DuckDB oracles assert exact
    values -- this is the SQL-expressible path). :func:`real_decoder`
    is the genuine-decode hook."""
    if payload is None:
        return [0.0] * 8
    n = len(payload)
    head = payload[:8].ljust(8, b"\0")
    return [float(n)] + [float(b) for b in head[:7]]


def decode_image(payload: bytes):
    """Dependency-free pixel decode -> (H, W, 3) uint8 numpy array:

    - binary PPM (P6, maxval <= 255; header comments/whitespace per the
      netpbm spec)
    - uncompressed 24/32-bit Windows BMP (BI_RGB or standard-mask
      BI_BITFIELDS; bottom-up or top-down, 4-byte row padding,
      BGR(A) -> RGB)
    - PNG (8/16-bit gray/RGB/palette/alpha, non-interlaced or Adam7
      interlaced) -- PNG's compression is DEFLATE + scanline filters,
      and zlib ships with CPython, so no external codec is needed
      (:func:`_decode_png`)
    - GIF 87a/89a first frame -- LZW is pure dictionary logic
      (:func:`_decode_gif`), including 4-pass interlacing

    - baseline sequential AND progressive JPEG -- Huffman entropy
      decode is pure dictionary logic and the 8x8 IDCT is two numpy
      matrix multiplies (:func:`_decode_jpeg`); arithmetic coding raises
    - lossless WebP (VP8L) -- full entropy layer (prefix codes, LZ77,
      color cache, meta groups) + all four transforms (subtract-green,
      palette, predictor, cross-color; operators/webp.py); lossy VP8
      raises
    - baseline TIFF (8-bit gray/RGB/RGBA, both byte orders, strip or
      tile layout, uncompressed/LZW/PackBits/new-style-JPEG;
      :func:`_decode_tiff`)

    Anything else (AVIF/HEIC/...) raises NotImplementedError -- those
    need codec libraries this container does not ship."""
    import numpy as np

    if payload is None or len(payload) < 2:
        raise NotImplementedError("empty or truncated payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from automated_review_analysis_pipeline_spark.operators.webp import (
            decode_webp_lossless,
        )

        return decode_webp_lossless(payload)
    raise NotImplementedError(
        "only PPM (P6), 24/32-bit BMP, PNG, GIF, baseline JPEG, "
        "lossless WebP, and baseline TIFF decode here; other formats "
        "require "
        "codec libraries not present in this environment -- inject "
        "deterministic_fake_decoder or a real codec")


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
            try:
                fields.append(int(payload[start:pos]))
            except ValueError as exc:
                raise NotImplementedError(
                    f"malformed PPM header token: {exc}") from exc
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
    # 24-bit BI_RGB, 32-bit BI_RGB (BGRX), and 32-bit BI_BITFIELDS with
    # the standard BGRA masks all decode; anything else (RLE, 16-bit
    # masks, palettes) raises
    if compression == 3 and bpp == 32 and len(payload) >= 66:
        masks = struct.unpack_from("<III", payload, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError("non-standard BMP bitfield masks")
    elif compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BI_RGB(/standard BI_BITFIELDS) "
            "BMP supported")
    h, bottom_up = abs(h_raw), h_raw > 0
    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4
    raster = payload[data_off:data_off + stride * h]
    if len(raster) != stride * h:
        raise NotImplementedError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)
    img = px[:, :, 2::-1]  # BGR(X/A) -> RGB, alpha/pad byte dropped
    return img[::-1] if bottom_up else img


def _decode_png(payload: bytes):
    """Dependency-free PNG decode -> (H, W, 3) uint8. PNG's
    "compression" is DEFLATE plus per-scanline byte filters, and zlib
    ships with CPython -- no codec library needed. Supports 8- and
    16-bit depth (16-bit samples reduce to their high byte for the
    8-bit pixel output), color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), and BOTH non-interlaced and
    Adam7-interlaced streams (seven independently-filtered
    sub-images) and 1/2/4-bit gray/palette sub-byte depths. Written
    against the public W3C PNG spec / RFC 2083. Alpha is dropped
    (features/thumbnails want opaque RGB); gray replicates across
    channels; palette indices look up PLTE.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG signature")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise NotImplementedError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise NotImplementedError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or comp != 0 or filt != 0 \
            or depth not in (1, 2, 4, 8, 16) \
            or (depth < 8 and ctype not in (0, 3)):
        raise NotImplementedError(
            "only 1/2/4-bit gray+palette or 8/16-bit color types "
            "0/2/3/4/6 PNG supported")
    if depth == 16 and ctype == 3:
        raise NotImplementedError("16-bit palette PNG is not legal")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise NotImplementedError(f"corrupt PNG stream: {exc}") from exc
    if h == 0 or w == 0:
        raise NotImplementedError("empty PNG raster")
    # filter unit: bytes per complete pixel, ROUNDED UP TO ONE (spec) --
    # sub-byte depths filter on whole packed bytes with bpp = 1
    bpp = max(1, channels * depth // 8)

    def _row_stride(width_px: int) -> int:
        return (width_px * channels * depth + 7) // 8

    def unfilter(buf: bytes, height: int, width_px: int) -> np.ndarray:
        # spec filters 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth.
        # None/Up are fully vectorized (uint8 wraps mod 256); Sub is a
        # per-byte-lane cumulative sum (also fully vectorized: the
        # recurrence cur[x] = line[x] + cur[x-bpp] telescopes to a
        # mod-256 prefix sum along each of the bpp lanes); Average and
        # Paeth are genuinely sequential in the left neighbor, so they
        # run as plain-Python list loops -- int arithmetic on lists is
        # ~5-10x faster than the numpy-scalar-indexing walk it replaces
        # (measured in tools/codec_bench.py; per-element numpy indexing
        # pays ~1us of boxing per access).
        stride = _row_stride(width_px)
        if len(buf) != (stride + 1) * height:
            raise NotImplementedError("PNG raster size mismatch")
        out = np.empty((height, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(height):
            f = buf[y * (stride + 1)]
            line = np.frombuffer(buf, np.uint8, stride,
                                 y * (stride + 1) + 1)
            if f == 0:
                cur = line.copy()
            elif f == 2:
                cur = line + prev
            elif f == 1:
                lanes = line.reshape(-1, bpp).astype(np.uint32)
                cur = np.cumsum(lanes, axis=0, dtype=np.uint32) \
                    .astype(np.uint8).reshape(-1)
            elif f == 3:
                c = line.tolist()
                p = prev.tolist()
                for x in range(bpp):
                    c[x] = (c[x] + (p[x] >> 1)) & 0xFF
                for x in range(bpp, stride):
                    c[x] = (c[x] + ((c[x - bpp] + p[x]) >> 1)) & 0xFF
                cur = np.array(c, dtype=np.uint8)
            elif f == 4:
                c = line.tolist()
                p = prev.tolist()
                for x in range(bpp):
                    # a = c = 0: predictor reduces to b
                    c[x] = (c[x] + p[x]) & 0xFF
                for x in range(bpp, stride):
                    a = c[x - bpp]
                    b = p[x]
                    cc = p[x - bpp]
                    pa = b - cc
                    if pa < 0:
                        pa = -pa
                    pb = a - cc
                    if pb < 0:
                        pb = -pb
                    pc = a + b - cc - cc
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = cc
                    c[x] = (c[x] + pred) & 0xFF
                cur = np.array(c, dtype=np.uint8)
            else:
                raise NotImplementedError(f"unknown PNG filter {f}")
            out[y] = cur
            prev = cur
        return out

    def to_samples(rows: np.ndarray, height: int,
                   width_px: int) -> np.ndarray:
        # 16-bit samples reduce to their high byte (8-bit output)
        if depth == 16:
            return rows.reshape(height, width_px, channels, 2)[..., 0]
        if depth < 8:
            # unpack MSB-first bit groups, drop row-end padding; gray
            # samples scale to 8-bit (255/(2^d - 1) is exact for
            # d in 1/2/4), palette INDEXES stay raw
            per_byte = 8 // depth
            mask = (1 << depth) - 1
            planes = [((rows >> (8 - depth * (i + 1))) & mask)
                      for i in range(per_byte)]
            vals = np.stack(planes, axis=2).reshape(height, -1)
            vals = vals[:, :width_px]
            if ctype == 0:
                vals = vals * (255 // mask)
            return vals.reshape(height, width_px, 1).astype(np.uint8)
        return rows.reshape(height, width_px, channels)

    if interlace == 0:
        px = to_samples(unfilter(raw, h, w), h, w)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, channels), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            chunk = (_row_stride(pw) + 1) * ph
            sub = unfilter(raw[offset:offset + chunk], ph, pw)
            offset += chunk
            px[y0::dy, x0::dx] = to_samples(sub, ph, pw)

    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # ctype 3: palette lookup
    if plte is None or len(plte) % 3:
        raise NotImplementedError("palette PNG without a valid PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max()) >= pal.shape[0]:
        raise NotImplementedError("palette index out of range")
    return pal[idx]


def _packbits(data: bytes, expected: int) -> bytes:
    """PackBits RLE decode (TIFF compression 32773; Apple PackBits)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                      # copy n+1 literal bytes
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                    # repeat next byte 257-n times
            if i >= len(data):
                break
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise NotImplementedError("truncated PackBits stream")
    return bytes(out[:expected])


def _tiff_lzw(data: bytes, expected: int) -> bytes:
    """TIFF LZW decode (compression 5, TIFF 6.0 section 13): MSB-first
    codes, 256=ClearCode / 257=EOI, table codes from 258, and the
    spec's EARLY-CHANGE width bump -- the encoder moves to 10/11/12
    bits when it ADDS code 511/1023/2047, so the decoder must widen one
    code earlier than a GIF-style decoder would (here: when the table
    is one short of the width's last usable code, because this loop
    appends the entry for code k while processing code k+1)."""
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    out = bytearray()
    bitpos, total = 0, len(data) * 8
    while bitpos + width <= total and len(out) < expected:
        i = bitpos >> 3
        chunk = int.from_bytes(data[i:i + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:  # clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:  # end of information
            break
        if prev is None:
            if code > 255:
                raise NotImplementedError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise NotImplementedError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise NotImplementedError("truncated TIFF LZW stream")
    return bytes(out[:expected])


def _decode_tiff(payload: bytes):
    """Dependency-free baseline TIFF decode -> (H, W, 3) uint8, written
    against the public TIFF 6.0 specification: both byte orders (II/MM),
    IFD walking with inline-or-offset values, strip OR tile assembly
    (section 15: edge-padded tiles, per-tile predictor reset), 8-bit
    gray/RGB/RGBA in chunky OR planar (284=2, strip layouts)
    configuration, compression 1 (none), 5
    (LZW, incl. the horizontal-differencing predictor tag), 7
    (new-style JPEG-in-TIFF, per-segment streams spliced with the
    shared JPEGTables tag, decoded by this module's own T.81 codec) or
    32773 (PackBits). Old-style JPEG (compression 6), planar JPEG or
    tiles, and non-8-bit depths raise NotImplementedError."""
    import struct

    import numpy as np

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise NotImplementedError("not a TIFF payload")
    if len(payload) < 8:
        raise NotImplementedError("truncated TIFF header")
    ifd_off = struct.unpack_from(e + "I", payload, 4)[0]
    if ifd_off + 2 > len(payload):
        raise NotImplementedError("truncated TIFF IFD")
    n = struct.unpack_from(e + "H", payload, ifd_off)[0]
    type_size = {1: 1, 3: 2, 4: 4, 7: 1}  # 7 = UNDEFINED (JPEGTables)
    type_fmt = {1: "B", 3: "H", 4: "I", 7: "B"}
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(payload):
            raise NotImplementedError("truncated TIFF IFD entry")
        tag, typ = struct.unpack_from(e + "HH", payload, base)
        count = struct.unpack_from(e + "I", payload, base + 4)[0]
        if typ not in type_size:
            continue  # RATIONAL/ASCII etc. -- not needed
        total = type_size[typ] * count
        if total <= 4:
            src = base + 8
        else:
            src = struct.unpack_from(e + "I", payload, base + 8)[0]
        if src + total > len(payload) or count > 1 << 20:
            raise NotImplementedError("truncated TIFF tag data")
        tags[tag] = list(struct.unpack_from(
            e + type_fmt[typ] * count, payload, src))

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise NotImplementedError(f"TIFF missing tag {tag}")
        return default

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    compression = one(259, 1)
    planar = one(284, 1)
    if any(b != 8 for b in bits) or planar not in (1, 2) or w == 0 \
            or h == 0:
        raise NotImplementedError(
            "only 8-bit chunky or planar TIFF supported")
    if planar == 2 and (compression == 7 or 322 in tags):
        # planar JPEG-in-TIFF and planar tiles don't occur in practice
        # (TIFF-EP mandates chunky; tiled planar writers are unheard
        # of) -- honest raise rather than untested paths
        raise NotImplementedError(
            "planar TIFF supported for non-JPEG strip layouts only")
    predictor = one(317, 1)
    if compression not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            "only uncompressed, LZW, Deflate, new-style JPEG, or "
            "PackBits TIFF supported")
    if predictor not in (1, 2) or (compression == 7 and predictor != 1):
        raise NotImplementedError("unsupported TIFF predictor")
    if compression == 7 and one(262) not in (1, 6):
        # _decode_jpeg unconditionally converts 3-component streams
        # YCbCr->RGB; an RGB-photometric TIFF-EP file (262=2) would
        # decode to silently color-shifted pixels, so honor the
        # decode-correctly-or-raise contract instead
        raise NotImplementedError(
            "JPEG-in-TIFF supports only YCbCr or grayscale photometric")
    # new-style JPEG-in-TIFF (compression 7, TIFF-EP): each strip/tile
    # is a self-contained JPEG stream, optionally sharing quant/huffman
    # tables through the JPEGTables tag (347: SOI + table segments +
    # EOI) -- splice those ahead of the segment stream per the spec
    jpeg_tables = b""
    if compression == 7 and 347 in tags:
        jt = bytes(tags[347])
        if len(jt) < 4 or jt[:2] != b"\xff\xd8" or jt[-2:] != b"\xff\xd9":
            raise NotImplementedError("malformed TIFF JPEGTables")
        jpeg_tables = jt[2:-2]

    def _jpeg_segment(off: int, cnt: int):
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise NotImplementedError("truncated TIFF segment")
        if seg[:2] != b"\xff\xd8":
            raise NotImplementedError("TIFF JPEG segment missing SOI")
        return _decode_jpeg(b"\xff\xd8" + jpeg_tables + bytes(seg[2:]))

    def _segment(off: int, cnt: int, expected: int) -> bytes:
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise NotImplementedError("truncated TIFF segment")
        if compression == 32773:
            return _packbits(seg, expected)
        if compression == 5:
            return _tiff_lzw(seg, expected)
        if compression in (8, 32946):
            # Deflate (Adobe 8 / old 32946): zlib stream per segment
            import zlib

            try:
                out = zlib.decompress(bytes(seg))
            except zlib.error as e:
                raise NotImplementedError(
                    f"corrupt TIFF deflate segment: {e}") from None
            if len(out) < expected:
                raise NotImplementedError("short TIFF deflate segment")
            return out[:expected]
        if len(seg) < expected:
            raise NotImplementedError("short TIFF segment")
        return bytes(seg[:expected])

    if 322 in tags:
        # tiled layout (TIFF 6.0 section 15): fixed tw x th tiles, each
        # compressed independently and PADDED at the right/bottom edges;
        # the predictor resets per tile row, so undo it per tile before
        # pasting the clipped region
        tw, th = one(322), one(323)
        t_offsets = tags.get(324)
        t_counts = tags.get(325)
        if tw == 0 or th == 0 or not t_offsets or not t_counts \
                or len(t_offsets) != len(t_counts):
            raise NotImplementedError("TIFF missing tile tables")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(t_offsets) != across * down:
            raise NotImplementedError("TIFF tile count mismatch")
        out_c = 3 if compression == 7 else spp
        px = np.zeros((h, w, out_c), dtype=np.uint8)
        for idx, (off, cnt) in enumerate(zip(t_offsets, t_counts)):
            if compression == 7:
                tile = _jpeg_segment(off, cnt)
                if tile.shape[0] < min(th, h - (idx // across) * th) \
                        or tile.shape[1] < min(tw, w - (idx % across) * tw):
                    raise NotImplementedError("short TIFF JPEG tile")
                tile = tile[:th, :tw]
            else:
                tile = np.frombuffer(
                    _segment(off, cnt, th * tw * spp), dtype=np.uint8
                ).reshape(th, tw, spp)
                if predictor == 2:
                    tile = np.cumsum(tile.astype(np.uint32), axis=1,
                                     dtype=np.uint32).astype(np.uint8)
            r0 = (idx // across) * th
            c0 = (idx % across) * tw
            px[r0:r0 + th, c0:c0 + tw] = \
                tile[:h - r0, :w - c0]
        if compression == 7:
            return px
        if spp == 1:
            return np.repeat(px, 3, axis=2)
        if spp >= 3:
            return px[:, :, :3].copy()
        raise NotImplementedError("unsupported TIFF samples per pixel")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise NotImplementedError("TIFF missing strip tables")
    rows_per_strip = one(278, h)
    if planar == 2:
        # planar configuration (TIFF 6.0 tag 284=2): the strip tables
        # hold strips_per_plane entries PER COMPONENT, all of plane 0
        # first; each strip carries rows x w bytes of one component.
        # The horizontal predictor applies within each plane's rows.
        spp_strips = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) != spp_strips * spp:
            raise NotImplementedError("TIFF planar strip count mismatch")
        planes = []
        for p in range(spp):
            raster = bytearray()
            rows_done = 0
            for i in range(spp_strips):
                off = offsets[p * spp_strips + i]
                cnt = counts[p * spp_strips + i]
                rows = min(rows_per_strip, h - rows_done)
                raster += _segment(off, cnt, rows * w)
                rows_done += rows
            if len(raster) != h * w:
                raise NotImplementedError("TIFF planar raster mismatch")
            plane = np.frombuffer(bytes(raster),
                                  dtype=np.uint8).reshape(h, w)
            if predictor == 2:
                plane = np.cumsum(plane.astype(np.uint32), axis=1,
                                  dtype=np.uint32).astype(np.uint8)
            planes.append(plane)
        px = np.stack(planes, axis=2)
        if spp == 1:
            return np.repeat(px, 3, axis=2)
        if spp >= 3:
            return px[:, :, :3].copy()
        raise NotImplementedError("unsupported TIFF samples per pixel")
    if compression == 7:
        parts = []
        rows_done = 0
        for off, cnt in zip(offsets, counts):
            rows = min(rows_per_strip, h - rows_done)
            strip = _jpeg_segment(off, cnt)
            if strip.shape[0] < rows or strip.shape[1] < w:
                raise NotImplementedError("short TIFF JPEG strip")
            parts.append(strip[:rows, :w])
            rows_done += rows
        if rows_done != h:
            raise NotImplementedError("TIFF raster size mismatch")
        return np.vstack(parts)
    raster = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, h - rows_done)
        raster += _segment(off, cnt, rows * w * spp)
        rows_done += rows
    if len(raster) != h * w * spp:
        raise NotImplementedError("TIFF raster size mismatch")
    px = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: undo with a per-channel row cumsum
        # (mod 256), the same telescoped recurrence as PNG's Sub filter
        px = np.cumsum(px.astype(np.uint32), axis=1,
                       dtype=np.uint32).astype(np.uint8)
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    if spp >= 3:
        return px[:, :, :3].copy()
    raise NotImplementedError("unsupported TIFF samples per pixel")


# JPEG (ITU-T T.81 baseline sequential DCT) -- decoded with numpy +
# stdlib only: Huffman entropy coding is dictionary logic, the 8x8 IDCT
# is two matrix multiplies. Natural-order index of the i-th coefficient
# in zigzag scan order, per spec Figure A.6:
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_dct_matrix():
    """Orthonormal 8x8 DCT-II matrix C: forward F = C X C^T, inverse
    X = C^T F C."""
    import numpy as np

    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8)
    c[0, :] = np.sqrt(1.0 / 8)
    return c


def _jpeg_huff_decode_table(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman per T.81 Annex C: (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_jpeg(payload: bytes):
    """Dependency-free BASELINE JPEG decode -> (H, W, 3) uint8, written
    against the public ITU-T T.81 spec: marker segments, DQT/DHT tables
    carried in-stream, interleaved MCU scan with byte stuffing and
    restart markers, integer-ratio chroma subsampling (4:4:4 / 4:2:2 /
    4:2:0), DC prediction, zigzag dequantization, orthonormal IDCT,
    JFIF YCbCr -> RGB. PROGRESSIVE (SOF2) decodes too: spectral
    selection + successive approximation per T.81 Annex G, multi-scan
    coefficient accumulation with EOB runs and AC refinement
    correction bits. Arithmetic coding, 12-bit precision, and
    hierarchical modes raise NotImplementedError.

    Throughput note: the entropy decode is a per-symbol Python loop --
    correct and bounded, but the scale path is Arrow-batch parallelism
    across payloads (one mapInPandas worker per batch), not per-pixel
    speed within one image."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coef_store = None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128],
                                         dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64],
                                         dtype=np.uint8).astype(np.float64)
                    i += 64
                if vals.size != 64:
                    raise NotImplementedError("truncated JPEG DQT")
                qt[tq] = vals  # zigzag order
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = seg[i + 17:i + 17 + n]
                if len(vals) != n:
                    raise NotImplementedError("truncated JPEG DHT")
                huff[(tc, th)] = _jpeg_huff_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append([cid, hv >> 4, hv & 15, tq])
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/1) or progressive (SOF2) "
                "JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS -- entropy-coded data follows
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            scan_order = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
                scan_order.append(cid)
            if not progressive:
                return _jpeg_decode_scan(payload, pos + 2 + ln, frame,
                                         sel, qt, huff,
                                         restart_interval)
            band = (seg[1 + 2 * ns], seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15)
            if coef_store is None:
                H_, W_, cs = frame
                hmax = max(c[1] for c in cs)
                vmax = max(c[2] for c in cs)
                mx = (W_ + 8 * hmax - 1) // (8 * hmax)
                my = (H_ + 8 * vmax - 1) // (8 * vmax)
                coef_store = {
                    c[0]: [[[0] * 64 for _ in range(mx * c[1])]
                           for _ in range(my * c[2])]
                    for c in cs
                }
            pos = _jpeg_progressive_scan(
                payload, pos + 2 + ln, frame, scan_order, sel, band,
                huff, coef_store, restart_interval)
            continue
        # APPn/COM/other: skip
        pos += 2 + ln
    if progressive and coef_store is not None:
        return _jpeg_reconstruct(frame, coef_store, qt)
    raise NotImplementedError("JPEG contains no scan data")


def _jpeg_decode_scan(buf: bytes, start: int, frame, sel, qt, huff,
                      restart_interval: int):
    import numpy as np

    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    pred = {c[0]: 0 for c in comps}
    C = _jpeg_dct_matrix()
    zig = np.array(_JPEG_ZIGZAG)
    # per-component coefficient accumulators: dequant + zigzag + IDCT
    # run BATCHED over all blocks after the entropy decode (one
    # broadcast matmul per component instead of two 8x8 matmuls plus
    # three small-array constructions per block)
    blk_coefs = {c[0]: [] for c in comps}
    blk_q = {}

    # Bit reservoir + byte-wise Huffman fast tables: bits accumulate a
    # byte at a time into a small int (stuffed 0x00s stripped at load),
    # and each Huffman decode peeks 8 bits into a 256-entry LUT that
    # resolves every code of length <= 8 in one lookup (codes 9..16
    # fall back to the per-bit walk). Replaces the per-BIT Python loop
    # (~10x, measured in tools/codec_bench.py); values are bit-exact.
    idx, resv, nres = start, 0, 0
    nbuf = len(buf)
    stopped_at_marker = False

    def soft_fill(need: int) -> None:
        # load whole bytes until `need` bits are available; stop (do
        # not raise) at a marker or end of buffer
        nonlocal idx, resv, nres, stopped_at_marker
        while nres < need and idx < nbuf:
            b = buf[idx]
            if b == 0xFF:
                if idx + 1 < nbuf and buf[idx + 1] == 0x00:
                    idx += 2  # stuffed 0x00
                else:
                    stopped_at_marker = True
                    return
            else:
                idx += 1
            resv = (resv << 8) | b
            nres += 8

    def read_bits(n: int) -> int:
        nonlocal resv, nres
        if n == 0:
            return 0
        if nres < n:
            soft_fill(n)
            if nres < n:
                raise NotImplementedError(
                    "unexpected marker inside JPEG scan"
                    if stopped_at_marker else "truncated JPEG scan")
        nres -= n
        v = (resv >> nres) & ((1 << n) - 1)
        resv &= (1 << nres) - 1
        return v

    def huffdecode(table) -> int:
        nonlocal resv, nres
        lut, longc = table
        if nres < 8:
            soft_fill(8)
        if nres >= 8:
            key = (resv >> (nres - 8)) & 0xFF
        elif nres > 0:
            # near end-of-stream: pad the peek with 1s; a LUT hit whose
            # length fits the REAL bits is still exact (padding only
            # influences entries longer than what remains)
            key = ((resv << (8 - nres)) | ((1 << (8 - nres)) - 1)) & 0xFF
        else:
            raise NotImplementedError(
                "unexpected marker inside JPEG scan"
                if stopped_at_marker else "truncated JPEG scan")
        ent = lut[key]
        if ent is not None:
            ln = ent & 0xF
            if ln <= nres:
                nres -= ln
                resv &= (1 << nres) - 1
                return ent >> 4
            raise NotImplementedError(
                "unexpected marker inside JPEG scan"
                if stopped_at_marker else "truncated JPEG scan")
        # long codes (9..16 bits): the first 8 bits are all real here
        code = read_bits(8)
        for length in range(9, 17):
            code = (code << 1) | read_bits(1)
            sym = longc.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid JPEG huffman code")

    def fast_table(table: dict):
        # 256-entry LUT: next-8-bits -> (symbol << 4) | code_length for
        # codes of length <= 8; longer codes keep the (length, code)
        # dict walk
        lut = [None] * 256
        longc = {}
        for (ln, code), sym in table.items():
            if ln <= 8:
                base = code << (8 - ln)
                packed = (sym << 4) | ln
                for i in range(1 << (8 - ln)):
                    lut[base + i] = packed
            else:
                longc[(ln, code)] = sym
        return lut, longc

    def wide_ac_table(table: dict):
        # 65536-entry AC LUT resolving Huffman symbol AND the value's
        # extra bits in ONE lookup whenever code+value fit 16 bits:
        # next-16-bits -> (total_bits, run, extended_value | None).
        # None value = s==0 control symbol (EOB when run 0, ZRL when
        # run 15). Build cost is one pass over the complete code space
        # (sum over symbols of 2^(16-ln-s) slots = 65536).
        lut = [None] * 65536
        for (ln, code), sym in table.items():
            s = sym & 15
            if ln + s > 16:
                continue  # falls back to the 8-bit path
            base = code << (16 - ln)
            if s == 0:
                ent = (ln, sym >> 4, None)
                span = 1 << (16 - ln)
                lut[base:base + span] = [ent] * span
            else:
                tail = 16 - ln - s
                half = 1 << (s - 1)
                span = 1 << tail
                for vbits in range(1 << s):
                    val = float(vbits - (1 << s) + 1
                                if vbits < half else vbits)
                    start = base + (vbits << tail)
                    lut[start:start + span] = \
                        [(ln + s, sym >> 4, val)] * span
        return lut

    fast_tables: dict = {}
    wide_tables: dict = {}

    def extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    def align_restart() -> None:
        nonlocal idx, resv, nres, stopped_at_marker
        # <= 7 padding bits may remain buffered before the marker
        resv, nres = 0, 0
        stopped_at_marker = False
        if (idx + 1 < nbuf and buf[idx] == 0xFF
                and 0xD0 <= buf[idx + 1] <= 0xD7):
            idx += 2
        else:
            raise NotImplementedError("missing JPEG restart marker")

    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                align_restart()
                for k in pred:
                    pred[k] = 0
            for cid, ch, cv, tq in comps:
                if cid not in sel:
                    raise NotImplementedError("JPEG component not in scan")
                dct, act = sel[cid]
                dc_table = huff.get((0, dct))
                ac_table = huff.get((1, act))
                qtab = qt.get(tq)
                if dc_table is None or ac_table is None or qtab is None:
                    raise NotImplementedError("missing JPEG table")
                if (0, dct) not in fast_tables:
                    fast_tables[(0, dct)] = fast_table(dc_table)
                if (1, act) not in fast_tables:
                    fast_tables[(1, act)] = fast_table(ac_table)
                    wide_tables[act] = wide_ac_table(ac_table)
                dc_table = fast_tables[(0, dct)]
                ac_table = fast_tables[(1, act)]
                dc_lut, dc_long = dc_table
                ac16 = wide_tables[act]
                for by in range(cv):
                    for bx in range(ch):
                        # The coefficient stream is decoded with the
                        # refill + LUT sequence INLINED (twice: DC then
                        # the AC loop) -- the helpers above are the
                        # exact same logic but cost a Python call per
                        # symbol, which dominated the profile; rare
                        # paths (long codes, refills past the
                        # reservoir) still delegate to them.
                        # ---- DC ----
                        if nres < 8:
                            # inline refill (deep: fewer refills and the
                            # receive paths below almost never need one)
                            while nres < 25 and idx < nbuf:
                                b = buf[idx]
                                if b == 0xFF:
                                    if idx + 1 < nbuf and \
                                            buf[idx + 1] == 0x00:
                                        idx += 2
                                    else:
                                        stopped_at_marker = True
                                        break
                                else:
                                    idx += 1
                                resv = (resv << 8) | b
                                nres += 8
                        if nres >= 8:
                            key = (resv >> (nres - 8)) & 0xFF
                        elif nres > 0:
                            key = ((resv << (8 - nres))
                                   | ((1 << (8 - nres)) - 1)) & 0xFF
                        else:
                            raise NotImplementedError(
                                "unexpected marker inside JPEG scan"
                                if stopped_at_marker
                                else "truncated JPEG scan")
                        ent = dc_lut[key]
                        if ent is not None and (ent & 0xF) <= nres:
                            nres -= ent & 0xF
                            resv &= (1 << nres) - 1
                            t = ent >> 4
                        else:
                            t = huffdecode(dc_table)
                        if t:
                            if nres >= t:
                                nres -= t
                                v = (resv >> nres) & ((1 << t) - 1)
                                resv &= (1 << nres) - 1
                            else:
                                v = read_bits(t)
                            pred[cid] += (v - (1 << t) + 1
                                          if v < (1 << (t - 1)) else v)
                        coefs = [0.0] * 64
                        coefs[0] = float(pred[cid])
                        k = 1
                        while k < 64:
                            # ---- AC: one 16-bit lookup resolves the
                            # Huffman symbol AND its value bits ----
                            if nres < 16:
                                while nres < 25 and idx < nbuf:
                                    b = buf[idx]
                                    if b == 0xFF:
                                        if idx + 1 < nbuf and \
                                                buf[idx + 1] == 0x00:
                                            idx += 2
                                        else:
                                            stopped_at_marker = True
                                            break
                                    else:
                                        idx += 1
                                    resv = (resv << 8) | b
                                    nres += 8
                            if nres >= 16:
                                ent = ac16[(resv >> (nres - 16)) & 0xFFFF]
                            elif nres > 0:
                                # near stream end: pad peek with 1s; an
                                # entry is trusted only if its real bit
                                # span fits what remains
                                ent = ac16[((resv << (16 - nres))
                                            | ((1 << (16 - nres)) - 1))
                                           & 0xFFFF]
                            else:
                                raise NotImplementedError(
                                    "unexpected marker inside JPEG scan"
                                    if stopped_at_marker
                                    else "truncated JPEG scan")
                            if ent is not None and ent[0] <= nres:
                                nb, r, val = ent
                                nres -= nb
                                resv &= (1 << nres) - 1
                                if val is None:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise NotImplementedError(
                                        "JPEG AC index overflow")
                                coefs[k] = val
                                k += 1
                                continue
                            # slow path: long code / code+value > 16
                            # bits / stream tail
                            rs = huffdecode(ac_table)
                            s = rs & 15
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise NotImplementedError(
                                    "JPEG AC index overflow")
                            v = read_bits(s)
                            coefs[k] = float(v - (1 << s) + 1
                                             if v < (1 << (s - 1)) else v)
                            k += 1
                        blk_coefs[cid].append(coefs)
                        blk_q[cid] = qtab
            nmcu += 1

    planes = {}
    for cid, ch, cv, _ in comps:
        if not blk_coefs[cid]:
            planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8),
                                   dtype=np.float64)
            continue
        arr = np.array(blk_coefs[cid]) * blk_q[cid]   # (n, 64) dequant
        fb = np.zeros_like(arr)
        fb[:, zig] = arr                              # de-zigzag
        sp = C.T @ fb.reshape(-1, 8, 8) @ C + 128.0   # batched IDCT
        # blocks arrive in (my, mx, by, bx) order; one transpose
        # assembles the full plane without a per-block scatter
        planes[cid] = (sp.reshape(mcuy, mcux, cv, ch, 8, 8)
                       .transpose(0, 2, 4, 1, 3, 5)
                       .reshape(mcuy * cv * 8, mcux * ch * 8))

    return _jpeg_assemble(planes, comps, hmax, vmax, H, W)


def _jpeg_assemble(planes: dict, comps, hmax: int, vmax: int,
                   H: int, W: int):
    """Upsample component planes to full resolution, crop, and convert
    JFIF YCbCr -> RGB (shared by the sequential and progressive
    decoders)."""
    import numpy as np

    full = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            if hmax % ch or vmax % cv:
                raise NotImplementedError(
                    "non-integer JPEG sampling ratio")
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        full.append(p[:H, :W])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(),
                   0, 255).astype(np.uint8)


def _jpeg_progressive_scan(buf: bytes, start: int, frame, scan_order,
                           sel, band, huff, store,
                           restart_interval: int) -> int:
    """Decode ONE scan of a progressive (SOF2) JPEG into the shared
    per-component coefficient store (T.81 Annex G): DC first/refine
    scans (possibly interleaved), AC first scans with EOB runs, and AC
    refinement scans with the correction-bit algorithm. Coefficients
    are stored in ZIGZAG index order, scaled by 2^Al as they arrive.
    Returns the position of the next marker."""
    H, W, comps = frame
    Ss, Se, Ah, Al = band
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    comp_by_id = {c[0]: c for c in comps}

    idx, resv, nres = start, 0, 0
    nbuf = len(buf)
    stopped_at_marker = False

    def soft_fill(need: int) -> None:
        nonlocal idx, resv, nres, stopped_at_marker
        while nres < need and idx < nbuf:
            b = buf[idx]
            if b == 0xFF:
                if idx + 1 < nbuf and buf[idx + 1] == 0x00:
                    idx += 2
                else:
                    stopped_at_marker = True
                    return
            else:
                idx += 1
            resv = (resv << 8) | b
            nres += 8

    def read_bits(n: int) -> int:
        nonlocal resv, nres
        if n == 0:
            return 0
        if nres < n:
            soft_fill(n)
            if nres < n:
                raise NotImplementedError(
                    "unexpected marker inside JPEG scan"
                    if stopped_at_marker else "truncated JPEG scan")
        nres -= n
        v = (resv >> nres) & ((1 << n) - 1)
        resv &= (1 << nres) - 1
        return v

    # byte-wise Huffman fast tables, same shape as the sequential
    # decoder's: next-8-bits -> (symbol << 4) | length for codes <= 8
    # bits, (length, code) dict walk for the rest
    _fast: dict[int, tuple] = {}

    def fast_of(table: dict) -> tuple:
        key = id(table)
        ent = _fast.get(key)
        if ent is None:
            lut: list = [None] * 256
            longc: dict = {}
            for (ln, code), sym in table.items():
                if ln <= 8:
                    base = code << (8 - ln)
                    packed = (sym << 4) | ln
                    for i in range(1 << (8 - ln)):
                        lut[base + i] = packed
                else:
                    longc[(ln, code)] = sym
            ent = (lut, longc)
            _fast[key] = ent
        return ent

    def huffdecode(table: dict) -> int:
        nonlocal resv, nres
        lut, longc = fast_of(table)
        if nres < 8:
            soft_fill(8)
        if nres >= 8:
            key = (resv >> (nres - 8)) & 0xFF
        elif nres > 0:
            key = ((resv << (8 - nres))
                   | ((1 << (8 - nres)) - 1)) & 0xFF
        else:
            raise NotImplementedError(
                "unexpected marker inside JPEG scan"
                if stopped_at_marker else "truncated JPEG scan")
        ent = lut[key]
        if ent is not None:
            ln = ent & 0xF
            if ln <= nres:
                nres -= ln
                resv &= (1 << nres) - 1
                return ent >> 4
            raise NotImplementedError(
                "unexpected marker inside JPEG scan"
                if stopped_at_marker else "truncated JPEG scan")
        code = read_bits(8)
        for length in range(9, 17):
            code = (code << 1) | read_bits(1)
            sym = longc.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid JPEG huffman code")

    def align_restart() -> None:
        nonlocal idx, resv, nres, stopped_at_marker
        resv, nres = 0, 0
        stopped_at_marker = False
        if (idx + 1 < nbuf and buf[idx] == 0xFF
                and 0xD0 <= buf[idx + 1] <= 0xD7):
            idx += 2
        else:
            raise NotImplementedError("missing JPEG restart marker")

    def extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    # MCU iteration: DC scans may interleave several components (MCU =
    # the usual block group); AC scans are single-component and
    # NON-interleaved (one block per MCU, over the component's TRUE
    # block dimensions -- the MCU-padded blocks exist only in
    # interleaved scans).
    mcus: list[list[tuple[int, int, int]]] = []
    if Ss == 0 and len(scan_order) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for cid in scan_order:
                    _, ch, cv, _tq = comp_by_id[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            mcu.append((cid, my * cv + by, mx * ch + bx))
                mcus.append(mcu)
    else:
        cid = scan_order[0]
        _, ch, cv, _tq = comp_by_id[cid]
        bw_true = ((W * ch + hmax - 1) // hmax + 7) // 8
        bh_true = ((H * cv + vmax - 1) // vmax + 7) // 8
        for r in range(bh_true):
            for c in range(bw_true):
                mcus.append([(cid, r, c)])

    pred = {cid: 0 for cid in scan_order}
    eobrun = 0
    p1 = 1 << Al
    m1 = -1 << Al
    nmcu = 0
    for mcu in mcus:
        if restart_interval and nmcu and nmcu % restart_interval == 0:
            align_restart()
            eobrun = 0
            for k2 in pred:
                pred[k2] = 0
        for cid, br_, bc_ in mcu:
            blk = store[cid][br_][bc_]
            if Ss == 0:
                if Se != 0:
                    raise NotImplementedError(
                        "JPEG DC scan with nonzero Se")
                if Ah == 0:  # DC first
                    dct, _act = sel[cid]
                    table = huff.get((0, dct))
                    if table is None:
                        raise NotImplementedError("missing JPEG table")
                    t = huffdecode(table)
                    pred[cid] += extend(read_bits(t), t) if t else 0
                    blk[0] = pred[cid] << Al
                else:  # DC refinement: one raw bit per block
                    if read_bits(1):
                        blk[0] |= p1
                continue
            # ---- AC scan ----
            _dct, act = sel[cid]
            table = huff.get((1, act))
            if table is None:
                raise NotImplementedError("missing JPEG table")
            if Ah == 0:  # AC first scan for this bit position
                if eobrun:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = huffdecode(table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += read_bits(r)
                        break
                    k += r
                    if k > Se:
                        raise NotImplementedError(
                            "JPEG AC index overflow")
                    blk[k] = extend(read_bits(s), s) << Al
                    k += 1
                continue
            # AC refinement (T.81 G.1.2.3 / Annex G decoder)
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = huffdecode(table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += read_bits(r)
                            break
                        val = 0
                    else:
                        if s != 1:
                            raise NotImplementedError(
                                "invalid JPEG AC refinement symbol")
                        val = p1 if read_bits(1) else m1
                    while k <= Se:
                        cur = blk[k]
                        if cur != 0:
                            if read_bits(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val:
                        if k > Se:
                            raise NotImplementedError(
                                "JPEG AC refinement overflow")
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    cur = blk[k]
                    if cur != 0:
                        if read_bits(1) and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1
        nmcu += 1

    # position of the next marker: any partial byte is padding
    while idx + 1 < nbuf:
        if buf[idx] == 0xFF and buf[idx + 1] != 0x00:
            return idx
        idx += 1
    return nbuf


def _jpeg_reconstruct(frame, store, qt):
    """Dequantize + de-zigzag + batched IDCT + assemble the progressive
    coefficient store into RGB (the sequential decoder's tail, fed from
    the multi-scan accumulator)."""
    import numpy as np

    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    C = _jpeg_dct_matrix()
    zig = np.array(_JPEG_ZIGZAG)
    planes = {}
    for cid, ch, cv, tq in comps:
        qtab = qt.get(tq)
        if qtab is None:
            raise NotImplementedError("missing JPEG table")
        grid = store[cid]
        bh, bwid = len(grid), len(grid[0])
        arr = np.array([blk for row in grid for blk in row],
                       dtype=np.float64) * qtab
        fb = np.zeros_like(arr)
        fb[:, zig] = arr
        sp = C.T @ fb.reshape(-1, 8, 8) @ C + 128.0
        planes[cid] = (sp.reshape(bh, bwid, 8, 8)
                       .transpose(0, 2, 1, 3)
                       .reshape(bh * 8, bwid * 8))
    return _jpeg_assemble(planes, comps, hmax, vmax, H, W)


def _jpeg_huff_encode_codes(bits: list[int], vals) -> dict:
    """Inverse of :func:`_jpeg_huff_decode_table`: symbol -> (code, len)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# Simple valid Huffman tables for the encoder (JPEG files CARRY their
# tables, so these need not be the Annex K defaults): all 12 DC size
# categories at 4 bits, all 162 AC run/size symbols at 8 bits -- both
# canonical, neither fills its length (no all-ones code).
_JPEG_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_ENC_DC_VALS = bytes(range(12))
_JPEG_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_JPEG_ENC_AC_VALS = bytes(sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                    for s in range(1, 11)]))


def encode_jpeg(img, quant: int = 1, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 -> baseline sequential JPEG bytes (T.81):
    uniform quantization ``quant`` (1 = near-lossless, error only from
    DCT rounding), optional 2x2 luma sampling (4:2:0, chroma averaged),
    optional restart markers every ``restart_interval`` MCUs. Tables
    are carried in-stream per the spec."""
    import struct

    import numpy as np

    C = _jpeg_dct_matrix()
    zig = np.array(_JPEG_ZIGZAG)
    qtab = np.full(64, float(quant))
    dc_codes = _jpeg_huff_encode_codes(_JPEG_ENC_DC_BITS,
                                       _JPEG_ENC_DC_VALS)
    ac_codes = _jpeg_huff_encode_codes(_JPEG_ENC_AC_BITS,
                                       _JPEG_ENC_AC_VALS)

    H, W = img.shape[:2]
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hs = vs = 2 if subsample else 1
    mcux = (W + 8 * hs - 1) // (8 * hs)
    mcuy = (H + 8 * vs - 1) // (8 * vs)

    def pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    yp = pad(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cb = cb[:mcuy * 16, :mcux * 16]
        cb = pad(cb, mcuy * 16, mcux * 16)
        cr = pad(cr[:mcuy * 16, :mcux * 16], mcuy * 16, mcux * 16)
        cbp = cb.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = cr.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad(cb, mcuy * 8, mcux * 8)
        crp = pad(cr, mcuy * 8, mcux * 8)
    comps = [(1, hs, vs, yp), (2, 1, 1, cbp), (3, 1, 1, crp)]

    scan = bytearray()
    acc, nacc = 0, 0

    def wbits(code: int, length: int) -> None:
        nonlocal acc, nacc
        for i in range(length - 1, -1, -1):
            acc = (acc << 1) | ((code >> i) & 1)
            nacc += 1
            if nacc == 8:
                scan.append(acc)
                if acc == 0xFF:
                    scan.append(0x00)
                acc, nacc = 0, 0

    def flush() -> None:
        nonlocal acc, nacc
        if nacc:
            v = (acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)
            scan.append(v)
            if v == 0xFF:
                scan.append(0x00)
            acc, nacc = 0, 0

    pred = {cid: 0 for cid, _, _, _ in comps}

    def encode_block(blk: np.ndarray, cid: int) -> None:
        fq = C @ (blk - 128.0) @ C.T
        qz = np.round(fq.reshape(-1)[zig] / qtab).astype(np.int64)
        qz[1:] = np.clip(qz[1:], -1023, 1023)  # baseline AC range
        diff = int(qz[0]) - pred[cid]
        pred[cid] = int(qz[0])
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        wbits(code, ln)
        if t:
            wbits(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(qz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]
                wbits(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            wbits(code, ln)
            wbits(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            wbits(code, ln)

    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                flush()
                scan += bytes([0xFF,
                               0xD0 + ((nmcu // restart_interval - 1)
                                       % 8)])
                for k in pred:
                    pred[k] = 0
            for cid, ch, cv, plane in comps:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        encode_block(plane[y0:y0 + 8, x0:x0 + 8], cid)
            nmcu += 1
    flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qtab))
    dht = (seg(0xC4, bytes([0x00]) + bytes(_JPEG_ENC_DC_BITS)
               + _JPEG_ENC_DC_VALS)
           + seg(0xC4, bytes([0x10]) + bytes(_JPEG_ENC_AC_BITS)
                 + _JPEG_ENC_AC_VALS))
    sof = seg(0xC0, struct.pack(">BHHB", 8, H, W, 3)
              + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + dht + sof + dri + sos + bytes(scan)
            + b"\xff\xd9")


# AC table for progressive scans: the 162 sequential run/size symbols
# plus the 15 EOBn symbols (0x00..0xE0) refinement and first scans use
# for end-of-band runs; canonical, 8 bits each, not full.
_JPEG_ENC_ACP_BITS = [0] * 7 + [176] + [0] * 8
_JPEG_ENC_ACP_VALS = bytes(sorted(
    [0xF0] + [r << 4 for r in range(15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]))


def encode_jpeg_progressive(img, quant: int = 1,
                            subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 -> PROGRESSIVE JPEG bytes (T.81 SOF2, Annex G):
    a 6-scan script exercising every progressive mechanism --
    interleaved DC first scan at Al=1, DC refinement, per-component AC
    first scans with spectral selection (bands 1-5 and 6-63) at Al=1
    with EOB-run aggregation, then AC refinement scans emitting
    correction bits. Same coefficients as :func:`encode_jpeg`, so the
    decoded pixels are bit-identical to the sequential encoding's."""
    import struct

    import numpy as np

    C = _jpeg_dct_matrix()
    zig = np.array(_JPEG_ZIGZAG)
    qtab = np.full(64, float(quant))
    dc_codes = _jpeg_huff_encode_codes(_JPEG_ENC_DC_BITS,
                                       _JPEG_ENC_DC_VALS)
    ac_codes = _jpeg_huff_encode_codes(_JPEG_ENC_ACP_BITS,
                                       _JPEG_ENC_ACP_VALS)

    H, W = img.shape[:2]
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hs = vs = 2 if subsample else 1
    mcux = (W + 8 * hs - 1) // (8 * hs)
    mcuy = (H + 8 * vs - 1) // (8 * vs)

    def pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    yp = pad(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cbp = pad(cb[:mcuy * 16, :mcux * 16], mcuy * 16, mcux * 16) \
            .reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = pad(cr[:mcuy * 16, :mcux * 16], mcuy * 16, mcux * 16) \
            .reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad(cb, mcuy * 8, mcux * 8)
        crp = pad(cr, mcuy * 8, mcux * 8)
    comps = [(1, hs, vs, yp), (2, 1, 1, cbp), (3, 1, 1, crp)]

    # quantized zigzag coefficients per component, batched
    coefs = {}
    dims = {}
    for cid, ch, cv, plane in comps:
        bh, bwid = mcuy * cv, mcux * ch
        blocks = (plane.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3)
                  - 128.0)
        fq = C @ blocks @ C.T
        qz = np.round(fq.reshape(bh, bwid, 64)[:, :, zig]
                      / qtab).astype(np.int64)
        qz[:, :, 1:] = np.clip(qz[:, :, 1:], -1023, 1023)
        coefs[cid] = qz
        bw_true = ((W * ch + hs - 1) // hs + 7) // 8
        bh_true = ((H * cv + vs - 1) // vs + 7) // 8
        dims[cid] = (bh_true, bw_true, bh, bwid)

    out = bytearray()
    acc, nacc = 0, 0
    scan = bytearray()
    rst_no = 0

    def wbits(code: int, length: int) -> None:
        nonlocal acc, nacc
        for i in range(length - 1, -1, -1):
            acc = (acc << 1) | ((code >> i) & 1)
            nacc += 1
            if nacc == 8:
                scan.append(acc)
                if acc == 0xFF:
                    scan.append(0x00)
                acc, nacc = 0, 0

    def flush() -> None:
        nonlocal acc, nacc
        if nacc:
            v = (acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)
            scan.append(v)
            if v == 0xFF:
                scan.append(0x00)
            acc, nacc = 0, 0

    def wsym(sym: int) -> None:
        code, ln = ac_codes[sym]
        wbits(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def sos(specs: list[tuple[int, int]], Ss: int, Se: int, Ah: int,
            Al: int) -> bytes:
        body = bytes([len(specs)])
        for cid, tt in specs:
            body += bytes([cid, tt])
        return seg(0xDA, body + bytes([Ss, Se, (Ah << 4) | Al]))

    def emit_restart() -> None:
        nonlocal rst_no
        flush()
        scan.append(0xFF)
        scan.append(0xD0 + rst_no % 8)
        rst_no += 1

    # ---- scan 1: DC first, interleaved, Al=1 ----
    def dc_first_scan(al: int) -> None:
        nonlocal rst_no
        rst_no = 0
        pred = {cid: 0 for cid, _, _, _ in comps}
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and nmcu \
                        and nmcu % restart_interval == 0:
                    emit_restart()
                    for k in pred:
                        pred[k] = 0
                for cid, ch, cv, _pl in comps:
                    for by in range(cv):
                        for bx in range(ch):
                            dc = int(coefs[cid][my * cv + by,
                                                mx * ch + bx, 0]) >> al
                            diff = dc - pred[cid]
                            pred[cid] = dc
                            t = abs(diff).bit_length()
                            code, ln = dc_codes[t]
                            wbits(code, ln)
                            if t:
                                wbits(diff if diff > 0
                                      else diff + (1 << t) - 1, t)
                nmcu += 1
        flush()

    # ---- DC refinement: one raw bit per block ----
    def dc_refine_scan(al: int) -> None:
        nonlocal rst_no
        rst_no = 0
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and nmcu \
                        and nmcu % restart_interval == 0:
                    emit_restart()
                for cid, ch, cv, _pl in comps:
                    for by in range(cv):
                        for bx in range(ch):
                            dc = int(coefs[cid][my * cv + by,
                                                mx * ch + bx, 0])
                            wbits((dc >> al) & 1, 1)
                nmcu += 1
        flush()

    def flush_eob(eobrun: int, bits: list[int]) -> None:
        if not eobrun:
            return
        rr = eobrun.bit_length() - 1
        wsym(rr << 4)
        if rr:
            wbits(eobrun - (1 << rr), rr)
        for bit in bits:
            wbits(bit, 1)

    # ---- AC first scan: one component, band Ss..Se, point transf Al
    def ac_first_scan(cid: int, Ss: int, Se: int, al: int) -> None:
        nonlocal rst_no
        rst_no = 0
        bh_true, bw_true, _, _ = dims[cid]
        eobrun = 0
        nmcu = 0
        for br_ in range(bh_true):
            for bc_ in range(bw_true):
                if restart_interval and nmcu \
                        and nmcu % restart_interval == 0:
                    flush_eob(eobrun, [])
                    eobrun = 0
                    emit_restart()
                nmcu += 1
                blk = coefs[cid][br_, bc_]
                ts = [int(abs(v)) >> al if v >= 0
                      else -(int(-v) >> al)
                      for v in blk[Ss:Se + 1]]
                if not any(ts):
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob(eobrun, [])
                        eobrun = 0
                    continue
                flush_eob(eobrun, [])
                eobrun = 0
                run = 0
                last_nz = max(i for i, t in enumerate(ts) if t)
                for i, t in enumerate(ts):
                    if i > last_nz:
                        break
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        wsym(0xF0)
                        run -= 16
                    s = abs(t).bit_length()
                    wsym((run << 4) | s)
                    wbits(t if t > 0 else t + (1 << s) - 1, s)
                    run = 0
                if last_nz < Se - Ss:
                    eobrun = 1
        flush_eob(eobrun, [])
        flush()

    # ---- AC refinement scan (T.81 G.1.2.3 encoder shape) ----
    def ac_refine_scan(cid: int, Ss: int, Se: int, al: int) -> None:
        nonlocal rst_no
        rst_no = 0
        bh_true, bw_true, _, _ = dims[cid]
        eobrun = 0
        eob_bits: list[int] = []
        nmcu = 0
        for br_ in range(bh_true):
            for bc_ in range(bw_true):
                if restart_interval and nmcu \
                        and nmcu % restart_interval == 0:
                    flush_eob(eobrun, eob_bits)
                    eobrun, eob_bits = 0, []
                    emit_restart()
                nmcu += 1
                blk = coefs[cid][br_, bc_]
                # events in band order: zero-history / history (with
                # its correction bit) / newly-nonzero (with its sign)
                events = []
                for v in blk[Ss:Se + 1]:
                    m = int(abs(v)) >> al
                    if m >= 2:
                        events.append(("h", m & 1))
                    elif m == 1:
                        events.append(("n", 1 if v > 0 else 0))
                    else:
                        events.append(("z",))
                if not any(e[0] == "n" for e in events):
                    eobrun += 1
                    eob_bits += [e[1] for e in events if e[0] == "h"]
                    if eobrun == 32767:
                        flush_eob(eobrun, eob_bits)
                        eobrun, eob_bits = 0, []
                    continue
                flush_eob(eobrun, eob_bits)
                eobrun, eob_bits = 0, []
                pos = 0
                n_ev = len(events)
                while pos < n_ev:
                    j, zcount, nxt = pos, 0, None
                    while j < n_ev:
                        if events[j][0] == "n":
                            nxt = j
                            break
                        if events[j][0] == "z":
                            zcount += 1
                        j += 1
                    if nxt is None:
                        # trailing band: joins the EOB run with its
                        # remaining correction bits
                        if pos < n_ev:
                            eobrun = 1
                            eob_bits = [e[1] for e in events[pos:]
                                        if e[0] == "h"]
                        break
                    while zcount > 15:
                        wsym(0xF0)
                        zz = 0
                        while zz < 16:
                            ev = events[pos]
                            pos += 1
                            if ev[0] == "h":
                                wbits(ev[1], 1)
                            else:
                                zz += 1
                        zcount -= 16
                    wsym((zcount << 4) | 1)
                    wbits(events[nxt][1], 1)
                    for ev in events[pos:nxt]:
                        if ev[0] == "h":
                            wbits(ev[1], 1)
                    pos = nxt + 1
        flush_eob(eobrun, eob_bits)
        flush()

    # ---- container ----
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qtab))
    dht = (seg(0xC4, bytes([0x00]) + bytes(_JPEG_ENC_DC_BITS)
               + _JPEG_ENC_DC_VALS)
           + seg(0xC4, bytes([0x10]) + bytes(_JPEG_ENC_ACP_BITS)
                 + _JPEG_ENC_ACP_VALS))
    sof = seg(0xC2, struct.pack(">BHHB", 8, H, W, 3)
              + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    out += b"\xff\xd8" + dqt + dht + sof + dri

    all_specs = [(1, 0x00), (2, 0x00), (3, 0x00)]
    scan = bytearray()
    dc_first_scan(1)
    out += sos(all_specs, 0, 0, 0, 1) + bytes(scan)
    scan = bytearray()
    dc_refine_scan(0)
    out += sos(all_specs, 0, 0, 1, 0) + bytes(scan)
    for Ss, Se in ((1, 5), (6, 63)):
        for cid in (1, 2, 3):
            scan = bytearray()
            ac_first_scan(cid, Ss, Se, 1)
            out += sos([(cid, 0x00)], Ss, Se, 0, 1) + bytes(scan)
    for Ss, Se in ((1, 5), (6, 63)):
        for cid in (1, 2, 3):
            scan = bytearray()
            ac_refine_scan(cid, Ss, Se, 0)
            out += sos([(cid, 0x00)], Ss, Se, 1, 0) + bytes(scan)
    return bytes(out) + b"\xff\xd9"


def _lzw_decode(data: bytes, min_code_size: int,
                max_pixels: int) -> list[int]:
    """GIF-variant LZW decompression (LSB-first variable-width codes,
    CLEAR/EOI, 12-bit table cap with deferred clear) -- pure logic, no
    codec library. Written against the public GIF89a specification
    Appendix F."""
    if not 1 <= min_code_size <= 11:  # LZW codes are capped at 12 bits
        raise NotImplementedError("invalid GIF LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [[i] for i in range(clear)] + [None, None]

    table = fresh()
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + width <= total_bits and len(out) < max_pixels:
        i = bitpos >> 3
        chunk = int.from_bytes(data[i:i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise NotImplementedError("bad first LZW code")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + [entry[0]])
        elif code == len(table) and len(table) < 4096:
            entry = prev + [prev[0]]  # the KwKwK case
            table.append(entry)
        else:
            raise NotImplementedError("corrupt LZW code stream")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _decode_gif(payload: bytes):
    """Dependency-free GIF decode -> (H, W, 3) uint8 of the FIRST image
    frame. GIF's compression is LZW -- pure dictionary logic, no codec
    library needed (:func:`_lzw_decode`). Handles GIF87a/89a, global and
    local color tables, extension-block skipping, sub-block reassembly,
    and Adam-style 4-pass interlacing. Animated GIFs yield frame 0
    composited on nothing (the features/thumbnail use case); transparency
    is ignored (opaque RGB out, same convention as PNG alpha)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise NotImplementedError("not a GIF payload")
    packed = payload[10]
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 7)
        tbl = payload[pos:pos + 3 * n]
        if len(tbl) != 3 * n:
            raise NotImplementedError("truncated GIF color table")
        gct = np.frombuffer(tbl, dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise NotImplementedError("truncated GIF image descriptor")
            _, _, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                tbl = payload[pos:pos + 3 * n]
                if len(tbl) != 3 * n:
                    raise NotImplementedError("truncated GIF color table")
                ct = np.frombuffer(tbl, dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if ct is None or w == 0 or h == 0:
                raise NotImplementedError("GIF frame without a color table")
            if pos >= len(payload):
                raise NotImplementedError("truncated GIF data")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise NotImplementedError("truncated GIF raster")
            arr = np.array(idx[:w * h], dtype=np.int64).reshape(h, w)
            if ipacked & 0x40:  # 4-pass interlace: rows arrive 8/8,
                order = (list(range(0, h, 8)) + list(range(4, h, 8))
                         + list(range(2, h, 4)) + list(range(1, h, 2)))
                out = np.empty_like(arr)
                out[order] = arr
                arr = out
            if int(arr.max()) >= ct.shape[0]:
                raise NotImplementedError("GIF index out of color table")
            return ct[arr]
        elif block == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    raise NotImplementedError("GIF contains no image data")


def encode_png(img) -> bytes:
    """(H, W, 3) uint8 -> canonical 8-bit truecolor PNG bytes (filter 0
    scanlines, one zlib-deflated IDAT, CRC-correct chunks)."""
    import struct
    import zlib

    h, w = img.shape[:2]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    raw = b"".join(b"\0" + img[y].astype("uint8").tobytes()
                   for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


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


def _g711_ulaw_decode(data: bytes):
    """G.711 mu-law -> int32 linear PCM (+-32124), the published CCITT
    expansion (sign/exponent/mantissa with bias 0x84), fully vectorized:
    one numpy pass over the byte stream."""
    import numpy as np

    u = (~np.frombuffer(data, dtype=np.uint8)) & 0xFF
    t = ((u & 0x0F).astype(np.int32) << 3) + 0x84
    t <<= ((u & 0x70) >> 4).astype(np.int32)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int32)


def _g711_alaw_decode(data: bytes):
    """G.711 A-law -> int32 linear PCM (+-32256): XOR 0x55 then the
    published segment expansion. Vectorized like the mu-law path."""
    import numpy as np

    a = np.frombuffer(data, dtype=np.uint8) ^ 0x55
    t = (a & 0x0F).astype(np.int32) << 4
    seg = ((a & 0x70) >> 4).astype(np.int32)
    expanded = (t + 0x108) << np.maximum(seg - 1, 0)
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, expanded))
    return np.where(a & 0x80, t, -t).astype(np.int32)


# MS-ADPCM (WAVE format 2) constants from the public Microsoft
# "Multimedia Standards Update" ADPCM specification: the 7 standard
# predictor coefficient pairs (/256 fixed point) and the 16-entry
# step-size adaptation table.
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)
_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232))


def _ms_adpcm_decode(data: bytes, n_channels: int, block_align: int,
                     coefs=_MS_COEFS):
    """MS-ADPCM (WAVE format 2) -> (n_frames, n_channels) int32 in
    int16 range. Block layout: per channel 1-byte predictor index, then
    per channel int16 delta, sample1, sample2; the 4-bit nibble stream
    follows HIGH nibble first, round-robin across channels. The two
    header samples are emitted oldest-first (sample2, then sample1);
    each nibble advances predictor = trunc((s1*c1 + s2*c2) / 256) +
    signed_nibble * delta (int16-clamped), then delta adapts through
    the published table with floor 16. Sequential per block like the
    IMA path -- parallelism is across payloads."""
    import struct

    import numpy as np

    hdr = 7 * n_channels
    if block_align < hdr or (block_align - hdr) % n_channels:
        raise NotImplementedError("invalid MS ADPCM block alignment")
    if not data or len(data) % block_align:
        raise NotImplementedError("truncated MS ADPCM data chunk")
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for b0 in range(0, len(data), block_align):
        c1, c2, delta, s1, s2 = [], [], [], [], []
        for ch in range(n_channels):
            idx = data[b0 + ch]
            if idx >= len(coefs):
                raise NotImplementedError("MS ADPCM predictor out of range")
            c1.append(coefs[idx][0])
            c2.append(coefs[idx][1])
        for ch in range(n_channels):
            delta.append(struct.unpack_from(
                "<h", data, b0 + n_channels + 2 * ch)[0])
        for ch in range(n_channels):
            s1.append(struct.unpack_from(
                "<h", data, b0 + 3 * n_channels + 2 * ch)[0])
        for ch in range(n_channels):
            s2.append(struct.unpack_from(
                "<h", data, b0 + 5 * n_channels + 2 * ch)[0])
        for ch in range(n_channels):
            chans[ch].append(s2[ch])  # oldest header sample first
            chans[ch].append(s1[ch])
        body = data[b0 + hdr:b0 + block_align]
        ch = 0
        for byte in body:
            for nib in (byte >> 4, byte & 0xF):  # HIGH nibble first
                signed = nib - 16 if nib >= 8 else nib
                p = s1[ch] * c1[ch] + s2[ch] * c2[ch]
                # C-style truncation toward zero, per the spec's /256
                pred = p // 256 if p >= 0 else -((-p) // 256)
                pred += signed * delta[ch]
                if pred > 32767:
                    pred = 32767
                elif pred < -32768:
                    pred = -32768
                s2[ch], s1[ch] = s1[ch], pred
                d = (_MS_ADAPT[nib] * delta[ch]) // 256
                delta[ch] = d if d >= 16 else 16
                chans[ch].append(pred)
                ch = (ch + 1) % n_channels
    n = min(len(c) for c in chans)
    return np.stack([np.array(c[:n], dtype=np.int32) for c in chans],
                    axis=1)


# IMA ADPCM quantizer tables (public spec: IMA "Recommended Practices
# for Enhancing Digital Audio Compatibility", also Microsoft WAVE format
# 0x11 documentation).
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
_IMA_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_adpcm_decode(data: bytes, n_channels: int, block_align: int):
    """IMA ADPCM (WAVE format 0x11) -> (n_frames, n_channels) int32 in
    int16 range. Block layout per channel: 4-byte header (int16
    predictor, uint8 step index, reserved), then the nibble stream in
    4-byte words interleaved per channel; nibbles decode low-half
    first. Sequential by construction (each sample feeds the next
    prediction) -- per-payload Python, parallelized across payloads by
    the mapInPandas batch pipeline like the other codecs."""
    import struct

    import numpy as np

    if block_align < 4 * n_channels \
            or (block_align - 4 * n_channels) % (4 * n_channels):
        # the body must be a whole number of per-channel 4-byte word
        # groups; a ragged multi-channel block would otherwise decode
        # channels to different lengths and silently truncate
        raise NotImplementedError("invalid IMA ADPCM block alignment")
    if len(data) % block_align:
        raise NotImplementedError("truncated IMA ADPCM data chunk")
    steps, adj = _IMA_STEPS, _IMA_INDEX_ADJ
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for b0 in range(0, len(data), block_align):
        preds, idxs = [], []
        for ch in range(n_channels):
            pred, index, _res = struct.unpack_from(
                "<hBB", data, b0 + 4 * ch)
            if index > 88:
                raise NotImplementedError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(index)
            chans[ch].append(pred)  # header predictor IS sample 0
        body = data[b0 + 4 * n_channels:b0 + block_align]
        # 4-byte words round-robin across channels
        for w0 in range(0, len(body), 4 * n_channels):
            for ch in range(n_channels):
                word = body[w0 + 4 * ch:w0 + 4 * ch + 4]
                pred, index = preds[ch], idxs[ch]
                out = chans[ch]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):
                        step = steps[index]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        pred = pred - diff if nib & 8 else pred + diff
                        if pred > 32767:
                            pred = 32767
                        elif pred < -32768:
                            pred = -32768
                        index += adj[nib & 7]
                        if index < 0:
                            index = 0
                        elif index > 88:
                            index = 88
                        out.append(pred)
                preds[ch], idxs[ch] = pred, index
    n = min(len(c) for c in chans)
    return np.stack([np.array(c[:n], dtype=np.int32) for c in chans],
                    axis=1)




# --- FLAC (Free Lossless Audio Codec) decode, dependency-free --------------
#
# Format per the public FLAC specification (RFC 9639 / flac format.html):
# fLaC marker, metadata blocks (STREAMINFO required), then CRC-protected
# frames of per-channel subframes (CONSTANT / VERBATIM / FIXED 0-4 /
# LPC 1-32) whose residuals are Rice-coded in partitions. Decode is
# exact-or-raise: header CRC-8 and frame CRC-16 are verified, reserved
# codes raise NotImplementedError -- same contract as the image codecs.

_FLAC_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                      6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                      11: 96000}
_FLAC_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8_flac(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 -- the FLAC
    frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 -- the
    FLAC whole-frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _FlacBits:
    """MSB-first bit reader over the frame byte range."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos

    def read(self, n: int) -> int:
        end = self.pos + n
        if (end + 7) // 8 > len(self.data):
            raise NotImplementedError("truncated FLAC bitstream")
        v = 0
        pos = self.pos
        data = self.data
        while n > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise NotImplementedError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _flac_utf8_number(br: "_FlacBits") -> int:
    """FLAC's extended-UTF-8 coded frame/sample number (up to 36 bits,
    7-byte form)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise NotImplementedError("malformed FLAC UTF-8 number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise NotImplementedError("malformed FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _flac_residual(br: "_FlacBits", blocksize: int, order: int) -> "object":
    """Rice-coded residual section: 2-bit method (4- or 5-bit params),
    4-bit partition order, per-partition Rice or escape-raw samples."""
    import numpy as np

    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_parts = 1 << porder
    if blocksize % n_parts or (blocksize >> porder) < max(order, 1):
        # equality is legal: the first partition is then empty
        raise NotImplementedError("invalid FLAC partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            for i in range(n):
                out[idx] = br.read_signed(raw_bits) if raw_bits else 0
                idx += 1
        else:
            for i in range(n):
                q = br.read_unary()
                v = (q << param) | (br.read(param) if param else 0)
                out[idx] = (v >> 1) ^ -(v & 1)
                idx += 1
    return out


_FLAC_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                     4: [4, -6, 4, -1]}


def _flac_subframe(br: "_FlacBits", blocksize: int, bps: int) -> "object":
    """One subframe -> int64 numpy array of ``blocksize`` samples."""
    import numpy as np

    if br.read(1) != 0:
        raise NotImplementedError("invalid FLAC subframe padding bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise NotImplementedError("FLAC wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        if eff == 8 and br.pos % 8 == 0:  # aligned fast path
            start = br.pos >> 3
            out = np.frombuffer(
                br.data[start:start + blocksize], dtype=np.int8
            ).astype(np.int64)
            if out.size != blocksize:
                raise NotImplementedError("truncated FLAC verbatim")
            br.pos += blocksize * 8
        else:
            out = np.empty(blocksize, dtype=np.int64)
            for i in range(blocksize):
                out[i] = br.read_signed(eff)
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        if order > blocksize:
            raise NotImplementedError("FLAC fixed order exceeds block")
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FLAC_FIXED_COEFS[order]
        for i in range(order, blocksize):
            acc = resid[i - order]
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = acc
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        if order > blocksize:
            raise NotImplementedError("FLAC LPC order exceeds block")
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise NotImplementedError("invalid FLAC LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise NotImplementedError("reserved FLAC subframe type")
    if wasted:
        out = out << wasted
    return out


def decode_flac(payload: bytes):
    """Dependency-free FLAC decode -> ``(samples, sample_rate)`` with
    ``samples`` an (n_frames, n_channels) int64 array of the raw PCM.

    Covers the full frame layer: CONSTANT / VERBATIM / FIXED(0-4) /
    LPC(1-32) subframes, both Rice methods (4- and 5-bit parameters)
    with escape-raw partitions, wasted bits, all four channel
    assignments (independent, left/side, right/side, mid/side), and
    variable/fixed blocking. Header CRC-8 and frame CRC-16 are VERIFIED
    -- a corrupt frame raises instead of emitting wrong samples.
    Reserved/invalid codes raise NotImplementedError (the honest-raise
    contract; cf. decode_wav for the WAV lane)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 42 or payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise NotImplementedError("truncated FLAC metadata")
        hdr = struct.unpack_from(">I", payload, pos)[0]
        last = hdr >> 31
        btype = (hdr >> 24) & 0x7F
        blen = hdr & 0xFFFFFF
        pos += 4
        if pos + blen > len(payload):
            raise NotImplementedError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise NotImplementedError("malformed FLAC STREAMINFO")
            streaminfo = payload[pos:pos + 34]
        elif btype == 127:
            raise NotImplementedError("invalid FLAC metadata type")
        pos += blen
        if last:
            break
    if streaminfo is None:
        raise NotImplementedError("FLAC missing STREAMINFO")
    si = _FlacBits(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    si_rate = si.read(20)
    si_channels = si.read(3) + 1
    si_bps = si.read(5) + 1
    si_total = si.read(36)
    if si_rate == 0:
        raise NotImplementedError("FLAC sample rate 0")

    chunks = []
    got = 0
    while pos < len(payload):
        frame_start = pos
        br = _FlacBits(payload, pos * 8)
        if br.read(14) != 0x3FFE:
            raise NotImplementedError("bad FLAC frame sync")
        if br.read(1) != 0:
            raise NotImplementedError("reserved FLAC frame bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0:
            raise NotImplementedError("reserved FLAC frame bit")
        _flac_utf8_number(br)
        if bs_code == 0:
            raise NotImplementedError("reserved FLAC block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _FLAC_SAMPLE_RATES:
            rate = _FLAC_SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise NotImplementedError("invalid FLAC sample rate code")
        # STREAMINFO is authoritative (si_rate == 0 already raised); a
        # frame header that contradicts it means a corrupt stream
        if rate != si_rate:
            raise NotImplementedError(
                "FLAC frame sample rate disagrees with STREAMINFO")
        if ch_code <= 7:
            n_ch, mode = ch_code + 1, "indep"
        elif ch_code <= 10:
            n_ch, mode = 2, ("ls", "rs", "ms")[ch_code - 8]
        else:
            raise NotImplementedError("reserved FLAC channel assignment")
        if ss_code == 0:
            bps = si_bps
        elif ss_code in _FLAC_SAMPLE_SIZES:
            bps = _FLAC_SAMPLE_SIZES[ss_code]
        else:
            raise NotImplementedError("reserved FLAC sample size code")
        hdr_end = br.pos >> 3
        if _crc8_flac(payload[frame_start:hdr_end]) != br.read(8):
            raise NotImplementedError("FLAC frame header CRC mismatch")

        chans = []
        for c in range(n_ch):
            side = ((mode == "ls" and c == 1) or (mode == "rs" and c == 0)
                    or (mode == "ms" and c == 1))
            chans.append(_flac_subframe(br, blocksize,
                                        bps + (1 if side else 0)))
        br.align()
        body_end = br.pos >> 3
        if _crc16_flac(payload[frame_start:body_end]) != br.read(16):
            raise NotImplementedError("FLAC frame CRC mismatch")
        pos = br.pos >> 3

        if mode == "ls":
            left = chans[0]
            right = left - chans[1]
            frame = np.stack([left, right], axis=1)
        elif mode == "rs":
            right = chans[1]
            left = chans[0] + right
            frame = np.stack([left, right], axis=1)
        elif mode == "ms":
            mid, side = chans[0], chans[1]
            mid = (mid << 1) | (side & 1)
            frame = np.stack([(mid + side) >> 1, (mid - side) >> 1],
                             axis=1)
        else:
            frame = np.stack(chans, axis=1)
        chunks.append(frame)
        got += blocksize
        if si_total and got >= si_total:
            break
    if not chunks:
        raise NotImplementedError("FLAC stream has no frames")
    samples = np.concatenate(chunks, axis=0)
    if si_total:
        samples = samples[:si_total]
    if si_channels != samples.shape[1]:
        raise NotImplementedError("FLAC channel count mismatch")
    return samples, si_rate


def encode_flac_pcm8(sample_bytes: bytes, sample_rate: int = 8000) -> bytes:
    """Minimal REAL FLAC encoder -- mono 8-bit, one VERBATIM frame --
    for payload synthesis: bytes are taken as unsigned PCM and stored
    as FLAC's signed samples (x - 128), the standard PCM8 convention.
    Every structural element is spec-true (STREAMINFO, frame header
    with CRC-8, verbatim subframe, padding, CRC-16), so decode_flac
    exercises its real parsing path on these payloads."""
    import struct

    n = len(sample_bytes)
    if not 1 <= n <= 65536:
        raise NotImplementedError("encode_flac_pcm8 needs 1..65536 samples")
    def w(buf: bytearray, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            buf.append((value >> i) & 1)

    def to_bytes(buf: bytearray) -> bytes:
        while len(buf) % 8:
            buf.append(0)
        out = bytearray()
        for i in range(0, len(buf), 8):
            v = 0
            for b in buf[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)

    si = bytearray()
    w(si, n, 16)      # min block size
    w(si, n, 16)      # max block size
    w(si, 0, 24)      # min frame size (unknown)
    w(si, 0, 24)      # max frame size
    w(si, sample_rate, 20)
    w(si, 0, 3)       # channels - 1
    w(si, 7, 5)       # bps - 1 = 8-bit
    w(si, n, 36)      # total samples
    si_bytes = to_bytes(si) + bytes(16)  # md5 of raw PCM: 0 = unknown

    hdr = bytearray()
    w(hdr, 0x3FFE, 14)
    w(hdr, 0, 1)
    w(hdr, 0, 1)      # fixed blocksize
    w(hdr, 7, 4)      # blocksize: 16-bit at end
    w(hdr, 0, 4)      # sample rate: from STREAMINFO
    w(hdr, 0, 4)      # 1 channel, independent
    w(hdr, 1, 3)      # 8-bit samples
    w(hdr, 0, 1)
    w(hdr, 0, 8)      # frame number 0 (UTF-8 one byte)
    w(hdr, n - 1, 16)
    hdr_bytes = to_bytes(hdr)
    hdr_bytes += bytes([_crc8_flac(hdr_bytes)])

    sub = bytearray()
    w(sub, 0, 1)
    w(sub, 1, 6)      # VERBATIM
    w(sub, 0, 1)      # no wasted bits
    for b in sample_bytes:
        w(sub, (b - 128) & 0xFF, 8)
    frame = hdr_bytes + to_bytes(sub)
    frame += struct.pack(">H", _crc16_flac(frame))
    return (b"fLaC"
            + struct.pack(">I", (1 << 31) | (0 << 24) | len(si_bytes))
            + si_bytes + frame)


def decode_wav(payload: bytes):
    """Dependency-free RIFF/WAVE decode -> ``(samples, sample_rate)``
    where ``samples`` is an (n_frames, n_channels) numpy array:

    - format 1 (integer PCM, 8/16-bit): int32 of raw PCM values (8-bit
      unsigned payloads stay 0..255; 16-bit signed stay
      -32768..32767);
    - format 3 (IEEE float PCM, 32/64-bit): float64 of the raw float
      values (normally in [-1, 1]) -- the common crawled-corpus
      variant;
    - formats 6/7 (G.711 a-law / mu-law, 8-bit): int32 linear PCM via
      the published expansion tables, fully vectorized -- the telephony
      byte-per-sample encodings crawled corpora carry;
    - format 2 (MS-ADPCM, 4-bit): int32 in int16 range via
      :func:`_ms_adpcm_decode` (published coefficient + adaptation
      tables; fmt-extension coefficient pairs honored);
    - format 0x11 (IMA ADPCM, 4-bit): int32 in int16 range via
      :func:`_ima_adpcm_decode` (pure table arithmetic). For both ADPCM
      forms a ``fact`` chunk's sample count truncates block padding.

    Walks the chunk list per the public RIFF/WAVE spec (Multimedia
    Programming Interface and Data Specifications 1.0): unknown chunks
    (LIST/cue/...) are skipped, chunk bodies are word-aligned.

    Anything else (mp3-in-WAV, GSM, ...) raises NotImplementedError --
    the same honest contract as :func:`decode_image` for lossy WebP:
    those need codec libraries this container does not ship."""
    import struct

    import numpy as np

    if (payload is None or len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise NotImplementedError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunk bodies are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise NotImplementedError("missing fmt /data chunk")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if n_channels < 1:
        raise NotImplementedError("WAV with zero channels")
    if audio_format == 1 and bits in (8, 16):
        dtype = np.uint8 if bits == 8 else np.dtype("<i2")
        frame_bytes = n_channels * bits // 8
        if len(data) % frame_bytes:
            raise NotImplementedError("truncated WAV data chunk")
        samples = np.frombuffer(data, dtype=dtype).astype(np.int32)
        return samples.reshape(-1, n_channels), int(sample_rate)
    if audio_format == 3 and bits in (32, 64):
        dtype = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        frame_bytes = n_channels * bits // 8
        if len(data) % frame_bytes:
            raise NotImplementedError("truncated WAV data chunk")
        samples = np.frombuffer(data, dtype=dtype).astype(np.float64)
        return samples.reshape(-1, n_channels), int(sample_rate)
    if audio_format in (6, 7) and bits == 8:
        # G.711 a-law (6) / mu-law (7): one byte per sample, expanded
        # to linear PCM by the published (vectorized) tables
        if len(data) % n_channels:
            raise NotImplementedError("truncated WAV data chunk")
        dec = _g711_alaw_decode if audio_format == 6 else _g711_ulaw_decode
        return dec(data).reshape(-1, n_channels), int(sample_rate)
    if audio_format == 2 and bits == 4:
        # MS-ADPCM; honor non-standard coefficient pairs from the fmt
        # extension (cbSize, samplesPerBlock, numCoef, int16 pairs)
        # when present and sane, else the 7 standard pairs
        coefs = _MS_COEFS
        if len(fmt) >= 22:
            n_coef = struct.unpack_from("<H", fmt, 20)[0]
            if 0 < n_coef <= 64 and len(fmt) >= 22 + 4 * n_coef:
                coefs = tuple(
                    struct.unpack_from("<hh", fmt, 22 + 4 * i)
                    for i in range(n_coef))
        samples = _ms_adpcm_decode(data, n_channels, block_align, coefs)
        if fact is not None and fact <= samples.shape[0]:
            samples = samples[:fact]
        return samples, int(sample_rate)
    if audio_format == 0x11 and bits == 4:
        samples = _ima_adpcm_decode(data, n_channels, block_align)
        if fact is not None and fact <= samples.shape[0]:
            samples = samples[:fact]
        return samples, int(sample_rate)
    raise NotImplementedError(
        "only integer PCM (8/16-bit), IEEE float PCM (32/64-bit), "
        "G.711 a-law/mu-law, and MS/IMA ADPCM WAV decode here; other "
        "encodings need codec libraries not present in this environment")


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n_frames[, n_channels]) int array -> canonical 16-bit PCM WAV
    bytes (RIFF + 16-byte fmt + data, no extension chunks)."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * n_channels * 2, n_channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def wav_header_pcm8(n_data_bytes: int, sample_rate: int = 8000) -> bytes:
    """The constant 44-byte canonical header of a MONO 8-BIT PCM WAV
    with a fixed-size data chunk. With the data size fixed the whole
    header is a compile-time constant, so a Spark plan can synthesize
    REAL WAV payloads as ``concat(lit(header), <sample bytes>)`` -- one
    JVM-side binary concat, no Python -- and the registry's audio query
    gets a full DuckDB value oracle (the oracle recomputes the features
    from the same sample bytes)."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    return (b"RIFF" + struct.pack("<I", 36 + n_data_bytes) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", n_data_bytes))


def resample_audio_nearest(samples, n_out: int):
    """Deterministic nearest-index resample to ``n_out`` frames (floor
    mapping src_i = (dst_i * n) // n_out -- the 1-D analogue of
    :func:`resize_image_nearest`; exact and library-free)."""
    import numpy as np

    n = samples.shape[0]
    idx = (np.arange(n_out) * n) // n_out
    return samples[idx]


def decode_audio(payload: bytes):
    """Audio container dispatch: FLAC payloads (fLaC marker) through
    :func:`decode_flac`, everything else through the RIFF/WAVE path --
    one decode surface for the feature extractors."""
    if payload is not None and payload[:4] == b"fLaC":
        return decode_flac(payload)
    return decode_wav(payload)


def audio_features(payload: bytes) -> list[float]:
    """8 deterministic integer-valued features off a REAL PCM decode:
    [sample_rate, n_channels, n_frames, duration_ms (floor), min
    sample, max sample, sum of samples, peak absolute deviation from
    the stream mean's integer floor]. Integer-valued by construction so
    the driver's int-rendered compare is exact across engines.

    IEEE-float WAVs (fmt 3) decode to float64 in [-1, 1]; those are
    scaled into the int16 domain first (rint(x * 32767), clipped) so
    min/max/sum/peak stay integer-valued and a full-scale [-1, 1]
    stream reports peak ~32767 instead of int-truncating to 0."""
    import numpy as np

    samples, rate = decode_audio(payload)
    if samples.dtype.kind == "f":
        samples = np.clip(np.rint(samples * 32767.0),
                          -32768, 32767).astype(np.int64)
    n = samples.shape[0]
    flat = samples.ravel()
    center = int(flat.sum()) // max(flat.size, 1)
    peak = int(abs(flat - center).max()) if flat.size else 0
    return [
        float(rate), float(samples.shape[1]), float(n),
        float((n * 1000) // max(rate, 1)),
        float(flat.min()) if flat.size else 0.0,
        float(flat.max()) if flat.size else 0.0,
        float(flat.sum()), float(peak),
    ]


def real_decoder(payload: bytes, mime: str) -> list[float]:
    """The production decode hook, REAL for every format a
    dependency-free codec can cover: PPM (P6) / 24-bit BMP / 8-bit
    non-interlaced PNG payloads decode to pixels via
    :func:`decode_image` and yield 8 deterministic pixel-statistics
    features (width, height, mean R/G/B, global mean/min/max);
    RIFF/WAVE integer-PCM payloads decode via :func:`decode_wav` and
    yield the 8 :func:`audio_features`. Covers baseline JPEG, PNG,
    GIF, lossless WebP (VP8L), baseline TIFF, and (audio) integer/
    float PCM, G.711 a-law/mu-law, and MS/IMA-ADPCM WAV -- only formats
    whose codecs are genuinely absent (lossy-VP8 WebP, AVIF/HEIC,
    old-style TIFF JPEG, mp3-in-WAV audio) still raise
    NotImplementedError."""
    if payload is not None and (
            payload[:4] == b"fLaC"
            or (payload[:4] == b"RIFF" and payload[8:12] != b"WEBP")):
        return audio_features(payload)
    img = decode_image(payload)
    f = img.astype("float64")
    return [
        float(img.shape[1]), float(img.shape[0]),
        float(f[:, :, 0].mean()), float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(f.mean()), float(f.min()), float(f.max()),
    ]


def real_encoder(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Real thumbnail re-encode: decode any supported raster
    (PPM/BMP/PNG/GIF/baseline JPEG) -> nearest-neighbor resize ->
    canonical P6 PPM bytes, exact pixels. Unsupported formats raise
    NotImplementedError."""
    return encode_ppm(resize_image_nearest(decode_image(payload),
                                           new_w, new_h))


def real_encoder_png(payload: bytes, new_w: int, new_h: int) -> bytes:
    """:func:`real_encoder` variant emitting PNG thumbnails (lossless,
    stdlib-zlib deflate) -- the web-interchange target."""
    return encode_png(resize_image_nearest(decode_image(payload),
                                           new_w, new_h))


def real_encoder_jpeg(payload: bytes, new_w: int, new_h: int) -> bytes:
    """:func:`real_encoder` variant emitting baseline-JPEG thumbnails
    (uniform quant 4, 4:4:4) -- the compact training-artifact target."""
    return encode_jpeg(resize_image_nearest(decode_image(payload),
                                            new_w, new_h), quant=4)


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
        # per-row tolerance: one NULL / truncated / unsupported payload
        # (real_decoder raises NotImplementedError on WebP or corrupt
        # streams) must null ITS features, not fail the whole
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
