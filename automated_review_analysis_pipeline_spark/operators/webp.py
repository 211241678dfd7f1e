"""WebP lossless (VP8L) codec -- dependency-free, written against the
public WebP Lossless Bitstream Specification.

Decoder scope (every path validated by hand-built bitstreams or
round-trips in tests/test_multimodal_codec.py):

- RIFF/WEBP container walking; VP8L chunk
- LSB-first bit reader; prefix codes both "simple" (1-2 symbols, zero
  bits for single-symbol codes) and "normal" (code-length code with
  16/17/18 repeats and the optional max_symbol short-circuit)
- LZ77 backward references incl. the 120-entry 2-D distance mapping
- color cache (hash 0x1e35a7bd, updated on every emitted pixel)
- meta prefix groups selected by an entropy-coded huffman image
- transforms: subtract-green, color-indexing (delta-coded palette,
  incl. pixel bundling for palettes <= 16), the per-tile PREDICTOR
  transform (all 14 spatial modes, SWAR channel arithmetic, libwebp
  edge rules incl. the contiguous-memory top-right of the last
  column), and the per-tile CROSS-COLOR transform (int8 delta
  multipliers, blue's red term on the restored red) -- each validated
  by hand-built bitstreams whose residuals are forward-computed
  spec-side in the tests

Lossy WebP (VP8) needs a real codec library and raises.

The encoder emits valid literal-only VP8L (flat 8-bit prefix codes,
optional subtract-green) -- uncompressed-sized but spec-conformant, and
enough to round-trip arbitrary RGB through the decoder.
"""

from __future__ import annotations

import struct

import numpy as np

CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                     12, 13, 14, 15]


class BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bit = pos * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        byte_i = self.bit >> 3
        if byte_i + ((self.bit & 7) + n + 7) // 8 > len(self.data):
            raise NotImplementedError("truncated VP8L stream")
        chunk = int.from_bytes(self.data[byte_i:byte_i + 8], "little")
        v = (chunk >> (self.bit & 7)) & ((1 << n) - 1)
        self.bit += n
        return v


class Prefix:
    """Canonical prefix decoder from code lengths (VP8L/deflate-style:
    codes assigned shortest-first, numerically increasing, MSB-first on
    the wire... VP8L reads prefix code bits one at a time MSB-of-code
    first)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise NotImplementedError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # canonical assignment: sort by (length, symbol)
        counts = {}
        for ln, _ in nz:
            counts[ln] = counts.get(ln, 0) + 1
        code = 0
        next_code = {}
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
        table = {}
        for ln, sym in sorted(nz):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        # overfull/underfull checks skipped (tolerant decode)
        self.table = table

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid VP8L prefix code")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> Prefix:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise NotImplementedError(
                    "VP8L simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise NotImplementedError(
                    "VP8L simple-code symbol out of range")
            lengths[sym0] = 1  # single-symbol: read() returns it, 0 bits
        p = Prefix(lengths)
        if num_symbols == 1:
            p.single = sym0
            p.table = None
        return p
    num_code_lengths = 4 + br.read(4)
    clcl = [0] * 19
    for i in range(num_code_lengths):
        clcl[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_prefix = Prefix(clcl)
    lengths = [0] * alphabet_size
    if br.read(1):  # max_symbol short-circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code = cl_prefix.read(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
        elif code == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif code == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return Prefix(lengths)


def _lz77_val(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# the 120-entry 2-D distance map (dx in [-8, 7], dy in [0, 7]) per the
# spec's neighborhood ordering
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _avg2(a: int, b: int) -> int:
    """Per-channel floor average of two packed ARGB pixels (SWAR: no
    cross-channel carries)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _add_px(a: int, b: int) -> int:
    """Per-channel addition mod 256 of two packed ARGB pixels (SWAR)."""
    return (((a & 0x7F7F7F7F) + (b & 0x7F7F7F7F))
            ^ ((a ^ b) & 0x80808080))


def _i8(v: int) -> int:
    """uint8 -> int8 (two's complement), the cast VP8L's color
    transform applies to channel values."""
    return v - 256 if v >= 128 else v


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """VP8L spatial predictor modes 0..13 (WebP Lossless Bitstream
    Specification; arithmetic matches libwebp's lossless.c)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    lc = ((L >> 24) & 0xFF, (L >> 16) & 0xFF, (L >> 8) & 0xFF, L & 0xFF)
    tc = ((T >> 24) & 0xFF, (T >> 16) & 0xFF, (T >> 8) & 0xFF, T & 0xFF)
    tl = ((TL >> 24) & 0xFF, (TL >> 16) & 0xFF, (TL >> 8) & 0xFF,
          TL & 0xFF)
    if mode == 11:  # Select
        p = [lv + tv - tlv for lv, tv, tlv in zip(lc, tc, tl)]
        p_l = sum(abs(pv - lv) for pv, lv in zip(p, lc))
        p_t = sum(abs(pv - tv) for pv, tv in zip(p, tc))
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for shift, (lv, tv, tlv) in zip((24, 16, 8, 0), zip(lc, tc, tl)):
            v = lv + tv - tlv
            out |= (0 if v < 0 else 255 if v > 255 else v) << shift
        return out
    if mode == 13:  # ClampAddSubtractHalf
        av = _avg2(L, T)
        ac = ((av >> 24) & 0xFF, (av >> 16) & 0xFF, (av >> 8) & 0xFF,
              av & 0xFF)
        out = 0
        for shift, (a_c, tlv) in zip((24, 16, 8, 0), zip(ac, tl)):
            d = a_c - tlv
            v = a_c + (d // 2 if d >= 0 else -((-d) // 2))  # C trunc div
            out |= (0 if v < 0 else 255 if v > 255 else v) << shift
        return out
    raise NotImplementedError(f"invalid VP8L predictor mode {mode}")


def _inverse_predictor(pixels: list[int], w: int, h: int,
                       size_bits: int, bw: int,
                       modes: list[int]) -> None:
    """In-place inverse of the VP8L predictor transform: residuals
    become pixels in raster order. Edge rules per spec: (0,0) predicts
    opaque black, the rest of row 0 predicts L, column 0 predicts T;
    the top-right neighbor of the last column is the CURRENT row's
    first pixel (the contiguous-memory rule libwebp uses)."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = (modes[(y >> size_bits) * bw
                              + (x >> size_bits)] >> 8) & 0xFF
                pred = _predict(mode, pixels[i - 1], pixels[i - w],
                                pixels[i - w - 1], pixels[i - w + 1])
            pixels[i] = _add_px(pixels[i], pred)


def _inverse_cross_color(pixels: list[int], w: int, h: int,
                         size_bits: int, bw: int,
                         elems: list[int]) -> None:
    """In-place inverse of the VP8L color (cross-color) transform.
    Element channels per spec: green_to_red in blue, green_to_blue in
    green, red_to_blue in red; delta = (int8(t) * int8(c)) >> 5 with
    ints (libwebp semantics), blue's red term uses the RESTORED
    red."""
    for y in range(h):
        row_elems = (y >> size_bits) * bw
        for x in range(w):
            i = y * w + x
            e = elems[row_elems + (x >> size_bits)]
            g2r = _i8(e & 0xFF)
            g2b = _i8((e >> 8) & 0xFF)
            r2b = _i8((e >> 16) & 0xFF)
            p = pixels[i]
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) + ((g2r * _i8(g)) >> 5)) & 0xFF
            b = ((p & 0xFF) + ((g2b * _i8(g)) >> 5)
                 + ((r2b * _i8(r)) >> 5)) & 0xFF
            pixels[i] = (p & 0xFF00FF00) | (r << 16) | b


def _decode_pixels(br: BitReader, w: int, h: int, is_level0: bool):
    """Returns list[int] of ARGB pixels, length w*h (w possibly the
    bundled width for palette streams). Handles transforms only at
    level 0."""
    transforms = []
    real_w = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 2:  # subtract green
                transforms.append(("subtract_green",))
            elif ttype == 3:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_pixels(br, n_colors, 1, False)
                # delta-coded palette: component-wise running sum
                out = [pal[0]]
                for p in pal[1:]:
                    prev = out[-1]
                    s = 0
                    for shift in (0, 8, 16, 24):
                        comp = (((p >> shift) & 0xFF)
                                + ((prev >> shift) & 0xFF)) & 0xFF
                        s |= comp << shift
                    out.append(s)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("color_indexing", out, width_bits,
                                   real_w))
                if width_bits:
                    w = (w + (1 << width_bits) - 1) >> width_bits
            elif ttype in (0, 1):  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_pixels(br, bw, bh, False)
                transforms.append((
                    "predictor" if ttype == 0 else "cross_color",
                    size_bits, bw, sub, w, h))
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise NotImplementedError("bad VP8L cache bits")
        cache = [0] * (1 << cache_bits)
    # meta prefix
    groups_img = None
    huffman_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        huffman_bits = br.read(3) + 2
        hw = (w + (1 << huffman_bits) - 1) >> huffman_bits
        hh = (h + (1 << huffman_bits) - 1) >> huffman_bits
        groups_img = _decode_pixels(br, hw, hh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in groups_img) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))
    n = w * h
    if n > (1 << 24):
        # a pure-Python per-pixel decode of a >16M-pixel image is not
        # practical, and garbage headers can claim 2^28 pixels -- cap
        raise NotImplementedError("VP8L image too large for this decoder")
    pixels: list[int] = []

    # constant-image fast path: all five codes single-symbol (zero bits
    # per pixel) -- also the guard that keeps garbage streams claiming
    # huge dimensions from spinning a zero-progress Python loop
    if groups_img is None:
        g0 = groups[0]
        if (g0[0].single is not None and g0[0].single < 256
                and g0[1].single is not None
                and g0[2].single is not None
                and g0[3].single is not None):
            const = ((g0[3].single << 24) | (g0[1].single << 16)
                     | (g0[0].single << 8) | g0[2].single)
            pixels = [const] * n

    def emit(p: int) -> None:
        pixels.append(p)
        if cache is not None:
            cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p

    while len(pixels) < n:
        if groups_img is not None:
            x = len(pixels) % w
            y = len(pixels) // w
            hw = (w + (1 << huffman_bits) - 1) >> huffman_bits
            meta = groups_img[(y >> huffman_bits) * hw
                              + (x >> huffman_bits)]
            g = groups[(meta >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            emit((alpha << 24) | (red << 16) | (s << 8) | blue)
        elif s < 280:
            length = _lz77_val(s - 256, br)
            dist_code = _lz77_val(g[4].read(br), br)
            dist = _plane_code_to_distance(w, dist_code)
            if dist > len(pixels):
                raise NotImplementedError("VP8L distance out of range")
            for _ in range(length):
                emit(pixels[-dist])
        else:
            if cache is None:
                raise NotImplementedError("VP8L cache symbol w/o cache")
            emit(cache[s - 280])

    if not is_level0:
        return pixels
    # apply inverse transforms in reverse order
    for t in reversed(transforms):
        if t[0] == "color_indexing":
            _, pal, width_bits, orig_w = t
            if width_bits:
                # bits per packed pixel: width_bits 3 -> 1, 2 -> 2,
                # 1 -> 4 (palette sizes <=2 / <=4 / <=16)
                bpp = {3: 1, 2: 2, 1: 4}[width_bits]
                out = []
                for y in range(h):
                    row = []
                    for xb in range(w):
                        green = (pixels[y * w + xb] >> 8) & 0xFF
                        for k in range(8 // bpp):
                            idx = (green >> (k * bpp)) & ((1 << bpp) - 1)
                            row.append(idx)
                    out.extend(row[:orig_w])
                idxs = out
                new_w = orig_w
            else:
                idxs = [(p >> 8) & 0xFF for p in pixels]
                new_w = w
            px2 = []
            for i in idxs:
                if i >= len(pal):
                    px2.append(0)
                else:
                    px2.append(pal[i])
            pixels = px2
            w = new_w
        elif t[0] == "subtract_green":
            out = []
            for p in pixels:
                gch = (p >> 8) & 0xFF
                r = ((p >> 16) + gch) & 0xFF
                b = (p + gch) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            pixels = out
        elif t[0] == "predictor":
            _, size_bits, bw, sub, tw, th = t
            _inverse_predictor(pixels, tw, th, size_bits, bw, sub)
        elif t[0] == "cross_color":
            _, size_bits, bw, sub, tw, th = t
            _inverse_cross_color(pixels, tw, th, size_bits, bw, sub)
    return pixels


def decode_webp_lossless(payload: bytes):
    if (len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WEBP"):
        raise NotImplementedError("not a WebP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise NotImplementedError("truncated WebP chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a real codec library")
        pos += 8 + size + (size & 1)
    if vp8l is None or vp8l[:1] != b"\x2f":
        raise NotImplementedError("no VP8L chunk")
    br = BitReader(vp8l, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise NotImplementedError("unknown VP8L version")
    pixels = _decode_pixels(br, w, h, True)
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgb = np.stack([(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF],
                   axis=2).astype(np.uint8)
    return rgb


# ---------------- minimal encoder (tests) ----------------

class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, ln: int) -> None:
        # prefix codes go MSB-first
        for i in range(ln - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    counts = {}
    for ln in lengths:
        if ln:
            counts[ln] = counts.get(ln, 0) + 1
    code = 0
    next_code = {}
    for ln in range(1, max(counts) + 1):
        code = (code + counts.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in sorted(enumerate(lengths), key=lambda t: (t[1], t[0])):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _write_flat_prefix(bw: BitWriter, alphabet_size: int,
                       n_used: int) -> dict[int, tuple[int, int]]:
    """Write a 'normal' prefix code assigning 8-bit lengths to symbols
    0..255 only — exactly full at 8 bits (Kraft sum 1).  The max_symbol
    short-circuit caps the decoder's fill loop at 256, so alphabets
    larger than 256 (the 280-entry green alphabet) stay length-0 past
    255 instead of inheriting length 8 and over-subscribing the code —
    strict decoders (libwebp) reject Kraft > 1."""
    assert n_used == 256
    bw.write(0, 1)            # not simple
    # code length code: single symbol '8'; single-symbol CL codes are
    # legal per Prefix(single) and cost 0 bits per emitted length.
    clcl = [0] * 19
    clcl[8] = 1
    num = 0
    for i, sym in enumerate(CODE_LENGTH_ORDER):
        if clcl[sym]:
            num = i + 1
    num = max(num, 4)
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(clcl[CODE_LENGTH_ORDER[i]], 3)
    bw.write(1, 1)            # use max_symbol
    bw.write(3, 3)            # length_nbits = 2 + 2*3 = 8
    bw.write(254, 8)          # max_symbol = 2 + 254 = 256
    # decoder emits exactly 256 CL symbols '8' (0 bits each), leaving
    # any symbols past 255 at length 0 -> exactly-full canonical code.
    return _canonical_codes([8] * 256 + [0] * (alphabet_size - 256))


def encode_webp_lossless(img: np.ndarray,
                         subtract_green: bool = False) -> bytes:
    h, w = img.shape[:2]
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)   # no alpha
    bw.write(0, 3)   # version
    px = img.astype(np.int32)
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # subtract green
        g = px[:, :, 1]
        px = px.copy()
        px[:, :, 0] = (px[:, :, 0] - g) & 0xFF
        px[:, :, 2] = (px[:, :, 2] - g) & 0xFF
    bw.write(0, 1)   # no more transforms
    bw.write(0, 1)   # no color cache
    bw.write(0, 1)   # no meta prefix
    green = _write_flat_prefix(bw, 256 + 24, 256)
    red = _write_flat_prefix(bw, 256, 256)
    blue = _write_flat_prefix(bw, 256, 256)
    alpha = _write_flat_prefix(bw, 256, 256)
    # distance tree: single symbol (0) simple code
    bw.write(1, 1)   # simple
    bw.write(0, 1)   # 1 symbol
    bw.write(0, 1)   # 1-bit symbol
    bw.write(0, 1)   # symbol 0
    for y in range(h):
        for x in range(w):
            r, gch, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            c, ln = green[gch]
            bw.write_code(c, ln)
            c, ln = red[r]
            bw.write_code(c, ln)
            c, ln = blue[b]
            bw.write_code(c, ln)
            c, ln = alpha[0xFF]
            bw.write_code(c, ln)
    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\0"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
