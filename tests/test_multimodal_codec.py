"""Real (dependency-free) codecs in the multimodal path: PPM (P6),
24-bit BMP, PNG (stdlib zlib), GIF (pure-logic LZW), baseline JPEG
(numpy Huffman + IDCT), and RIFF/WAVE PCM all decode for real; the
nearest-neighbor thumbnail re-encode produces exact expected rasters
through the Spark resize plan; NotImplementedError is reserved for
formats whose codec libraries this container genuinely lacks
(WebP/TIFF) and for corrupt streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_review_analysis_pipeline_spark.operators.multimodal import (
    attach_media_features,
    decode_image,
    encode_ppm,
    media_near_dup_pairs,
    real_decoder,
    real_encoder,
    resize_image_nearest,
    resize_media,
)

MEDIA_COLS = ("media_id long, payload binary, mime string, width int, "
              "height int, duration_ms long, source string")


def _ppm(img: np.ndarray) -> bytes:
    return encode_ppm(img)


def _bmp24(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP writer (test-side golden)."""
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    for row in img[::-1]:                     # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])   # BGR
        line += b"\0" * (stride - len(line))
        raster += line
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    return bytes(header + raster)


def _grad(h: int, w: int) -> np.ndarray:
    """Deterministic test image: channel-coded coordinates."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (y * 16 % 256, x * 16 % 256, (y + x) % 256)
    return img


def test_ppm_decode_exact_and_roundtrip():
    img = _grad(3, 5)
    assert np.array_equal(decode_image(_ppm(img)), img)
    # canonical round-trip
    assert encode_ppm(decode_image(_ppm(img))) == _ppm(img)
    # header comments and extra whitespace per the netpbm spec
    commented = (b"P6\n# a comment\n 5 \n# another\n3\n255\n"
                 + img.tobytes())
    assert np.array_equal(decode_image(commented), img)


def test_bmp_decode_exact_with_padding():
    # width 3 -> 9 raster bytes/row, padded to 12: exercises the stride
    img = _grad(2, 3)
    assert np.array_equal(decode_image(_bmp24(img)), img)
    # top-down variant (negative height) decodes identically
    b = bytearray(_bmp24(img))
    raster = bytes(b[54:])
    stride = 12
    flipped = b"".join(raster[i * stride:(i + 1) * stride]
                       for i in reversed(range(2)))
    b[18:26] = struct.pack("<ii", 3, -2)
    assert np.array_equal(decode_image(bytes(b[:54]) + flipped), img)


def test_unsupported_or_corrupt_formats_still_raise():
    # PNG, GIF, and baseline JPEG left this list in round 7 (stdlib
    # zlib / pure-logic LZW / numpy Huffman+IDCT); WebP/TIFF genuinely
    # need codec libraries, and a corrupt JPEG stream raises cleanly
    for magic in (b"\xff\xd8\xff\xe0JFIF", b"II*\x00",
                  b"RIFF....WEBP"):
        with pytest.raises(NotImplementedError):
            decode_image(magic + b"\0" * 64)
    with pytest.raises(NotImplementedError):
        real_decoder(b"\xff\xd8\xff\xe0" + b"\0" * 64, "image/jpeg")


def test_nearest_resize_exact():
    img = _grad(4, 4)
    out = resize_image_nearest(img, 2, 2)
    # floor mapping: dst (0,0)->(0,0), (0,1)->(0,2), (1,0)->(2,0), ...
    want = img[[0, 2]][:, [0, 2]]
    assert np.array_equal(out, want)


def test_real_decoder_pixel_statistics():
    img = _grad(3, 5)
    for payload in (_ppm(img), _bmp24(img)):
        f = real_decoder(payload, "")
        arr = img.astype(np.float64)
        assert f == [5.0, 3.0, arr[:, :, 0].mean(), arr[:, :, 1].mean(),
                     arr[:, :, 2].mean(), arr.mean(), arr.min(),
                     arr.max()]


def test_resize_media_real_codec_exact_pixels(spark):
    """The Spark resize plan with the REAL codec: a 8x4 PPM bounded to
    4x4 scales by 1/2 (aspect preserved -> 4x2), and the output payload
    is the exact nearest-neighbor P6 raster; a smaller-than-bounds BMP
    passes through at scale 1 re-encoded as PPM with identical pixels."""
    big = _grad(4, 8)          # h=4, w=8
    small = _grad(2, 3)
    rows = [(1, bytearray(_ppm(big)), "image/x-portable-pixmap",
             8, 4, None, "t"),
            (2, bytearray(_bmp24(small)), "image/bmp", 3, 2, None, "t")]
    media = spark.createDataFrame(rows, MEDIA_COLS)
    got = {r["media_id"]: r for r in
           resize_media(media, max_w=4, max_h=4,
                        encoder=real_encoder).collect()}

    assert (got[1]["new_width"], got[1]["new_height"]) == (4, 2)
    want1 = encode_ppm(resize_image_nearest(big, 4, 2))
    assert bytes(got[1]["payload"]) == want1
    # hand-check one pixel of the scaled raster: dst (1,2) -> src (2,4)
    dec = decode_image(want1)
    assert tuple(dec[1, 2]) == tuple(big[2, 4])

    assert (got[2]["new_width"], got[2]["new_height"]) == (3, 2)  # no upscale
    assert np.array_equal(decode_image(bytes(got[2]["payload"])), small)


def test_attach_media_features_real_codec(spark):
    img = _grad(3, 5)
    media = spark.createDataFrame(
        [(1, bytearray(_ppm(img)), "image/x-portable-pixmap",
          5, 3, None, "t")], MEDIA_COLS)
    row = attach_media_features(media, decoder=real_decoder).collect()[0]
    assert row["n_bytes"] == len(_ppm(img))
    feats = [pytest.approx(v) for v in real_decoder(_ppm(img), "")]
    assert list(row["features"]) == feats


def test_media_near_dup_on_real_ppm_bytes(spark):
    """Perceptual near-dup over REAL PPM payloads: a one-pixel edit
    keeps hamming distance tiny (pair found); an inverted image does
    not pair."""
    base = _grad(8, 8)
    edited = base.copy()
    edited[3, 3] = (255, 255, 255)
    inverted = (255 - base).astype(np.uint8)
    rows = [(1, bytearray(_ppm(base)), "image/x-portable-pixmap",
             8, 8, None, "t"),
            (2, bytearray(_ppm(edited)), "image/x-portable-pixmap",
             8, 8, None, "t"),
            (3, bytearray(_ppm(inverted)), "image/x-portable-pixmap",
             8, 8, None, "t")]
    media = spark.createDataFrame(rows, MEDIA_COLS)
    pairs = {(r[0], r[1]) for r in
             media_near_dup_pairs(media, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_bad_payloads_null_their_row_not_the_job(spark):
    """Per-row error tolerance: a batch mixing a good PPM, a corrupt
    JPEG stream (real_decoder raises NotImplementedError), a NULL
    payload, and a truncated header must complete -- bad rows get NULL
    features/payload, the good row keeps exact values."""
    img = _grad(3, 5)
    rows = [
        (1, bytearray(_ppm(img)), "image/x-portable-pixmap", 5, 3,
         None, "t"),
        (2, bytearray(b"\xff\xd8\xff\xe0" + b"\0" * 64), "image/jpeg",
         5, 3, None, "t"),
        (3, None, "image/x-portable-pixmap", 5, 3, None, "t"),
        (4, bytearray(b"P6 5"), "image/x-portable-pixmap", 5, 3,
         None, "t"),
    ]
    media = spark.createDataFrame(rows, MEDIA_COLS)

    feats = {r["media_id"]: r["features"] for r in
             attach_media_features(media, decoder=real_decoder).collect()}
    assert list(feats[1]) == [pytest.approx(v)
                              for v in real_decoder(_ppm(img), "")]
    assert feats[2] is None and feats[3] is None and feats[4] is None

    thumbs = {r["media_id"]: r["payload"] for r in
              resize_media(media, max_w=4, max_h=4,
                           encoder=real_encoder).collect()}
    assert decode_image(bytes(thumbs[1])).shape == (2, 4, 3)  # resized
    assert thumbs[2] is None and thumbs[3] is None and thumbs[4] is None


# ---- RIFF/WAVE integer-PCM codec ----------------------------------------

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    audio_features,
    decode_wav,
    encode_wav,
    resample_audio_nearest,
    wav_header_pcm8,
)


def test_wav_16bit_stereo_roundtrip_exact():
    frames = np.array([[0, 1], [-32768, 32767], [100, -100], [7, 7]],
                      dtype=np.int16)
    payload = encode_wav(frames, 44100)
    samples, rate = decode_wav(payload)
    assert rate == 44100
    assert samples.shape == (4, 2)
    assert np.array_equal(samples, frames.astype(np.int32))


def test_wav_8bit_mono_header_plus_raw_bytes():
    """wav_header_pcm8 + raw bytes IS a decodable WAV whose samples are
    the bytes -- the exact synthesis contract the registry query uses."""
    data = bytes(range(10))
    samples, rate = decode_wav(wav_header_pcm8(len(data)) + data)
    assert rate == 8000
    assert samples.shape == (10, 1)
    assert list(samples[:, 0]) == list(range(10))


def test_wav_chunk_walk_skips_unknown_chunks():
    """A LIST metadata chunk (odd-sized body, so word-alignment padding
    is exercised) between fmt and data must be skipped per the RIFF
    spec."""
    base = encode_wav(np.array([5, -5, 9], dtype=np.int16), 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # pad byte
    payload = bytearray(base[:fmt_end] + extra + base[fmt_end:])
    struct.pack_into("<I", payload, 4, len(payload) - 8)
    samples, rate = decode_wav(bytes(payload))
    assert list(samples[:, 0]) == [5, -5, 9]


def test_wav_compressed_and_corrupt_raise():
    # MS-ADPCM (format tag 2) with a TRUNCATED data chunk (4 bytes of a
    # 256-byte block); also stands in for the whole-block validation
    fmt = struct.pack("<HHIIHH", 0x02, 1, 8000, 4055, 256, 4)
    msadpcm = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    # mp3-in-WAV (format tag 0x55) -- genuinely no codec here
    mfmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 4055, 1, 0)
    mp3wav = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
              + b"fmt " + struct.pack("<I", 16) + mfmt
              + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    # IMA ADPCM with a TRUNCATED data chunk (not a block multiple)
    ifmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, 256, 4)
    ima_trunc = (b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 16) + ifmt
                 + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    for bad in (msadpcm, mp3wav, ima_trunc, b"RIFF\x04\0\0\0WAVE",
                b"OggS" + b"\0" * 40,
                wav_header_pcm8(100) + b"short"):
        with pytest.raises(NotImplementedError):
            decode_wav(bad)


def _wav(fmt_tag: int, n_ch: int, rate: int, block_align: int,
         bits: int, data: bytes, fact: int | None = None) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, rate,
                      rate * max(block_align, 1), block_align, bits)
    parts = [b"fmt " + struct.pack("<I", 16) + fmt]
    if fact is not None:
        parts.append(b"fact" + struct.pack("<I", 4)
                     + struct.pack("<I", fact))
    parts.append(b"data" + struct.pack("<I", len(data)) + data)
    body = b"WAVE" + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_float32_and_float64_exact():
    vals = np.array([0.0, 0.5, -0.25, 1.0, -1.0, 0.125], dtype=np.float32)
    p32 = _wav(3, 2, 48000, 8, 32, vals.tobytes())
    s, rate = decode_wav(p32)
    assert rate == 48000 and s.shape == (3, 2) and s.dtype == np.float64
    assert np.array_equal(s.ravel(), vals.astype(np.float64))
    v64 = vals.astype("<f8")
    p64 = _wav(3, 1, 16000, 8, 64, v64.tobytes())
    s, rate = decode_wav(p64)
    assert s.shape == (6, 1) and np.array_equal(s.ravel(), v64)
    # truncated float data raises the one catchable error
    with pytest.raises(NotImplementedError):
        decode_wav(_wav(3, 2, 48000, 8, 32, vals.tobytes()[:-2]))
    # audio_features runs on float WAVs too -- and scales [-1, 1]
    # streams into the int16 domain so every feature stays
    # integer-valued and full-scale audio does not int-truncate to 0
    f = audio_features(p32)
    assert f[0] == 48000.0 and f[1] == 2.0 and f[2] == 3.0
    assert all(v == float(int(v)) for v in f)
    assert f[4] == -32767.0 and f[5] == 32767.0  # min / max at +-1.0
    assert f[7] >= 16384.0  # peak deviation, not truncated to 0


def test_wav_g711_ulaw_hand_derived_golden():
    """Walking the published CCITT mu-law expansion by hand:
    0x00 -> -32124 (max negative), 0x80 -> +32124, 0xFF/0x7F -> 0
    (positive/negative silence), 0xEE (exp 1, mant 1, positive) ->
    ((1<<3)+0x84)<<1 - 0x84 = 148.
    """
    p = _wav(7, 1, 8000, 1, 8, bytes([0x00, 0x80, 0xFF, 0x7F, 0xEE]))
    s, rate = decode_wav(p)
    assert rate == 8000 and s.shape == (5, 1)
    assert list(s[:, 0]) == [-32124, 32124, 0, 0, 148]
    # audio_features stays integer-valued on G.711 decodes
    f = audio_features(p)
    assert f[2] == 5.0 and all(v == float(int(v)) for v in f)


def test_wav_g711_alaw_hand_derived_golden():
    """Hand-derived A-law expansion: 0x55 -> -8 (xor 0x55 = 0, seg 0),
    0xD5 -> +8, 0x2A -> -32256 (xor = 0x7F, seg 7 max), 0xAA -> +32256,
    0x45 -> xor 0x55 = 0x10: seg 1, (0<<4)+0x108 = 264, negative."""
    p = _wav(6, 1, 8000, 1, 8, bytes([0x55, 0xD5, 0x2A, 0xAA, 0x45]))
    s, _ = decode_wav(p)
    assert list(s[:, 0]) == [-8, 8, -32256, 32256, -264]
    # stereo reshapes frame-wise
    p2 = _wav(6, 2, 8000, 2, 8, bytes([0x55, 0xD5, 0x2A, 0xAA]))
    s2, _ = decode_wav(p2)
    assert s2.shape == (2, 2)
    assert list(s2[0]) == [-8, 8] and list(s2[1]) == [-32256, 32256]


def test_wav_ms_adpcm_hand_computed_golden():
    """Mono block walked by hand: predictor 0 (coeffs 256/0), delta 16,
    s1=100, s2=50, nibbles [1, -1, 2, -8] (HIGH nibble first):
    emits [50, 100, 116, 100, 132, 4]."""
    block = (bytes([0]) + struct.pack("<h", 16) + struct.pack("<h", 100)
             + struct.pack("<h", 50) + bytes([0x1F, 0x28]))
    p = _wav(2, 1, 8000, len(block), 4, block)
    s, rate = decode_wav(p)
    assert rate == 8000
    assert list(s[:, 0]) == [50, 100, 116, 100, 132, 4]


def test_wav_ms_adpcm_stereo_fact_and_guards():
    """Stereo nibbles round-robin across channels (predictor 2 has
    coeffs 0/0, so every decoded sample is signed_nibble * delta);
    the fact chunk truncates; out-of-range predictor index and ragged
    blocks raise the one catchable error."""
    hdr = (bytes([2, 2]) + struct.pack("<hh", 10, 20)
           + struct.pack("<hh", 1, 2) + struct.pack("<hh", 3, 4))
    # nibbles: L=+1, R=+2, L=-1, R=-2  (bytes: 0x12, 0xFE)
    block = hdr + bytes([0x12, 0xFE])
    p = _wav(2, 2, 8000, len(block), 4, block, fact=3)
    s, _ = decode_wav(p)
    assert s.shape == (3, 2)
    assert list(s[0]) == [3, 4]      # sample2 first
    assert list(s[1]) == [1, 2]      # then sample1
    assert list(s[2]) == [10, 40]    # 1*10, 2*20

    bad_pred = bytes([9]) + block[1:]
    with pytest.raises(NotImplementedError):
        decode_wav(_wav(2, 1, 8000, len(bad_pred), 4, bad_pred))
    # stereo block whose body is odd vs the channel count
    ragged = hdr + bytes([0x12])
    with pytest.raises(NotImplementedError):
        decode_wav(_wav(2, 2, 8000, len(ragged), 4, ragged))


def test_wav_ms_adpcm_fmt_extension_coefficients():
    """Non-standard coefficient pairs in the fmt extension override the
    built-in table: with coeff1=512, coeff2=-256 at index 0 the
    prediction is 2*s1 - s2."""
    block = (bytes([0]) + struct.pack("<h", 16) + struct.pack("<h", 100)
             + struct.pack("<h", 60) + bytes([0x00]))
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, len(block), 4)
    ext = struct.pack("<HHH", 32, 2 + 2 * (len(block) - 7), 1) \
        + struct.pack("<hh", 512, -256)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16 + len(ext)) + fmt
            + ext + b"data" + struct.pack("<I", len(block)) + block)
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    s, _ = decode_wav(p)
    # nibble 0 twice: pred = 2*100 - 60 = 140, then 2*140 - 100 = 180
    assert list(s[:, 0]) == [60, 100, 140, 180]


def test_wav_ima_adpcm_hand_computed_golden():
    """Step-table golden, fully hand-derived: mono, one block, header
    predictor 0 / index 0, nibbles [2,9,0,15,4,4,8,3] (packed
    low-half-first). Walking the published IMA quantizer by hand:
    samples = [0, 3, 2, 2, -9, 9, 30, 28, 45]."""
    body = struct.pack("<hBB", 0, 0, 0) + bytes([0x92, 0xF0, 0x44, 0x38])
    p = _wav(0x11, 1, 8000, 8, 4, body, fact=9)
    s, rate = decode_wav(p)
    assert rate == 8000
    assert list(s[:, 0]) == [0, 3, 2, 2, -9, 9, 30, 28, 45]


def test_wav_ima_adpcm_stereo_interleave_and_fact():
    """Stereo blocks interleave 4-byte words per channel; all-zero
    nibbles hold each channel at its header predictor (step 7 >> 3 ==
    0), and nibble 8 subtracts zero likewise. The fact chunk truncates
    block padding."""
    hdr = struct.pack("<hBB", 100, 0, 0) + struct.pack("<hBB", -100, 0, 0)
    body = hdr + b"\x00" * 4 + b"\x88" * 4
    p = _wav(0x11, 2, 8000, 16, 4, body, fact=7)
    s, rate = decode_wav(p)
    assert s.shape == (7, 2)
    assert list(s[:, 0]) == [100] * 7
    assert list(s[:, 1]) == [-100] * 7


def test_wav_ima_adpcm_ragged_multichannel_block_raises():
    """A stereo block whose body is NOT a whole number of per-channel
    4-byte word groups (12 body bytes, needs multiples of 8) must raise
    the one catchable error instead of decoding ragged channels."""
    hdr = struct.pack("<hBB", 0, 0, 0) + struct.pack("<hBB", 0, 0, 0)
    body = hdr + b"\x00" * 12
    p = _wav(0x11, 2, 8000, 8 + 12, 4, body)
    with pytest.raises(NotImplementedError):
        decode_wav(p)


def test_wav_ima_adpcm_matches_reference_decoder():
    """Pseudorandom nibble stream vs an independent in-test reference
    implementation of the published IMA quantizer."""
    import random

    rng = random.Random(13)
    nibbles = [rng.randrange(16) for _ in range(64)]
    packed = bytes(nibbles[i] | (nibbles[i + 1] << 4)
                   for i in range(0, 64, 2))
    body = struct.pack("<hBB", -1234, 17, 0) + packed
    p = _wav(0x11, 1, 22050, 4 + 32, 4, body)
    s, _ = decode_wav(p)

    STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
             34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
             130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
             408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
             1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
             3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
             7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
             18500, 20350, 22385, 24623, 27086, 29794, 32767]
    ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]
    pred, index, want = -1234, 17, [-1234]
    for nib in nibbles:
        step = STEPS[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = max(-32768, min(32767, pred - diff if nib & 8
                               else pred + diff))
        index = max(0, min(88, index + ADJ[nib & 7]))
        want.append(pred)
    assert list(s[:, 0]) == want


def test_resample_audio_nearest_floor_mapping():
    s = np.arange(8, dtype=np.int32)[:, None]
    down = resample_audio_nearest(s, 4)
    assert list(down[:, 0]) == [0, 2, 4, 6]
    up = resample_audio_nearest(s[:2], 4)
    assert list(up[:, 0]) == [0, 0, 1, 1]


def test_real_decoder_dispatches_riff_to_audio_features():
    data = bytes([10, 20, 250, 0])
    payload = wav_header_pcm8(len(data)) + data
    f = real_decoder(payload, "audio/wav")
    assert f == audio_features(payload)
    # [rate, ch, n_frames, duration_ms, min, max, sum, peak]; center =
    # 280 // 4 = 70, peak = |250 - 70| = 180
    assert f == [8000.0, 1.0, 4.0, 0.0, 0.0, 250.0, 280.0, 180.0]


# ---- PNG codec (DEFLATE via stdlib zlib -- dependency-free) --------------

import zlib  # noqa: E402

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    _decode_png,
    encode_png,
)


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png(raw_scanlines: bytes, w: int, h: int, ctype: int,
         plte: bytes | None = None, depth: int = 8,
         interlace: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    parts = [b"\x89PNG\r\n\x1a\n", _png_chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_png_chunk(b"PLTE", plte))
    # split the stream across two IDATs to exercise concatenation
    z = zlib.compress(raw_scanlines)
    parts += [_png_chunk(b"IDAT", z[:7]), _png_chunk(b"IDAT", z[7:]),
              _png_chunk(b"IEND", b"")]
    return b"".join(parts)


def _filter_line(f: int, line: np.ndarray, prev: np.ndarray,
                 bpp: int) -> bytes:
    """Spec-side FORWARD filter (test golden): produces the filtered
    bytes the decoder must invert."""
    out = bytearray()
    for x in range(len(line)):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((int(line[x]) - pred) & 0xFF)
    return bytes(out)


def test_png_roundtrip_exact():
    img = _grad(5, 7)
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_all_filters_decode_exact():
    """One scanline per filter type 0..4, forward-filtered by the
    spec-side golden above -- the decoder must reconstruct the exact
    pixels."""
    img = _grad(5, 4)  # h=5 rows, one per filter
    flat = img.reshape(5, -1)
    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        raw += bytes([f]) + _filter_line(f, flat[y], prev, 3)
        prev = flat[y]
    payload = _png(bytes(raw), 4, 5, ctype=2)
    assert np.array_equal(decode_image(payload), img)


def test_png_palette_gray_and_alpha_variants():
    # palette: 3 colors, 2x2
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    raw = b"".join(b"\0" + idx[y].tobytes() for y in range(2))
    got = decode_image(_png(raw, 2, 2, ctype=3, plte=pal))
    assert tuple(got[0, 0]) == (255, 0, 0)
    assert tuple(got[1, 0]) == (0, 0, 255)

    # grayscale replicates channels
    g = np.array([[7, 200]], dtype=np.uint8)
    got = decode_image(_png(b"\0" + g[0].tobytes(), 2, 1, ctype=0))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))

    # RGBA drops alpha; gray+alpha keeps the gray
    rgba = bytes([1, 2, 3, 128, 9, 8, 7, 0])
    got = decode_image(_png(b"\0" + rgba, 2, 1, ctype=6))
    assert tuple(got[0, 0]) == (1, 2, 3) and tuple(got[0, 1]) == (9, 8, 7)
    ga = bytes([42, 10, 99, 200])
    got = decode_image(_png(b"\0" + ga, 2, 1, ctype=4))
    assert tuple(got[0, 0]) == (42, 42, 42)
    assert tuple(got[0, 1]) == (99, 99, 99)


def test_png_adam7_interlaced_decode_exact():
    """Adam7: seven independently-filtered sub-images reassemble to the
    exact pixels (9x9 exercises every pass including 1-pixel ones)."""
    img = _grad(9, 9)
    raw = bytearray()
    for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                           (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                           (0, 1, 1, 2)):
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\0" + row.tobytes()
    got = decode_image(_png(bytes(raw), 9, 9, ctype=2, interlace=1))
    assert np.array_equal(got, img)


def test_png_16bit_reduces_to_high_byte():
    img = _grad(2, 3)
    wide = np.zeros((2, 3, 3, 2), dtype=np.uint8)
    wide[..., 0] = img          # high byte
    wide[..., 1] = 0xAB         # low byte, discarded
    raw = b"".join(b"\0" + wide[y].tobytes() for y in range(2))
    got = decode_image(_png(raw, 3, 2, ctype=2, depth=16))
    assert np.array_equal(got, img)


def test_png_unsupported_shapes_raise():
    img = _grad(2, 2)
    raw = b"".join(b"\0" + img[y].tobytes() for y in range(2))
    with pytest.raises(NotImplementedError):  # sub-byte depth
        _decode_png(_png(raw, 2, 2, ctype=2, depth=4))
    with pytest.raises(NotImplementedError):  # corrupt DEFLATE
        _decode_png(b"\x89PNG\r\n\x1a\n"
                    + _png_chunk(b"IHDR",
                                 struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                             0, 0, 0))
                    + _png_chunk(b"IDAT", b"junkjunk")
                    + _png_chunk(b"IEND", b""))


def test_png_through_spark_resize_and_features(spark):
    """A real PNG payload drives the full Spark media path: features
    are exact pixel statistics and the thumbnail is the exact
    nearest-neighbor raster."""
    img = _grad(4, 8)
    rows = [(1, bytearray(encode_png(img)), "image/png", 8, 4, None,
             "t")]
    media = spark.createDataFrame(rows, MEDIA_COLS)
    row = attach_media_features(media, decoder=real_decoder).collect()[0]
    arr = img.astype(np.float64)
    assert list(row["features"]) == [
        pytest.approx(v) for v in
        [8.0, 4.0, arr[:, :, 0].mean(), arr[:, :, 1].mean(),
         arr[:, :, 2].mean(), arr.mean(), arr.min(), arr.max()]]
    thumb = resize_media(media, max_w=4, max_h=4,
                         encoder=real_encoder).collect()[0]
    assert np.array_equal(decode_image(bytes(thumb["payload"])),
                          resize_image_nearest(img, 4, 2))


# ---- GIF codec (LZW is pure dictionary logic -- dependency-free) ---------

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    _decode_gif,
    _lzw_decode,
)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Test-side GIF-variant LZW compressor (spec Appendix F): real
    dictionary growth and width escalation, so round-trips exercise the
    decoder's full table lifecycle (not just literal codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int, w: int) -> None:
        for i in range(w):
            bits.append((code >> i) & 1)

    emit(clear, width)
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    w = (indices[0],)
    for k in indices[1:]:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = (k,)
    emit(table[w], width)
    emit(eoi, width)
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << j
        data.append(b)
    return bytes(data)


def _gif(idx: np.ndarray, palette: bytes, min_code_size: int = 2,
         interlace: bool = False, with_gce: bool = False) -> bytes:
    """Minimal GIF89a container around LZW-compressed indices."""
    h, w = idx.shape
    s = 0
    while (2 << s) * 3 < len(palette):
        s += 1
    pal = palette.ljust((2 << s) * 3, b"\0")
    rows = idx
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        rows = idx[order]  # stored in pass order
    stream = _lzw_encode([int(v) for v in rows.ravel()], min_code_size)
    subs = b"".join(bytes([len(stream[i:i + 255])]) + stream[i:i + 255]
                    for i in range(0, len(stream), 255))
    gce = (b"\x21\xf9\x04\x00\x00\x00\x00\x00" if with_gce else b"")
    return (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | s, 0, 0]) + pal + gce
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
            + bytes([0x40 if interlace else 0])
            + bytes([min_code_size]) + subs + b"\x00" + b"\x3b")


PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def test_lzw_hand_derived_golden():
    """Codes [CLEAR,0,6,7,0,EOI] at min_code_size=2, hand-packed
    LSB-first: exercises the KwKwK case twice and one width bump."""
    assert _lzw_decode(bytes([0x84, 0x0F, 0x05]), 2, 100) == [0] * 7


def test_gif_roundtrip_exact_pixels():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 4, size=(9, 13)).astype(np.uint8)
    got = decode_image(_gif(idx, PAL4))
    pal = np.frombuffer(PAL4, np.uint8).reshape(-1, 3)
    assert np.array_equal(got, pal[idx])


def test_gif_interlaced_and_gce_skipping():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 4, size=(17, 5)).astype(np.uint8)
    pal = np.frombuffer(PAL4, np.uint8).reshape(-1, 3)
    got = decode_image(_gif(idx, PAL4, interlace=True, with_gce=True))
    assert np.array_equal(got, pal[idx])


def test_gif_table_saturation_roundtrip():
    """Low-entropy raster long enough to saturate the 12-bit LZW table
    (deferred-clear regime)."""
    idx = np.tile(np.array([0, 0, 1, 0, 2, 0, 3], dtype=np.uint8),
                  2000).reshape(100, 140)
    pal = np.frombuffer(PAL4, np.uint8).reshape(-1, 3)
    assert np.array_equal(decode_image(_gif(idx, PAL4)), pal[idx])


def test_gif_corrupt_raises():
    idx = np.zeros((2, 2), dtype=np.uint8)
    good = _gif(idx, PAL4)
    with pytest.raises(NotImplementedError):
        _decode_gif(good[:20])           # truncated mid-stream
    with pytest.raises(NotImplementedError):
        _decode_gif(b"GIF89a" + b"\0" * 20)  # no image descriptor


# ---- baseline JPEG codec (Huffman + IDCT in numpy -- dependency-free) ----

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    _decode_jpeg,
    encode_jpeg,
)


def _maxerr(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_jpeg_flat_color_exact():
    img = np.full((8, 8, 3), (200, 30, 90), dtype=np.uint8)
    assert _maxerr(decode_image(encode_jpeg(img)), img) == 0


def test_jpeg_roundtrip_within_dct_rounding():
    """quant=1 4:4:4: the only loss is DCT/color-transform rounding, so
    every pixel must land within +/-2 -- on asymmetric non-multiple-of-8
    shapes (catches transposes and padding bugs)."""
    img = _grad(20, 13)
    dec = decode_image(encode_jpeg(img))
    assert dec.shape == img.shape
    assert _maxerr(dec, img) <= 2
    rng = np.random.RandomState(3)
    noisy = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    assert _maxerr(decode_image(encode_jpeg(noisy)), noisy) <= 2


def test_jpeg_420_subsampling_and_restart_markers():
    # constant-chroma image: 2x2 chroma averaging loses nothing
    img = np.zeros((19, 22, 3), dtype=np.uint8)
    img[:, :] = (np.arange(22) * 11 % 256)[None, :, None]
    assert _maxerr(decode_image(encode_jpeg(img, subsample=True)),
                   img) <= 1
    # restart markers every 3 MCUs: DC predictors reset + realignment
    img = _grad(33, 41)
    assert _maxerr(decode_image(encode_jpeg(img, restart_interval=3)),
                   img) <= 2


def test_jpeg_hand_built_dc_only_golden():
    """Spec-level vector built WITHOUT the encoder: a single grayscale
    8x8 block carrying only DC category 3 / value bits 100 (diff = 4)
    then EOB, quant table all 16s. Canonical Huffman per T.81 Annex C
    puts DC symbol t at code t (length 4) and EOB at code 0 (length 8),
    so the scan is exactly 0x38 0x01 -- and the orthonormal IDCT of a
    lone DC gives the flat value 4*16/8 + 128 = 136 everywhere."""

    def seg(m: int, body: bytes) -> bytes:
        return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body

    acvals = bytes(sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16)
                                          for s in range(1, 11)]))
    jp = (b"\xff\xd8"
          + seg(0xDB, bytes([0]) + bytes([16] * 64))
          + seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
                + bytes(range(12)))
          + seg(0xC4, bytes([0x10]) + bytes([0] * 7 + [162] + [0] * 8)
                + acvals)
          + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
          + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
          + bytes([0x38, 0x01]) + b"\xff\xd9")
    out = _decode_jpeg(jp)
    assert out.shape == (8, 8, 3)
    assert set(np.unique(out)) == {136}


def test_jpeg_unsupported_modes_raise():
    img = _grad(8, 8)
    good = bytearray(encode_jpeg(img))
    # flip SOF0 -> SOF2 (progressive)
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    good[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        _decode_jpeg(bytes(good))
    with pytest.raises(NotImplementedError):  # truncated scan
        _decode_jpeg(encode_jpeg(img)[:-20])


def test_resize_media_png_and_jpeg_thumbnail_targets(spark):
    """The Spark resize plan with PNG / JPEG thumbnail encoders: PNG is
    pixel-exact vs the PPM reference thumbnail; JPEG lands within DCT
    rounding of it."""
    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        real_encoder_jpeg,
        real_encoder_png,
    )

    img = _grad(4, 8)
    want = resize_image_nearest(img, 4, 2)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img)), "image/png", 8, 4, None, "t")],
        MEDIA_COLS)
    png_thumb = resize_media(media, max_w=4, max_h=4,
                             encoder=real_encoder_png).collect()[0]
    got = decode_image(bytes(png_thumb["payload"]))
    assert bytes(png_thumb["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(got, want)

    jpg_thumb = resize_media(media, max_w=4, max_h=4,
                             encoder=real_encoder_jpeg).collect()[0]
    assert bytes(jpg_thumb["payload"])[:2] == b"\xff\xd8"
    got = decode_image(bytes(jpg_thumb["payload"]))
    assert _maxerr(got, want) <= 8  # quant-4 DCT rounding


def test_bmp_32bit_variants_decode_exact():
    """32-bit BGRX (BI_RGB) and standard-mask BI_BITFIELDS BMPs decode
    to the same pixels as the 24-bit golden; alpha/pad bytes drop."""
    img = _grad(3, 2)
    h, w = 3, 2
    raster = bytearray()
    for row in img[::-1]:
        for px in row:
            raster += bytes([px[2], px[1], px[0], 0x7F])  # BGRA
    off_rgb = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off_rgb + len(raster), 0, 0,
                               off_rgb)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0,
                         len(raster), 2835, 2835, 0, 0))
    assert np.array_equal(decode_image(bytes(hdr) + bytes(raster)), img)

    off_bf = 14 + 40 + 12
    hdr_bf = (b"BM" + struct.pack("<IHHI", off_bf + len(raster), 0, 0,
                                  off_bf)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3,
                            len(raster), 2835, 2835, 0, 0)
              + struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF))
    assert np.array_equal(decode_image(bytes(hdr_bf) + bytes(raster)),
                          img)

    bad_masks = (bytes(hdr_bf[:54])
                 + struct.pack("<III", 0x000000FF, 0x0000FF00,
                               0x00FF0000) + bytes(raster))
    with pytest.raises(NotImplementedError):
        decode_image(bad_masks)


def test_codec_fuzz_no_uncontrolled_exceptions():
    """Library-API hardening: decode_image / decode_wav on arbitrary
    bytes (seeded fuzz, 4000 payloads biased toward real magic
    prefixes) either succeed or raise exactly NotImplementedError --
    never a raw ValueError/struct.error/zlib.error -- so callers
    outside the Spark per-row-tolerant path get one catchable
    contract."""
    import random

    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        decode_wav,
    )

    rng = random.Random(0)
    magics = [b"P6", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
              b"\xff\xd8", b"RIFF", b"RIFF\x10\x00\x00\x00WEBPVP8L",
              b"II*\x00", b"MM\x00*"]
    for _ in range(4000):
        body = bytes(rng.randrange(256)
                     for _ in range(rng.randint(0, 200)))
        payload = (rng.choice(magics)
                   if rng.random() < 0.8 else b"") + body
        for fn in (decode_image, decode_wav):
            try:
                fn(payload)
            except NotImplementedError:
                pass


# ---- WebP lossless (VP8L) codec -----------------------------------------

from automated_review_analysis_pipeline_spark.operators.webp import (  # noqa: E402
    BitReader,
    BitWriter,
    _canonical_codes,
    _read_prefix_code,
    decode_webp_lossless,
    encode_webp_lossless,
)

_VP8L_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
               14, 15]
_VP8L_GREEN = 280


def _w_prefix(bw, lengths):
    """Test-side 'normal' prefix-code writer (plain CL symbols)."""
    used = sorted({ln for ln in lengths})
    cl = [0] * 19
    if len(used) == 1:
        cl[used[0]] = 1
    else:
        depth = max(1, (len(used) - 1).bit_length())
        for s in used:
            cl[s] = depth
    bw.write(0, 1)
    num = max(max((i + 1 for i, s in enumerate(_VP8L_ORDER) if cl[s]),
                  default=0), 4)
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl[_VP8L_ORDER[i]], 3)
    bw.write(0, 1)
    clc = _canonical_codes(cl)
    if len(used) > 1:
        for ln in lengths:
            c, n = clc[ln]
            bw.write_code(c, n)
    return _canonical_codes(lengths), sum(1 for ln in lengths if ln)


def _emit(bw, pref, sym):
    codes, nsyms = pref
    if nsyms > 1:  # single-symbol codes consume ZERO bits
        c, n = codes[sym]
        bw.write_code(c, n)


def _simple1(bw, sym):
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(sym, 8)


def _vp8l(bw):
    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\0"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _hdr(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _lens(used, size=256):
    out = [0] * size
    depth = max(1, (len(used) - 1).bit_length()) if len(used) > 1 else 1
    for s in used:
        out[s] = depth
    return out


def test_webp_lossless_roundtrips():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (6, 9, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_image(encode_webp_lossless(img)), img)
    assert np.array_equal(
        decode_image(encode_webp_lossless(img, subtract_green=True)),
        img)


def test_webp_lz77_both_distance_forms():
    # distance code > 120: literal run copy at distance 1
    bw = BitWriter()
    _hdr(bw, 5, 1)
    bw.write(0, 1), bw.write(0, 1), bw.write(0, 1)
    gl = [0] * _VP8L_GREEN
    gl[1] = 1
    gl[2] = 2
    gl[258] = 2   # length code 2 -> length 3
    g = _w_prefix(bw, gl)
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([255]))
    _simple1(bw, 13)          # distance symbol 13: offset 96, 5 extra
    _emit(bw, g, 1)
    _emit(bw, g, 2)
    _emit(bw, g, 258)
    bw.write(24, 5)           # val 96+24+1=121 -> distance 1
    got = decode_webp_lossless(_vp8l(bw))
    want = np.array([[[0, 1, 0]] + [[0, 2, 0]] * 4], dtype=np.uint8)
    assert np.array_equal(got, want)

    # 2-D distance map: plane code 1 -> (0,1) -> copy the row above
    bw = BitWriter()
    _hdr(bw, 3, 2)
    bw.write(0, 1), bw.write(0, 1), bw.write(0, 1)
    gl = [0] * _VP8L_GREEN
    gl[7] = 1
    gl[9] = 2
    gl[258] = 2
    g = _w_prefix(bw, gl)
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([255]))
    _simple1(bw, 0)           # distance val 1 -> plane (0,1) -> dist=w
    for gr in (7, 9, 7):
        _emit(bw, g, gr)
    _emit(bw, g, 258)
    got = decode_webp_lossless(_vp8l(bw))
    want = np.array([[[0, 7, 0], [0, 9, 0], [0, 7, 0]]] * 2,
                    dtype=np.uint8)
    assert np.array_equal(got, want)


def test_webp_color_cache():
    bw = BitWriter()
    _hdr(bw, 3, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(4, 4)            # cache_bits = 4
    bw.write(0, 1)
    P = (255 << 24) | (5 << 8)
    idx = ((0x1E35A7BD * P) & 0xFFFFFFFF) >> 28
    gl = [0] * (_VP8L_GREEN + 16)
    gl[5] = 1
    gl[9] = 2
    gl[280 + idx] = 2
    g = _w_prefix(bw, gl)
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([255]))
    _simple1(bw, 0)
    _emit(bw, g, 5)
    _emit(bw, g, 9)
    _emit(bw, g, 280 + idx)   # cache hit re-emits the first pixel
    got = decode_webp_lossless(_vp8l(bw))
    want = np.array([[[0, 5, 0], [0, 9, 0], [0, 5, 0]]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_webp_palette_transform_with_bundling():
    bw = BitWriter()
    _hdr(bw, 6, 1)
    bw.write(1, 1)            # transform present
    bw.write(3, 2)            # color indexing
    bw.write(3, 8)            # 4 colors
    cols = [(255, 10, 0, 0), (255, 0, 20, 0), (255, 0, 0, 30),
            (255, 40, 40, 40)]
    deltas, prev = [], (0, 0, 0, 0)
    for c in cols:
        deltas.append(tuple((c[i] - prev[i]) & 0xFF for i in range(4)))
        prev = c
    bw.write(0, 1)            # palette sub-stream: no cache
    g = _w_prefix(bw, _lens(sorted({d[2] for d in deltas}), _VP8L_GREEN))
    r = _w_prefix(bw, _lens(sorted({d[1] for d in deltas})))
    b = _w_prefix(bw, _lens(sorted({d[3] for d in deltas})))
    a = _w_prefix(bw, _lens(sorted({d[0] for d in deltas})))
    _simple1(bw, 0)
    for d in deltas:
        _emit(bw, g, d[2])
        _emit(bw, r, d[1])
        _emit(bw, b, d[3])
        _emit(bw, a, d[0])
    bw.write(0, 1)            # end of transform list
    # 4 colors -> 2 bits/px, 4 px per green byte; [0,1,2,3,2,1] ->
    # bytes 0xE4, 0x06 over bundled width 2
    bw.write(0, 1)
    bw.write(0, 1)
    g2 = _w_prefix(bw, _lens([0x06, 0xE4], _VP8L_GREEN))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([255]))
    _simple1(bw, 0)
    _emit(bw, g2, 0xE4)
    _emit(bw, g2, 0x06)
    got = decode_webp_lossless(_vp8l(bw))
    want = np.array([[[10, 0, 0], [0, 20, 0], [0, 0, 30],
                      [40, 40, 40], [0, 0, 30], [0, 20, 0]]],
                    dtype=np.uint8)
    assert np.array_equal(got, want)


def test_webp_meta_prefix_groups():
    bw = BitWriter()
    _hdr(bw, 8, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(1, 1)            # meta prefix present
    bw.write(0, 3)            # huffman_bits=2 -> two 4px tiles
    bw.write(0, 1)            # huffman-image sub-stream: no cache
    hg = _w_prefix(bw, _lens([0, 1], _VP8L_GREEN))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([0]))
    _w_prefix(bw, _lens([255]))
    _simple1(bw, 0)
    _emit(bw, hg, 0)          # tile 0 -> group 0
    _emit(bw, hg, 1)          # tile 1 -> group 1
    for gsym in (50, 60):     # two all-single-symbol groups
        _w_prefix(bw, _lens([gsym], _VP8L_GREEN))
        _w_prefix(bw, _lens([0]))
        _w_prefix(bw, _lens([0]))
        _w_prefix(bw, _lens([255]))
        _simple1(bw, 0)
    got = decode_webp_lossless(_vp8l(bw))
    want = np.array([[[0, 50, 0]] * 4 + [[0, 60, 0]] * 4],
                    dtype=np.uint8)
    assert np.array_equal(got, want)


def test_webp_prefix_repeat_codes():
    """CL symbols 16 (repeat prev) and 17 (zero runs) in a normal
    prefix header."""
    bw = BitWriter()
    cl = [0] * 19
    for s in (8, 16, 17, 0):
        cl[s] = 2
    bw.write(0, 1)
    num = max(i + 1 for i, s in enumerate(_VP8L_ORDER) if cl[s])
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl[_VP8L_ORDER[i]], 3)
    bw.write(0, 1)
    clc = _canonical_codes(cl)

    def em(sym, extra=None, nbits=0):
        c, n = clc[sym]
        bw.write_code(c, n)
        if extra is not None:
            bw.write(extra, nbits)

    em(8)
    em(16, 0, 2)              # repeat len-8 three times (syms 1-3)
    em(17, 2, 3)              # 5 zeros
    em(8)                     # sym 9
    for _ in range(3):
        em(17, 7, 3)          # 30 zeros
    p = _read_prefix_code(BitReader(bw.bytes()), 40)
    lens = {sym: ln for (ln, code), sym in p.table.items()}
    assert lens == {0: 8, 1: 8, 2: 8, 3: 8, 9: 8}


def test_webp_unsupported_modes_raise():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (3, 3, 3)).astype(np.uint8)
    # a predictor transform cut off mid-declaration raises (truncated
    # sub-image; the transform itself decodes since round 8)
    bw = BitWriter()
    _hdr(bw, 3, 3)
    bw.write(1, 1)
    bw.write(0, 2)            # predictor
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(_vp8l(bw))
    # lossy VP8 raises
    lossy = (b"RIFF" + struct.pack("<I", 20) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 8) + b"\0" * 8)
    with pytest.raises(NotImplementedError):
        decode_image(lossy)
    # truncated VP8L raises
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(encode_webp_lossless(img)[:-6])


def test_webp_encoder_flat_prefix_is_kraft_valid():
    # Regression: the encoder's flat code on the 280-entry green
    # alphabet must cap at 256 symbols via max_symbol (Kraft sum
    # exactly 1), not let the decoder fill all 280 to length 8
    # (Kraft 280/256 > 1 -- strict decoders reject that).
    from automated_review_analysis_pipeline_spark.operators.webp import (
        _write_flat_prefix,
    )
    bw = BitWriter()
    _write_flat_prefix(bw, _VP8L_GREEN, 256)
    pref = _read_prefix_code(BitReader(bw.bytes()), _VP8L_GREEN)
    assert pref.table is not None and len(pref.table) == 256
    assert all(ln == 8 for (ln, _code) in pref.table)
    assert sum(2.0 ** -ln for (ln, _code) in pref.table) == 1.0
    assert all(sym < 256 for sym in pref.table.values())


def test_webp_simple_code_symbol_out_of_range_raises():
    # A 'simple' prefix code naming symbol 200 in the 40-entry distance
    # alphabet must raise the module's single catchable error, not
    # IndexError.
    for two_symbols in (False, True):
        bw = BitWriter()
        _hdr(bw, 1, 1)
        bw.write(0, 1)        # no transform
        bw.write(0, 1)        # no color cache
        bw.write(0, 1)        # no meta prefix
        for _ in range(4):    # green/red/blue/alpha: simple, symbol 0
            _simple1(bw, 0)
        bw.write(1, 1)        # distance code: simple
        bw.write(1 if two_symbols else 0, 1)
        bw.write(1, 1)        # 8-bit first symbol
        bw.write(200, 8)      # out of range for alphabet 40
        if two_symbols:
            bw.write(5, 8)
        with pytest.raises(NotImplementedError):
            decode_webp_lossless(_vp8l(bw))


# ---- baseline TIFF (uncompressed / PackBits strips) ----------------------

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    _decode_tiff,
    _packbits,
)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Spec-side TIFF LZW encoder (TIFF 6.0 section 13): MSB-first
    codes, EARLY CHANGE -- width moves to 10/11/12 bits when code
    511/1023/2047 is ADDED -- and a ClearCode restart when the table
    reaches 4094."""
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    codes.append((256, width))
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            codes.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    out = bytearray()
    acc = nbits = 0
    for code, cw in codes:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff(img: np.ndarray, endian: str = "<", compression: int = 1,
          rows_per_strip: int | None = None,
          predictor: int = 1) -> bytes:
    """Minimal test-side TIFF writer: 8-bit RGB chunky strips."""
    h, w = img.shape[:2]
    rows_per_strip = rows_per_strip or h
    if predictor == 2:
        d = img.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - img.astype(np.int16)[:, :-1, :]
        img = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = img[y0:y0 + rows_per_strip].tobytes()
        if compression == 32773:
            # trivial PackBits encode: literal runs of <=128 bytes
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i:i + 128]
                out += bytes([len(chunk) - 1]) + chunk
            strips.append(bytes(out))
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression in (8, 32946):
            import zlib
            strips.append(zlib.compress(raw))
        else:
            strips.append(raw)
    entries = []
    extra = bytearray()
    header_len = 8
    n_entries = 9 + (1 if predictor == 2 else 0)
    ifd_len = 2 + 12 * n_entries + 4
    data_base = header_len + ifd_len

    def entry(tag, typ, values, fmt):
        nonlocal extra
        size = {1: 1, 3: 2, 4: 4}[typ] * len(values)
        body = struct.pack(endian + fmt * len(values), *values)
        if size <= 4:
            entries.append((tag, typ, len(values),
                            body.ljust(4, b"\0")))
        else:
            off = data_base + len(extra)
            extra += body
            entries.append((tag, typ, len(values),
                            struct.pack(endian + "I", off)))

    entry(256, 3, [w], "H")
    entry(257, 3, [h], "H")
    entry(258, 3, [8, 8, 8], "H")
    entry(259, 3, [compression], "H")
    entry(262, 3, [2], "H")
    entry(277, 3, [3], "H")
    entry(278, 3, [rows_per_strip], "H")
    if predictor == 2:
        entry(317, 3, [predictor], "H")
    # reserve strip tables in 'extra'
    so_off = data_base + len(extra)
    extra += b"\0" * (4 * len(strips))
    entries.append((273, 4, len(strips),
                    struct.pack(endian + "I", so_off)
                    if len(strips) > 1 else None))
    sc_vals = [len(s) for s in strips]
    if len(strips) > 1:
        sc_off = data_base + len(extra)
        extra += struct.pack(endian + "I" * len(strips), *sc_vals)
        entries.append((279, 4, len(strips),
                        struct.pack(endian + "I", sc_off)))
    else:
        entries.append((279, 4, 1,
                        struct.pack(endian + "I", sc_vals[0])))
    strip_base = data_base + len(extra)
    offs = []
    p = strip_base
    for s_ in strips:
        offs.append(p)
        p += len(s_)
    if len(strips) > 1:
        extra[so_off - data_base:so_off - data_base + 4 * len(strips)] = \
            struct.pack(endian + "I" * len(strips), *offs)
        entries[-2] = (273, 4, len(strips),
                       struct.pack(endian + "I", so_off))
    else:
        entries[-2] = (273, 4, 1, struct.pack(endian + "I", offs[0]))
    entries.sort(key=lambda t: t[0])
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    out = magic + struct.pack(endian + "I", 8)
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(endian + "HHI", tag, typ, cnt) + val
    out += struct.pack(endian + "I", 0)  # no next IFD
    return out + bytes(extra) + b"".join(strips)


def test_tiff_uncompressed_both_endians_and_strips():
    img = _grad(5, 4)
    for endian in ("<", ">"):
        assert np.array_equal(decode_image(_tiff(img, endian)), img)
    # multi-strip (2 rows per strip -> 3 strips)
    assert np.array_equal(
        decode_image(_tiff(img, "<", rows_per_strip=2)), img)


def test_tiff_packbits_decode():
    img = _grad(3, 7)
    assert np.array_equal(
        decode_image(_tiff(img, "<", compression=32773)), img)
    # packbits repeat form: 257-n repeats
    assert _packbits(bytes([0xFE, 7, 0x01, 1, 2]), 5) == bytes(
        [7, 7, 7, 1, 2])
    with pytest.raises(NotImplementedError):
        _packbits(bytes([0x05, 1, 2]), 10)  # truncated


def test_tiff_unsupported_raises():
    img = _grad(2, 2)
    good = bytearray(_tiff(img))
    # flip compression tag (259) to LZW (5)
    i = good.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    good[i + 8:i + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError):
        _decode_tiff(bytes(good))
    with pytest.raises(NotImplementedError):
        _decode_tiff(b"II*\x00" + b"\0" * 3)  # truncated


# ---- VP8L predictor / cross-color transforms (round 8) -------------------

def _i8t(v):
    return v - 256 if v >= 128 else v


def _sub_px(a, b):
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _ref_predict(mode, L, T, TL, TR):
    """Spec-side forward reference of the 14 VP8L predictor modes --
    written independently of the decoder (per-channel tuples, no
    SWAR)."""
    def ch(p):
        return [(p >> s) & 0xFF for s in (24, 16, 8, 0)]

    def pack(cs):
        return sum(c << s for c, s in zip(cs, (24, 16, 8, 0)))

    def avg(a, b):
        return [(x + y) // 2 for x, y in zip(ch(a), ch(b))]

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
        return pack([(a + t) // 2 for a, t in zip(avg(L, TR), ch(T))])
    if mode == 6:
        return pack(avg(L, TL))
    if mode == 7:
        return pack(avg(L, T))
    if mode == 8:
        return pack(avg(TL, T))
    if mode == 9:
        return pack(avg(T, TR))
    if mode == 10:
        a, b = avg(L, TL), avg(T, TR)
        return pack([(x + y) // 2 for x, y in zip(a, b)])
    if mode == 11:
        p = [lv + tv - tlv for lv, tv, tlv in zip(ch(L), ch(T), ch(TL))]
        pl = sum(abs(pv - lv) for pv, lv in zip(p, ch(L)))
        pt = sum(abs(pv - tv) for pv, tv in zip(p, ch(T)))
        return L if pl < pt else T
    if mode == 12:
        return pack([max(0, min(255, lv + tv - tlv))
                     for lv, tv, tlv in zip(ch(L), ch(T), ch(TL))])
    a = avg(L, T)
    out = []
    for av, tlv in zip(a, ch(TL)):
        d = av - tlv
        out.append(max(0, min(255, av + int(d / 2))))
    return pack(out)


def _forward_predictor(final, w, h, size_bits, bw_t, modes):
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else final[i - 1]
            elif x == 0:
                pred = final[i - w]
            else:
                m = modes[(y >> size_bits) * bw_t + (x >> size_bits)]
                pred = _ref_predict(m, final[i - 1], final[i - w],
                                    final[i - w - 1], final[i - w + 1])
            res.append(_sub_px(final[i], pred))
    return res


def _forward_cross_color(final, w, h, size_bits, bw_t, elems):
    out = []
    for y in range(h):
        for x in range(w):
            p = final[y * w + x]
            e = elems[(y >> size_bits) * bw_t + (x >> size_bits)]
            g2r, g2b, r2b = (_i8t(e & 0xFF), _i8t((e >> 8) & 0xFF),
                             _i8t((e >> 16) & 0xFF))
            a, r = (p >> 24) & 0xFF, (p >> 16) & 0xFF
            g, b = (p >> 8) & 0xFF, p & 0xFF
            rs = (r - ((g2r * _i8t(g)) >> 5)) & 0xFF
            bs = (b - ((g2b * _i8t(g)) >> 5) - ((r2b * _i8t(r)) >> 5)) \
                & 0xFF
            out.append((a << 24) | (rs << 16) | (g << 8) | bs)
    return out


def _argb_img(w, h, seed=3):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h * w, 3))
    return [(0xFF << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
            for r, g, b in px]


def _write_sub_image(bw, greens):
    """Entropy-code a transform sub-image whose pixels are
    (0xFF<<24 | green<<8): green carries the mode/element byte."""
    bw.write(0, 1)  # no color cache
    if len(set(greens)) == 1:
        _simple1(bw, greens[0])
        gcodes = None
    else:
        lens = _lens(sorted(set(greens)), _VP8L_GREEN)
        gcodes = _w_prefix(bw, lens)
    for pref_sym in (0, 0, 0xFF):  # red, blue, alpha single-symbol
        _simple1(bw, pref_sym)
    _simple1(bw, 0)  # distance
    if gcodes is not None:
        for g in greens:
            _emit(bw, gcodes, g)


def _write_sub_image_argb(bw, pixels):
    """Sub-image writer for arbitrary ARGB element pixels (cross-color
    elements use red+green+blue channels)."""
    bw.write(0, 1)
    greens = [(p >> 8) & 0xFF for p in pixels]
    reds = [(p >> 16) & 0xFF for p in pixels]
    blues = [p & 0xFF for p in pixels]
    alphas = [(p >> 24) & 0xFF for p in pixels]
    chans = []
    for vals, size in ((greens, _VP8L_GREEN), (reds, 256), (blues, 256),
                       (alphas, 256)):
        if len(set(vals)) == 1:
            _simple1(bw, vals[0])
            chans.append(None)
        else:
            chans.append(_w_prefix(bw, _lens(sorted(set(vals)), size)))
    _simple1(bw, 0)  # distance
    for i in range(len(pixels)):
        for vals, codes in zip((greens, reds, blues, alphas), chans):
            if codes is not None:
                _emit(bw, codes, vals[i])


def _write_main_pixels(bw, pixels):
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    greens = [(p >> 8) & 0xFF for p in pixels]
    reds = [(p >> 16) & 0xFF for p in pixels]
    blues = [p & 0xFF for p in pixels]
    alphas = [(p >> 24) & 0xFF for p in pixels]
    chans = []
    for vals, size in ((greens, _VP8L_GREEN), (reds, 256), (blues, 256),
                       (alphas, 256)):
        if len(set(vals)) == 1:
            _simple1(bw, vals[0])
            chans.append(None)
        else:
            chans.append(_w_prefix(bw, _lens(sorted(set(vals)), size)))
    _simple1(bw, 0)  # distance
    for i in range(len(pixels)):
        for vals, codes in zip((greens, reds, blues, alphas), chans):
            if codes is not None:
                _emit(bw, codes, vals[i])


def _to_rgb(pixels, w, h):
    arr = np.zeros((h, w, 3), np.uint8)
    for i, p in enumerate(pixels):
        arr[i // w, i % w] = [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]
    return arr


def test_webp_predictor_all_14_modes():
    """Each spatial mode as a single-tile 4x4 image: residuals are
    forward-computed by an independent spec-side reference; decode
    must reproduce the exact pixels (incl. the row-0/column-0 edge
    rules every image exercises)."""
    w = h = 4
    img = _argb_img(w, h)
    for mode in range(14):
        res = _forward_predictor(img, w, h, 2, 1, [mode])
        bw = BitWriter()
        _hdr(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)       # predictor transform
        bw.write(0, 3)       # size_bits = 2 -> 4x4 tiles -> one tile
        _write_sub_image(bw, [mode])
        bw.write(0, 1)       # no more transforms
        _write_main_pixels(bw, res)
        got = decode_webp_lossless(_vp8l(bw))
        assert np.array_equal(got, _to_rgb(img, w, h)), f"mode {mode}"


def test_webp_predictor_multi_tile_and_top_right_edge():
    """8x4 image, 4x4 tiles with DIFFERENT modes (11=Select,
    13=ClampAddSubtractHalf); x=w-1 pixels exercise the
    contiguous-memory top-right rule (TR = current row's first
    pixel)."""
    w, h = 8, 4
    img = _argb_img(w, h, seed=11)
    modes = [11, 13]
    res = _forward_predictor(img, w, h, 2, 2, modes)
    bw = BitWriter()
    _hdr(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(0, 3)           # size_bits=2 -> two 4x4 tiles
    _write_sub_image(bw, modes)
    bw.write(0, 1)
    _write_main_pixels(bw, res)
    got = decode_webp_lossless(_vp8l(bw))
    assert np.array_equal(got, _to_rgb(img, w, h))


def test_webp_cross_color_transform():
    """4x4 single-tile cross-color: multipliers g2r=+64, g2b=-112,
    r2b=-1 (int8 semantics, blue's red term on the restored red);
    stored channels forward-computed spec-side."""
    w = h = 4
    img = _argb_img(w, h, seed=5)
    elem = (0xFF << 24) | (0xFF << 16) | (0x90 << 8) | 0x40
    res = _forward_cross_color(img, w, h, 2, 1, [elem])
    bw = BitWriter()
    _hdr(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)           # cross-color transform
    bw.write(0, 3)           # size_bits = 2
    _write_sub_image_argb(bw, [elem])
    bw.write(0, 1)
    _write_main_pixels(bw, res)
    got = decode_webp_lossless(_vp8l(bw))
    assert np.array_equal(got, _to_rgb(img, w, h))


def test_webp_cross_color_then_subtract_green_compose():
    """Two transforms in one stream: forward order cross-color then
    subtract-green (stream read order), decoder inverts in reverse."""
    w = h = 4
    img = _argb_img(w, h, seed=9)
    elem = (0xFF << 24) | (0x20 << 16) | (0xE0 << 8) | 0x7F
    stage1 = _forward_cross_color(img, w, h, 2, 1, [elem])
    stored = []
    for p in stage1:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        stored.append((p & 0xFF00FF00) | (r << 16) | b)
    bw = BitWriter()
    _hdr(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)           # cross-color first in stream order
    bw.write(0, 3)
    _write_sub_image_argb(bw, [elem])
    bw.write(1, 1)
    bw.write(2, 2)           # subtract green
    bw.write(0, 1)           # no more transforms
    _write_main_pixels(bw, stored)
    got = decode_webp_lossless(_vp8l(bw))
    assert np.array_equal(got, _to_rgb(img, w, h))


def test_webp_invalid_predictor_mode_raises():
    bw = BitWriter()
    _hdr(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(0, 3)
    _write_sub_image(bw, [14])   # mode 14 does not exist
    bw.write(0, 1)
    _write_main_pixels(bw, [0xFF000000] * 4)
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(_vp8l(bw))


# ---- TIFF LZW (round 8) ---------------------------------------------------

def test_tiff_lzw_hand_packed_golden():
    """Hand-packed 9-bit MSB-first code stream [Clear, 'A', 258(KwKwK),
    'B', EOI] -> 'AAAB' -- every byte derived by hand in the round-8
    notes: 0x80 0x10 0x60 0x44 0x28 0x08."""
    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        _tiff_lzw,
    )

    data = bytes([0x80, 0x10, 0x60, 0x44, 0x28, 0x08])
    assert _tiff_lzw(data, 4) == b"AAAB"
    with pytest.raises(NotImplementedError):
        _tiff_lzw(data, 10)  # stream ends before 10 bytes exist


def test_tiff_lzw_roundtrip_crosses_width_boundaries():
    """Random strip large enough to push the code table past 511 and
    1023 entries -- the early-change width bumps are exactly where a
    GIF-style decoder diverges, so a byte-exact round-trip pins them."""
    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        _tiff_lzw,
    )

    rng = np.random.RandomState(4)
    raw = rng.randint(0, 256, 40 * 40 * 3).astype(np.uint8).tobytes()
    enc = _lzw_encode_tiff(raw)
    assert _tiff_lzw(enc, len(raw)) == raw
    # and end-to-end through the TIFF container, both endians
    img = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    for endian in ("<", ">"):
        assert np.array_equal(
            decode_image(_tiff(img, endian, compression=5)), img)


def test_tiff_lzw_multistrip_and_predictor():
    img = _grad(9, 5)
    # multi-strip LZW (each strip is an independent LZW stream)
    p = _tiff(img, compression=5, rows_per_strip=4)
    assert np.array_equal(decode_image(p), img)
    # horizontal-differencing predictor (tag 317=2) composes with LZW
    p2 = _tiff(img, compression=5, predictor=2)
    assert np.array_equal(decode_image(p2), img)
    # and with no compression
    p3 = _tiff(img, compression=1, predictor=2)
    assert np.array_equal(decode_image(p3), img)


def test_tiff_lzw_table_clear_restart():
    """A strip long and varied enough to force the encoder's 4094-entry
    ClearCode restart; the decoder must reset width and table."""
    rng = np.random.RandomState(8)
    raw = rng.randint(0, 256, 24000).astype(np.uint8).tobytes()
    enc = _lzw_encode_tiff(raw)
    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        _tiff_lzw,
    )
    assert _tiff_lzw(enc, len(raw)) == raw


# ---- progressive JPEG (SOF2, round 8) -------------------------------------

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402,E501
    encode_jpeg_progressive,
)


def test_jpeg_progressive_matches_sequential_exactly():
    """The progressive encoder writes the SAME quantized coefficients
    as the sequential encoder through a 6-scan progressive script
    (interleaved DC first/refine at Al=1->0, per-component spectral
    bands 1-5 / 6-63 first+refine), so the decoded pixels must be
    BIT-IDENTICAL to decoding the sequential file -- any divergence in
    EOB runs, ZRL handling, correction bits, or successive
    approximation shows up as a pixel diff."""
    rng = np.random.RandomState(21)
    noise = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:24, 0:17]
    smooth = np.stack([(yy * 5) % 256, (xx * 9) % 256,
                       ((yy + xx) * 3) % 256], axis=2).astype(np.uint8)
    for img in (noise, smooth):
        for quant in (1, 8, 24):
            for sub in (False, True):
                seq = decode_image(encode_jpeg(img, quant=quant,
                                               subsample=sub))
                pro = decode_image(encode_jpeg_progressive(
                    img, quant=quant, subsample=sub))
                assert np.array_equal(seq, pro), (quant, sub)


def test_jpeg_progressive_restart_markers():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (20, 20, 3)).astype(np.uint8)
    seq = decode_image(encode_jpeg(img, quant=8))
    pro = decode_image(encode_jpeg_progressive(img, quant=8,
                                               restart_interval=2))
    assert np.array_equal(seq, pro)


def test_jpeg_progressive_truncated_raises():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(img, quant=8)
    with pytest.raises(NotImplementedError):
        decode_image(p[:len(p) // 2])


def test_jpeg_progressive_zrl_in_refinement():
    """A high-frequency checkerboard concentrates energy at zigzag
    index 63, so in the 6..63 refinement band the new +-1 coefficient
    sits behind 50+ zero-history positions -- forcing the ZRL
    (skip-16-zero-history) path of the refinement decoder (verified by
    branch tracing to fire here)."""
    yy, xx = np.mgrid[0:16, 0:16]
    checker = (128 + 9 * ((-1.0) ** (xx + yy))).astype(np.uint8)
    img = np.stack([checker] * 3, axis=2)
    for quant in (8, 24, 32):
        seq = decode_image(encode_jpeg(img, quant=quant))
        pro = decode_image(encode_jpeg_progressive(img, quant=quant))
        assert np.array_equal(seq, pro), quant


def _tiff_tiled(img: np.ndarray, endian: str = "<", compression: int = 1,
                tw: int = 4, th: int = 4, predictor: int = 1,
                drop_last_tile: bool = False) -> bytes:
    """Test-side tiled TIFF writer (TIFF 6.0 section 15): fixed-size
    edge-padded tiles, per-tile predictor, row-major tile order."""
    h, w = img.shape[:2]
    spp = img.shape[2]
    across, down = -(-w // tw), -(-h // th)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            tile = np.zeros((th, tw, spp), dtype=np.uint8)
            sub = img[ty * th:ty * th + th, tx * tw:tx * tw + tw]
            tile[:sub.shape[0], :sub.shape[1]] = sub
            if predictor == 2:
                d = tile.astype(np.int16)
                d[:, 1:, :] -= tile.astype(np.int16)[:, :-1, :]
                tile = (d & 0xFF).astype(np.uint8)
            raw = tile.tobytes()
            if compression == 5:
                raw = _lzw_encode_tiff(raw)
            elif compression == 32773:
                out = bytearray()
                for i in range(0, len(raw), 128):
                    chunk = raw[i:i + 128]
                    out += bytes([len(chunk) - 1]) + chunk
                raw = bytes(out)
            tiles.append(raw)
    if drop_last_tile:
        tiles = tiles[:-1]
    n_entries = 10 + (1 if predictor == 2 else 0)
    ifd_len = 2 + 12 * n_entries + 4
    data_base = 8 + ifd_len
    entries = []
    extra = bytearray()

    def entry(tag, typ, values, fmt):
        nonlocal extra
        size = {1: 1, 3: 2, 4: 4}[typ] * len(values)
        body = struct.pack(endian + fmt * len(values), *values)
        if size <= 4:
            entries.append((tag, typ, len(values), body.ljust(4, b"\0")))
        else:
            off = data_base + len(extra)
            extra += body
            entries.append((tag, typ, len(values),
                            struct.pack(endian + "I", off)))

    entry(256, 3, [w], "H")
    entry(257, 3, [h], "H")
    entry(258, 3, [8] * spp, "H")
    entry(259, 3, [compression], "H")
    entry(262, 3, [2 if spp >= 3 else 1], "H")
    entry(277, 3, [spp], "H")
    if predictor == 2:
        entry(317, 3, [2], "H")
    entry(322, 3, [tw], "H")
    entry(323, 3, [th], "H")
    # tile data sits after 'extra'; compute offsets up front
    tile_table_bytes = (4 * len(tiles)) * 2 if len(tiles) > 1 else 0
    tile_base = data_base + len(extra) + tile_table_bytes
    offs, p = [], tile_base
    for t in tiles:
        offs.append(p)
        p += len(t)
    entry(324, 4, offs, "I")
    entry(325, 4, [len(t) for t in tiles], "I")
    entries.sort(key=lambda t: t[0])
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    out = magic + struct.pack(endian + "I", 8)
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(endian + "HHI", tag, typ, cnt) + val
    out += struct.pack(endian + "I", 0)
    return out + bytes(extra) + b"".join(tiles)


def test_tiff_tiled_assembles_edge_padded_tiles():
    """5x7 RGB with 4x4 tiles -> 2x2 tile grid with right+bottom
    padding that must be clipped away; both byte orders."""
    img = _grad(5, 7)
    for endian in ("<", ">"):
        assert np.array_equal(
            decode_image(_tiff_tiled(img, endian, tw=4, th=4)), img)
    # single-tile layout (inline offset/count tags)
    assert np.array_equal(
        decode_image(_tiff_tiled(img, "<", tw=8, th=8)), img)


def test_tiff_tiled_lzw_predictor_and_packbits():
    """Per-tile LZW with horizontal predictor (resets each tile), and
    per-tile PackBits."""
    img = _grad(6, 9)
    got = decode_image(_tiff_tiled(img, "<", compression=5,
                                   tw=4, th=4, predictor=2))
    assert np.array_equal(got, img)
    got = decode_image(_tiff_tiled(img, "<", compression=32773,
                                   tw=4, th=4))
    assert np.array_equal(got, img)


def test_tiff_tiled_guards():
    """Tile-count mismatch and truncated tile data raise the one
    catchable error."""
    img = _grad(5, 7)
    with pytest.raises(NotImplementedError):
        decode_image(_tiff_tiled(img, "<", tw=4, th=4,
                                 drop_last_tile=True))
    p = bytearray(_tiff_tiled(img, "<", tw=4, th=4))
    with pytest.raises(NotImplementedError):
        decode_image(bytes(p[:-10]))


def test_wav_g711_all_256_bytes_vs_reference():
    """Exhaustive: every mu-law and A-law byte decodes identically to an
    independent in-test implementation of the published G.711 expansion
    (the Sun g711.c reference arithmetic)."""
    def ulaw_ref(b):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw_ref(b):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    all_bytes = bytes(range(256))
    su, _ = decode_wav(_wav(7, 1, 8000, 1, 8, all_bytes))
    sa, _ = decode_wav(_wav(6, 1, 8000, 1, 8, all_bytes))
    assert list(su[:, 0]) == [ulaw_ref(b) for b in range(256)]
    assert list(sa[:, 0]) == [alaw_ref(b) for b in range(256)]
    # symmetry sanity: the two sign halves mirror exactly
    assert list(su[:128, 0]) == [-v for v in su[128:, 0]]


def test_wav_ms_adpcm_negative_predictor_truncates_toward_zero():
    """The spec's /256 is C division (truncation toward ZERO, not
    floor): with coeffs (240, 0), s1 = -3, a zero nibble predicts
    trunc(-720/256) = -2; floor semantics would give -3."""
    block = (bytes([4]) + struct.pack("<h", 16) + struct.pack("<h", -3)
             + struct.pack("<h", 7) + bytes([0x00]))
    s, _ = decode_wav(_wav(2, 1, 8000, len(block), 4, block))
    # nibble 1: pred after first = -2; second nibble 0:
    # trunc(-2*240/256) = trunc(-1.875) = -1
    assert list(s[:, 0]) == [7, -3, -2, -1]


def _tiff_jpeg(segments: list[bytes], w: int, h: int, endian: str = "<",
               rows_per_strip: int | None = None,
               tile_wh: tuple[int, int] | None = None,
               jpeg_tables: bytes | None = None,
               photometric: int = 6) -> bytes:
    """Test-side new-style-JPEG TIFF writer (compression 7): strip or
    tile layout, optional shared JPEGTables tag (type UNDEFINED)."""
    # tags: 256,257,258,259,262,277 (+278,273,279 strips |
    # +322,323,324,325 tiles) (+347 shared tables)
    n_entries = 6 + (4 if tile_wh else 3) + (1 if jpeg_tables else 0)
    ifd_len = 2 + 12 * n_entries + 4
    data_base = 8 + ifd_len
    entries = []
    extra = bytearray()

    def entry(tag, typ, values, fmt):
        nonlocal extra
        size = {1: 1, 3: 2, 4: 4, 7: 1}[typ] * len(values)
        body = struct.pack(endian + fmt * len(values), *values)
        if size <= 4:
            entries.append((tag, typ, len(values), body.ljust(4, b"\0")))
        else:
            off = data_base + len(extra)
            extra += body
            entries.append((tag, typ, len(values),
                            struct.pack(endian + "I", off)))

    entry(256, 3, [w], "H")
    entry(257, 3, [h], "H")
    entry(258, 3, [8, 8, 8], "H")
    entry(259, 3, [7], "H")
    entry(262, 3, [photometric], "H")  # 6=YCbCr default
    entry(277, 3, [3], "H")
    if jpeg_tables:
        entry(347, 7, list(jpeg_tables), "B")
    if tile_wh:
        entry(322, 3, [tile_wh[0]], "H")
        entry(323, 3, [tile_wh[1]], "H")
        off_tag, cnt_tag = 324, 325
    else:
        entry(278, 3, [rows_per_strip or h], "H")
        off_tag, cnt_tag = 273, 279
    table_bytes = (4 * len(segments)) * 2 if len(segments) > 1 else 0
    seg_base = data_base + len(extra) + table_bytes
    offs, p = [], seg_base
    for seg in segments:
        offs.append(p)
        p += len(seg)
    entry(off_tag, 4, offs, "I")
    entry(cnt_tag, 4, [len(s) for s in segments], "I")
    entries.sort(key=lambda t: t[0])
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    out = magic + struct.pack(endian + "I", 8)
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(endian + "HHI", tag, typ, cnt) + val
    out += struct.pack(endian + "I", 0)
    return out + bytes(extra) + b"".join(segments)


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a JPEG stream into (JPEGTables blob, abbreviated stream):
    DQT/DHT segments move into SOI+tables+EOI; the rest keeps its
    order. The TIFF-EP shared-tables layout."""
    pos, tables, rest = 2, bytearray(), bytearray(b"\xff\xd8")
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xD9:  # EOI
            rest += stream[pos:pos + 2]
            break
        if marker == 0xDA:  # SOS: rest of stream is entropy data
            rest += stream[pos:]
            break
        size = struct.unpack_from(">H", stream, pos + 2)[0]
        seg = stream[pos:pos + 2 + size]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + size
    return b"\xff\xd8" + bytes(tables) + b"\xff\xd9", bytes(rest)


def test_tiff_jpeg_strips_match_direct_decode():
    """Compression-7 strips: assembling per-strip JPEG decodes must
    equal decoding the TIFF; both endians; multi-strip with an edge
    strip shorter than rows_per_strip."""
    img = _grad(13, 12)
    strips, parts = [], []
    for y0 in range(0, 13, 5):
        sub = img[y0:y0 + 5]
        enc = encode_jpeg(sub, quant=2)
        strips.append(enc)
        parts.append(decode_image(enc)[:sub.shape[0], :12])
    want = np.vstack(parts)
    for endian in ("<", ">"):
        p = _tiff_jpeg(strips, 12, 13, endian, rows_per_strip=5)
        assert np.array_equal(decode_image(p), want)


def test_tiff_jpeg_tiles_and_shared_tables():
    """Compression-7 tiles with the shared JPEGTables tag: DQT/DHT live
    once in tag 347, each tile stream is abbreviated; result equals the
    unsplit per-tile decodes clipped to the image."""
    img = _grad(10, 14)
    tw = th = 8
    tiles, full_tiles = [], []
    tables_blob = None
    for ty in range(2):
        for tx in range(2):
            tile = np.zeros((th, tw, 3), dtype=np.uint8)
            sub = img[ty * th:ty * th + th, tx * tw:tx * tw + tw]
            tile[:sub.shape[0], :sub.shape[1]] = sub
            enc = encode_jpeg(tile, quant=2)
            tables_blob, abbrev = _jpeg_split_tables(enc)
            tiles.append(abbrev)
            full_tiles.append(decode_image(enc))
    want = np.zeros((10, 14, 3), dtype=np.uint8)
    for idx, dec in enumerate(full_tiles):
        r0, c0 = (idx // 2) * th, (idx % 2) * tw
        want[r0:r0 + th, c0:c0 + tw] = dec[:10 - r0, :14 - c0]
    p = _tiff_jpeg(tiles, 14, 10, "<", tile_wh=(tw, th),
                   jpeg_tables=tables_blob)
    assert np.array_equal(decode_image(p), want)


def test_tiff_jpeg_guards():
    """Old-style JPEG (compression 6) still raises; a segment without
    SOI raises; malformed JPEGTables raises."""
    img = _grad(4, 4)
    enc = encode_jpeg(img, quant=2)
    good = _tiff_jpeg([enc], 4, 4)
    assert np.array_equal(decode_image(good),
                          decode_image(enc)[:4, :4])
    # compression 6: patch the tag value (259 type 3 inline LE)
    bad6 = bytearray(good)
    i = bad6.find(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", bad6, i + 8, 6)
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad6))
    # no SOI in the segment
    with pytest.raises(NotImplementedError):
        decode_image(_tiff_jpeg([b"\x00" * 16], 4, 4))
    # malformed JPEGTables
    with pytest.raises(NotImplementedError):
        decode_image(_tiff_jpeg([enc], 4, 4, jpeg_tables=b"\x01\x02"))
    # RGB photometric (262=2, TIFF-EP): _decode_jpeg would YCbCr-shift
    # the colors, so the decoder must refuse rather than silently skew
    with pytest.raises(NotImplementedError):
        decode_image(_tiff_jpeg([enc], 4, 4, photometric=2))
    # grayscale photometric (1) stays accepted alongside YCbCr (6)
    assert decode_image(_tiff_jpeg([enc], 4, 4, photometric=1)) is not None


def test_codec_mutation_fuzz_new_formats():
    """Deep-parser hardening for the round-9 formats: take structurally
    VALID G.711 / MS-ADPCM / IMA-ADPCM WAVs and tiled / JPEG-in-TIFF
    images, then flip bytes, truncate, and extend (seeded, 1200
    mutants) -- decode must succeed or raise exactly
    NotImplementedError, never a raw struct/ValueError/IndexError/
    numpy error, so one corrupt payload can only null its own row."""
    import random

    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        decode_wav,
    )

    img = _grad(10, 14)
    ima_body = struct.pack("<hBB", 0, 0, 0) + bytes(range(16))
    ms_body = (bytes([0]) + struct.pack("<h", 16) + struct.pack("<h", 9)
               + struct.pack("<h", 5) + bytes([0x12, 0x34]))
    enc = encode_jpeg(img, quant=2)
    tables, abbrev = _jpeg_split_tables(enc)
    seeds = [
        (decode_wav, _wav(7, 1, 8000, 1, 8, bytes(range(64)))),
        (decode_wav, _wav(6, 2, 8000, 2, 8, bytes(range(64)))),
        (decode_wav, _wav(2, 1, 8000, len(ms_body), 4, ms_body)),
        (decode_wav, _wav(0x11, 1, 8000, len(ima_body), 4, ima_body,
                          fact=9)),
        (decode_image, _tiff_tiled(img, "<", compression=5, tw=4, th=4,
                                   predictor=2)),
        (decode_image, _tiff_jpeg([enc], 14, 10)),
        (decode_image, _tiff_jpeg([abbrev], 14, 10, jpeg_tables=tables)),
    ]
    rng = random.Random(99)
    for fn, base in seeds:
        for _ in range(1200 // len(seeds)):
            mutant = bytearray(base)
            op = rng.random()
            if op < 0.45:  # flip 1-4 bytes
                for _ in range(rng.randint(1, 4)):
                    mutant[rng.randrange(len(mutant))] = rng.randrange(256)
            elif op < 0.8:  # truncate
                del mutant[rng.randrange(1, len(mutant)):]
            else:  # extend with noise
                mutant += bytes(rng.randrange(256)
                                for _ in range(rng.randint(1, 32)))
            try:
                fn(bytes(mutant))
            except NotImplementedError:
                pass


# --- FLAC ------------------------------------------------------------------

from automated_review_analysis_pipeline_spark.operators.multimodal import (  # noqa: E402
    _crc8_flac,
    _crc16_flac,
    decode_flac,
    encode_flac_pcm8,
)


class _FW:
    """Test-side MSB-first bit writer."""

    def __init__(self):
        self.bits = []

    def w(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def ws(self, value, nbits):
        return self.w(value & ((1 << nbits) - 1), nbits)

    def rice(self, value, param):
        v = (value << 1) ^ (value >> 63) if value >= 0 else \
            ((-value - 1) << 1) + 1 if False else None
        # zigzag: non-negative -> 2v, negative -> -2v-1
        u = (value << 1) if value >= 0 else ((-value) << 1) - 1
        q, r = u >> param, u & ((1 << param) - 1)
        self.bits.extend([0] * q + [1])
        if param:
            self.w(r, param)
        return self

    def bytes(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def _flac_container(frames: list[bytes], n_total: int, channels: int,
                    bps: int, rate: int = 8000,
                    min_bs: int = 16) -> bytes:
    si = _FW()
    si.w(min_bs, 16).w(65535, 16).w(0, 24).w(0, 24)
    si.w(rate, 20).w(channels - 1, 3).w(bps - 1, 5).w(n_total, 36)
    body = si.bytes() + bytes(16)
    return (b"fLaC" + struct.pack(">I", (1 << 31) | len(body)) + body
            + b"".join(frames))


def _frame(subframe_payloads: list["_FW"], blocksize: int, ch_code: int,
           ss_code: int, frame_no: int = 0) -> bytes:
    h = _FW()
    h.w(0x3FFE, 14).w(0, 1).w(0, 1)
    h.w(7, 4)            # 16-bit blocksize at end
    h.w(0, 4)            # rate from STREAMINFO
    h.w(ch_code, 4).w(ss_code, 3).w(0, 1)
    h.w(frame_no, 8)     # UTF-8 frame number (< 128)
    h.w(blocksize - 1, 16)
    hb = h.bytes()
    hb += bytes([_crc8_flac(hb)])
    body = _FW()
    for sf in subframe_payloads:
        body.bits.extend(sf.bits)
    frame = hb + body.bytes()
    return frame + struct.pack(">H", _crc16_flac(frame))


def _sf_constant(value: int, bps: int) -> "_FW":
    return _FW().w(0, 1).w(0, 6).w(0, 1).ws(value, bps)


def _sf_verbatim(samples, bps: int) -> "_FW":
    f = _FW().w(0, 1).w(1, 6).w(0, 1)
    for s in samples:
        f.ws(s, bps)
    return f


def _sf_fixed(samples, order: int, bps: int, param: int = 3,
              porder: int = 0, method: int = 0) -> "_FW":
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
             4: [4, -6, 4, -1]}[order]
    f = _FW().w(0, 1).w(8 + order, 6).w(0, 1)
    for s in samples[:order]:
        f.ws(s, bps)
    resid = [samples[i] - sum(c * samples[i - 1 - j]
                              for j, c in enumerate(coefs))
             for i in range(order, len(samples))]
    f.w(method, 2).w(porder, 4)
    n_parts = 1 << porder
    idx = 0
    pbits = 4 if method == 0 else 5
    for p in range(n_parts):
        n = (len(samples) >> porder) - (order if p == 0 else 0)
        f.w(param, pbits)
        for r in resid[idx:idx + n]:
            f.rice(r, param)
        idx += n
    return f


def test_flac_constant_fixed_orders_and_partitions():
    """CONSTANT and every FIXED order round-trip exactly, across rice
    methods, partition orders, and both rice params."""
    import numpy as np

    bs = 16
    sf = _sf_constant(-7, 8)
    p = _flac_container([_frame([sf], bs, 0, 1)], bs, 1, 8)
    got, rate = decode_flac(p)
    assert rate == 8000 and np.all(got[:, 0] == -7)

    rng = [((i * 13) % 51) - 25 for i in range(bs)]
    for order in (0, 1, 2, 3, 4):
        for porder, method in ((0, 0), (1, 0), (2, 1)):
            sf = _sf_fixed(rng, order, 8, param=4, porder=porder,
                           method=method)
            p = _flac_container([_frame([sf], bs, 0, 1)], bs, 1, 8)
            got, _ = decode_flac(p)
            assert got[:, 0].tolist() == rng, (order, porder, method)


def test_flac_lpc_escape_wasted_bits_and_multiframe():
    """LPC subframes (quantized coefficients + shift), escape-coded raw
    partitions, wasted bits, and multi-frame streams all reconstruct
    exact PCM."""
    import numpy as np

    bs = 16
    samples = [((i * 29) % 41) - 20 for i in range(bs)]
    order, shift, coefs = 2, 2, [5, -2]
    f = _FW().w(0, 1).w(32 + order - 1, 6).w(0, 1)
    for s in samples[:order]:
        f.ws(s, 8)
    f.w(3, 4)          # precision-1 -> 4-bit coefs
    f.ws(shift, 5)
    for c in coefs:
        f.ws(c, 4)
    resid = []
    for i in range(order, bs):
        pred = (coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) \
            >> shift
        resid.append(samples[i] - pred)
    f.w(0, 2).w(0, 4).w(5, 4)
    for r in resid:
        f.rice(r, 5)
    p = _flac_container([_frame([f], bs, 0, 1)], bs, 1, 8)
    got, _ = decode_flac(p)
    assert got[:, 0].tolist() == samples

    # escape partition: raw 7-bit residuals (param 15 in method 0)
    f = _FW().w(0, 1).w(8 + 1, 6).w(0, 1).ws(samples[0], 8)
    f.w(0, 2).w(0, 4).w(15, 4).w(7, 5)
    for i in range(1, bs):
        f.ws(samples[i] - samples[i - 1], 7)
    p = _flac_container([_frame([f], bs, 0, 1)], bs, 1, 8)
    got, _ = decode_flac(p)
    assert got[:, 0].tolist() == samples

    # wasted bits: samples all even -> 1 wasted bit, constant subframe
    f = _FW().w(0, 1).w(0, 6).w(1, 1)
    f.bits.append(1)   # unary 0 -> wasted = 1
    f.ws(-6 >> 1, 7)   # eff = bps - 1 bits
    p = _flac_container([_frame([f], bs, 0, 1)], bs, 1, 8)
    got, _ = decode_flac(p)
    assert np.all(got[:, 0] == -6)

    # two frames concatenated, total truncates the second
    sf1 = _sf_verbatim(samples, 8)
    sf2 = _sf_constant(3, 8)
    p = _flac_container(
        [_frame([sf1], bs, 0, 1, 0), _frame([sf2], bs, 0, 1, 1)],
        bs + 10, 1, 8)
    got, _ = decode_flac(p)
    assert got.shape == (bs + 10, 1)
    assert got[:bs, 0].tolist() == samples and np.all(got[bs:, 0] == 3)


def test_flac_stereo_decorrelation_modes():
    """left/side, right/side, mid/side and independent stereo all
    reconstruct the same (left, right) PCM exactly."""
    bs = 16
    left = [((i * 17) % 61) - 30 for i in range(bs)]
    right = [((i * 7) % 37) - 18 for i in range(bs)]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]

    cases = [
        (1, [_sf_verbatim(left, 8), _sf_verbatim(right, 8)]),        # indep
        (8, [_sf_verbatim(left, 8), _sf_verbatim(side, 9)]),         # L/S
        (9, [_sf_verbatim(side, 9), _sf_verbatim(right, 8)]),        # R/S
        (10, [_sf_verbatim(mid, 8), _sf_verbatim(side, 9)]),         # M/S
    ]
    for ch_code, sfs in cases:
        p = _flac_container([_frame(sfs, bs, ch_code, 1)], bs, 2, 8)
        got, _ = decode_flac(p)
        assert got[:, 0].tolist() == left, ch_code
        assert got[:, 1].tolist() == right, ch_code


def test_flac_guards_and_crc():
    """Corrupt CRC-8/CRC-16, bad sync, reserved codes, truncation, and
    the encoder round-trip all behave per the exact-or-raise contract."""
    data = bytes(range(200)) + b" " * 56
    p = encode_flac_pcm8(data)
    got, rate = decode_flac(p)
    assert rate == 8000
    assert got[:, 0].tolist() == [b - 128 for b in data]

    bad = bytearray(p)
    bad[-1] ^= 0x40            # frame CRC-16
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(bad))
    bad = bytearray(p)
    bad[4 + 4 + 38 + 4] ^= 0x01  # inside frame header -> CRC-8
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(bad))
    with pytest.raises(NotImplementedError):
        decode_flac(p[:-3])    # truncated
    with pytest.raises(NotImplementedError):
        decode_flac(b"fLaX" + p[4:])
    # reserved subframe type (2) inside an otherwise-valid frame
    bs = 8
    f = _FW().w(0, 1).w(2, 6).w(0, 1).ws(0, 8)
    p2 = _flac_container([_frame([f], bs, 0, 1)], bs, 1, 8)
    with pytest.raises(NotImplementedError):
        decode_flac(p2)


def test_flac_mutation_fuzz():
    """Deep-parser hardening for FLAC: byte flips, truncations, and
    extensions of valid streams (verbatim/fixed/LPC/stereo) must decode
    or raise exactly NotImplementedError -- never a raw struct/ValueError/
    IndexError/numpy error. CRC verification makes most flips raise; the
    contract is only about the exception TYPE."""
    import random

    rng = random.Random(10)
    bs = 16
    samples = [((i * 13) % 51) - 25 for i in range(bs)]
    seeds = [
        encode_flac_pcm8(bytes(range(64))),
        _flac_container([_frame([_sf_fixed(samples, 2, 8, 4, 1)],
                                bs, 0, 1)], bs, 1, 8),
        _flac_container([_frame([_sf_verbatim(samples, 8),
                                 _sf_verbatim(samples, 9)],
                                bs, 8, 1)], bs, 2, 8),
    ]
    n_mut = 0
    for seed in seeds:
        for _ in range(150):
            b = bytearray(seed)
            op = rng.randrange(3)
            if op == 0:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1:
                b = b[:rng.randrange(len(b))]
            else:
                b += bytes(rng.randrange(1, 9))
            try:
                decode_flac(bytes(b))
            except NotImplementedError:
                pass
            n_mut += 1
    assert n_mut == 450


def test_tiff_deflate_roundtrip_both_codes_and_predictor():
    """Deflate-compressed TIFF (Adobe code 8 and legacy 32946)
    round-trips pixel-exact, with multi-strip layouts, horizontal
    predictor, and both endians; corrupt zlib streams raise."""
    img = _grad(9, 13)
    for code in (8, 32946):
        for endian in ("<", ">"):
            p = _tiff(img, endian, compression=code, rows_per_strip=4)
            assert np.array_equal(decode_image(p), img), (code, endian)
        p = _tiff(img, "<", compression=code, rows_per_strip=3,
                  predictor=2)
        assert np.array_equal(decode_image(p), img), code
    # corrupt stream: flip a byte inside the first strip's zlib data
    p = bytearray(_tiff(img, "<", compression=8))
    p[-10] ^= 0xFF
    with pytest.raises(NotImplementedError):
        decode_image(bytes(p))


def _pack_bits(values, depth):
    """MSB-first bit packing of one scanline, zero row-end padding."""
    per_byte = 8 // depth
    out = bytearray()
    for i in range(0, len(values), per_byte):
        b = 0
        group = values[i:i + per_byte]
        for j in range(per_byte):
            v = group[j] if j < len(group) else 0
            b |= (v & ((1 << depth) - 1)) << (8 - depth * (j + 1))
        out.append(b)
    return bytes(out)


def test_png_sub_byte_depths_gray_and_palette():
    """1/2/4-bit PNGs decode exactly: gray samples scale to 8-bit
    (255/(2^d-1)), palette indexes look up unscaled, row-end bit
    padding is dropped, filters run on packed bytes (Sub with bpp=1),
    and Adam7 interlace reassembles sub-byte passes."""
    rng = [(i * 7 + 3) % 16 for i in range(13 * 5)]
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        w, h = 13, 5
        vals = [v & mx for v in rng]
        rows = [vals[y * w:(y + 1) * w] for y in range(h)]
        # gray, filter 0
        raw = b"".join(b"\x00" + _pack_bits(r, depth) for r in rows)
        img = decode_image(_png(raw, w, h, 0, depth=depth))
        want = np.array(rows, dtype=np.uint8) * (255 // mx)
        assert np.array_equal(img, np.repeat(
            want[:, :, None], 3, axis=2)), depth

        # palette (indexes mod palette size), filter 2 (Up) on packed
        # bytes
        pal = bytes(v for i in range(mx + 1)
                    for v in ((i * 37) % 256, (i * 59) % 256,
                              (i * 83) % 256))
        packed = [_pack_bits(r, depth) for r in rows]
        filt = bytearray()
        prev = bytes(len(packed[0]))
        for line in packed:
            filt += b"\x02" + bytes((a - b) & 0xFF
                                    for a, b in zip(line, prev))
            prev = line
        img = decode_image(_png(bytes(filt), w, h, 3, plte=pal,
                                depth=depth))
        palarr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
        want = palarr[np.array(rows)]
        assert np.array_equal(img, want), depth

    # Adam7, 4-bit gray: per-pass sub-byte strides
    w, h, depth = 9, 9, 4
    full = np.array([[(x * 3 + y * 5) % 16 for x in range(w)]
                     for y in range(h)], dtype=np.uint8)
    passes = []
    for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                           (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                           (0, 1, 1, 2)):
        sub = full[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in sub:
            passes.append(b"\x00" + _pack_bits(list(r), depth))
    img = decode_image(_png(b"".join(passes), w, h, 0, depth=depth,
                            interlace=1))
    assert np.array_equal(img, np.repeat(
        (full * 17)[:, :, None], 3, axis=2))

    # 2-bit RGB stays illegal
    with pytest.raises(NotImplementedError):
        decode_image(_png(b"\x00" * 10, 2, 2, 2, depth=2))


def test_flac_frame_rate_disagreeing_with_streaminfo_raises():
    """STREAMINFO's rate is authoritative; a frame header carrying a
    CONTRADICTING table rate (CRC-8 fixed up so the header itself is
    valid) is a corrupt stream and must raise the one catchable
    exception."""
    from automated_review_analysis_pipeline_spark.operators.multimodal import (
        _crc8_flac,
        decode_flac,
        encode_flac_pcm8,
    )

    p = bytearray(encode_flac_pcm8(bytes(range(64)), sample_rate=8000))
    # walk metadata blocks after the 4-byte magic to the first frame
    off = 4
    while True:
        last = p[off] & 0x80
        off += 4 + int.from_bytes(p[off + 1:off + 4], "big")
        if last:
            break
    # byte 2 of the frame = bs_code(4) | sr_code(4): set sr_code to 9
    # (= 44100, disagreeing with STREAMINFO's 8000), re-CRC the header
    assert p[off + 2] & 0x0F == 0  # encoder writes "from STREAMINFO"
    p[off + 2] = (p[off + 2] & 0xF0) | 9
    p[off + 7] = _crc8_flac(bytes(p[off:off + 7]))
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="disagrees"):
        decode_flac(bytes(p))


def test_tiff_old_style_jpeg_compression6_pinned_raise():
    """Old-style JPEG-in-TIFF (compression 6, deprecated by TIFF 6.0's
    own errata) is explicitly unsupported: a structurally-valid TIFF
    whose compression tag says 6 must raise the one catchable
    exception BEFORE any strip decode is attempted -- pinned so the
    honest-raise contract can't silently regress into a garbage
    decode."""
    img = _grad(2, 2)
    buf = bytearray(_tiff(img))
    i = buf.find(struct.pack("<HHI", 259, 3, 1))
    assert i > 0
    buf[i + 8:i + 10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError,
                       match="uncompressed, LZW, Deflate"):
        _decode_tiff(bytes(buf))


def _tiff_planar(img, endian="<", compression=1, rows_per_strip=None,
                 predictor=1):
    """Minimal PLANAR (tag 284=2) TIFF writer: 8-bit RGB, per-plane
    strips, optional LZW + horizontal predictor."""
    h, w = img.shape[:2]
    rows_per_strip = rows_per_strip or h
    strips = []
    for p in range(3):
        for y0 in range(0, h, rows_per_strip):
            block = img[y0:y0 + rows_per_strip, :, p]
            if predictor == 2:
                d = block.astype(np.int16).copy()
                d[:, 1:] = d[:, 1:] - block.astype(np.int16)[:, :-1]
                block = (d & 0xFF).astype(np.uint8)
            raw = block.tobytes()
            strips.append(_lzw_encode_tiff(raw) if compression == 5
                          else raw)

    tags = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [8, 8, 8]),
        (259, 3, [compression]), (262, 3, [2]), (277, 3, [3]),
        (278, 3, [rows_per_strip]), (284, 3, [2]),
    ]
    if predictor == 2:
        tags.append((317, 3, [predictor]))
    tags += [(273, 4, [0] * len(strips)), (279, 4,
                                           [len(s) for s in strips])]
    tags.sort()
    ifd_off = 8
    ifd_len = 2 + 12 * len(tags) + 4
    extra = bytearray()
    data_base = ifd_off + ifd_len
    sizes = {3: 2, 4: 4}
    fmts = {3: "H", 4: "I"}

    def render(values, typ):
        nonlocal extra
        body = struct.pack(endian + fmts[typ] * len(values), *values)
        if len(body) <= 4:
            return body.ljust(4, b"\0"), None
        off = data_base + len(extra)
        extra += body
        return struct.pack(endian + "I", off), off

    rendered = []
    strip_off_pos = None
    for tag, typ, vals in tags:
        body, off = render(vals, typ)
        if tag == 273:
            strip_off_pos = (off if off is not None else None, len(vals))
        rendered.append((tag, typ, len(vals), body))
    # lay strips after extra, then backpatch offsets into extra
    strip_base = data_base + len(extra)
    offs, p = [], strip_base
    for s in strips:
        offs.append(p)
        p += len(s)
    if strip_off_pos[0] is not None:
        rel = strip_off_pos[0] - data_base
        extra[rel:rel + 4 * len(strips)] = struct.pack(
            endian + "I" * len(strips), *offs)
    else:  # single strip: inline
        rendered = [(t, ty, c, struct.pack(endian + "I", offs[0])
                     .ljust(4, b"\0")) if t == 273 else (t, ty, c, b)
                    for t, ty, c, b in rendered]
    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(rendered))
    for tag, typ, cnt, body in rendered:
        out += struct.pack(endian + "HHI", tag, typ, cnt) + body
    out += struct.pack(endian + "I", 0)
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def test_tiff_planar_configuration_decodes():
    """Planar TIFF (284=2): per-plane strip tables, both endians,
    multi-strip, LZW + horizontal predictor (per plane) -- all must
    decode pixel-identically to the chunky layout of the same image;
    planar tiles stay an honest raise."""
    img = _grad(5, 4)
    want = _decode_tiff(_tiff(img))
    for endian in ("<", ">"):
        for comp, pred in ((1, 1), (5, 1), (5, 2)):
            for rps in (None, 2):
                got = _decode_tiff(_tiff_planar(
                    img, endian=endian, compression=comp,
                    rows_per_strip=rps, predictor=pred))
                assert (got == want).all(), (endian, comp, pred, rps)
