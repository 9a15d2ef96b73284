"""Real-codec tier (X13): built-in PNG/PPM/WAV codecs must decode
correctly (golden pixels, every PNG filter type), round-trip through
encode, and drive the Spark-side multimodal operators end-to-end —
real decode for supported containers, deterministic byte fallback for the
fixture path, strict-mode errors only for genuinely unsupported payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalakefoundation_spark.ext import codecs
from datalakefoundation_spark.ext import multimodal as MM


# ---------------------------------------------------------------- PNG golden


def _manual_png(filters: list[int], pixels: np.ndarray) -> bytes:
    """Hand-build a PNG whose scanlines use the GIVEN filter types, applying
    each filter's forward transform per the spec — exercises the decoder's
    reconstruction paths independently of our encoder (which only emits
    filter 0)."""
    h, w, c = pixels.shape
    assert len(filters) == h
    out = bytearray()
    prior = np.zeros(w * c, dtype=np.int32)
    for y, f in enumerate(filters):
        cur = pixels[y].reshape(-1).astype(np.int32)
        line = np.zeros_like(cur)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prior[x]
            cc = prior[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out.extend(line.astype(np.uint8).tobytes())
        prior = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_every_filter_type():
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _manual_png([0, 1, 2, 3, 4], pixels)
    got = codecs.png_decode(png)
    assert got.shape == (5, 4, 3)
    np.testing.assert_array_equal(got, pixels)


def test_png_known_2x2_golden():
    # 2x2 RGB: red, green / blue, white — filter 0 everywhere
    pixels = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    png = codecs.png_encode(pixels)
    assert png[:8] == codecs.PNG_SIG
    np.testing.assert_array_equal(codecs.png_decode(png), pixels)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    rng = np.random.default_rng(channels)
    pixels = rng.integers(0, 256, size=(9, 7, channels), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.png_decode(codecs.png_encode(pixels)), pixels)


def test_png_rejects_unsupported():
    with pytest.raises(codecs.UnsupportedMedia):
        codecs.png_decode(b"not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        codecs.PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(codecs.UnsupportedMedia):
        codecs.png_decode(bad)


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    ppm = codecs.ppm_encode(pixels)
    np.testing.assert_array_equal(codecs.ppm_decode(ppm), pixels)
    # header comments are legal PPM
    commented = ppm.replace(b"P6\n", b"P6\n# comment line\n", 1)
    np.testing.assert_array_equal(codecs.ppm_decode(commented), pixels)


def test_wav_roundtrip():
    t = np.linspace(0, 1, 1600, dtype=np.float32)
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    wav = codecs.wav_encode(mono, rate=1600)
    samples, rate = codecs.wav_decode(wav)
    assert rate == 1600 and samples.shape == (1600, 1)
    np.testing.assert_allclose(samples[:, 0], mono, atol=1e-3)


def test_resize_nearest_exact():
    pixels = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = codecs.resize_nearest(pixels, 8, 8)
    assert up.shape == (8, 8, 1)
    # each source pixel becomes a 2x2 block
    np.testing.assert_array_equal(up[0:2, 0:2, 0], np.full((2, 2), 0))
    np.testing.assert_array_equal(up[6:8, 6:8, 0], np.full((2, 2), 15))
    down = codecs.resize_nearest(up, 4, 4)
    np.testing.assert_array_equal(down, pixels)


def test_image_features_real_values():
    # pure red image: mean R=1, G=B=0; histogram mass in the 85/255 bin
    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    f = codecs.image_features(red, 16)
    assert len(f) == 16
    assert f[0] == pytest.approx(1.0)  # mean R
    assert f[1] == f[2] == pytest.approx(0.0)  # mean G, B
    assert f[3] == f[4] == f[5] == pytest.approx(0.0)  # flat -> std 0
    assert f[14] == pytest.approx(1.0)  # square aspect
    assert f[15] == pytest.approx(0.0)  # no gradient
    lum_hist = f[6:14]
    assert sum(lum_hist) == pytest.approx(1.0)


def test_sniff():
    assert codecs.sniff(codecs.png_encode(np.zeros((1, 1, 3), np.uint8))) == "png"
    assert codecs.sniff(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert codecs.sniff(codecs.wav_encode(np.zeros(4, np.float32))) == "wav"
    assert codecs.sniff(b"plain text bytes") is None


# ---------------------------------------------------------- Spark end-to-end


def _media_df(spark):
    rng = np.random.default_rng(11)
    png = codecs.png_encode(rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8))
    wav = codecs.wav_encode(
        0.3 * np.sin(np.linspace(0, 40, 800, dtype=np.float32)), rate=800
    )
    rows = [
        (1, bytearray(png), "image"),
        (2, bytearray(wav), "audio"),
        (3, bytearray(b"opaque text payload"), "image"),
        (4, None, "image"),
    ]
    return spark.createDataFrame(
        rows, "media_id long, content binary, media_type string"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(10).alias("width"),
            F.lit(12).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("png").alias("codec"),
        ),
    )


def test_extract_features_real_decode_in_spark(spark):
    out = {r["media_id"]: r for r in MM.extract_features(_media_df(spark)).collect()}
    png_row, wav_row, txt_row, null_row = out[1], out[2], out[3], out[4]
    # the PNG row must match a local real decode, not the byte fallback
    local_png = codecs.image_features(
        codecs.png_decode(bytes(_media_df(spark).where("media_id=1").head()["content"])),
        MM.FEATURE_DIM,
    )
    assert png_row["features"] == pytest.approx(local_png)
    assert png_row["features"] != pytest.approx(
        MM._fake_decode(bytes(_media_df(spark).where("media_id=1").head()["content"]))
    )
    assert len(wav_row["features"]) == MM.FEATURE_DIM
    assert wav_row["features"][0] > 0  # real RMS of a sine, not a hash byte
    # unknown container -> deterministic byte fallback
    assert txt_row["features"] == pytest.approx(
        MM._fake_decode(b"opaque text payload")
    )
    assert null_row["features"] is None and null_row["n_bytes"] == 0


def test_extract_features_strict_raises_only_for_unknown(spark):
    from pyspark.errors.exceptions.captured import PythonException

    df = _media_df(spark)
    good = MM.extract_features(df.where("media_id in (1, 2, 4)"), strict=True)
    assert good.count() == 3  # real containers + NULL decode fine in strict
    bad = MM.extract_features(df.where("media_id = 3"), strict=True)
    with pytest.raises(PythonException, match="UnsupportedMedia|not recognized"):
        bad.collect()


def test_resize_images_real_pixels_in_spark(spark):
    df = _media_df(spark).where("media_id = 1")
    src = codecs.png_decode(bytes(df.head()["content"]))
    out = MM.resize_images(df, 5, 6).head()
    got = codecs.png_decode(bytes(out["content"]))
    assert got.shape == (6, 5, 3)
    np.testing.assert_array_equal(got, codecs.resize_nearest(src, 5, 6))
    assert out["meta"]["width"] == 5 and out["meta"]["height"] == 6
    # unknown container passes through unchanged in non-strict mode
    txt = MM.resize_images(_media_df(spark).where("media_id = 3"), 5, 6).head()
    assert bytes(txt["content"]) == b"opaque text payload"


# ---------------------------------------------------------------- GIF


def _anim_frames():
    rng = np.random.default_rng(21)
    base = rng.integers(0, 4, size=(8, 6, 3), dtype=np.uint8) * 60
    frames = []
    for i in range(5):
        f = base.copy()
        f[i % 8, :, :] = [255, 0, 0]  # moving red stripe
        frames.append(f)
    return frames


def test_gif_roundtrip_frames():
    frames = _anim_frames()
    gif = codecs.gif_encode(frames, delay_ms=200)
    assert codecs.sniff(gif) == "gif"
    got, delays = codecs.gif_decode_frames(gif)
    assert len(got) == 5 and delays == [200] * 5
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_gif_lzw_decoder_handles_real_compression():
    """The literal encoder never grows the LZW table; feed the decoder a
    stream that DOES exercise table growth by building it manually from
    the spec's algorithm (compress a repetitive index run)."""
    # classic LZW compress (GIF variant) of a repetitive sequence
    min_code = 2
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    seq = [0, 1, 0, 1, 0, 1, 0, 1, 2, 3] * 20
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    codes = [clear]
    buf = tuple()
    for s in seq:
        if buf + (s,) in table:
            buf = buf + (s,)
            continue
        codes.append(table[buf])
        table[buf + (s,)] = next_code
        next_code += 1
        buf = (s,)
    codes.append(table[buf])
    codes.append(eoi)
    # pack with growing width mirroring the decoder's growth rule
    out = bytearray()
    acc = bits = 0
    width = min_code + 1
    emitted = 0
    next_code = eoi + 1
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if emitted > 0 and c not in (clear, eoi):
            # decoder adds one table entry per code after the first;
            # mirror its width-growth trigger
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        if c == clear:
            next_code = eoi + 1
            width = min_code + 1
            emitted = 0
            continue
        emitted += 1
    if bits:
        out.append(acc & ((1 << bits) - 1))
    got = codecs._lzw_decode(min_code, bytes(out))
    assert got == seq


def test_frame_sample_real_gif_in_spark(spark):
    frames = _anim_frames()
    gif = codecs.gif_encode(frames, delay_ms=400)
    df = spark.createDataFrame(
        [
            (7, bytearray(gif), "video"),
            (8, bytearray(b"no-pixels"), "video"),
        ],
        "media_id long, content binary, media_type string",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(6).alias("width"),
            F.lit(8).alias("height"),
            F.lit(2000).cast("long").alias("duration_ms"),
            F.lit("gif").alias("codec"),
        ),
    )
    out = MM.frame_sample(df, every_ms=800).collect()
    gif_rows = sorted(
        (r for r in out if r["media_id"] == 7), key=lambda r: r["frame_idx"]
    )
    # 5 frames x 400ms; keep one per >=800ms window -> ts 0, 800, 1600
    assert [r["frame_ts_ms"] for r in gif_rows] == [0, 800, 1600]
    # emitted pixels are the real composed frames, PNG-encoded
    np.testing.assert_array_equal(
        codecs.png_decode(bytes(gif_rows[0]["frame_png"])), frames[0]
    )
    np.testing.assert_array_equal(
        codecs.png_decode(bytes(gif_rows[1]["frame_png"])), frames[2]
    )
    # non-GIF payload keeps the metadata-grid fallback (NULL pixels)
    other = [r for r in out if r["media_id"] == 8]
    assert [r["frame_ts_ms"] for r in other] == [0, 800, 1600]
    assert all(r["frame_png"] is None for r in other)


def test_gif_features_decode_first_frame(spark):
    frames = [np.full((4, 4, 3), 200, dtype=np.uint8)]
    gif = codecs.gif_encode(frames)
    df = spark.createDataFrame(
        [(9, bytearray(gif), "image")],
        "media_id long, content binary, media_type string",
    )
    row = MM.extract_features(df, strict=True).head()
    assert row["features"] == pytest.approx(
        codecs.image_features(frames[0], MM.FEATURE_DIM)
    )


# ------------------------------------------------------- property round-trips

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.png_decode(codecs.png_encode(pixels)), pixels)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    n_frames=st.integers(1, 4),
    n_colors=st.integers(2, 17),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_frames, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = [
        palette[rng.integers(0, n_colors, size=(h, w))] for _ in range(n_frames)
    ]
    got, delays = codecs.gif_decode_frames(codecs.gif_encode(frames, delay_ms=50))
    assert len(got) == n_frames and delays == [50] * n_frames
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 3000),
    ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-0.999, 0.999, size=(n, ch)).astype(np.float32)
    got, rate = codecs.wav_decode(codecs.wav_encode(samples, rate=8000))
    assert rate == 8000 and got.shape == (n, ch)
    # bound: 0.5/32767 rounding + the 32767-encode/32768-decode scale gap
    np.testing.assert_allclose(got, samples, atol=1 / 16384)


# ------------------------------------------------------------------- JPEG

def _assemble_jpeg(h, w, comps, qtables, scan_bits, dri=0):
    """Hand-assemble a baseline JFIF byte stream from parts the TEST
    controls — markers and entropy bits written per T.81 directly, so the
    decoder is exercised against the SPEC, not against jpeg_encode.
    ``comps``: list of (h_samp, v_samp, tq); ``qtables``: natural-order
    int arrays; ``scan_bits``: pre-stuffed entropy bytes (incl. RSTs)."""
    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(q[z]) for z in codecs._ZIGZAG)
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (hs, vs, tq) in enumerate(comps):
        out += bytes([ci + 1, (hs << 4) | vs, tq])
    for tc, tabs in ((0, (codecs._HT_DC_LUMA, codecs._HT_DC_CHROMA)),
                     (1, (codecs._HT_AC_LUMA, codecs._HT_AC_CHROMA))):
        for th in range(1 if nc == 1 else 2):
            bits, vals = tabs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        th = 0 if ci == 0 else 1
        out += bytes([ci + 1, (th << 4) | th])
    out += b"\x00\x3f\x00" + scan_bits + b"\xff\xd9"
    return bytes(out)


def _bits_dc_eob(wr, diff, dc_tab, ac_tab):
    """One DC-only block: category+magnitude bits then EOB."""
    t = int(abs(diff)).bit_length()
    code, ln = dc_tab[t]
    wr.write(code, ln)
    if t:
        wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    code, ln = ac_tab[0x00]
    wr.write(code, ln)


def test_jpeg_decode_analytic_dc_block():
    """Spec-golden single-block fixture: 8x8 grey, unit quant table, one
    DC coefficient D=40, all AC zero. T.81 math gives pixel =
    round(D/8) + 128 = 133 everywhere — hand-assembled entropy bits, so
    this passes only if marker parsing, canonical Huffman decode, DC
    EXTEND, dequantization, the IDCT, and the level shift are all right."""
    dc = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    ac = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    wr = codecs._BitWriter()
    _bits_dc_eob(wr, 40, dc, ac)
    data = _assemble_jpeg(8, 8, [(1, 1, 0)], [np.ones(64, dtype=np.int64)], wr.flush())
    px = codecs.jpeg_decode(data)
    assert px.shape == (8, 8, 1)
    assert (px == 133).all()
    # negative DC diff exercises EXTEND's sign branch: D=-40 -> 123
    wr = codecs._BitWriter()
    _bits_dc_eob(wr, -40, dc, ac)
    data = _assemble_jpeg(8, 8, [(1, 1, 0)], [np.ones(64, dtype=np.int64)], wr.flush())
    assert (codecs.jpeg_decode(data) == 123).all()


def test_jpeg_decode_420_subsampled_solid():
    """Hand-built 4:2:0 color fixture: one 16x16 MCU (4 Y + 1 Cb + 1 Cr
    blocks), solid YCbCr=(160, 98, 180) -> analytic BT.601 RGB. Exercises
    the sampling-factor block layout, chroma replication upsample, and the
    color transform."""
    dcl = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    acl = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    dcc = codecs._huff_encode_table(*codecs._HT_DC_CHROMA)
    acc = codecs._huff_encode_table(*codecs._HT_AC_CHROMA)
    y, cb, cr = 160, 98, 180
    wr = codecs._BitWriter()
    _bits_dc_eob(wr, (y - 128) * 8, dcl, acl)   # Y block 1: diff from 0
    for _ in range(3):                          # Y blocks 2-4: diff 0
        _bits_dc_eob(wr, 0, dcl, acl)
    _bits_dc_eob(wr, (cb - 128) * 8, dcc, acc)
    _bits_dc_eob(wr, (cr - 128) * 8, dcc, acc)
    q = np.ones(64, dtype=np.int64)
    data = _assemble_jpeg(16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], [q, q], wr.flush())
    px = codecs.jpeg_decode(data)
    assert px.shape == (16, 16, 3)
    want = np.clip(np.round([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all(), (px[0, 0], want)


def test_jpeg_decode_restart_markers():
    """DRI=1 with an RST0 between two MCUs: the DC predictor must reset, so
    both solid blocks carry the same full-magnitude diff."""
    dc = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    ac = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    segs = []
    for _ in range(2):
        wr = codecs._BitWriter()
        _bits_dc_eob(wr, 40, dc, ac)
        segs.append(wr.flush())
    scan = segs[0] + b"\xff\xd0" + segs[1]
    data = _assemble_jpeg(
        8, 16, [(1, 1, 0)], [np.ones(64, dtype=np.int64)], scan, dri=1
    )
    px = codecs.jpeg_decode(data)
    assert px.shape == (8, 16, 1)
    assert (px == 133).all()


def test_jpeg_roundtrip_accuracy():
    """Encoder->decoder round trip: exact on solid colors (DC-only blocks
    quantize losslessly at any quality), tight on smooth gradients, and
    bounded on noise (quantization error only)."""
    img = np.full((16, 16), 128, dtype=np.uint8)
    assert (codecs.jpeg_decode(codecs.jpeg_encode(img, 90))[:, :, 0] == 128).all()

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([
        (xx * 255 / 47).astype(np.uint8),
        (yy * 255 / 31).astype(np.uint8),
        ((xx + yy) * 255 / 79).astype(np.uint8),
    ], axis=-1)
    dec = codecs.jpeg_decode(codecs.jpeg_encode(img, 92))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2, (err.max(), err.mean())

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    dec = codecs.jpeg_decode(codecs.jpeg_encode(img, 95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 48 and err.mean() < 8, (err.max(), err.mean())

    # non-multiple-of-8 dims: edge padding must not bleed into the crop
    img = np.full((13, 21, 3), (10, 200, 90), dtype=np.uint8)
    dec = codecs.jpeg_decode(codecs.jpeg_encode(img, 90))
    assert dec.shape == (13, 21, 3)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_idct_matches_naive_definition():
    """The einsum IDCT must equal the O(N^4) textbook DCT-III double sum —
    an implementation-independent cross-check of the transform itself."""
    rng = np.random.default_rng(3)
    F8 = rng.uniform(-500, 500, (8, 8))
    fast = codecs._DCT_A.T @ F8 @ codecs._DCT_A
    naive = np.zeros((8, 8))
    for x in range(8):
        for yy in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F8[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * yy + 1) * v * np.pi / 16)
                    )
            naive[x, yy] = s / 4
    assert np.abs(fast - naive).max() < 1e-9


def test_jpeg_rejects_non_baseline():
    # SOF2 (progressive) is DECODED since r10; the still-refused frame
    # types are lossless (SOF3) and arithmetic-coded (SOF9+) ones
    for sof in (0xC3, 0xC9, 0xCB):
        bad = (b"\xff\xd8\xff" + bytes([sof]) + struct.pack(">H", 11)
               + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00")
        with pytest.raises(codecs.UnsupportedMedia, match="non-baseline"):
            codecs.jpeg_decode(bad)
    # a truncated SOF2 stream must fail typed, not crash
    trunc = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + b"\x08\x00\x08"
    with pytest.raises(codecs.UnsupportedMedia):
        codecs.jpeg_decode(trunc)
    with pytest.raises(codecs.UnsupportedMedia):
        codecs.jpeg_decode(b"\x89PNG")


def test_jpeg_sniff_and_decode_image_route():
    img = np.full((8, 8, 3), (50, 100, 150), dtype=np.uint8)
    enc = codecs.jpeg_encode(img, 90)
    assert codecs.sniff(enc) == "jpeg"
    assert codecs.decode_image(enc).shape == (8, 8, 3)


@pytest.mark.skipif(not codecs.HAVE_PIL, reason="Pillow absent in this container")
def test_jpeg_golden_vs_pillow():  # pragma: no cover - auto-activates in prod
    """When Pillow IS present (a real deployment), our decoder must agree
    with libjpeg on Pillow-encoded files and Pillow must accept ours."""
    import io as _io

    from PIL import Image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=0)
    ours = codecs.jpeg_decode(buf.getvalue())
    theirs = np.asarray(Image.open(_io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2
    theirs2 = np.asarray(
        Image.open(_io.BytesIO(codecs.jpeg_encode(img, 90))).convert("RGB")
    )
    assert np.abs(theirs2.astype(int) - img.astype(int)).mean() < 10


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_property(h, w, c, seed):
    """Solid-color images of any geometry survive the round trip exactly:
    DC-only blocks quantize losslessly, and the crop must shed the edge
    padding without bleed."""
    rng = np.random.default_rng(seed)
    color = rng.integers(0, 256, c, dtype=np.uint8)
    img = np.broadcast_to(color, (h, w, c)).copy()
    dec = codecs.jpeg_decode(codecs.jpeg_encode(img, 90))
    assert dec.shape == (h, w, c)
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


def test_extract_features_real_jpeg_in_spark(spark):
    """A JPEG payload must flow through the Arrow-batched feature stage via
    the REAL decoder (features match a local jpeg_decode), never the byte
    fallback — the r9 coverage of the dominant web-corpus container."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    jpg = codecs.jpeg_encode(img, quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(jpg), "image")],
        "media_id long, content binary, media_type string",
    )
    row = MM.extract_features(df, strict=True).head()
    local = codecs.image_features(codecs.jpeg_decode(jpg), MM.FEATURE_DIM)
    assert row["features"] == pytest.approx(local)
    assert row["features"] != pytest.approx(MM._fake_decode(jpg))


def test_jpeg_decode_422_subsampled_solid():
    """4:2:2 (h=2, v=1 luma): one 16x8 MCU = 2 Y + 1 Cb + 1 Cr blocks —
    pins the horizontal-only replication upsample the 4:2:0 test can't."""
    dcl = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    acl = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    dcc = codecs._huff_encode_table(*codecs._HT_DC_CHROMA)
    acc = codecs._huff_encode_table(*codecs._HT_AC_CHROMA)
    y, cb, cr = 100, 150, 60
    wr = codecs._BitWriter()
    _bits_dc_eob(wr, (y - 128) * 8, dcl, acl)
    _bits_dc_eob(wr, 0, dcl, acl)
    _bits_dc_eob(wr, (cb - 128) * 8, dcc, acc)
    _bits_dc_eob(wr, (cr - 128) * 8, dcc, acc)
    q = np.ones(64, dtype=np.int64)
    data = _assemble_jpeg(8, 16, [(2, 1, 0), (1, 1, 1), (1, 1, 1)], [q, q], wr.flush())
    px = codecs.jpeg_decode(data)
    assert px.shape == (8, 16, 3)
    want = np.clip(np.round([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all(), (px[0, 0], want)


def test_resize_images_jpeg_in_spark(spark):
    """JPEG payloads resize through the real decode->resize->re-encode path
    and come back out as JPEG with the metadata rewritten."""
    img = np.full((16, 12, 3), (30, 90, 210), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.jpeg_encode(img, 90)), "image")],
        "media_id long, content binary, media_type string",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(12).alias("width"), F.lit(16).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("jpeg").alias("codec"),
        ),
    )
    row = MM.resize_images(df, 6, 8, strict=True).head()
    out = bytes(row["content"])
    assert codecs.sniff(out) == "jpeg"
    px = codecs.jpeg_decode(out)
    assert px.shape == (8, 6, 3)
    assert int(np.abs(px.astype(int) - np.array([30, 90, 210])).max()) <= 2
    assert row["meta"]["width"] == 6 and row["meta"]["height"] == 8


def test_jpeg_decode_never_leaks_parse_errors():
    """Fuzz: garbage after a JPEG magic and truncations of a valid file
    must ALWAYS raise UnsupportedMedia — never struct.error / IndexError /
    raw ValueError (a web corpus feeds the decoder garbage constantly;
    strict-mode mapInPandas stages rely on the typed error)."""
    import random

    rng = random.Random(1)
    for _ in range(600):
        payload = b"\xff\xd8\xff" + bytes(
            rng.randrange(256) for _ in range(rng.randint(0, 200))
        )
        try:
            codecs.jpeg_decode(payload)
        except codecs.UnsupportedMedia:
            pass
    img = np.full((16, 16, 3), (10, 200, 90), dtype=np.uint8)
    enc = codecs.jpeg_encode(img, 90)
    for cut in range(2, len(enc), 5):
        try:
            codecs.jpeg_decode(enc[:cut])
        except codecs.UnsupportedMedia:
            pass


@pytest.mark.slow  # multi-minute certification/equivalence run: builder gate only (r12, VERDICT r11 #1)
@pytest.mark.parametrize("kind", ["png", "ppm", "wav", "gif"])
def test_decoders_never_leak_parse_errors(kind):
    """Same fuzz contract as JPEG for every built-in decoder: garbage after
    the container magic and truncations of a valid payload always raise
    the typed UnsupportedMedia."""
    import random

    rng = random.Random(3)
    img = np.full((8, 8, 3), (1, 2, 3), dtype=np.uint8)
    magic, fn, valid = {
        "png": (codecs.PNG_SIG, codecs.png_decode, codecs.png_encode(img)),
        "ppm": (b"P6", codecs.ppm_decode, codecs.ppm_encode(img)),
        "wav": (
            b"RIFF\x00\x00\x00\x00WAVE",
            codecs.wav_decode,
            codecs.wav_encode(0.1 * np.sin(np.linspace(0, 9, 200, dtype=np.float32))),
        ),
        "gif": (b"GIF89a", lambda b: codecs.gif_decode_frames(b), codecs.gif_encode([img])),
    }[kind]
    for _ in range(400):
        payload = magic + bytes(
            rng.randrange(256) for _ in range(rng.randint(0, 150))
        )
        try:
            fn(payload)
        except codecs.UnsupportedMedia:
            pass
    for cut in range(2, len(valid), 5):
        try:
            fn(valid[:cut])
        except codecs.UnsupportedMedia:
            pass


# ------------------------------------------------- JPEG progressive (r10)


def _assemble_multiscan(h, w, comps, qtables, scans, sof=0xC2, dri=0,
                        extra_dht=None):
    """Hand-assemble a multi-scan JFIF stream (progressive SOF2 by
    default, sof=0xC0 for multi-scan sequential) — same spec-golden role
    as _assemble_jpeg, extended with per-scan spectral selection and
    successive approximation. ``scans``: dicts with sel=[(comp_1based,
    dc_t, ac_t)...], ss, se, ah, al, bits."""
    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti])
        out += bytes(int(q[z]) for z in codecs._ZIGZAG)
    nc = len(comps)
    out += b"\xff" + bytes([sof]) + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (hs, vs, tq) in enumerate(comps):
        out += bytes([ci + 1, (hs << 4) | vs, tq])
    for tc, tabs in ((0, (codecs._HT_DC_LUMA, codecs._HT_DC_CHROMA)),
                     (1, (codecs._HT_AC_LUMA, codecs._HT_AC_CHROMA))):
        for th in range(1 if nc == 1 else 2):
            bits, vals = tabs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if extra_dht is not None:  # progressive EOBn symbols aren't in the
        # Annex-K sequential tables; fixtures add a custom table for them
        tc, th, bits, vals = extra_dht
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    for sc in scans:
        ns = len(sc["sel"])
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for comp, dct, act in sc["sel"]:
            out += bytes([comp, (dct << 4) | act])
        out += bytes([sc["ss"], sc["se"], (sc["ah"] << 4) | sc["al"]])
        out += sc["bits"]
    out += b"\xff\xd9"
    return bytes(out)


def _w_dc(wr, diff, tab):
    t = int(abs(diff)).bit_length()
    code, ln = tab[t]
    wr.write(code, ln)
    if t:
        wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def test_jpeg_progressive_matches_baseline_golden():
    """Spec-golden successive approximation: DC first (Al=1) + DC refine +
    AC first (Al=1) + AC refine building coefficients DC=40, AC1=13 must
    decode pixel-identically to the BASELINE stream carrying the same
    final coefficients — the refinement path is exercised bit by bit."""
    dc = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    ac = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    q = [np.ones(64, dtype=np.int64)]

    # baseline twin: DC diff 40, then (run 0, size 4) AC1=13, EOB
    wr = codecs._BitWriter()
    _w_dc(wr, 40, dc)
    code, ln = ac[0x04]
    wr.write(code, ln)
    wr.write(13, 4)
    code, ln = ac[0x00]
    wr.write(code, ln)
    want = codecs.jpeg_decode(
        _assemble_jpeg(8, 8, [(1, 1, 0)], q, wr.flush())
    )

    # progressive: DC first at Al=1 carries 40>>1=20
    w1 = codecs._BitWriter()
    _w_dc(w1, 20, dc)
    # DC refine: bit 0 of 40 is 0
    w2 = codecs._BitWriter()
    w2.write(0, 1)
    # AC first 1..63 at Al=1: (run 0, size 3) value 13>>1=6, then EOB0
    w3 = codecs._BitWriter()
    code, ln = ac[0x03]
    w3.write(code, ln)
    w3.write(6, 3)
    code, ln = ac[0x00]
    w3.write(code, ln)
    # AC refine 1..63 at Al=0: EOB0 (eobrun=1) then the correction bit for
    # the nonzero AC1 (bit 0 of 13 is 1 -> 12+1=13)
    w4 = codecs._BitWriter()
    code, ln = ac[0x00]
    w4.write(code, ln)
    w4.write(1, 1)
    data = _assemble_multiscan(
        8, 8, [(1, 1, 0)], q,
        [
            {"sel": [(1, 0, 0)], "ss": 0, "se": 0, "ah": 0, "al": 1, "bits": w1.flush()},
            {"sel": [(1, 0, 0)], "ss": 0, "se": 0, "ah": 1, "al": 0, "bits": w2.flush()},
            {"sel": [(1, 0, 0)], "ss": 1, "se": 63, "ah": 0, "al": 1, "bits": w3.flush()},
            {"sel": [(1, 0, 0)], "ss": 1, "se": 63, "ah": 1, "al": 0, "bits": w4.flush()},
        ],
    )
    got = codecs.jpeg_decode(data)
    np.testing.assert_array_equal(got, want)


def test_jpeg_progressive_420_noninterleaved_eobrun():
    """Progressive 4:2:0 color: interleaved DC scan + per-component
    non-interleaved AC scans where the 4 Y blocks are covered by ONE
    EOB4 run — exercises the component ceil-grid addressing and EOB-run
    bookkeeping. Solid YCbCr must equal the analytic BT.601 RGB."""
    dcl = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    acl = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    dcc = codecs._huff_encode_table(*codecs._HT_DC_CHROMA)
    acc = codecs._huff_encode_table(*codecs._HT_AC_CHROMA)
    y, cb, cr = 160, 98, 180
    wdc = codecs._BitWriter()
    _w_dc(wdc, (y - 128) * 8, dcl)
    for _ in range(3):
        _w_dc(wdc, 0, dcl)
    _w_dc(wdc, (cb - 128) * 8, dcc)
    _w_dc(wdc, (cr - 128) * 8, dcc)
    # Y AC scan: EOB4 = code (2<<4 | 0) + 2 extension bits 00, via a
    # custom 2-symbol table (id 2) — Annex-K has no EOBn symbols
    eob_bits = [0, 2] + [0] * 14
    eob_vals = [0x20, 0x00]
    eobt = codecs._huff_encode_table(eob_bits, eob_vals)
    wy = codecs._BitWriter()
    code, ln = eobt[0x20]
    wy.write(code, ln)
    wy.write(0, 2)
    wcb = codecs._BitWriter()
    code, ln = acc[0x00]
    wcb.write(code, ln)
    wcr = codecs._BitWriter()
    wcr.write(code, ln)
    q = np.ones(64, dtype=np.int64)
    data = _assemble_multiscan(
        16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], [q, q],
        [
            {"sel": [(1, 0, 0), (2, 1, 1), (3, 1, 1)],
             "ss": 0, "se": 0, "ah": 0, "al": 0, "bits": wdc.flush()},
            {"sel": [(1, 0, 2)], "ss": 1, "se": 63, "ah": 0, "al": 0, "bits": wy.flush()},
            {"sel": [(2, 1, 1)], "ss": 1, "se": 63, "ah": 0, "al": 0, "bits": wcb.flush()},
            {"sel": [(3, 1, 1)], "ss": 1, "se": 63, "ah": 0, "al": 0, "bits": wcr.flush()},
        ],
        extra_dht=(1, 2, eob_bits, eob_vals),
    )
    px = codecs.jpeg_decode(data)
    assert px.shape == (16, 16, 3)
    want = np.clip(np.round([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all(), (px[0, 0], want)


def test_jpeg_multiscan_sequential_noninterleaved():
    """Multi-scan BASELINE (one sequential scan per component) — the
    legal-but-rare layout the r9 marker walk refused after the first SOS.
    Same analytic solid-color target as the interleaved fixture."""
    dcl = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    acl = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    dcc = codecs._huff_encode_table(*codecs._HT_DC_CHROMA)
    acc = codecs._huff_encode_table(*codecs._HT_AC_CHROMA)
    y, cb, cr = 160, 98, 180
    wy = codecs._BitWriter()
    _bits_dc_eob(wy, (y - 128) * 8, dcl, acl)
    for _ in range(3):  # Y ceil-grid is 2x2 blocks at 16x16 4:2:0
        _bits_dc_eob(wy, 0, dcl, acl)
    wcb = codecs._BitWriter()
    _bits_dc_eob(wcb, (cb - 128) * 8, dcc, acc)
    wcr = codecs._BitWriter()
    _bits_dc_eob(wcr, (cr - 128) * 8, dcc, acc)
    q = np.ones(64, dtype=np.int64)
    data = _assemble_multiscan(
        16, 16, [(2, 2, 0), (1, 1, 1), (1, 1, 1)], [q, q],
        [
            {"sel": [(1, 0, 0)], "ss": 0, "se": 63, "ah": 0, "al": 0, "bits": wy.flush()},
            {"sel": [(2, 1, 1)], "ss": 0, "se": 63, "ah": 0, "al": 0, "bits": wcb.flush()},
            {"sel": [(3, 1, 1)], "ss": 0, "se": 63, "ah": 0, "al": 0, "bits": wcr.flush()},
        ],
        sof=0xC0,
    )
    px = codecs.jpeg_decode(data)
    want = np.clip(np.round([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all(), (px[0, 0], want)


def test_jpeg_fill_bytes_before_marker():
    """Repeated 0xFF padding before a marker is legal (T.81 B.1.1.2) —
    the r9 walk raised on it."""
    img = np.full((8, 8), 99, dtype=np.uint8)
    enc = codecs.jpeg_encode(img, 90)
    # inject fill bytes before the SOF marker (first 0xFFC0)
    i = enc.index(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    np.testing.assert_array_equal(codecs.jpeg_decode(padded), codecs.jpeg_decode(enc))


@pytest.mark.skipif(not codecs.HAVE_PIL, reason="Pillow absent in this container")
def test_jpeg_progressive_golden_vs_pillow():  # pragma: no cover - prod only
    """Where Pillow exists, our progressive decode must agree with libjpeg
    on a Pillow-encoded progressive file (the dominant web-JPEG layout)."""
    import io as _io

    from PIL import Image

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img).save(
        buf, format="JPEG", quality=90, subsampling=0, progressive=True
    )
    ours = codecs.jpeg_decode(buf.getvalue())
    theirs = np.asarray(Image.open(_io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2


def test_extract_features_decode_audit(spark):
    """r9 directive #8: decode-cost telemetry. audit=True must tag every
    payload with its container, decode path, and per-payload wall — same
    features as the untagged run — and decode_audit must aggregate to the
    bytes-actually-decoded report a 100 TB run reads."""
    df = _media_df(spark)
    plain = {r["media_id"]: r["features"] for r in MM.extract_features(df).collect()}
    audited = MM.extract_features(df, audit=True)
    rows = {r["media_id"]: r for r in audited.collect()}
    assert rows[1]["container"] == "png" and rows[1]["decode_path"] == "real"
    assert rows[2]["container"] == "wav" and rows[2]["decode_path"] == "real"
    assert rows[3]["container"] is None and rows[3]["decode_path"] == "fallback"
    assert rows[4]["decode_path"] is None and rows[4]["features"] is None
    for mid, r in rows.items():
        assert r["features"] == pytest.approx(plain[mid]) if plain[mid] is not None else r["features"] is None
        assert r["decode_us"] >= 0
    agg = {
        (r["container"], r["decode_path"]): r
        for r in MM.decode_audit(audited).collect()
    }
    assert agg[("png", "real")]["n_payloads"] == 1
    assert agg[("wav", "real")]["n_payloads"] == 1
    assert agg[(None, "fallback")]["n_payloads"] == 1
    assert agg[("png", "real")]["total_bytes"] > 0
    assert agg[("png", "real")]["decode_us_total"] >= 0
    # coverage fraction the report exists for: real-decoded bytes / total
    real_b = sum(v["total_bytes"] for k, v in agg.items() if k[1] == "real")
    all_b = sum(v["total_bytes"] for v in agg.values())
    assert 0 < real_b <= all_b
