"""Real media codecs for the multimodal tier (X13).

This container has no Pillow/librosa/ffmpeg, so the image path is a real
pure-Python+numpy implementation of the formats a test corpus actually
needs — PNG (stdlib ``zlib`` inflate + full filter reconstruction) and
binary PPM — plus WAV PCM audio via stdlib ``struct``. When Pillow IS
importable (a real deployment), it is used as the fast path for anything
it can open; the built-in codecs remain the fallback and the reference
implementation for tests.

Everything here is driver/executor-side *Python batch* code by design: it
runs inside Arrow-batched ``mapInPandas`` stages (ext/multimodal.py), so
per-row overhead is already amortized; the pixel math is numpy-vectorized.

Format support (built-in):
* PNG: 8-bit greyscale / RGB / RGBA / grey+alpha, non-interlaced,
  filters 0-4 (None/Sub/Up/Average/Paeth) on decode; encode writes
  filter-0 scanlines. Palette/16-bit/interlaced raise ``UnsupportedMedia``.
* PPM: binary P6 (8-bit RGB) decode/encode.
* WAV: PCM 8/16-bit mono/stereo decode to float32 in [-1, 1].
* GIF: 87a/89a decode incl. real LZW + frame disposal; literal-LZW encode.
* JPEG: sequential (SOF0/1) AND progressive (SOF2) JFIF decode
  (canonical Huffman, spectral selection + successive approximation,
  einsum IDCT, 4:4:4/4:2:2/4:2:0 sampling, restart intervals,
  multi-scan non-interleaved layouts) — the containers that dominate web
  corpora; lossless/arithmetic/hierarchical/12-bit raise
  ``UnsupportedMedia``. Encode writes baseline 4:4:4 with the Annex-K
  tables (fixture fabrication, like gif_encode).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedMedia(ValueError):
    """Payload is not a format the built-in codec tier supports."""


def _corrupt_guard(fn):
    """Decode entry points face web-corpus garbage constantly: any parse
    failure (truncation, bogus lengths, impossible headers) must surface
    as the TYPED ``UnsupportedMedia``, never a raw struct/index/zlib
    error — strict-mode Arrow stages and callers' error routing rely on
    it (fuzzed in tests/test_codecs.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(content, *a, **kw):
        try:
            return fn(content, *a, **kw)
        except UnsupportedMedia:
            raise
        except (
            struct.error, zlib.error, ValueError, IndexError, KeyError,
            TypeError, EOFError,
        ) as exc:
            raise UnsupportedMedia(
                f"corrupt {fn.__name__.split('_')[0]} payload: "
                f"{type(exc).__name__}: {exc}"
            ) from exc

    return wrapped


try:  # optional fast path — absent in this container, present in prod
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAVE_PIL = False


# --------------------------------------------------------------- sniffing

def sniff(content: bytes) -> str | None:
    """Best-effort container detection from magic bytes: 'png' | 'ppm' |
    'wav' | 'gif' | None (unknown)."""
    if content is None:
        return None
    if content[:8] == PNG_SIG:
        return "png"
    if content[:2] == b"P6":
        return "ppm"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# --------------------------------------------------------------- PNG decode

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> sample count


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (ints to avoid uint8
    wraparound in the distance math)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


@_corrupt_guard
def png_decode(content: bytes) -> np.ndarray:
    """Decode a PNG payload to a HxWxC uint8 array (C=1/2/3/4).

    Full filter reconstruction (types 0-4) per the PNG spec; scanline
    unfiltering is inherently sequential row-to-row but vectorized within
    each row. Raises UnsupportedMedia for palette/16-bit/interlaced."""
    if content[:8] != PNG_SIG:
        raise UnsupportedMedia("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise UnsupportedMedia(f"bit depth {depth} unsupported (8 only)")
            if color not in _CHANNELS:
                raise UnsupportedMedia(f"color type {color} unsupported")
            if interlace != 0:
                raise UnsupportedMedia("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMedia("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise UnsupportedMedia("PNG IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        f, cur = int(filters[y]), lines[y].astype(np.uint8).copy()
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — sequential in x by bpp blocks
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(cur[x]) + int(left)) & 0xFF
        elif f == 2:  # Up — fully vectorized
            out[y] = cur + prior
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(cur[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                out[y, x] = (int(cur[x]) + int(_paeth(
                    np.uint8(a), np.uint8(b), np.uint8(c)
                ))) & 0xFF
        else:
            raise UnsupportedMedia(f"PNG filter {f} invalid")
    return out.reshape(height, width, channels)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode a HxWxC (or HxW) uint8 array as a PNG (filter 0, one IDAT)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * c)], axis=1
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- PPM

@_corrupt_guard
def ppm_decode(content: bytes) -> np.ndarray:
    """Binary P6 PPM -> HxWx3 uint8."""
    if content[:2] != b"P6":
        raise UnsupportedMedia("not a P6 PPM payload")
    f = io.BytesIO(content)
    fields: list[int] = []
    f.read(2)
    while len(fields) < 3:
        line = f.readline()
        if not line:
            raise UnsupportedMedia("truncated PPM header")
        body = line.split(b"#", 1)[0]
        fields.extend(int(tok) for tok in body.split())
    w, h, maxval = fields[:3]
    if maxval != 255:
        raise UnsupportedMedia(f"PPM maxval {maxval} unsupported (255 only)")
    data = f.read(w * h * 3)
    if len(data) != w * h * 3:
        raise UnsupportedMedia("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def ppm_encode(pixels: np.ndarray) -> bytes:
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise UnsupportedMedia("PPM requires HxWx3 RGB")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# --------------------------------------------------------------- WAV

@_corrupt_guard
def wav_decode(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float32 samples in [-1, 1] shaped (n, channels), rate).
    8-bit unsigned and 16-bit signed PCM supported."""
    import wave

    try:
        with wave.open(io.BytesIO(content), "rb") as wv:
            nch, sw, rate, nframes = (
                wv.getnchannels(),
                wv.getsampwidth(),
                wv.getframerate(),
                wv.getnframes(),
            )
            frames = wv.readframes(nframes)
    except wave.Error as exc:
        raise UnsupportedMedia(f"not a PCM WAV payload: {exc}") from exc
    if sw == 1:
        samples = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    else:
        raise UnsupportedMedia(f"sample width {sw} unsupported (1|2 bytes)")
    return samples.reshape(-1, nch), rate


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] (n,) or (n, ch) -> 16-bit PCM WAV bytes."""
    import wave

    arr = np.asarray(samples, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.rint(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(arr.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------- transforms

def decode_image(content: bytes) -> np.ndarray:
    """Decode any supported image payload to HxWxC uint8. Pillow fast path
    when available; built-in PNG/PPM otherwise."""
    kind = sniff(content)
    if HAVE_PIL and kind in ("png", "ppm", "jpeg"):  # pragma: no cover - no PIL here
        with _PILImage.open(io.BytesIO(content)) as im:
            return np.asarray(im.convert(im.mode if im.mode in ("L", "RGB", "RGBA") else "RGB"))
    if kind == "png":
        return png_decode(content)
    if kind == "ppm":
        return ppm_decode(content)
    if kind == "jpeg":
        return jpeg_decode(content)
    raise UnsupportedMedia("unknown image container")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index maps — exact, allocation-light,
    and identical on every platform (no resampling kernel to disagree on)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def image_features(pixels: np.ndarray, dim: int = 16) -> list[float]:
    """Real, deterministic feature vector from decoded pixels (all in
    [0, 1]): per-channel mean + std over RGB (grey broadcasts), an 8-bin
    luminance histogram, aspect ratio, and mean |horizontal gradient|
    (sharpness proxy). Matches FEATURE_DIM=16."""
    arr = pixels.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    rgb = arr[:, :, :3] if c >= 3 else np.repeat(arr[:, :, :1], 3, axis=2)
    lum = rgb.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(1, lum.size)
    grad = np.abs(np.diff(lum, axis=1)).mean() / 255.0 if lum.shape[1] > 1 else 0.0
    h, w = lum.shape
    feats = [
        *(rgb[:, :, i].mean() / 255.0 for i in range(3)),
        *(rgb[:, :, i].std() / 255.0 for i in range(3)),
        *hist.tolist(),
        min(h, w) / max(h, w),
        float(grad),
    ]
    out = [float(x) for x in feats[:dim]]
    return out + [0.0] * (dim - len(out))


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> list[float]:
    """Deterministic audio features: RMS, peak, zero-crossing rate, duration
    (s, capped at 1 for the unit range), 8-band energy spectrum via numpy
    rFFT, channel count fraction, DC offset."""
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    peak = float(np.abs(mono).max()) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono))
    bands = (
        [float(b.mean()) for b in np.array_split(spec, 8)] if spec.size >= 8 else [0.0] * 8
    )
    total = sum(bands) or 1.0
    feats = [
        rms,
        peak,
        zcr,
        min(1.0, n / rate if rate else 0.0),
        *(b / total for b in bands),
        samples.shape[1] / 8.0,
        float(abs(mono.mean())) if n else 0.0,
    ]
    out = [float(x) for x in feats[:dim]]
    return out + [0.0] * (dim - len(out))


# --------------------------------------------------------------- GIF (LZW)

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, EOI terminates. Returns pixel index stream."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = eoi + 1

    width = next_code = 0
    reset()
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < next_code and code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + [prev[0]]
            else:
                raise UnsupportedMedia(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode_literal(min_code_size: int, indices: list[int]) -> bytes:
    """Valid LZW stream that never grows the table: CLEAR before every
    code-width boundary would be needed — emit CLEAR every (2^w - eoi - 2)
    literals so codes stay literal-sized. Compression-free but spec-exact;
    the decoder path is the one that must handle real compressed streams."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    # after a CLEAR, next_code = eoi+1 and grows by 1 per emitted literal;
    # stay below 2^width so the width never changes
    budget = (1 << width) - (eoi + 1)
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    since_clear = 0
    for idx in indices:
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(idx)
        since_clear += 1
    emit(eoi)
    if bits:
        out.append(acc & ((1 << bits) - 1))
    return bytes(out)


@_corrupt_guard
def gif_decode_frames(content: bytes) -> tuple[list["np.ndarray"], list[int]]:
    """Decode an (animated) GIF into RGB frames + per-frame delays (ms).

    Supports global/local color tables, transparency, interlacing, and
    disposal methods 0/1 (draw over) and 2 (restore background). Each
    returned frame is the COMPOSED canvas (HxWx3 uint8) at that point."""
    if content[:6] not in GIF_SIGS:
        raise UnsupportedMedia("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    delay_ms = 0
    disposal = 0
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = content[pos]
            pos += 1
            blocks = []
            while content[pos] != 0:
                ln = content[pos]
                blocks.append(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and blocks:  # graphic control
                gflags, d = blocks[0][0], struct.unpack("<H", blocks[0][1:3])[0]
                disposal = (gflags >> 2) & 0x07
                delay_ms = d * 10
                transparent = blocks[0][3] if gflags & 0x01 else None
            continue
        if b != 0x2C:
            raise UnsupportedMedia(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise UnsupportedMedia("GIF image without a color table")
        min_code = content[pos]
        pos += 1
        data = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            data.extend(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(min_code, bytes(data))[: iw * ih], dtype=np.int32)
        if len(idx) < iw * ih:
            raise UnsupportedMedia("truncated GIF frame data")
        idx = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        prev_region = canvas[top : top + ih, left : left + iw].copy()
        region = ct[idx.clip(0, len(ct) - 1)]
        if transparent is not None:
            mask = (idx == transparent)[:, :, None]
            region = np.where(mask, prev_region, region)
        canvas[top : top + ih, left : left + iw] = region
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background after this frame
            bg_rgb = gct[bg] if (gct is not None and bg < len(gct)) else 0
            canvas[top : top + ih, left : left + iw] = bg_rgb
        transparent = None
        delay_ms = 0
        disposal = 0
    return frames, delays


def gif_encode(frames: list["np.ndarray"], delay_ms: int = 100) -> bytes:
    """Encode RGB frames as an animated GIF with one shared palette built
    from the frames' distinct colors (<=256 required). Literal-code LZW
    (valid, uncompressed) — the decoder handles real compressed streams;
    this encoder exists so tests and fixtures can fabricate real GIFs."""
    if not frames:
        raise UnsupportedMedia("no frames")
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise UnsupportedMedia(f"{len(colors)} colors > 256 (quantize first)")
    depth = max(2, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    # netscape looping extension (standard for animation)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_ms // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        idx = [lut[tuple(px)] for px in f.reshape(-1, 3)]
        out.append(depth)
        stream = _lzw_encode_literal(depth, idx)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# ----------------------------------------------------------- JPEG (baseline)
# JFIF (ITU-T T.81): sequential SOF0/1 and progressive SOF2 frames,
# Huffman entropy coding, 8-bit samples, interleaved and non-interleaved
# (multi-scan) layouts, optional restart intervals, 4:4:4 / 4:2:2 /
# 4:2:0 chroma sampling on decode; progressive adds spectral selection
# and successive approximation (DC/AC refinement, EOB runs — G.1.2).
# Lossless (SOF3), arithmetic-coded (SOF9+), 12-bit, and hierarchical
# frames raise UnsupportedMedia. The encoder writes baseline 4:4:4 with the spec's
# Annex-K example tables so tests and fixtures can fabricate real JPEGs;
# it exists for the same reason gif_encode does. All block math is
# numpy-vectorized across a component's blocks (einsum IDCT); only the
# Huffman bit walk is a Python loop, amortized inside Arrow-batched
# mapInPandas stages like every other codec here.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS counts per length 1..16, HUFFVAL)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: forward F = A f A^T, inverse
    f = A^T F A (T.81 A.3.3 up to the orthonormal scaling)."""
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    a[0, :] = 1 / (2 * np.sqrt(2))
    return a


_DCT_A = _dct_matrix()


class _HuffDecoder:
    """Canonical Huffman decoder (T.81 F.2.2.3): per-length min/max code
    arithmetic over the BITS/HUFFVAL table representation."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            self.maxcode[ln] = code - 1 if bits[ln - 1] else -1
            code <<= 1

    def decode(self, rd: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rd.bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise UnsupportedMedia("corrupt JPEG: bad Huffman code")


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise UnsupportedMedia("corrupt JPEG: entropy data exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(content: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF payload to HxWxC uint8 (C=1 grey,
    C=3 RGB via BT.601 full-range YCbCr). Corrupt/truncated payloads of
    any shape raise ``UnsupportedMedia`` — a web-corpus decoder sees
    garbage constantly, and leaking struct/index errors would crash the
    strict-mode Arrow stage with undiagnosable tracebacks (fuzzed in
    tests/test_codecs.py)."""
    try:
        return _jpeg_decode_impl(content)
    except UnsupportedMedia:
        raise
    except (struct.error, ValueError, IndexError, KeyError, TypeError) as exc:
        raise UnsupportedMedia(f"corrupt JPEG: {type(exc).__name__}: {exc}") from exc


def _jpeg_decode_impl(content: bytes) -> np.ndarray:
    if content[:2] != b"\xff\xd8":
        raise UnsupportedMedia("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart = 0
    scans: list[dict] = []
    i = 2
    n = len(content)
    while i < n:
        if content[i] != 0xFF:
            raise UnsupportedMedia("corrupt JPEG: expected marker")
        # legal fill bytes: any number of repeated 0xFF padding a marker
        # (T.81 B.1.1.2) — skip to the marker code itself
        while i + 1 < n and content[i + 1] == 0xFF:
            i += 1
        m = content[i + 1] if i + 1 < n else 0
        i += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", content[i : i + 2])[0]
        seg = content[i + 2 : i + seg_len]
        i += seg_len
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise UnsupportedMedia("corrupt JPEG: multiple SOF frames")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise UnsupportedMedia(f"{prec}-bit JPEG unsupported")
            if h == 0 or w == 0:
                raise UnsupportedMedia("JPEG with DNL-deferred dimensions unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia(
                f"non-baseline JPEG frame (marker 0xFF{m:02X}: lossless/"
                "arithmetic/hierarchical) unsupported"
            )
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedMedia("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            sel = []
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
                sel.append((cs, tdta >> 4, tdta & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            # entropy segment runs to the next non-RST/non-stuffed marker
            j = i
            while j < n - 1:
                if content[j] == 0xFF and content[j + 1] != 0x00 and not (
                    0xD0 <= content[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scans.append(
                {
                    "sel": sel,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "restart": restart,
                    "huff": dict(huff),  # tables as defined AT this scan
                    "data": content[i:j],
                }
            )
            i = j
    if frame is None or not scans:
        raise UnsupportedMedia("corrupt JPEG: no scan data")
    return _jpeg_decode_scans(frame, qt, scans)


def _destuff_chunks(scan: bytes) -> list[bytes]:
    """Split entropy data at restart markers and de-stuff 0xFF00 bytes."""
    chunks = []
    cur = bytearray()
    k = 0
    while k < len(scan):
        b = scan[k]
        if b == 0xFF:
            nxt = scan[k + 1] if k + 1 < len(scan) else 0
            if nxt == 0x00:
                cur.append(0xFF)
                k += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                chunks.append(bytes(cur))
                cur = bytearray()
                k += 2
                continue
        cur.append(b)
        k += 1
    chunks.append(bytes(cur))
    return chunks


def _jpeg_decode_scans(frame, qt, scans) -> np.ndarray:
    """Decode every scan into per-component BLOCK-GRID coefficient arrays
    (rows = grid row-major blocks, zigzag order within a row), then
    dequantize + IDCT once. One spectral decoder serves sequential AND
    progressive streams: a sequential scan is exactly the progressive
    first-pass with Ss=0, Se=63, Ah=Al=0 (its EOB is the EOB-run of
    length 1, T.81 F.2 vs G.2), so multi-scan non-interleaved baseline
    files fall out of the same loop instead of being refused (r9 ADVICE).
    Progressive (SOF2, the dominant web-JPEG variant) adds DC/AC
    refinement passes (Ah>0) with EOB-run bookkeeping per G.1.2.2-3."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    byid = {c["id"]: c for c in comps}
    grid = {c["id"]: (mcuy * c["v"], mcux * c["h"]) for c in comps}
    coeffs = {
        cid: np.zeros((bh * bw, 64), dtype=np.int64) for cid, (bh, bw) in grid.items()
    }
    for scan in scans:
        _decode_scan_into(frame, scan, coeffs, grid, mcux, mcuy, byid)
    planes = {}
    for c in comps:
        if c["tq"] not in qt:
            raise UnsupportedMedia("corrupt JPEG: missing quantization table")
        bh, bw = grid[c["id"]]
        zz = coeffs[c["id"]] * qt[c["tq"]][None, :]
        blocks = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = zz
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ur,nuv,vc->nrc", _DCT_A, blocks, _DCT_A) + 128.0
        # grid-row-major blocks reassemble with one transpose, no loop
        plane = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution by sample replication, crop
        plane = np.repeat(np.repeat(plane, maxv // c["v"], 0), maxh // c["h"], 1)
        planes[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        return np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)[
            :, :, None
        ]
    y, cb, cr = (planes[c["id"]] for c in comps)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _decode_scan_into(frame, scan, coeffs, grid, mcux, mcuy, byid) -> None:
    h, w = frame["h"], frame["w"]
    maxh = max(c["h"] for c in frame["comps"])
    maxv = max(c["v"] for c in frame["comps"])
    sel, huff = scan["sel"], scan["huff"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if se > 63 or ss > se:
        raise UnsupportedMedia("corrupt JPEG: bad spectral selection")
    if frame["progressive"] and ss > 0 and len(sel) != 1:
        raise UnsupportedMedia("corrupt JPEG: interleaved progressive AC scan")
    chunks = _destuff_chunks(scan["data"])
    restart = scan["restart"]
    interleaved = len(sel) > 1
    if interleaved:
        units = mcux * mcuy  # one unit = one MCU
    else:
        cid = sel[0][0]
        c = byid[cid]
        # non-interleaved: the component's OWN ceil-grid (T.81 A.2.2),
        # narrower than the MCU-padded storage grid
        csx = -(-(w * c["h"]) // maxh)  # ceil(w * h_i / maxh) samples
        csy = -(-(h * c["v"]) // maxv)
        cw = -(-csx // 8)
        ch = -(-csy // 8)
        units = cw * ch
    pred = {cid: 0 for cid, _dc, _ac in sel}
    eobrun = 0
    rd = _BitReader(chunks[0])
    chunk_idx = 0
    for unit in range(units):
        if restart and unit and unit % restart == 0:
            chunk_idx += 1
            if chunk_idx >= len(chunks):
                raise UnsupportedMedia("corrupt JPEG: missing restart interval")
            rd = _BitReader(chunks[chunk_idx])
            pred = {cid: 0 for cid, _dc, _ac in sel}
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for cid, dc_t, ac_t in sel:
                c = byid[cid]
                _bh, bw = grid[cid]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        eobrun, pred[cid] = _decode_block(
                            coeffs[cid][row], rd, huff, dc_t, ac_t,
                            ss, se, ah, al, eobrun, pred[cid],
                        )
        else:
            cid, dc_t, ac_t = sel[0]
            _bh, bw = grid[cid]
            row = (unit // cw) * bw + (unit % cw)
            eobrun, pred[cid] = _decode_block(
                coeffs[cid][row], rd, huff, dc_t, ac_t,
                ss, se, ah, al, eobrun, pred[cid],
            )


def _decode_block(out, rd, huff, dc_t, ac_t, ss, se, ah, al, eobrun, pred):
    """One 8x8 block's share of a scan (T.81 F.2 sequential; G.2
    progressive first/refinement passes). Returns (eobrun, dc_pred)."""
    if ss == 0:  # DC pass (sequential scans continue into AC below)
        if ah == 0:
            dch = huff.get((0, dc_t))
            if dch is None:
                raise UnsupportedMedia("corrupt JPEG: missing DC Huffman table")
            t = dch.decode(rd)
            pred += _extend(rd.receive(t), t)
            out[0] = pred << al
        else:  # DC refinement: one correction bit
            if rd.bit():
                out[0] |= 1 << al
        if se == 0:
            return eobrun, pred
    k = max(ss, 1)
    ach = huff.get((1, ac_t))
    if ach is None:
        raise UnsupportedMedia("corrupt JPEG: missing AC Huffman table")
    if ah == 0:  # first pass over this spectral band
        if eobrun > 0:
            return eobrun - 1, pred
        while k <= se:
            rs = ach.decode(rd)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOB run of 2^r + extension bits blocks, incl. this one
                eobrun = (1 << r) + (rd.receive(r) if r else 0) - 1
                break
            k += r
            if k > se:
                raise UnsupportedMedia("corrupt JPEG: AC overrun")
            out[k] = _extend(rd.receive(s), s) << al
            k += 1
        return eobrun, pred
    # AC refinement (G.1.2.3): correction bits for already-nonzero
    # coefficients, newly-significant coefficients appear as ±1<<al
    p1, m1 = 1 << al, -1 << al
    if eobrun == 0:
        while k <= se:
            rs = ach.decode(rd)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (rd.receive(r) if r else 0)
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise UnsupportedMedia("corrupt JPEG: bad refinement size")
                val = p1 if rd.bit() else m1
            while k <= se:
                if out[k] != 0:
                    if rd.bit() and (out[k] & p1) == 0:
                        out[k] += p1 if out[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                out[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if out[k] != 0 and rd.bit() and (out[k] & p1) == 0:
                out[k] += p1 if out[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun, pred


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the canonical BITS/HUFFVAL form —
    the same generation rule _HuffDecoder walks in reverse."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Encode HxW(x1) grey or HxWx3 RGB uint8 as baseline-sequential JFIF
    (4:4:4, Annex-K tables scaled by the libjpeg quality rule). Exists so
    tests and fixtures can fabricate real JPEGs — same role as gif_encode;
    jpeg_decode is the production decode path."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise UnsupportedMedia(f"{nc}-channel JPEG encode unsupported")
    s = 5000 // max(1, min(100, quality)) if quality < 50 else 200 - 2 * min(100, quality)
    qts = []
    for base in (_QT_LUMA, _QT_CHROMA)[: (1 if nc == 1 else 2)]:
        qts.append(np.clip((base * s + 50) // 100, 1, 255).astype(np.int64))
    p = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [p[..., 0]]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_tabs = [_huff_encode_table(*_HT_DC_LUMA), _huff_encode_table(*_HT_DC_CHROMA)]
    ac_tabs = [_huff_encode_table(*_HT_AC_LUMA), _huff_encode_table(*_HT_AC_CHROMA)]
    # per-component quantized zigzag coefficients, vectorized across blocks
    comp_zz = []
    for ci, plane in enumerate(planes):
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = np.einsum("ru,nuv,cv->nrc", _DCT_A, blocks, _DCT_A)
        q = qts[min(ci, 1)]  # natural order; zigzagged at DQT write below
        quant = np.round(coef.reshape(-1, 64) / q[None, :].astype(np.float64))
        comp_zz.append(quant.astype(np.int64)[:, _ZIGZAG])
    wr = _BitWriter()
    pred = [0] * nc
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 — one block per component per MCU
        for ci in range(nc):
            zz = comp_zz[ci][bi]
            dct, act = dc_tabs[min(ci, 1)], ac_tabs[min(ci, 1)]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            t = _category(diff)
            code, ln = dct[t]
            wr.write(code, ln)
            if t:
                wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            last = int(last_nz[-1]) + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]  # ZRL
                    wr.write(code, ln)
                    run -= 16
                t = _category(v)
                code, ln = act[(run << 4) | t]
                wr.write(code, ln)
                wr.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if last < 63:
                code, ln = act[0x00]  # EOB
                wr.write(code, ln)
    scan = wr.flush()
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00" + b"\x01\x01" + b"\x00"  # v1.1, no density units
        + b"\x00\x01\x00\x01" + b"\x00\x00"    # 1x1 aspect, no thumbnail
    )
    for ti, q in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(
            int(x) for x in q[_ZIGZAG]  # DQT stores zigzag order
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    for tc, tabs in ((0, (_HT_DC_LUMA, _HT_DC_CHROMA)), (1, (_HT_AC_LUMA, _HT_AC_CHROMA))):
        for th in range(1 if nc == 1 else 2):
            bits, vals = tabs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        th = min(ci, 1)
        out += bytes([ci + 1, (th << 4) | th])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
