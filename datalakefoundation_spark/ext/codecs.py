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
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedMedia(ValueError):
    """Payload is not a format the built-in codec tier supports."""


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
    if HAVE_PIL and kind in ("png", "ppm"):  # pragma: no cover - no PIL here
        with _PILImage.open(io.BytesIO(content)) as im:
            return np.asarray(im.convert(im.mode if im.mode in ("L", "RGB", "RGBA") else "RGB"))
    if kind == "png":
        return png_decode(content)
    if kind == "ppm":
        return ppm_decode(content)
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
