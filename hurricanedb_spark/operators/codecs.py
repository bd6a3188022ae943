"""Real media decode kernels for uncompressed/stdlib-decodable formats.

The container has no external codec libraries (PIL/librosa/ffmpeg), but
several production formats are decodable with the standard library alone,
so these kernels are REAL, not stand-ins:

  PNG  — chunk parse + zlib inflate (stdlib) + scanline unfilter
         (filters 0-4 per the PNG spec), 8-bit gray/RGB/RGBA
  BMP  — BITMAPINFOHEADER 24/32-bit uncompressed, bottom-up row order,
         4-byte row padding
  WAV  — stdlib `wave` module (PCM 8/16-bit)

Compressed formats that genuinely need external codecs (JPEG, MP3, video)
raise UnsupportedMediaError — callers fall back to byte-statistics
features and the drop-in seam stays documented. All kernels are pure
functions over bytes -> numpy, executed inside Arrow-batched mapInPandas
(operators/multimodal.py); Spark never sees per-pixel Python objects.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Format requires an external codec not present in this environment."""


class CorruptMediaError(UnsupportedMediaError):
    """Payload claims a decodable format but the container is damaged
    (truncated IDAT, missing IHDR, bad chunk structure). Subclass of
    UnsupportedMediaError so a broad `except UnsupportedMediaError`
    still degrades gracefully, while callers that care can label the
    row corrupt instead of merely codec-less."""


# --------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit PNG into (height, width, channels) uint8."""
    if not payload.startswith(_PNG_MAGIC):
        raise UnsupportedMediaError("not a PNG")
    pos = len(_PNG_MAGIC)
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos < len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise UnsupportedMediaError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "interlace not supported (8-bit non-interlaced only)"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise CorruptMediaError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CorruptMediaError(f"PNG IDAT corrupt: {e}") from e
    stride = width * ch
    if len(raw) < height * (1 + stride):
        raise CorruptMediaError("PNG scanline data truncated")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        filt = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if filt == 1:  # Sub: per-channel prefix sum; uint8 accumulate wraps mod 256
            line = np.cumsum(
                line.reshape(width, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif filt == 2:  # Up: uint8 add wraps mod 256
            line += prev
        elif filt == 3:  # Average: sequential in x, vectorized across channels
            cur = line.reshape(width, ch).astype(np.int32)
            up = prev.reshape(width, ch).astype(np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(width):
                left = (cur[x] + ((left + up[x]) >> 1)) & 0xFF
                cur[x] = left
            line = cur.astype(np.uint8).reshape(stride)
        elif filt == 4:  # Paeth: sequential in x, vectorized across channels
            cur = line.reshape(width, ch).astype(np.int32)
            up = prev.reshape(width, ch).astype(np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(width):
                b = up[x]
                p = left + b - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - b)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, upleft)
                )
                left = (cur[x] + pred) & 0xFF
                cur[x] = left
                upleft = b
            line = cur.astype(np.uint8).reshape(stride)
        elif filt != 0:
            raise UnsupportedMediaError(f"PNG filter {filt}")
        out[y] = line
        prev = line
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) — test/write-path inverse."""
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# -------------------------------------------------------------------- JPEG


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG decode via Pillow when importable — the documented codec seam
    (a DCT decoder is out of scope for the stdlib-only container). Without
    Pillow this raises UnsupportedMediaError and callers keep the honest
    byte-stat fallback; with Pillow present the same call decodes to
    (h, w, 3) uint8 RGB with no other code change."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG")
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency
    except ImportError as e:
        raise UnsupportedMediaError("JPEG decode requires Pillow") from e
    try:
        img = Image.open(io.BytesIO(payload))
        return np.asarray(img.convert("RGB"))
    except Exception as e:  # truncated / garbled entropy stream
        raise CorruptMediaError(str(e)) from e


# --------------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP into (h, w, 3|4) uint8 (BGR
    order converted to RGB)."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size = struct.unpack("<I", payload[14:18])[0]
    if header_size < 40:
        raise UnsupportedMediaError("BMP core header not supported")
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    ch = bpp // 8
    stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    flip = h > 0
    h = abs(h)
    rows = []
    for y in range(h):
        off = data_offset + y * stride
        rows.append(np.frombuffer(payload, np.uint8, w * ch, off).reshape(w, ch))
    img = np.stack(rows[::-1] if flip else rows)
    img = img[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]  # BGR(A) -> RGB(A)
    return img


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit BMP writer (bottom-up) — test/write-path inverse."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    bgr = pixels[:, :, [2, 1, 0]]
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * (stride - w * 3) for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


# --------------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PCM WAV -> (sample_rate, n_channels, samples int16[frames,ch])."""
    if payload[:4] != b"RIFF":
        raise UnsupportedMediaError("not a WAV")
    try:
        with wave.open(io.BytesIO(payload)) as f:
            rate, nch, sw = f.getframerate(), f.getnchannels(), f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(str(e)) from e
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise UnsupportedMediaError(f"WAV sample width {sw}")
    return rate, nch, arr.reshape(-1, nch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """PCM16 WAV writer — test/write-path inverse."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ------------------------------------------------------------------ kernels


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (no loops)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def image_features(pixels: np.ndarray) -> list[float]:
    """8 deterministic image features: dims + per-channel mean/std summary."""
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, pixels.shape[2]).astype(np.float64)
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    return [
        float(w),
        float(h),
        float(pixels.shape[2]),
        float(mean.mean()),
        float(std.mean()),
        float(flat.min()),
        float(flat.max()),
        float(np.median(flat)),
    ]


def audio_features(rate: int, samples: np.ndarray) -> list[float]:
    """8 deterministic audio features: duration, rms, zero-crossings, …"""
    x = samples.astype(np.float64).mean(axis=1)  # downmix
    n = len(x)
    zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
    return [
        float(rate),
        float(samples.shape[1]),
        float(n),
        float(n / rate) if rate else 0.0,
        float(np.sqrt(np.mean(x**2))) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        float(zc),
        float(zc / (n / rate)) if n > 1 and rate else 0.0,
    ]
