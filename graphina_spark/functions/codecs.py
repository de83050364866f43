"""Pure-numpy media codecs — REAL decoders for the formats that need none
of the absent libraries (PIL/ffmpeg/soundfile).

Upgrades the multimodal pipeline's ``codec="real"`` path from a stub to a
working decode for three genuine production formats whose specs are plain
struct layouts:

- **PPM** (P6 binary, P3 ASCII — Netpbm): header ``P6 <w> <h> <maxval>``
  then raw RGB bytes; the interchange format imaging tools emit.
- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB): 14-byte file
  header + BITMAPINFOHEADER; bottom-up rows padded to 4 bytes.
- **WAV** (RIFF PCM 16-bit): chunked RIFF layout; ``fmt `` + ``data``.

Compressed formats (JPEG/PNG/MP3/MP4) still raise with the exact library
call needed — decoding them without their libraries would mean vendoring a
codec, not writing an operator.

Everything is deterministic byte→array arithmetic (no dithering, no color
management), so tests pin exact pixel/sample values, and the Arrow-batched
``mapInPandas`` wrappers in functions/multimodal.py inherit exactness.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(blob: bytes) -> str:
    """'ppm' | 'bmp' | 'wav' | 'jpeg' | 'png' | 'unknown'."""
    if blob is None or len(blob) < 4:
        return "unknown"
    if blob[:2] in (b"P6", b"P3"):
        return "ppm"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def decode_ppm(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from a P6 (binary) or P3 (ASCII) PPM."""
    magic = blob[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError("not a PPM")
    # header tokens: magic, width, height, maxval — whitespace/comments
    tokens, i, n = [], 2, len(blob)
    while len(tokens) < 3 and i < n:
        c = blob[i:i + 1]
        if c == b"#":
            while i < n and blob[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not blob[j:j + 1].isspace():
                j += 1
            tokens.append(int(blob[i:j]))
            i = j
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if magic == b"P6":
        i += 1  # single whitespace after maxval
        px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=i)
    else:
        px = np.array(blob[i:].split()[: w * h * 3], dtype=np.uint8)
    return px.reshape(h, w, 3)


def decode_bmp(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bit BI_RGB BMP
    (bottom-up or top-down; row stride padded to 4 bytes; BGR on disk)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", blob[10:14])[0]
    w, h = struct.unpack("<ii", blob[18:26])
    bpp = struct.unpack("<H", blob[28:30])[0]
    compression = struct.unpack("<I", blob[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(blob, dtype=np.uint8, count=w * 3, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if bottom_up else img


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """(samples[int16, shape (n, channels)], sample_rate) from RIFF PCM16."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i, n = 12, len(blob)
    fmt = None
    while i + 8 <= n:
        cid, size = blob[i:i + 4], struct.unpack("<I", blob[i + 4:i + 8])[0]
        body = blob[i + 8:i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM 16-bit supported")
            fmt = (channels, rate)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            channels, rate = fmt
            samples = np.frombuffer(body, dtype="<i2")
            return samples.reshape(-1, channels), rate
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def decode_image(blob: bytes) -> np.ndarray:
    """Dispatch: real decode for PPM/BMP; actionable error for the rest."""
    kind = sniff_format(blob)
    if kind == "ppm":
        return decode_ppm(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    raise NotImplementedError(
        f"decoding {kind!r} needs PIL.Image.open(io.BytesIO(blob)) — "
        "library not available in this container"
    )


def resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (floor index mapping — the
    cv2.INTER_NEAREST convention)."""
    h, w = img.shape[:2]
    ri = (np.arange(th) * h) // th
    ci = (np.arange(tw) * w) // tw
    return img[ri][:, ci]


def image_stats(img: np.ndarray) -> tuple:
    """(height, width, channels, per-channel means, per-channel stds)."""
    h, w, c = img.shape
    flat = img.reshape(-1, c).astype(np.float64)
    return (h, w, c, flat.mean(axis=0).tolist(), flat.std(axis=0).tolist())


def audio_stats(samples: np.ndarray, rate: int) -> tuple:
    """(n_samples, channels, sample_rate, duration_s, rms, peak)."""
    n, ch = samples.shape
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt((x * x).mean())) if n else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    return (n, ch, rate, n / rate if rate else 0.0, rms, peak)
