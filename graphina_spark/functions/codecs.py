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
- **PNG** (non-interlaced, 8-bit depth; gray / RGB / palette / gray+alpha
  / RGBA): stdlib ``zlib`` inflate + the five scanline unfilters (None /
  Sub / Up / Average / Paeth, RFC 2083 §6) — Up/None vectorized, the
  byte-recurrent filters decoded per-row.
- **GIF** (87a/89a, first frame, global or local palette, interlaced or
  not): pure-Python LZW with variable code width and clear/EOI handling.

Matching minimal ENCODERS (``encode_png`` cycling all five filter types,
``encode_gif`` using the spec's clear-code-reset uncompressed LZW idiom)
exist so round-trip gates prove the decoders against spec-conformant
byte streams built from deterministic pixel arithmetic that a DuckDB
oracle reproduces without any codec.

Truly library-bound formats (JPEG/MP3/MP4) still raise with the exact
library call needed — DCT/entropy coding without libjpeg would mean
vendoring a codec, not writing an operator.

Everything is deterministic byte→array arithmetic (no dithering, no color
management), so tests pin exact pixel/sample values, and the Arrow-batched
``mapInPandas`` wrappers in functions/multimodal.py inherit exactness.
"""

from __future__ import annotations

import struct
import zlib

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
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """(h, w, channels) uint8 from a non-interlaced 8-bit-depth PNG
    (color types 0/2/3/4/6; palette expanded to RGB).  Raises ValueError
    on interlaced or 16-bit images (out of contract)."""
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, n = 8, len(blob)
    w = h = depth = color = interlace = None
    idat, plte = [], None
    while i + 8 <= n:
        size = struct.unpack(">I", blob[i:i + 4])[0]
        ctype = blob[i + 4:i + 8]
        body = blob[i + 8:i + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + size  # size + type + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError("only 8-bit-depth PNG supported")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = ch  # bytes per pixel at depth 8
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = np.frombuffer(bytes(row), dtype=np.uint8)
        elif ft == 2:  # Up — vectorized
            out[r] = (
                np.frombuffer(bytes(row), dtype=np.uint8).astype(np.int32)
                + prev
            ) % 256
        else:  # Sub / Average / Paeth — byte-recurrent
            cur = bytearray(stride)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(out[r - 1][x - bpp]) if (r and x >= bpp) else 0
                if ft == 1:
                    rec = a
                elif ft == 3:
                    rec = (a + b) // 2
                elif ft == 4:
                    rec = _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown PNG filter {ft}")
                cur[x] = (row[x] + rec) & 0xFF
            out[r] = np.frombuffer(bytes(cur), dtype=np.uint8)
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, filter_cycle: bool = True) -> bytes:
    """Minimal spec-conformant PNG writer (8-bit gray/RGB/RGBA by channel
    count).  ``filter_cycle=True`` rotates scanline filters 0→4 per row so
    a round-trip exercises every unfilter path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        row = img[r].reshape(-1).astype(np.int32)
        ft = (r % 5) if filter_cycle else 0
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - left) % 256
        elif ft == 2:  # Up
            enc = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.empty_like(row)
            for x in range(len(row)):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (row[x] - _paeth(a, b, c)) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-flavor LZW (variable width, clear/EOI codes, LSB-first bits)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    code_size = min_code_size + 1
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            if len(out) >= max_pixels:
                return out
            prev = list(entry)
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB — the FIRST frame of a GIF87a/89a stream
    (global or local palette, interlaced or sequential rows)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    i = 13
    gpal = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        gpal = np.frombuffer(
            blob, dtype=np.uint8, count=gsize * 3, offset=i
        ).reshape(-1, 3)
        i += gsize * 3
    while i < len(blob):
        b0 = blob[i]
        if b0 == 0x21:  # extension: label + sub-blocks
            i += 2
            while blob[i] != 0:
                i += 1 + blob[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            _lx, _ty, iw, ih, iflags = struct.unpack("<HHHHB", blob[i + 1:i + 10])
            i += 10
            pal = gpal
            if iflags & 0x80:
                lsize = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    blob, dtype=np.uint8, count=lsize * 3, offset=i
                ).reshape(-1, 3)
                i += lsize * 3
            if pal is None:
                raise ValueError("GIF image without a palette")
            min_code = blob[i]
            i += 1
            data = bytearray()
            while blob[i] != 0:
                size = blob[i]
                data += blob[i + 1:i + 1 + size]
                i += 1 + size
            i += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            arr = np.array(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows written in 4 passes
                ordered = np.empty_like(arr)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for r in range(start, ih, step):
                        ordered[r] = arr[src]
                        src += 1
                arr = ordered
            return pal[arr]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a writer: one frame of palette ``indices`` (h, w) over
    ``palette`` (p, 3).  Uses the spec's uncompressed-LZW idiom — a CLEAR
    code before every pixel code keeps the code width fixed at
    min_code_size+1 while remaining a fully conformant stream."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = indices.shape
    p = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(p, 2)))))
    psize = 1 << bits
    pal = np.zeros((psize, 3), dtype=np.uint8)
    pal[:p] = palette
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    head += pal.tobytes()
    head += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = bits
    clear, eoi = 1 << bits, (1 << bits) + 1
    code_size = bits + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in indices.reshape(-1):
        emit(clear)
        emit(int(v))
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    body = bytes([min_code])
    for off in range(0, len(stream), 255):
        blockb = bytes(stream[off:off + 255])
        body += bytes([len(blockb)]) + blockb
    return head + body + b"\x00\x3b"


def decode_image(blob: bytes) -> np.ndarray:
    """Dispatch: real decode for PPM/BMP/PNG/GIF; actionable error for the
    library-bound formats (JPEG)."""
    kind = sniff_format(blob)
    if kind == "ppm":
        return decode_ppm(blob)
    if kind == "bmp":
        return decode_bmp(blob)
    if kind == "png":
        return decode_png(blob)
    if kind == "gif":
        return decode_gif(blob)
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
