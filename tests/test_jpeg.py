"""Baseline JPEG codec (functions/codecs.py) — entropy-coding losslessness
and honest-boundary tests.

The decode oracle is the codec-free pixel pipeline: level-shift -> 8x8 DCT
-> quantize(round) -> dequantize -> IDCT -> round+clip, computed with the
same float64 matrix arithmetic the codec uses.  Huffman/zigzag/marker
plumbing is LOSSLESS, so decode(encode(img)) must equal the pipeline
BIT-EXACTLY — any coding bug shows up as a pixel diff.  Block-constant
images additionally reconstruct the ORIGINAL exactly at flat quant (the
driver-gate fixture class, independently checkable by plain arithmetic).
"""

import numpy as np
import pytest
from struct import error as struct_error

from graphina_spark.functions.codecs import (
    JPEG_QUANT_FLAT,
    JPEG_QUANT_MILD,
    _fdct,
    _idct,
    decode_image,
    decode_jpeg,
    encode_jpeg,
    sniff_format,
)


def _pipeline_gray(img: np.ndarray, quant) -> np.ndarray:
    """The lossy-part twin: what a correct decoder must return, computed
    without any entropy coding."""
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(np.float64)
            if blk.shape != (8, 8):
                blk = np.pad(
                    blk,
                    ((0, 8 - blk.shape[0]), (0, 8 - blk.shape[1])),
                    mode="edge",
                )
            coef = np.round(_fdct(blk - 128.0) / q)
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.round(
                _idct(coef * q) + 128.0
            )
    return np.clip(out[:h, :w], 0, 255).astype(np.uint8)


def _planted(h, w, seed=0):
    # deterministic busy image: every AC frequency band gets energy
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return ((seed + 7 * r * r + 13 * c + 5 * r * c) % 256).astype(np.uint8)


def test_jpeg_gray_roundtrip_matches_pipeline_flat_quant():
    img = _planted(24, 16)
    got = decode_jpeg(encode_jpeg(img, quant=JPEG_QUANT_FLAT))
    assert got.shape == (24, 16, 1)
    np.testing.assert_array_equal(
        got[:, :, 0], _pipeline_gray(img, JPEG_QUANT_FLAT)
    )


def test_jpeg_gray_roundtrip_matches_pipeline_mild_quant():
    img = _planted(17, 23, seed=3)  # non-multiple-of-8 dims: edge blocks
    got = decode_jpeg(encode_jpeg(img, quant=JPEG_QUANT_MILD))
    np.testing.assert_array_equal(
        got[:, :, 0], _pipeline_gray(img, JPEG_QUANT_MILD)
    )


def test_jpeg_block_constant_is_exact():
    # constant 8x8 blocks + flat quant: only an integer DC coefficient
    # survives, so the round trip reproduces the ORIGINAL bytes — the
    # arithmetic the driver-gate oracle recomputes without the codec
    vals = np.array([[10, 200], [255, 0], [128, 77]])
    img = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quant=JPEG_QUANT_FLAT))
    np.testing.assert_array_equal(got[:, :, 0], img)


def test_jpeg_color_roundtrip_matches_pipeline():
    rgb = np.stack(
        [_planted(16, 16, s) for s in (0, 11, 29)], axis=-1
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, quant=JPEG_QUANT_FLAT))
    assert got.shape == (16, 16, 3)
    # twin: forward color transform (encoder's exact rounding), per-plane
    # pipeline, inverse transform with the decoder's exact rounding
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255
    )
    cr = np.clip(
        np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255
    )
    yy, cbb, crr = (
        _pipeline_gray(p.astype(np.uint8), JPEG_QUANT_FLAT).astype(np.float64)
        for p in (y, cb, cr)
    )
    er = np.round(yy + 1.402 * (crr - 128.0))
    eg = np.round(yy - 0.344136 * (cbb - 128.0) - 0.714136 * (crr - 128.0))
    eb = np.round(yy + 1.772 * (cbb - 128.0))
    exp = np.clip(np.stack([er, eg, eb], axis=-1), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_jpeg_sniff_and_dispatch():
    img = _planted(8, 8)
    blob = encode_jpeg(img)
    assert sniff_format(blob) == "jpeg"
    out = decode_image(blob)  # dispatch no longer raises for jpeg
    np.testing.assert_array_equal(
        out[:, :, 0], _pipeline_gray(img, JPEG_QUANT_FLAT)
    )


def test_jpeg_progressive_raises():
    blob = bytearray(encode_jpeg(_planted(8, 8)))
    # rewrite the SOF0 marker (FFC0) to SOF2 (progressive)
    i = bytes(blob).find(b"\xff\xc0")
    assert i > 0
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(blob))


def test_jpeg_truncated_raises():
    blob = encode_jpeg(_planted(16, 16))
    with pytest.raises((ValueError, IndexError, struct_error)):
        decode_jpeg(blob[: len(blob) // 2])


def test_real_image_features_grayscale_png_does_not_crash(spark):
    # 1-channel images used to under-fill the 13-column feature row
    # (*means[:3] with one mean) and kill the whole Arrow batch — the
    # crash-class cousin of the mirrored-readout blind spots
    from graphina_spark.functions.codecs import encode_png
    from graphina_spark.functions.multimodal import real_image_features

    gray = _planted(6, 5)[:, :, None]  # (h, w, 1) — PNG color type 0
    blob = encode_png(gray)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, blob binary"
    )
    row = real_image_features(df).collect()[0]
    assert row["ok"] is True
    assert row["channels"] == 1
    m = float(gray.astype(np.float64).mean())
    # luma replicated into r/g/b by convention
    assert row["mean_r"] == pytest.approx(m)
    assert row["mean_g"] == pytest.approx(m)
    assert row["mean_b"] == pytest.approx(m)


# ------------------------------------------------- r5 adversarial fixtures
# (VERDICT r4, task 7: codec boundary conditions the roundtrip tests and
# the DuckDB gate can't see — full-size DHT, restart markers, odd dims,
# truncated scans)


def test_jpeg_odd_dimensions_roundtrip():
    # edge blocks replicate; 13x9 exercises both partial-row and
    # partial-column padding simultaneously
    img = _planted(13, 9, seed=3)
    got = decode_jpeg(encode_jpeg(img, quant=JPEG_QUANT_MILD))[:, :, 0]
    np.testing.assert_array_equal(got, _pipeline_gray(img, JPEG_QUANT_MILD))


def test_jpeg_odd_dimensions_color_roundtrip():
    g = _planted(11, 7, seed=5)
    img = np.stack([g, np.roll(g, 1, axis=0), np.roll(g, 1, axis=1)], axis=-1)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (11, 7, 3)


def _segment(marker: int, body: bytes) -> bytes:
    import struct as _s
    return b"\xff" + bytes([marker]) + _s.pack(">H", len(body) + 2) + body


def test_jpeg_max_size_dht_parses():
    # a FULL 256-symbol table (all 256 HUFFVALs at code length 16) is the
    # largest legal DHT; the parser must accept it and fail only on the
    # absent SOS — not on the table itself
    # BITS bytes are each <=255, so the 256-symbol maximum is encoded as
    # 1 code at length 15 + 255 at length 16
    bits = [0] * 14 + [1, 255]
    body = bytes([0x10]) + bytes(bits) + bytes(range(256))
    blob = b"\xff\xd8" + _segment(0xC4, body) + b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(blob)


def test_jpeg_truncated_dht_raises_valueerror():
    # BITS claims 5 symbols but only 2 HUFFVALs follow — must be a clean
    # ValueError, not a silent short table or a raw IndexError
    bits = [0, 5] + [0] * 14
    body = bytes([0x00]) + bytes(bits) + bytes([1, 2])
    blob = b"\xff\xd8" + _segment(0xC4, body) + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated DHT"):
        decode_jpeg(blob)


def test_jpeg_oversubscribed_dht_raises_valueerror():
    # 3 codes of length 1 exceed the 2-code space — overlapping canonical
    # codes downstream would decode garbage silently
    bits = [3] + [0] * 15
    body = bytes([0x00]) + bytes(bits) + bytes([1, 2, 3])
    blob = b"\xff\xd8" + _segment(0xC4, body) + b"\xff\xd9"
    with pytest.raises(ValueError, match="over-subscribed"):
        decode_jpeg(blob)


def test_jpeg_restart_interval_raises_notimplemented():
    # inject a nonzero DRI into a valid stream: the scan reader has no
    # RSTn resync, so this must be an up-front honest boundary
    blob = encode_jpeg(_planted(8, 8))
    i = blob.find(b"\xff\xc4")  # before the first DHT
    assert i > 0
    dri = _segment(0xDD, b"\x00\x04")
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(blob[:i] + dri + blob[i:])


def test_jpeg_zero_restart_interval_ignored():
    # DRI with interval 0 is a no-op per T.81 — stream stays decodable
    blob = encode_jpeg(_planted(8, 8))
    i = blob.find(b"\xff\xc4")
    dri = _segment(0xDD, b"\x00\x00")
    got = decode_jpeg(blob[:i] + dri + blob[i:])[:, :, 0]
    np.testing.assert_array_equal(
        got, _pipeline_gray(_planted(8, 8), JPEG_QUANT_FLAT)
    )


def test_jpeg_truncated_scan_is_valueerror():
    # chop mid-scan: the bit reader must raise the codec ValueError
    # convention, never a raw IndexError (ADVICE r4)
    blob = encode_jpeg(_planted(16, 16))
    for cut in (len(blob) - 4, len(blob) - 8):
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])


def test_jpeg_quant_table_validation():
    img = _planted(8, 8)
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg(img, quant=[0] * 64)  # zero divides
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg(img, quant=[256] * 64)  # overflows 1-byte DQT
