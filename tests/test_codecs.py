"""Pure-numpy media codecs (functions/codecs.py) + the real-decode
mapInPandas wrappers (functions/multimodal.py)."""

import struct

import numpy as np
import pytest

from graphina_spark.functions.codecs import (
    audio_stats,
    decode_bmp,
    decode_ppm,
    decode_wav,
    image_stats,
    resize_nearest,
    sniff_format,
)


def make_ppm_p6(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def make_ppm_p3(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    body = " ".join(str(int(x)) for x in img.reshape(-1))
    return (f"P3\n{w} {h}\n255\n{body}\n").encode()


def make_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BI_RGB BMP of an (h, w, 3) RGB array."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r][:, ::-1].tobytes()  # RGB -> BGR
        data += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + bytes(data)


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


IMG = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)


def test_ppm_roundtrip_exact():
    assert (decode_ppm(make_ppm_p6(IMG)) == IMG).all()
    assert (decode_ppm(make_ppm_p3(IMG)) == IMG).all()


def test_bmp_roundtrip_exact():
    assert (decode_bmp(make_bmp(IMG)) == IMG).all()
    # odd width exercises the 4-byte row padding
    odd = np.arange(2 * 5 * 3, dtype=np.uint8).reshape(2, 5, 3)
    assert (decode_bmp(make_bmp(odd)) == odd).all()


def test_wav_roundtrip_and_stats():
    s = np.array([[0, 100], [200, -300], [32767, -32768]], dtype=np.int16)
    samples, rate = decode_wav(make_wav(s, rate=16000))
    assert rate == 16000 and (samples == s).all()
    n, ch, r, dur, rms, peak = audio_stats(samples, rate)
    assert (n, ch, r) == (3, 2, 16000)
    assert dur == pytest.approx(3 / 16000)
    assert peak == pytest.approx(1.0)


def test_sniff_and_unsupported():
    assert sniff_format(make_ppm_p6(IMG)) == "ppm"
    assert sniff_format(make_bmp(IMG)) == "bmp"
    assert sniff_format(make_wav(np.zeros((1, 1), np.int16))) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0junk") == "jpeg"
    from graphina_spark.functions.codecs import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0junk")


def test_resize_nearest_exact():
    img = np.array([[[0] * 3, [10] * 3], [[20] * 3, [30] * 3]], dtype=np.uint8)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0, 0] == 0).all() and (up[3, 3] == 30).all()
    assert (resize_nearest(up, 2, 2) == img).all()


def test_real_image_features_spark(spark):
    from graphina_spark.functions.multimodal import real_image_features

    blobs = [
        (1, bytearray(make_ppm_p6(IMG))),
        (2, bytearray(make_bmp(IMG))),
        (3, bytearray(b"\xff\xd8\xff\xe0jpegjunk")),
    ]
    df = spark.createDataFrame(blobs, "media_id long, blob binary")
    got = {r["media_id"]: r for r in real_image_features(df).collect()}
    h, w, c, means, stds = image_stats(IMG)
    for mid in (1, 2):
        r = got[mid]
        assert r["ok"] and (r["height"], r["width"], r["channels"]) == (2, 3, 3)
        assert r["mean_r"] == pytest.approx(means[0])
        assert r["std_b"] == pytest.approx(stds[2])
    assert not got[3]["ok"] and "PIL" in got[3]["err"]
    assert got[3]["format"] == "jpeg"


def test_real_audio_features_spark(spark):
    from graphina_spark.functions.multimodal import real_audio_features

    s = np.array([[1000], [-1000], [500], [0]], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(make_wav(s, 8000))), (2, bytearray(b"nonsense"))],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r for r in real_audio_features(df).collect()}
    assert got[1]["ok"] and got[1]["n_samples"] == 4
    assert got[1]["duration_s"] == pytest.approx(4 / 8000)
    assert not got[2]["ok"]
