"""Stdlib PNG/WAV codec tests — the REAL multimodal decode hot path.

The decoder must be exact: every filter type (0-4), every supported
channel count, and the PCM sample math are checked bit-for-bit against
independently-constructed payloads.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pandas_expr_spark.functions import multimodal as mm


def _rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("shape", [(6, 8, 3), (5, 5), (1, 1, 4),
                                   (7, 3, 2), (16, 16, 3), (2, 40, 1)])
def test_png_roundtrip(shape):
    a = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    dec = mm.decode_png(mm.encode_png(a))
    exp = a if a.ndim == 3 else a[:, :, None]
    assert dec.shape == exp.shape
    assert (dec == exp).all()


def _filter_scanlines(a: np.ndarray, ftype: int) -> bytes:
    """Forward-apply a PNG filter per the spec — an independent encoder
    implementation so decode is not tested against its own inverse."""
    h, w, nch = a.shape
    stride = w * nch
    flat = a.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        enc = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = line[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else ul)
            enc[x] = (line[x] - pred) % 256
        out.append(ftype)
        out += enc.astype(np.uint8).tobytes()
        prev = line
    return bytes(out)


def _build_png(a: np.ndarray, raw_scanlines: bytes) -> bytes:
    h, w, nch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_scanlines))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_png_all_filters(ftype, nch):
    a = _rng().integers(0, 256, size=(9, 7, nch), dtype=np.uint8)
    payload = _build_png(a, _filter_scanlines(a, ftype))
    assert (mm.decode_png(payload) == a).all()


def test_png_mixed_filters_per_row():
    a = _rng().integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    # alternate filter type per scanline — decoders must track row state
    raw = bytearray()
    for y in range(10):
        row = a[y:y + 1]
        ft = y % 5
        # re-filter row-by-row against the true previous row
        full = _filter_scanlines(a[: y + 1], ft)
        stride = 6 * 3 + 1
        raw += full[y * stride:(y + 1) * stride]
    assert (mm.decode_png(_build_png(a, bytes(raw))) == a).all()


def test_png_rejects_bad_payloads():
    with pytest.raises(ValueError):
        mm.decode_png(b"not a png")
    a = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = mm.encode_png(a)
    with pytest.raises(ValueError):
        mm.decode_png(good[:40])  # truncated: no IDAT


def test_wav_roundtrip_16bit():
    s = np.sin(np.linspace(0, 40 * np.pi, 8000))
    rate, out = mm.decode_wav_pcm(mm.encode_wav_pcm(s, 16000))
    assert rate == 16000 and out.shape == (8000, 1)
    # 16-bit quantization error bound
    assert np.abs(out[:, 0] - s).max() <= 1.0 / 32768 + 1e-12


def test_wav_stereo_and_exact_dyadic():
    # dyadic rationals k/256 survive encode→decode exactly
    k = np.arange(512) % 256
    s = ((k - 128) / 256.0).reshape(-1, 2)
    rate, out = mm.decode_wav_pcm(mm.encode_wav_pcm(s, 44100))
    assert rate == 44100 and out.shape == s.shape
    assert (out == s).all()


def test_wav_8bit_path():
    # hand-build an 8-bit PCM WAV
    pcm = bytes(range(256))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = mm.decode_wav_pcm(payload)
    assert rate == 8000
    exp = (np.arange(256) - 128) / 128.0
    assert np.allclose(out[:, 0], exp)


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float fmt tag
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        mm.decode_wav_pcm(payload)


def test_image_pixel_stats_spark(spark):
    import pandas as pd
    a1 = np.full((4, 5, 3), 10, dtype=np.uint8)
    a2 = _rng().integers(0, 256, size=(3, 3, 1), dtype=np.uint8)
    pdf = pd.DataFrame({
        "media_id": [1, 2, 3],
        "payload": [mm.encode_png(a1), mm.encode_png(a2), b"corrupt"],
    })
    out = (mm.image_pixel_stats(spark.createDataFrame(pdf))
           .orderBy("media_id").collect())
    assert (out[0].width, out[0].height, out[0].channels) == (5, 4, 3)
    assert out[0].mean_px == 10.0
    assert out[1].mean_px == pytest.approx(float(a2.mean()))
    assert out[2].width is None  # corrupt row yields nulls, no job failure


def test_audio_pcm_stats_spark(spark):
    import pandas as pd
    s = ((np.arange(800) % 256 - 128) / 256.0)
    pdf = pd.DataFrame({
        "media_id": [1, 2],
        "payload": [mm.encode_wav_pcm(s, 8000), b"junk"],
    })
    out = (mm.audio_pcm_stats(spark.createDataFrame(pdf))
           .orderBy("media_id").collect())
    assert out[0].sample_rate == 8000 and out[0].n_frames == 800
    assert out[0].rms == pytest.approx(float(np.sqrt((s ** 2).mean())))
    assert out[1].sample_rate is None
