"""MJPEG-AVI container + the real builtin media decoders (JPEG/PNG/WAV).

The AVI reader's oracle is structural (RIFF spec fields round-trip through
an independent header parse) plus content (PSNR of decoded frames vs the
planted truth — the entropy layer is our own JPEG codec, already
fixture-validated in test_jpeg.py)."""

import io
import struct
import wave

import numpy as np
import pandas as pd
import pytest

from rasteret_spark.format import avi, jpegcodec, pngcodec
from rasteret_spark.operators import multimodal

RNG = np.random.default_rng(55)


def _smooth_frames(t, h, w):
    """Smooth gradient frames (JPEG-friendly) with a per-frame DC shift."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 2) % 200
    return np.stack([(base + 10 * k) % 256 for k in range(t)]).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


# --- container layer ---------------------------------------------------------
def test_avi_roundtrip_and_info():
    frames = _smooth_frames(7, 40, 56)
    buf = avi.frames_to_avi(frames, fps=5, quality=95)
    inf = avi.parse_avi(buf)
    assert (inf.width, inf.height, inf.fps, inf.n_frames) == (56, 40, 5, 7)
    assert inf.handler == "MJPG"
    got = [jpegcodec.decode(f) for f in avi.iter_frames(buf)]
    assert len(got) == 7
    for g, want in zip(got, frames):
        assert g.shape == (40, 56)
        assert _psnr(g, want) > 35.0


def test_avi_odd_sized_payload_word_alignment():
    # odd-length frame payloads: the chunk walk must skip RIFF pad bytes
    # (iter_frames never decodes, so raw byte payloads are fine here)
    frames = [b"\x01\x02\x03", b"\x04\x05\x06\x07", b"\x08"]
    buf = avi.encode_avi(frames, 8, 8, fps=3)
    assert list(avi.iter_frames(buf)) == frames


def test_avi_error_paths():
    with pytest.raises(avi.AviError, match="at least one frame"):
        avi.encode_avi([], 8, 8)
    with pytest.raises(avi.AviError, match="not an AVI"):
        avi.parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    buf = avi.frames_to_avi(_smooth_frames(2, 8, 8))
    with pytest.raises(avi.AviError, match="truncated"):
        avi.parse_avi(buf[:40])


# --- builtin decoders --------------------------------------------------------
def _wav_bytes(x, rate=8000, nch=1, width=2):
    b = io.BytesIO()
    with wave.open(b, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(width)
        f.setframerate(rate)
        if width == 2:
            f.writeframes((x * 32767).astype("<i2").tobytes())
        else:
            f.writeframes(((x * 127) + 128).astype(np.uint8).tobytes())
    return b.getvalue()


def test_wav_decode_kernel():
    t = np.linspace(0, 1, 800, endpoint=False)
    x = np.sin(2 * np.pi * 5 * t)
    wavef = multimodal._DECODERS["audio-wav"](_wav_bytes(x))
    assert wavef.shape == (1, 800)
    np.testing.assert_allclose(wavef[0], x, atol=1e-3)
    # stereo interleaving: channel axis first
    st = np.stack([x, -x], axis=1).reshape(-1)
    wavef2 = multimodal._DECODERS["audio-wav"](_wav_bytes(st, nch=2))
    assert wavef2.shape == (2, 800)
    np.testing.assert_allclose(wavef2[0], x, atol=1e-3)
    np.testing.assert_allclose(wavef2[1], -x, atol=1e-3)


def test_png_jpeg_builtin_kernels_match_codecs():
    img = _smooth_frames(1, 33, 21)[0]
    png = pngcodec.encode(img)
    jpg = jpegcodec.encode(img, quality=95)
    g_png = multimodal._DECODERS["png"](png)
    assert g_png.shape == (33, 21)
    np.testing.assert_array_equal(g_png, img.astype(np.float64))  # lossless
    g_jpg = multimodal._DECODERS["jpeg"](jpg)
    assert _psnr(g_jpg, img) > 35.0
    # 16-bit PNG scales into the 0..255 presentation range
    img16 = (img.astype(np.uint16) * 257)
    g16 = multimodal._DECODERS["png"](pngcodec.encode(img16))
    np.testing.assert_allclose(g16, img.astype(np.float64), atol=0.01)
    # RGB -> BT.601 luma
    rgb = np.dstack([img, img // 2, img // 3])
    lum = multimodal._DECODERS["png"](pngcodec.encode(rgb))
    want = img * 0.299 + (img // 2) * 0.587 + (img // 3) * 0.114
    np.testing.assert_allclose(lum, want)


def test_sniff_offset_patterns():
    frames = _smooth_frames(1, 8, 8)
    assert multimodal.sniff_kind(avi.frames_to_avi(frames)) == "video-avi"
    assert multimodal.sniff_kind(_wav_bytes(np.zeros(4))) == "audio-wav"
    assert multimodal.sniff_kind(pngcodec.encode(frames[0])) == "png"
    assert multimodal.sniff_kind(jpegcodec.encode(frames[0])) == "jpeg"
    assert multimodal.sniff_kind(b"II*\x00rest") == "tiff"
    assert multimodal.sniff_kind(b"RIFF\x00\x00\x00\x00XXXX") == "unknown"


# --- Spark plumbing ----------------------------------------------------------
@pytest.fixture(scope="module")
def media_df(spark):
    frames = _smooth_frames(12, 24, 24)
    t = np.linspace(0, 1, 400, endpoint=False)
    rows = [
        {"image_id": "vid-1", "bytes": avi.frames_to_avi(frames, fps=6)},
        {"image_id": "png-1", "bytes": pngcodec.encode(frames[0])},
        {"image_id": "jpg-1", "bytes": jpegcodec.encode(frames[3], quality=95)},
        {"image_id": "wav-1", "bytes": _wav_bytes(np.sin(2 * np.pi * 3 * t))},
        {"image_id": "bad-1", "bytes": b"\xff\xd8\xff" + b"junk" * 4},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_classify_media_native_chain(media_df):
    got = (
        multimodal.classify_media(media_df)
        .select("image_id", "media_kind")
        .toPandas()
        .set_index("image_id")["media_kind"]
    )
    assert got["vid-1"] == "video-avi"
    assert got["png-1"] == "png"
    assert got["jpg-1"] == "jpeg"
    assert got["wav-1"] == "audio-wav"
    assert got["bad-1"] == "jpeg"  # magic matches; decode stage quarantines


def test_frame_sample_real_video(media_df):
    sub = media_df.filter("image_id = 'vid-1'")
    got = multimodal.frame_sample(sub, every_n=5).toPandas()
    assert sorted(got["frame_no"]) == [0, 5, 10]
    assert (got["status"] == "ok").all()
    # frame means track the planted +10-per-frame DC ramp (mod 256 wraps
    # are absent for these indices)
    m = got.sort_values("frame_no")["frame_mean"].to_numpy()
    assert m[1] > m[0] and m[2] > m[1]


def test_decode_resize_across_kinds(media_df):
    got = multimodal.decode_resize(media_df, 8, 8).toPandas().set_index("image_id")
    for rid in ["vid-1", "png-1", "jpg-1", "wav-1"]:
        assert got.loc[rid, "status"] == "ok", got.loc[rid, "status"]
        assert len(got.loc[rid, "pixels"]) == 64
    assert got.loc["bad-1", "status"] != "ok"
    assert got.loc["bad-1", "pixels"] is None


def test_extract_features_across_kinds(media_df):
    got = multimodal.extract_features(media_df).toPandas().set_index("image_id")
    ok = got[got["status"] == "ok"]
    assert set(ok.index) == {"vid-1", "png-1", "jpg-1", "wav-1"}
    for rid in ok.index:
        f = np.asarray(ok.loc[rid, "features"])
        assert f.shape == (multimodal.FEATURE_DIM,)
        assert np.isfinite(f).all()
