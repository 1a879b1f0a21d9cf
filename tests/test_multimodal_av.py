"""Audio (RIFF/PCM WAV) and video (packed raw frames) column tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from greenocr_ray.functions.multimodal import (
    AudioFeatureStage,
    VideoFrameSampleStage,
    decode_wav,
    encode_wav,
    extract_audio_features,
    sample_video_frames,
)


def _sine(freq=440.0, sr=16000, dur=0.5, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_16bit():
    x = _sine()
    y, sr = decode_wav(encode_wav(x, 16000))
    assert sr == 16000
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 2.0 / 32768


def test_wav_8bit_and_stereo_mono_fold():
    # hand-build an 8-bit stereo wav: L = +0.5, R = -0.5 -> mono 0
    n = 100
    left = np.full(n, 192, dtype=np.uint8)   # +0.5
    right = np.full(n, 64, dtype=np.uint8)   # -0.5
    data = np.empty(2 * n, dtype=np.uint8)
    data[0::2] = left
    data[1::2] = right
    body = data.tobytes()
    hdr = (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (8).to_bytes(2, "little") + b"data" + len(body).to_bytes(4, "little")
    )
    y, sr = decode_wav(hdr + body)
    assert sr == 8000 and len(y) == n
    assert np.abs(y).max() < 1e-6  # L/R cancel


def test_wav_malformed_rejected():
    for bad in (b"", b"RIFFxxxxWAVE", b"JUNK" * 20, encode_wav(_sine())[:30]):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_audio_features_pure_sine():
    sr, f, a = 16000, 440.0, 0.5
    feats = extract_audio_features(encode_wav(_sine(f, sr, 1.0, a), sr))
    assert abs(feats["duration_sec"] - 1.0) < 1e-9
    assert abs(feats["rms"] - a / np.sqrt(2)) < 1e-3
    # a sine crosses zero 2f times per second
    assert abs(feats["zero_cross_rate"] - 2 * f / sr) < 5e-3
    assert abs(feats["spectral_centroid_hz"] - f) < 15.0


def test_audio_stage_skip_and_continue(ray_session):
    rows = pa.table(
        {
            "media_ref": pa.array(["a", "bad", "b"], type=pa.string()),
            "payload": pa.array(
                [encode_wav(_sine(300.0)), b"not a wav", encode_wav(_sine(600.0))],
                type=pa.binary(),
            ),
        }
    )
    out = (
        rd.from_arrow(rows)
        .map_batches(AudioFeatureStage, batch_format="pyarrow",
                     batch_size=2, concurrency=(1, 2))
        .to_pandas()
        .set_index("media_ref")
    )
    assert bool(out.loc["a", "decoded"]) and bool(out.loc["b", "decoded"])
    assert not bool(out.loc["bad", "decoded"])
    assert out.loc["bad", "rms"] == 0.0
    # higher frequency -> higher centroid
    assert out.loc["b", "spectral_centroid_hz"] > out.loc["a", "spectral_centroid_hz"]


def _video(n_frames=12, h=8, w=6):
    # frame k is constant level k*20
    return np.stack(
        [np.full((h, w), k * 20, dtype=np.uint8) for k in range(n_frames)]
    )


def test_sample_video_frames_exact():
    v = _video()
    got = sample_video_frames(v.tobytes(), 6, 8, every_n=5)
    assert got.shape == (3, 8, 6)  # frames 0, 5, 10
    assert [int(f[0, 0]) for f in got] == [0, 100, 200]
    with pytest.raises(ValueError):
        sample_video_frames(v.tobytes()[:-1], 6, 8)  # ragged payload
    with pytest.raises(ValueError):
        sample_video_frames(v.tobytes(), 0, 8)


def test_video_stage_rows_per_frame(ray_session):
    v = _video()
    rows = pa.table(
        {
            "media_ref": pa.array(["v1", "broken"], type=pa.string()),
            "width": pa.array([6, 6], type=pa.int32()),
            "height": pa.array([8, 8], type=pa.int32()),
            "payload": pa.array([v.tobytes(), b"\x00" * 7], type=pa.binary()),
        }
    )
    out = (
        rd.from_arrow(rows)
        .map_batches(VideoFrameSampleStage,
                     fn_constructor_kwargs={"every_n": 5},
                     batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert list(out["media_ref"]) == ["v1"] * 3  # broken row skipped
    assert list(out["frame_idx"]) == [0, 5, 10]
    # sampled frames chain into the image layout: len == w*h
    assert all(len(p) == 48 for p in out["pixels"])
