"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata
(width/height/format), processed by actor-pool ``map_batches`` stages.
Image (raw-gray-u8 + pure-numpy PNG and baseline-JPEG codecs), audio
(pure-numpy RIFF/PCM WAV reader -> spectral/energy features) and video
(packed raw-frame sampler) columns are all REAL — decoded and computed
with numpy alone. Only external-codec container formats (mp3/aac,
mp4/h264, progressive/arithmetic JPEG) stay behind
``NotImplementedError``; their Ray-side plumbing is identical to the
working paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import jpeg, kernels, png

RAW_FORMAT = "raw-gray-u8"  # row-major uint8 grayscale, len == w*h


def valid_payload(raw, w, h) -> bool:
    """Skip-and-continue guard (the reference's per-row error policy):
    malformed media rows — null payload, null/NaN/non-positive dims,
    or a payload shorter than w*h — must not crash the stage."""
    if raw is None:
        return False
    if raw[:8] == png.SIGNATURE or jpeg.is_jpeg(raw):
        return True  # dims come from the codec header, not the metadata
    if w is None or h is None:
        return False
    try:
        wf, hf = float(w), float(h)
    except (TypeError, ValueError):
        return False
    if not (np.isfinite(wf) and np.isfinite(hf)):
        return False
    if int(wf) <= 0 or int(hf) <= 0:
        return False
    return len(raw) >= int(wf) * int(hf)


def decode_raster(raw: bytes, width: int, height: int, fmt: str = RAW_FORMAT) -> np.ndarray:
    """binary payload -> HxW float32 [0,1] grayscale.

    PNG and baseline-JPEG payloads (the reference reads whatever
    cv2.imread supports, exe_t.py:482) are decoded with the pure-numpy
    codecs in ``greenocr_ray.png`` / ``greenocr_ray.jpeg`` — no codec
    library needed. A payload carrying a codec signature is decoded by
    content sniffing regardless of ``fmt``, so mixed raw/PNG/JPEG
    media tables need no format column."""
    if raw[:8] == png.SIGNATURE:
        fmt = "png"
    elif jpeg.is_jpeg(raw):
        fmt = "jpeg"
    if fmt == RAW_FORMAT:
        return (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(height, width)
            .astype(np.float32)
            / np.float32(255.0)
        )
    if fmt == "png":
        arr = png.decode_png(raw)
        if arr.ndim == 2:
            return arr.astype(np.float32) / np.float32(255.0)
        if arr.shape[2] == 2:  # gray + alpha: composite over white
            a = arr.astype(np.float32) / np.float32(255.0)
            return a[:, :, 0] * a[:, :, 1] + (np.float32(1.0) - a[:, :, 1])
        return kernels.to_grayscale(arr)
    if fmt == "jpeg":
        arr = jpeg.decode_jpeg(raw)
        if arr.ndim == 2:
            return arr.astype(np.float32) / np.float32(255.0)
        return kernels.to_grayscale(arr)
    raise ValueError(f"unknown media format {fmt!r}")


def _decode_row(raw: bytes, w, h) -> np.ndarray:
    """decode_raster for a validated row: PNG/JPEG dims come from the
    codec header, so metadata w/h are only trusted for raw payloads."""
    if raw[:8] == png.SIGNATURE:
        return decode_raster(raw, 0, 0, fmt="png")
    if jpeg.is_jpeg(raw):
        return decode_raster(raw, 0, 0, fmt="jpeg")
    return decode_raster(raw, int(w), int(h))


# --------------------------------------------------------- audio (WAV)
#
# Container formats needing external codec libraries (mp3/aac/mp4/h264)
# stay out of scope for this environment; RIFF/PCM WAV and packed raw
# frames are parsed with numpy alone, which makes the audio/video
# columns REAL: payloads decode, features compute, frames sample — all
# inside actor-pool map_batches stages over binary columns.

WAV_FORMAT = "wav-pcm"
RAW_VIDEO_FORMAT = "raw-video-u8"  # packed n_frames x h x w uint8 frames


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/PCM WAV reader -> (mono float32 in [-1,1],
    sample_rate). Supports 8-bit unsigned and 16-bit signed PCM, any
    channel count (averaged to mono). Raises ValueError on anything
    that is not a well-formed PCM WAV (callers apply the engine's
    skip-and-continue row policy)."""
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt = int.from_bytes(body[0:2], "little")
            if audio_fmt != 1:
                raise ValueError(f"non-PCM wav (format {audio_fmt})")
            fmt = {
                "channels": int.from_bytes(body[2:4], "little"),
                "rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    ch = max(1, fmt["channels"])
    if fmt["bits"] == 16:
        x = np.frombuffer(
            data[: len(data) - (len(data) % (2 * ch))], dtype="<i2"
        ).astype(np.float32) / np.float32(32768.0)
    elif fmt["bits"] == 8:
        x = (
            np.frombuffer(data[: len(data) - (len(data) % ch)], dtype=np.uint8)
            .astype(np.float32)
            - np.float32(128.0)
        ) / np.float32(128.0)
    else:
        raise ValueError(f"unsupported bit depth {fmt['bits']}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32), fmt["rate"]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV bytes (fixture helper)."""
    pcm = np.clip(
        np.round(np.asarray(samples, dtype=np.float64) * 32767.0),
        -32768,
        32767,
    ).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + int(sample_rate).to_bytes(4, "little")
        + int(sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def extract_audio_features(raw: bytes) -> dict:
    """WAV payload -> deterministic scalar features: duration, RMS
    energy, zero-crossing rate, and the spectral centroid in Hz (rfft
    magnitude-weighted mean frequency) — the audio analogs of the
    image ink/contrast/edge features."""
    x, sr = decode_wav(raw)
    n = len(x)
    if n == 0:
        return {
            "duration_sec": 0.0,
            "rms": 0.0,
            "zero_cross_rate": 0.0,
            "spectral_centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    mag = np.abs(np.fft.rfft(x.astype(np.float64)))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    tot = float(mag.sum())
    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    return {
        "duration_sec": n / float(sr),
        "rms": rms,
        "zero_cross_rate": zcr,
        "spectral_centroid_hz": centroid,
    }


class AudioFeatureStage:
    """Actor-pool stage over (media_ref, payload) WAV rows -> one
    feature row each; malformed payloads keep skip-and-continue
    semantics (all-zero features, decoded=False)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n = len(refs)
        dur = np.zeros(n)
        rms = np.zeros(n)
        zcr = np.zeros(n)
        cen = np.zeros(n)
        ok = np.zeros(n, dtype=bool)
        for i, raw in enumerate(payloads):
            if raw is None:
                continue
            try:
                f = extract_audio_features(raw)
            except ValueError:
                continue
            dur[i] = f["duration_sec"]
            rms[i] = f["rms"]
            zcr[i] = f["zero_cross_rate"]
            cen[i] = f["spectral_centroid_hz"]
            ok[i] = True
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "duration_sec": pa.array(np.round(dur, 6)),
                "rms": pa.array(np.round(rms, 6)),
                "zero_cross_rate": pa.array(np.round(zcr, 6)),
                "spectral_centroid_hz": pa.array(np.round(cen, 6)),
                "decoded": pa.array(ok),
            }
        )


# ----------------------------------------------------- video (raw frames)


def sample_video_frames(
    raw: bytes, width: int, height: int, every_n: int = 30
) -> np.ndarray:
    """Packed raw-video payload (n_frames x h x w uint8, row-major) ->
    (k, h, w) uint8 array of every ``every_n``-th frame starting at
    frame 0. Frame count is inferred from the payload length; a
    payload that is not a whole number of frames raises ValueError
    (callers skip-and-continue)."""
    w, h = int(width), int(height)
    if w <= 0 or h <= 0:
        raise ValueError("non-positive frame dims")
    fsz = w * h
    if fsz == 0 or len(raw) % fsz != 0:
        raise ValueError("payload is not a whole number of frames")
    n_frames = len(raw) // fsz
    frames = np.frombuffer(raw, dtype=np.uint8).reshape(n_frames, h, w)
    return frames[:: max(1, int(every_n))].copy()


class VideoFrameSampleStage:
    """Actor-pool stage over (media_ref, width, height, payload)
    packed-raw-video rows -> ONE ROW PER SAMPLED FRAME
    (media_ref, frame_idx, width, height, pixels), pixels in the
    engine's raw-gray-u8 layout so the image stages (resize, features,
    OCR) chain directly on sampled frames. Malformed payloads emit no
    rows (skip-and-continue)."""

    def __init__(self, every_n: int = 30):
        self.every_n = max(1, int(every_n))

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        o_ref, o_idx, o_w, o_h, o_px = [], [], [], [], []
        for ref, w, h, raw in zip(refs, widths, heights, payloads):
            if raw is None:
                continue
            try:
                frames = sample_video_frames(raw, w, h, self.every_n)
            except (ValueError, TypeError):
                continue
            for j, fr in enumerate(frames):
                o_ref.append(ref)
                o_idx.append(j * self.every_n)
                o_w.append(int(w))
                o_h.append(int(h))
                o_px.append(fr.tobytes())
        return pa.table(
            {
                "media_ref": pa.array(o_ref, type=pa.string()),
                "frame_idx": pa.array(o_idx, type=pa.int64()),
                "width": pa.array(o_w, type=pa.int32()),
                "height": pa.array(o_h, type=pa.int32()),
                "pixels": pa.array(o_px, type=pa.binary()),
            }
        )


def encode_media_png(batch: pa.Table) -> pa.Table:
    """raw-gray-u8 media rows -> the same rows with PNG-encoded
    payloads (schema unchanged; downstream stages sniff the PNG
    signature). Fixture/derivation helper for exercising the PNG
    decode path end-to-end."""
    widths = batch.column("width").to_numpy()
    heights = batch.column("height").to_numpy()
    payloads = batch.column("pixels").to_pylist()
    out = []
    for raw, w, h in zip(payloads, widths, heights):
        if not valid_payload(raw, w, h) or raw[:8] == png.SIGNATURE:
            out.append(raw)
            continue
        img = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w))
        out.append(png.encode_png(img))
    i = batch.schema.get_field_index("pixels")
    return batch.set_column(i, "pixels", pa.array(out, type=pa.binary()))


def encode_media_jpeg(batch: pa.Table, quality: int = 95) -> pa.Table:
    """raw-gray-u8 media rows -> the same rows with baseline-JPEG
    payloads (schema unchanged; downstream stages sniff the JPEG
    signature). Fixture/derivation helper for exercising the JPEG
    decode path end-to-end — quality 95 keeps glyph strips exactly
    recognizable."""
    widths = batch.column("width").to_numpy()
    heights = batch.column("height").to_numpy()
    payloads = batch.column("pixels").to_pylist()
    out = []
    for raw, w, h in zip(payloads, widths, heights):
        if (
            not valid_payload(raw, w, h)
            or raw[:8] == png.SIGNATURE
            or jpeg.is_jpeg(raw)
        ):
            out.append(raw)
            continue
        img = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w))
        out.append(jpeg.encode_jpeg(img, quality=quality))
    i = batch.schema.get_field_index("pixels")
    return batch.set_column(i, "pixels", pa.array(out, type=pa.binary()))


def stack_media_pages(batch: pa.Table, gap_frac: float = 1.0) -> pa.Table:
    """Derive PAGE-shaped media from line-strip media: each payload
    becomes the same line stacked twice with a blank gap (gap =
    gap_frac x line height). Ground truth for such a page is the line
    text repeated — used to exercise the CC multi-line recognition
    path (`layout='page'`) end-to-end against a derivable oracle."""
    widths = batch.column("width").to_numpy()
    heights = batch.column("height").to_numpy()
    payloads = batch.column("pixels").to_pylist()
    out_px, out_w, out_h = [], [], []
    for raw, w, h in zip(payloads, widths, heights):
        if not valid_payload(raw, w, h):
            out_px.append(raw)
            out_w.append(int(w) if w is not None else 0)
            out_h.append(int(h) if h is not None else 0)
            continue
        img = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w))
        gap = max(8, int(round(gap_frac * img.shape[0])))
        page = np.full(
            (img.shape[0] * 2 + gap, img.shape[1]), 255, dtype=np.uint8
        )
        page[: img.shape[0]] = img
        page[img.shape[0] + gap :] = img
        out_px.append(page.tobytes())
        out_h.append(page.shape[0])
        out_w.append(page.shape[1])
    names = batch.schema.names
    cols = {n: batch.column(n) for n in names}
    cols["width"] = pa.array(out_w, type=pa.int32())
    cols["height"] = pa.array(out_h, type=pa.int32())
    cols["pixels"] = pa.array(out_px, type=pa.binary())
    return pa.table(cols)


class ImageResizeStage:
    """Actor-pool stage: resize payload rasters to a fixed height,
    preserving aspect (the reference's h=64 normalization,
    exe_t.py:211-219,505). Emits a new payload column + updated dims."""

    def __init__(self, target_h: int = 64):
        self.target_h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        payloads = batch.column("pixels").to_pylist()
        out_px, out_w, out_h = [], [], []
        for raw, w, h in zip(payloads, widths, heights):
            if not valid_payload(raw, w, h):
                out_px.append(b"")
                out_h.append(0)
                out_w.append(0)
                continue
            try:
                img = _decode_row(raw, w, h)
            except ValueError:
                # valid_payload passes on a PNG signature alone; a
                # truncated/corrupt body must still not crash the stage
                out_px.append(b"")
                out_h.append(0)
                out_w.append(0)
                continue
            resized = kernels.resize_keep_aspect(img, self.target_h)
            u8 = np.clip(np.round(resized * 255.0), 0, 255).astype(np.uint8)
            out_px.append(u8.tobytes())
            out_h.append(u8.shape[0])
            out_w.append(u8.shape[1])
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "width": pa.array(out_w, type=pa.int32()),
                "height": pa.array(out_h, type=pa.int32()),
                "pixels": pa.array(out_px, type=pa.binary()),
            }
        )


class ImageFeatureStage:
    """Actor-pool stage: cheap deterministic image features per payload
    (ink density, contrast span, edge energy via the Laplacian kernel —
    the P7 stroke-confidence feature, train.py:629-632)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        payloads = batch.column("pixels").to_pylist()
        n = batch.num_rows
        density = np.zeros(n)
        contrast = np.zeros(n)
        edge = np.zeros(n)
        for i, (raw, w, h) in enumerate(zip(payloads, widths, heights)):
            if not valid_payload(raw, w, h):
                continue  # feature row stays all-zero
            try:
                img = _decode_row(raw, w, h)
            except ValueError:
                continue  # corrupt PNG body: feature row stays all-zero
            mask = kernels.binarize(img, "otsu")
            density[i] = float(mask.mean())
            p1, p99 = np.percentile(img, [1, 99])
            contrast[i] = float(p99 - p1)
            edge[i] = float(kernels.laplacian(img).mean())
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "ink_density": pa.array(np.round(density, 6)),
                "contrast_span": pa.array(np.round(contrast, 6)),
                "edge_energy": pa.array(np.round(edge, 6)),
            }
        )
