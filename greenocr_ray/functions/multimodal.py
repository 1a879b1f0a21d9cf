"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata
(width/height/format), processed by actor-pool ``map_batches`` stages.
The Ray-side plumbing — schema, batching, actor signatures, output
layout — is real and tested; codec-dependent decodes (PNG/JPEG/audio/
video) are STUBBED behind ``NotImplementedError`` because the codec
libraries are not in this container. The raw-raster path (the format
the engine's media tables actually use) is fully implemented.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import kernels, png

RAW_FORMAT = "raw-gray-u8"  # row-major uint8 grayscale, len == w*h


def valid_payload(raw, w, h) -> bool:
    """Skip-and-continue guard (the reference's per-row error policy):
    malformed media rows — null payload, null/NaN/non-positive dims,
    or a payload shorter than w*h — must not crash the stage."""
    if raw is None:
        return False
    if raw[:8] == png.SIGNATURE:
        return True  # dims come from the PNG header, not the metadata
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

    PNG payloads (the reference's real input format, exe_t.py:482) are
    decoded with the pure-numpy codec in ``greenocr_ray.png`` — no
    codec library needed. A payload carrying the PNG signature is
    decoded as PNG regardless of ``fmt`` (content sniffing), so mixed
    raw/PNG media tables need no format column."""
    if raw[:8] == png.SIGNATURE:
        fmt = "png"
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
        raise NotImplementedError(
            "jpeg decode requires a codec library not present in this "
            "environment; use PNG or raw-gray-u8 payloads"
        )
    raise ValueError(f"unknown media format {fmt!r}")


def _decode_row(raw: bytes, w, h) -> np.ndarray:
    """decode_raster for a validated row: PNG dims come from the
    header, so metadata w/h are only trusted for raw payloads."""
    if raw[:8] == png.SIGNATURE:
        return decode_raster(raw, 0, 0, fmt="png")
    return decode_raster(raw, int(w), int(h))


def sample_video_frames(raw: bytes, every_n: int = 30):
    raise NotImplementedError(
        "video frame sampling requires a codec library not present in this "
        "environment"
    )


def extract_audio_features(raw: bytes, sample_rate: int = 16000):
    raise NotImplementedError(
        "audio decode requires a codec library not present in this environment"
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
