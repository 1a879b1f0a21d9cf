"""Line-image text recognition (the engine's "model").

Replaces the reference's CRNN + CTC decode (exe_t.py:370-427,519-533)
with a deterministic chain over the same semantic steps:

    enhance (stretch/CLAHE + unsharp)      exe_t.py:253-300
    -> deskew (projection-profile)          north-star Hough-deskew analog
    -> binarize (Otsu / Sauvola)            north-star adaptive binarization
    -> despeckle + line band                segmentation
    -> column-projection glyph segments     geometric left-to-right order
    -> per-glyph template match vs atlas    the "model forward" (M1/M3)
    -> space insertion from gap widths      CTC-style sequence assembly (M4/M5)
    -> whitespace normalize                 exe_t.py:531-533

The atlas matrices play the role of model weights: built once per
recognizer instance (actor ``__init__``), reused across batches — the
fix for the reference's per-image model construction (exe_t.py:485-496).
"""

from __future__ import annotations

import numpy as np

from . import kernels
from .glyphs import GLYPH_H, GLYPH_W, SCALE, SPACE_GAP_THRESHOLD_U, atlas
from .vocab import normalize_whitespace

_MIN_SEGMENT_AREA = 30  # ink pixels; smaller segments are noise specks


class Recognizer:
    """Holds the glyph-template 'weights'; one instance per OCR actor."""

    def __init__(
        self,
        enhance: str = "clahe",  # 'clahe' | 'stretch' | 'sr' | 'external'
        binarization: str = "otsu",  # 'otsu' | 'sauvola'
        scale: int = SCALE,
        enhance_fn=None,  # required when enhance='external'
    ):
        a = atlas()
        self.chars = "".join(a.keys())
        # ±1 templates, one row per char (normalized correlation target)
        self.templates = np.stack(
            [a[c].astype(np.float32).ravel() * 2.0 - 1.0 for c in self.chars]
        )
        self.enhance = enhance
        self.binarization = binarization
        self.scale = scale
        if enhance == "external" and enhance_fn is None:
            raise ValueError(
                "enhance='external' needs enhance_fn (HxW float [0,1] -> "
                "HxW float [0,1])"
            )
        self.enhance_fn = enhance_fn

    # ------------------------------------------------------------ steps

    def _enhance(self, img: np.ndarray) -> np.ndarray:
        if self.enhance == "external":
            # the learned-SR seam (exe_t.py:483-499 Real-ESRGAN slot):
            # a torch/ONNX model loaded once per actor drops in here on
            # a real cluster without touching the pipeline; this
            # sandbox has no such runtime, so the fn is caller-supplied
            out = np.asarray(self.enhance_fn(img), dtype=np.float32)
        elif self.enhance == "sr":
            # in-repo P1 operator: deterministic Richardson-Lucy
            # detail restoration (the Real-ESRGAN outscale=1 contract,
            # exe_t.py:483-505), then CLAHE for the faded contrast
            out = kernels.clahe(kernels.sr_enhance(img))
        elif self.enhance == "clahe":
            out = kernels.clahe(img)
        else:
            out = kernels.percentile_stretch(img)
        return kernels.unsharp(out)

    @staticmethod
    def _despeckle(mask: np.ndarray) -> np.ndarray:
        """Remove ink pixels with <=1 of 8 ink neighbors (impulse noise)."""
        p = np.pad(mask, 1)
        neigh = (
            p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
            + p[1:-1, :-2] + p[1:-1, 2:]
            + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
        )
        return (mask & (neigh >= 2)).astype(np.uint8)

    @staticmethod
    def _pool_from_integral(
        ii: np.ndarray,
        ys: int,
        ye_: int,
        xs: int,
        xe_: int,
        gh: int,
        gw: int,
    ) -> np.ndarray:
        """Area-average the mask window [ys:ye_, xs:xe_) down to a
        (gh, gw) float grid, sampling ONE precomputed line-level
        integral image — no per-glyph cumsum. Fractional cell
        boundaries are sampled bilinearly from the integral image,
        identical math to pooling the window in isolation."""
        h = ye_ - ys
        w = xe_ - xs
        hh = ii.shape[0] - 1
        ww = ii.shape[1] - 1
        ye = ys + np.arange(gh + 1, dtype=np.float64) * (h / gh)
        xe = xs + np.arange(gw + 1, dtype=np.float64) * (w / gw)
        y0 = np.floor(ye).astype(np.int64)
        x0 = np.floor(xe).astype(np.int64)
        y1 = np.minimum(y0 + 1, hh)
        x1 = np.minimum(x0 + 1, ww)
        fy = (ye - y0)[:, None]
        fx = (xe - x0)[None, :]
        g00 = ii[y0[:, None], x0[None, :]]
        g01 = ii[y0[:, None], x1[None, :]]
        g10 = ii[y1[:, None], x0[None, :]]
        g11 = ii[y1[:, None], x1[None, :]]
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s = top * (1 - fy) + bot * fy
        areas = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
        cell = (h / gh) * (w / gw)
        return (areas / max(cell, 1e-9)).astype(np.float32)

    # ------------------------------------------------------------- main

    def recognize(self, img: np.ndarray) -> tuple[str, float]:
        """Grayscale float [0,1] HxW line image -> (text, mean_confidence)."""
        enhanced = self._enhance(img.astype(np.float32))
        deskewed, _angle = kernels.deskew(enhanced)
        mask = kernels.binarize(deskewed, method=self.binarization)
        mask = self._despeckle(mask)
        return self._recognize_mask(mask)

    def _recognize_mask(self, mask: np.ndarray) -> tuple[str, float]:
        """Single-line recognition over a binarized 0/1 mask."""
        bands = [b for b in kernels.row_bands(mask, min_ink=2) if b[1] - b[0] >= 4]
        if not bands:
            return "", 0.0
        y0 = min(b[0] for b in bands)
        y1 = max(b[1] for b in bands)
        line = mask[y0:y1, :]
        segs = kernels.column_segments(line, min_gap=2, min_ink=2)
        segs = [
            (x0, x1)
            for (x0, x1) in segs
            if int(line[:, x0:x1].sum()) >= _MIN_SEGMENT_AREA
        ]
        if not segs:
            return "", 0.0
        space_px = SPACE_GAP_THRESHOLD_U * self.scale
        # one integral image for the whole line; every glyph pools from it
        ii = np.zeros((line.shape[0] + 1, line.shape[1] + 1), dtype=np.float64)
        np.cumsum(
            np.cumsum(line, axis=0, dtype=np.float64), axis=1, out=ii[1:, 1:]
        )
        # per-glyph ink row bounds (cheap), then ONE batched pooling
        # over every glyph window — same bilinear math as the scalar
        # helper, without a Python call per glyph
        xs = np.array([s[0] for s in segs], dtype=np.int64)
        xe_ = np.array([s[1] for s in segs], dtype=np.int64)
        ys = np.empty(len(segs), dtype=np.int64)
        ye_ = np.empty(len(segs), dtype=np.int64)
        for i, (x0, x1) in enumerate(segs):
            rows = np.nonzero(line[:, x0:x1].any(axis=1))[0]
            ys[i] = rows[0]
            ye_[i] = rows[-1] + 1
        grids = self._pool_many(ii, ys, ye_, xs, xe_, GLYPH_H, GLYPH_W)
        V = (np.clip(grids, 0, 1) * 2.0 - 1.0).reshape(len(segs), -1)
        out: list[str] = []
        confs: list[float] = []
        prev_end: int | None = None
        for i, (x0, x1) in enumerate(segs):
            if prev_end is not None and (x0 - prev_end) > space_px:
                out.append(" ")
            prev_end = x1
            scores = self.templates @ V[i] / self.templates.shape[1]
            k = int(np.argmax(scores))
            out.append(self.chars[k])
            confs.append(float(scores[k]))
        text = normalize_whitespace("".join(out))
        return text, float(np.mean(confs)) if confs else 0.0

    @staticmethod
    def _pool_many(
        ii: np.ndarray,
        ys: np.ndarray,
        ye_: np.ndarray,
        xs: np.ndarray,
        xe_: np.ndarray,
        gh: int,
        gw: int,
    ) -> np.ndarray:
        """Batched ``_pool_from_integral``: pools every glyph window to
        a (gh, gw) grid in one set of fancy-indexed gathers — formula-
        identical per element, so recognition output is unchanged."""
        hh = ii.shape[0] - 1
        ww = ii.shape[1] - 1
        h = (ye_ - ys).astype(np.float64)
        w = (xe_ - xs).astype(np.float64)
        ye = ys[:, None] + np.arange(gh + 1, dtype=np.float64)[None, :] * (
            h[:, None] / gh
        )
        xe = xs[:, None] + np.arange(gw + 1, dtype=np.float64)[None, :] * (
            w[:, None] / gw
        )
        y0 = np.floor(ye).astype(np.int64)
        x0 = np.floor(xe).astype(np.int64)
        y1 = np.minimum(y0 + 1, hh)
        x1 = np.minimum(x0 + 1, ww)
        fy = (ye - y0)[:, :, None]
        fx = (xe - x0)[:, None, :]
        g00 = ii[y0[:, :, None], x0[:, None, :]]
        g01 = ii[y0[:, :, None], x1[:, None, :]]
        g10 = ii[y1[:, :, None], x0[:, None, :]]
        g11 = ii[y1[:, :, None], x1[:, None, :]]
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        s = top * (1 - fy) + bot * fy
        areas = s[:, 1:, 1:] - s[:, :-1, 1:] - s[:, 1:, :-1] + s[:, :-1, :-1]
        cell = np.maximum((h / gh) * (w / gw), 1e-9)
        return (areas / cell[:, None, None]).astype(np.float32)

    # ------------------------------------------------------ page layout

    def recognize_page(self, img: np.ndarray) -> tuple[str, float]:
        """Multi-line / multi-column page -> (text, mean_confidence).

        The north-star 'line/word segmentation' path the projection
        bands can't serve: column gutters are detected from the page's
        column ink projection (wide blank verticals), then connected
        components group into lines per column (``segment_lines_cc``),
        each recognized with the single-line path. Reading order:
        columns left-to-right, lines top-to-bottom, glyphs
        left-to-right (§2.6 geometric contract). On a single-line
        strip this degrades exactly to ``recognize``'s segmentation
        (one column, one CC line group == the projection band)."""
        enhanced = self._enhance(img.astype(np.float32))
        deskewed, _angle = kernels.deskew(enhanced)
        mask = kernels.binarize(deskewed, method=self.binarization)
        mask = self._despeckle(mask)
        # a column gutter is far wider than an inter-word space
        gutter_px = 3 * SPACE_GAP_THRESHOLD_U * self.scale
        columns = kernels.column_segments(
            mask, min_gap=gutter_px, min_ink=2
        ) or [(0, mask.shape[1])]
        texts: list[str] = []
        confs: list[float] = []
        for cx0, cx1 in columns:
            col = mask[:, cx0:cx1]
            groups = kernels.segment_lines_cc(col, min_area=4)
            for boxes in self._merge_close_lines(groups):
                y0 = min(b[0] for b in boxes)
                y1 = max(b[1] for b in boxes)
                t, c = self._recognize_mask(col[y0:y1, :])
                if t:
                    texts.append(t)
                    confs.append(c)
        text = normalize_whitespace(" ".join(texts))
        return text, float(np.mean(confs)) if confs else 0.0

    @staticmethod
    def _merge_close_lines(
        groups: list[list[tuple[int, int, int, int]]],
    ) -> list[list[tuple[int, int, int, int]]]:
        """Merge CC line groups separated by less than a quarter of the
        taller group's height — diacritics/i-dots whose components
        don't y-overlap their stem line must not become their own
        'line'."""
        merged: list[list[tuple[int, int, int, int]]] = []
        for boxes in groups:
            if merged:
                prev = merged[-1]
                py0 = min(b[0] for b in prev)
                py1 = max(b[1] for b in prev)
                y0 = min(b[0] for b in boxes)
                y1 = max(b[1] for b in boxes)
                gap = y0 - py1
                if gap < 0.25 * max(py1 - py0, y1 - y0):
                    merged[-1] = prev + boxes
                    continue
            merged.append(list(boxes))
        return merged
