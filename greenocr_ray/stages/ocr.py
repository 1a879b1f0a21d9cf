"""Stateful OCR stage — actor-pool ``map_batches``.

The reference constructs its enhancement model once PER IMAGE inside
the inference loop (exe_t.py:485-496) — the canonical anti-pattern.
Here the recognizer (glyph-atlas "weights" + compiled chain) is built
once per actor in ``__init__`` and reused across batches:

    ds.map_batches(OcrActor, batch_format="pyarrow",
                   batch_size=OCR_BATCH_SIZE, concurrency=(1, N),
                   num_cpus=1)

Batches arrive as flat media-span rows joined with their payloads:
(doc_id, offset, media_ref, width, height, pixels). Payload decode
(binary -> numpy raster) happens in-actor, zero file I/O.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import jpeg, png
from ..functions.multimodal import decode_raster
from ..recognize import Recognizer

# media payloads are large (a wide scan is ~100 KB raw); keep OCR
# batches small so one batch x pool concurrency stays well inside a
# worker's heap and stragglers stay short (SURVEY.md §4 skew row)
OCR_BATCH_SIZE = 32


def cost_stripe_media(
    t: pa.Table, batch_size: int = OCR_BATCH_SIZE, skew_ratio: float = 4.0
) -> pa.Table:
    """G1 cost-aware skew handling (SURVEY §4): compute a
    ``media_bytes`` costing column (payload byte length — the
    stateless analog of the reference's exact (w,h) size bucketing,
    imgWidthSepareter.py:52, train.py:899-1004) and, when the block
    shows a heavy tail (p99/median cost > ``skew_ratio``),
    COST-STRIPE the rows: sort by cost descending, then emit in
    transposed round-robin order so every consecutive
    ``batch_size``-row window — exactly the slices the OCR actor pool
    receives — gets one row from each cost tier. Batch walls equalize
    (sum of one-per-tier costs) instead of spiking when several wide
    page scans land in one batch, which is what bounds p95 batch wall
    and the stage tail at crawl scale. Measured on the 12%-wide skew
    fixture (1200 docs, tools/skew_bench.py): real OCR batch-wall p95
    improves 1.12x, end-to-end wall 1.20x, deterministic per-window
    byte cost p95 1.25x / max 1.55x. Homogeneous blocks take
    the cheap guard exit — no reorder, no payload copy. Per-block and
    stateless: pixels still never cross an exchange."""
    import pyarrow.compute as pc

    n = t.num_rows
    if n <= batch_size:
        return t
    cost = pc.cast(pc.binary_length(t.column("pixels")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    med = float(np.median(cost))
    p99 = float(np.percentile(cost, 99))
    if med <= 0 or p99 / max(med, 1.0) <= skew_ratio:
        return t  # no heavy tail: skip the reorder copy entirely
    order = np.argsort(-cost, kind="stable")
    m_full = n // batch_size  # full windows; the remainder window is last
    rem = n % batch_size
    # the rem cheapest rows form the short trailing window, so every
    # other window is exactly batch_size rows and downstream slicing
    # aligns with the stripes; window j takes sorted[j], sorted[j+m], ...
    body = order[: m_full * batch_size]
    striped = body.reshape(batch_size, m_full).T.ravel()
    pos = np.concatenate([striped, order[m_full * batch_size :]]) if rem else striped
    return t.take(pa.array(pos))


class _RecognizerBase:
    def __init__(
        self,
        enhance: str = "clahe",  # 'clahe' | 'stretch' | 'sr' | 'external'
        binarization: str = "otsu",
        layout: str = "line",  # 'line' strips | 'page' (CC multi-line/column)
        enhance_fn=None,  # the learned-SR seam (enhance='external')
    ):
        # once per actor: the 'model load' (cf. exe_t.py:461-471 torch.load)
        self.recognizer = Recognizer(
            enhance=enhance, binarization=binarization, enhance_fn=enhance_fn
        )
        self._recognize = (
            self.recognizer.recognize_page
            if layout == "page"
            else self.recognizer.recognize
        )

    def _recognize_rows(
        self, batch: pa.Table
    ) -> tuple[list[str], np.ndarray]:
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        pixels = batch.column("pixels").to_pylist()
        texts: list[str] = []
        confs = np.zeros(batch.num_rows, dtype=np.float64)
        for i in range(batch.num_rows):
            raw = pixels[i]
            # skip-and-log semantics (exe_t.py:319-336): emit an empty
            # OCR span rather than failing the partition. Null dims
            # arrive as NaN through to_numpy — guard BEFORE int().
            if raw is None:
                texts.append("")
                confs[i] = 0.0
                continue
            if raw[:8] == png.SIGNATURE or jpeg.is_jpeg(raw):
                # the reference's actual input formats (exe_t.py:482,
                # cv2.imread): dims come from the codec header, not
                # row metadata
                try:
                    img = decode_raster(
                        raw, 0, 0,
                        fmt="png" if raw[:8] == png.SIGNATURE else "jpeg",
                    )
                except ValueError:
                    texts.append("")
                    confs[i] = 0.0
                    continue
            else:
                if not (np.isfinite(widths[i]) and np.isfinite(heights[i])):
                    texts.append("")
                    confs[i] = 0.0
                    continue
                w, h = int(widths[i]), int(heights[i])
                if len(raw) != w * h:
                    texts.append("")
                    confs[i] = 0.0
                    continue
                img = (
                    np.frombuffer(raw, dtype=np.uint8)
                    .reshape(h, w)
                    .astype(np.float32)
                    / np.float32(255.0)
                )
            text, conf = self._recognize(img)
            texts.append(text)
            confs[i] = conf
        return texts, confs


class OcrActor(_RecognizerBase):
    """OCR over span rows already joined with payloads
    (doc_id, offset, media_ref, width, height, pixels)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, confs = self._recognize_rows(batch)
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "kind": pa.array(np.full(n, "ocr"), type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": batch.column("media_ref"),
                "confidence": pa.array(confs),
            }
        )


class OcrMediaActor(_RecognizerBase):
    """OCR directly over the media payload table
    (media_ref, width, height, pixels) -> (media_ref, text, confidence).

    The scale-critical variant: pixels flow straight from the read
    tasks into this actor pool and are DROPPED here — they never cross
    a shuffle exchange. Only the recognized text (a few hundred bytes
    per span vs ~100 KB of raster) joins back to the span rows, so the
    downstream hash join moves ~1000x fewer bytes than joining payloads
    onto spans first (cf. exe_t.py:475-533, where pixels likewise never
    outlive the per-image loop)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, confs = self._recognize_rows(batch)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "text": pa.array(texts, type=pa.string()),
                "confidence": pa.array(confs),
            }
        )
