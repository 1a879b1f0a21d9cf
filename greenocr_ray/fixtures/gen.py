"""Deterministic synthetic corpus generator (FIXTURES.md §1-§4).

Produces three pyarrow Tables:

- ``documents``: interleaved text+media docs, exactly the BASELINE.json
  ``input_hint`` schema;
- ``media``: payload side table (raw grayscale rasters rendered by the
  deterministic glyph font, with seeded faded-document degradations
  mirroring what the reference pipeline corrects: low contrast →
  stretch/CLAHE `exe_t.py:253-262`, mild blur → unsharp
  `exe_t.py:299-300`, small skew → deskew, sparse noise);
- ``expected``: golden output spans for exact span-sequence-equality
  comparison on (kind, text, media_ref, order).

Everything is seeded; same (n_docs, seed) → bit-identical tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import kernels
from ..glyphs import render_line, renderable_text
from ..schema import DOCUMENTS_SCHEMA, EXTRACTED_SCHEMA, MEDIA_SCHEMA
from ..vocab import normalize_whitespace

WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value stream "
    "index plan cost page block cache disk read write shard node task worker "
    "span text media image faded ink press old archive letter record field "
    # the reference's target corpus is Germanic/Nordic (exe_t.py:79
    # vocab); fixture lines must exercise the diacritic glyph set
    "straße grün müde äldre försök høst æble år Åse Ærø Øst Über Änder Östen"
).split()

_BOILERPLATE = [
    "Home About Contact Login",
    "Subscribe to our newsletter",
    "Cookie settings Accept all",
    "Copyright 2024 All rights reserved",
]


def _words(rng: np.random.Generator, lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(WORDS[int(i)] for i in rng.integers(0, len(WORDS), n))


def make_html_span(rng: np.random.Generator) -> tuple[str, str]:
    """Returns (raw_html, expected_clean_text)."""
    body = _words(rng, 4, 12)
    nav = _BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))]
    raw = (
        f'<html><head><style>p {{color: red}}</style></head><body>'
        f'<nav>{nav}</nav>'
        f'<div class="content"><p>{body}</p>'
        f"<p>extra &amp; more &lt;stuff&gt;</p></div>"
        f"<script>var x = 1;</script>"
        f"<footer>{nav}</footer></body></html>"
    )
    expected = normalize_whitespace(body + " extra & more <stuff>")
    return raw, expected


def make_pdf_span(rng: np.random.Generator) -> tuple[str, str]:
    """Returns (raw_pdf_text, expected_clean_text).

    Raw form mimics layout-extracted PDF text: hard line wraps,
    in-word hyphenation at line breaks, form-feed page markers and
    'Page N' furniture lines.
    """
    body_words = _words(rng, 6, 16).split()
    lines: list[str] = []
    cur: list[str] = []
    for w in body_words:
        cur.append(w)
        if len(cur) >= 4:
            if len(w) > 4 and rng.random() < 0.5:
                # hyphenate the last word across the line break
                cut = len(w) // 2
                cur[-1] = w[:cut] + "-"
                lines.append(" ".join(cur))
                cur = [w[cut:]]
            else:
                lines.append(" ".join(cur))
                cur = []
    if cur:
        lines.append(" ".join(cur))
    page_no = int(rng.integers(1, 40))
    raw = "\n".join(lines[:2]) + f"\n\x0cPage {page_no}\n" + "\n".join(lines[2:])
    expected = normalize_whitespace(" ".join(body_words))
    return raw, expected


def degrade(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Seeded faded-document degradation of a clean render.

    Fade (narrow contrast range), gaussian blur, small skew (magnitude
    capped so rotated ink stays on the canvas for wide scans), sparse
    impulse noise. Mild enough that the OCR chain recovers the text
    exactly — the fixtures are goldens, not an accuracy stress test.
    """
    h, w = img.shape
    ink = np.float32(0.30 + 0.15 * rng.random())
    bg = np.float32(0.78 + 0.12 * rng.random())
    out = ink + (bg - ink) * img  # 0 -> ink level, 1 -> background level
    # skew: cap so vertical displacement across the width fits the margin
    max_by_width = np.rad2deg(np.arctan2(8.0, w / 2.0))
    max_angle = min(2.5, float(max_by_width))
    angle = float(rng.uniform(-max_angle, max_angle))
    out = kernels.rotate(out, angle, fill=bg)
    out = kernels.gaussian_blur(out, sigma=float(rng.uniform(0.4, 0.8)))
    # sparse impulse noise
    n_noise = int(0.001 * h * w)
    if n_noise:
        ys = rng.integers(0, h, n_noise)
        xs = rng.integers(0, w, n_noise)
        out[ys, xs] = np.clip(
            out[ys, xs] + rng.uniform(-0.15, 0.15, n_noise).astype(np.float32), 0, 1
        )
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def render_media(text: str, rng: np.random.Generator) -> tuple[bytes, int, int]:
    """Render + degrade -> (raw uint8 raster bytes, width, height)."""
    img = degrade(render_line(text), rng)
    u8 = np.round(img * 255.0).astype(np.uint8)
    h, w = u8.shape
    return u8.tobytes(), w, h


def make_corpus(
    n_docs: int = 200,
    seed: int = 42,
    media_fraction: float = 0.3,
    wide_fraction: float = 0.1,
    max_spans: int = 8,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (documents, media, expected) tables. Deterministic."""
    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    exp_spans: list[list[dict]] = []
    media_rows: list[dict] = []

    for d in range(n_docs):
        rng = np.random.Generator(np.random.PCG64([seed, d]))
        n_spans = int(rng.integers(1, max_spans + 1))
        spans: list[dict] = []
        expected: list[dict] = []
        for s in range(n_spans):
            r = rng.random()
            if r < media_fraction:
                wide = rng.random() < wide_fraction
                text = renderable_text(_words(rng, 8, 12) if wide else _words(rng, 1, 3))
                ref = f"img-{seed}-{d:06d}-{s:02d}"
                mrng = np.random.Generator(np.random.PCG64([seed, d, s, 7]))
                pixels, w, h = render_media(text, mrng)
                media_rows.append(
                    {
                        "media_ref": ref,
                        "width": w,
                        "height": h,
                        "pixels": pixels,
                        "true_text": text,
                    }
                )
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "offset": s}
                )
                expected.append(
                    {"kind": "ocr", "text": text, "media_ref": ref, "offset": s}
                )
            elif r < media_fraction + 0.25:
                raw, clean = make_html_span(rng)
                spans.append(
                    {"kind": "html", "text": raw, "media_ref": "", "offset": s}
                )
                expected.append(
                    {"kind": "text", "text": clean, "media_ref": "", "offset": s}
                )
            elif r < media_fraction + 0.45:
                raw, clean = make_pdf_span(rng)
                spans.append({"kind": "pdf", "text": raw, "media_ref": "", "offset": s})
                expected.append(
                    {"kind": "text", "text": clean, "media_ref": "", "offset": s}
                )
            else:
                body = _words(rng, 3, 12)
                raw = "  " + body.replace(" ", "   ", 1) + " \t"
                spans.append({"kind": "text", "text": raw, "media_ref": "", "offset": s})
                expected.append(
                    {
                        "kind": "text",
                        "text": normalize_whitespace(raw),
                        "media_ref": "",
                        "offset": s,
                    }
                )
        doc_ids.append(f"doc-{d:06d}")
        doc_spans.append(spans)
        exp_spans.append(expected)

    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": doc_spans}, schema=DOCUMENTS_SCHEMA
    )
    media = pa.Table.from_pydict(
        {
            "media_ref": [m["media_ref"] for m in media_rows],
            "width": [m["width"] for m in media_rows],
            "height": [m["height"] for m in media_rows],
            "pixels": [m["pixels"] for m in media_rows],
            "true_text": [m["true_text"] for m in media_rows],
        },
        schema=MEDIA_SCHEMA,
    )
    expected = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": exp_spans}, schema=EXTRACTED_SCHEMA
    )
    return documents, media, expected


def write_corpus(out_dir: str, **kwargs) -> dict[str, str]:
    """Write the three tables as parquet under out_dir; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    documents, media, expected = make_corpus(**kwargs)
    paths = {}
    for name, tbl in [
        ("documents", documents),
        ("media", media),
        ("expected", expected),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
