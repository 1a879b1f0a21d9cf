"""Deterministic glyph atlas + line-image renderer.

The reference's recognizer is a learned CRNN over line images of a
frozen vocabulary (exe_t.py:79,370-414). This engine replaces learned
weights with a *deterministic* glyph atlas: every renderable character
maps to a fixed GLYPH_H x GLYPH_W binary bitmap generated from a
per-character seeded PRNG, subject to constraints that make the
pipeline's segmentation and template matching exact:

- no blank rows/columns inside a glyph (so a glyph never splits at the
  column-projection segmentation step);
- pairwise Hamming distance >= MIN_HAMMING from every other glyph (so
  normalized template matching has a wide margin even after blur /
  binarization noise).

``render_line`` renders text left-to-right on a light background at a
fixed scale — the geometry mirrors the reference fixtures (height ~64,
width ~96 for a short word up to ~1661 for a full line, FIXTURES.md §5).
The same atlas is actor state in the recognizer (stages/ocr.py),
playing the role of the reference's model weights loaded once per
worker (vs. per-image construction, exe_t.py:485-496).
"""

from __future__ import annotations

import numpy as np

from .vocab import RENDERABLE

GLYPH_H = 12
GLYPH_W = 8
MIN_HAMMING = 24  # of GLYPH_H*GLYPH_W = 96 cells

# layout units (multiples of `scale` pixels)
CHAR_GAP_U = 2  # blank columns between adjacent glyphs
SPACE_ADVANCE_U = GLYPH_W  # extra blank advance for a space character
MARGIN_U = 4  # border margin on all sides
SCALE = 3  # pixels per glyph unit -> line height = (12 + 8) * 3 = 60 px

# blank-run width (units) above which a gap decodes as a space:
# char gap = 2 units, space gap = CHAR_GAP_U + SPACE_ADVANCE_U + CHAR_GAP_U = 12
SPACE_GAP_THRESHOLD_U = 6

_ATLAS_SEED = 0x6C0C4


def _candidate(ch: str, attempt: int) -> np.ndarray:
    rng = np.random.Generator(
        np.random.PCG64([_ATLAS_SEED, ord(ch), attempt])
    )
    return rng.random((GLYPH_H, GLYPH_W)) < 0.5


def _ok_shape(g: np.ndarray) -> bool:
    return bool(g.any(axis=0).all() and g.any(axis=1).all())


def build_atlas() -> dict[str, np.ndarray]:
    """char -> (GLYPH_H, GLYPH_W) bool bitmap; deterministic."""
    atlas: dict[str, np.ndarray] = {}
    chosen: list[np.ndarray] = []
    for ch in RENDERABLE:
        if ch == " ":
            continue
        attempt = 0
        while True:
            g = _candidate(ch, attempt)
            attempt += 1
            if not _ok_shape(g):
                continue
            if all((g != prev).sum() >= MIN_HAMMING for prev in chosen):
                break
        atlas[ch] = g
        chosen.append(g)
    return atlas


_atlas_cache: dict[str, np.ndarray] | None = None


def atlas() -> dict[str, np.ndarray]:
    global _atlas_cache
    if _atlas_cache is None:
        _atlas_cache = build_atlas()
    return _atlas_cache


def renderable_text(text: str) -> str:
    """Project text onto the renderable charset (OOV chars dropped,
    mirroring the reference's silent OOV drop, exe_t.py:112-114) and
    whitespace-collapse."""
    kept = "".join(c for c in text if c in RENDERABLE)
    return " ".join(kept.split())


def line_width_units(text: str) -> int:
    w = 2 * MARGIN_U
    first = True
    for ch in text:
        if ch == " ":
            w += SPACE_ADVANCE_U + CHAR_GAP_U
            first = False
            continue
        if not first:
            w += CHAR_GAP_U
        w += GLYPH_W
        first = False
    return w


def render_line(text: str, scale: int = SCALE) -> np.ndarray:
    """Render text -> float32 HxW image, ink 0.0 on background 1.0.

    Layout: left-to-right glyph cells at fixed pitch with CHAR_GAP_U
    blank units between glyphs and a SPACE_ADVANCE_U-unit blank advance
    for spaces — the blank-run widths are the segmentation contract
    decoded by the recognizer.
    """
    text = renderable_text(text)
    if not text:
        text = "?"
    a = atlas()
    h_u = GLYPH_H + 2 * MARGIN_U
    w_u = line_width_units(text)
    canvas = np.zeros((h_u, w_u), dtype=bool)
    x = MARGIN_U
    first = True
    for ch in text:
        if ch == " ":
            x += SPACE_ADVANCE_U + CHAR_GAP_U
            first = False
            continue
        if not first:
            x += CHAR_GAP_U
        canvas[MARGIN_U : MARGIN_U + GLYPH_H, x : x + GLYPH_W] |= a[ch]
        x += GLYPH_W
        first = False
    big = np.kron(canvas, np.ones((scale, scale), dtype=bool))
    return np.where(big, np.float32(0.0), np.float32(1.0))


