import numpy as np

from greenocr_ray.glyphs import (
    GLYPH_H,
    GLYPH_W,
    MIN_HAMMING,
    SCALE,
    atlas,
    build_atlas,
    line_width_units,
    render_line,
    renderable_text,
)
from greenocr_ray.vocab import RENDERABLE


def test_atlas_covers_renderable_and_is_deterministic():
    a = atlas()
    assert set(a.keys()) == set(RENDERABLE) - {" "}
    b = build_atlas()
    for c in a:
        assert np.array_equal(a[c], b[c])


def test_atlas_constraints():
    a = atlas()
    glyphs = list(a.values())
    for g in glyphs:
        assert g.shape == (GLYPH_H, GLYPH_W)
        assert g.any(axis=0).all(), "blank column would split at segmentation"
        assert g.any(axis=1).all(), "blank row would break vertical registration"
    for i in range(len(glyphs)):
        for j in range(i + 1, len(glyphs)):
            assert (glyphs[i] != glyphs[j]).sum() >= MIN_HAMMING


def test_renderable_text_drops_oov_and_collapses_ws():
    assert renderable_text("a☃b  c") == "ab c"


def test_render_geometry():
    img = render_line("the")
    assert img.shape[0] == (GLYPH_H + 8) * SCALE
    assert img.shape[1] == line_width_units("the") * SCALE
    assert img.dtype == np.float32
    assert img.min() == 0.0 and img.max() == 1.0
    # wider text -> wider image
    assert render_line("the fast").shape[1] > img.shape[1]
