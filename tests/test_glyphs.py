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


def test_sr_enhance_recovers_blur():
    """P1 operator: on a heavily blurred faded render (sigma 2.5, ~3x
    the fixture degradation cap), the CLAHE-only chain misreads while
    enhance='sr' (Richardson-Lucy detail restoration, the
    Real-ESRGAN outscale=1 stand-in) recovers the text exactly, and
    the default chain's behavior is unchanged on a clean render."""
    import numpy as np

    from greenocr_ray import kernels
    from greenocr_ray.glyphs import render_line
    from greenocr_ray.recognize import Recognizer

    truth = "the quick brown fox 42"
    img = render_line(truth).astype(np.float32)
    degraded = kernels.gaussian_blur(0.38 + 0.24 * img, 2.5)

    got_clahe, _ = Recognizer(enhance="clahe").recognize(degraded)
    got_sr, conf_sr = Recognizer(enhance="sr").recognize(degraded)
    assert got_clahe != truth  # the degradation defeats contrast alone
    assert got_sr == truth
    assert conf_sr > 0.3

    # default chain unchanged on a mildly degraded render
    mild = kernels.gaussian_blur(0.3 + 0.6 * img, 0.6)
    assert Recognizer(enhance="clahe").recognize(mild)[0] == truth
    # sr output contract: same shape, [0,1]
    out = kernels.sr_enhance(degraded)
    assert out.shape == degraded.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
