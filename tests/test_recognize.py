import numpy as np
import pytest

from greenocr_ray.fixtures.gen import degrade, make_corpus
from greenocr_ray.glyphs import render_line
from greenocr_ray.recognize import Recognizer


def _img_from_row(media, i):
    w = media["width"][i].as_py()
    h = media["height"][i].as_py()
    return (
        np.frombuffer(media["pixels"][i].as_py(), dtype=np.uint8)
        .reshape(h, w)
        .astype(np.float32)
        / 255.0
    )


def test_clean_render_recognized_exactly():
    rec = Recognizer()
    for text in ["the", "Hello, World! 123", "a b c", "presto"]:
        got, conf = rec.recognize(render_line(text))
        assert got == text
        assert conf > 0.5


def test_degraded_recovery_default_mode_exact():
    """The BASELINE.json invariant: OCR output must equal the golden
    text exactly for span-sequence equality to hold."""
    _, media, _ = make_corpus(n_docs=30, seed=11)
    rec = Recognizer()
    for i in range(media.num_rows):
        got, _ = rec.recognize(_img_from_row(media, i))
        assert got == media["true_text"][i].as_py()


@pytest.mark.parametrize(
    "enhance,binarization",
    [("stretch", "otsu"), ("clahe", "sauvola")],
)
def test_alternate_modes_near_exact(enhance, binarization):
    _, media, _ = make_corpus(n_docs=20, seed=5)
    rec = Recognizer(enhance=enhance, binarization=binarization)
    ok = sum(
        rec.recognize(_img_from_row(media, i))[0] == media["true_text"][i].as_py()
        for i in range(media.num_rows)
    )
    assert ok >= media.num_rows - 1


def test_skewed_wide_line():
    text = "the fast key order sort table scan merge part window"
    img = render_line(text)
    rng = np.random.Generator(np.random.PCG64([3, 3]))
    got, _ = Recognizer().recognize(degrade(img, rng))
    assert got == text


def test_empty_image():
    rec = Recognizer()
    got, conf = rec.recognize(np.ones((60, 100), dtype=np.float32))
    assert got == "" and conf == 0.0


def _stack_lines(lines, gap_px=24, pad_px=12):
    """Compose rendered line images into one page (background 1.0)."""
    w = max(im.shape[1] for im in lines)
    h = sum(im.shape[0] for im in lines) + gap_px * (len(lines) - 1) + 2 * pad_px
    page = np.ones((h, w + 2 * pad_px), dtype=np.float32)
    y = pad_px
    for im in lines:
        page[y : y + im.shape[0], pad_px : pad_px + im.shape[1]] = im
        y += im.shape[0] + gap_px
    return page


def test_page_two_lines_golden():
    """CC line grouping reads a stacked two-line page top-to-bottom
    (the multi-line path projection bands can't serve alone)."""
    page = _stack_lines(
        [render_line("first line here"), render_line("second one below")]
    )
    text, conf = Recognizer().recognize_page(page)
    assert text == "first line here second one below"
    assert conf > 0.5


def test_page_single_line_matches_recognize():
    img = render_line("just one strip")
    rec = Recognizer()
    assert rec.recognize_page(img)[0] == rec.recognize(img)[0] == "just one strip"


def test_page_two_columns_reading_order():
    """Two columns, two lines each: reading order is column-major
    (column left-to-right, lines top-to-bottom inside a column)."""
    left = _stack_lines([render_line("alpha beta"), render_line("gamma delta")])
    right = _stack_lines([render_line("epsilon zeta"), render_line("eta theta")])
    h = max(left.shape[0], right.shape[0])
    gutter = 120  # >> the 3x space-gap gutter threshold
    page = np.ones((h, left.shape[1] + gutter + right.shape[1]), dtype=np.float32)
    page[: left.shape[0], : left.shape[1]] = left
    page[: right.shape[0], left.shape[1] + gutter :] = right
    text, _ = Recognizer().recognize_page(page)
    assert text == "alpha beta gamma delta epsilon zeta eta theta"


def test_page_degraded_two_lines():
    rng = np.random.Generator(np.random.PCG64(77))
    page = _stack_lines(
        [render_line("noisy page test"), render_line("still reads fine")]
    )
    text, _ = Recognizer().recognize_page(degrade(page, rng))
    assert text == "noisy page test still reads fine"


def test_external_enhance_seam():
    """enhance='external' plugs a caller-supplied model in place of
    CLAHE (the Real-ESRGAN slot, exe_t.py:483-499) without touching
    the rest of the chain."""
    calls = []

    def fake_sr(img):
        calls.append(img.shape)
        return np.clip(img * 1.05 - 0.02, 0.0, 1.0)  # mild contrast push

    rec = Recognizer(enhance="external", enhance_fn=fake_sr)
    text, _ = rec.recognize(render_line("external path"))
    assert text == "external path"
    assert calls  # the external model actually ran

    with pytest.raises(ValueError):
        Recognizer(enhance="external")
