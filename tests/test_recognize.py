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
