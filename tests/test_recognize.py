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


def _ragged_page(line_words, jitter_px, gap_px, pad_px=14, seed=4):
    """Compose a page where each WORD sits at its own vertical offset
    (ragged baseline) — stresses segment_lines_cc's interval-overlap
    grouping; a projection-profile band would mis-split or mis-merge
    these once jitter approaches the inter-line gap."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rendered = [[render_line(w) for w in words] for words in line_words]
    space_px = render_line("a a").shape[1] - 2 * render_line("a").shape[1]
    line_h = rendered[0][0].shape[0]
    widths = [
        sum(im.shape[1] for im in ims) + space_px * (len(ims) - 1)
        for ims in rendered
    ]
    w = max(widths) + 2 * pad_px
    h = (
        len(rendered) * (line_h + 2 * jitter_px)
        + gap_px * (len(rendered) - 1)
        + 2 * pad_px
    )
    page = np.ones((h, w), dtype=np.float32)
    y = pad_px + jitter_px
    for ims in rendered:
        x = pad_px
        for im in ims:
            dy = int(rng.integers(-jitter_px, jitter_px + 1))
            page[y + dy : y + dy + im.shape[0], x : x + im.shape[1]] = im
            x += im.shape[1] + space_px
        y += line_h + 2 * jitter_px + gap_px
    return page


def test_page_ragged_baselines_reading_order():
    """Words jittered +-6 px around each baseline still group into
    their lines (>=50% y-overlap contract) and read in order."""
    page = _ragged_page(
        [
            ["ragged", "baseline", "first"],
            ["second", "line", "wanders"],
            ["third", "stays", "put"],
        ],
        jitter_px=6,
        gap_px=36,
    )
    text, conf = Recognizer().recognize_page(page)
    assert text == "ragged baseline first second line wanders third stays put"
    assert conf > 0.5


def test_page_unequal_columns_ragged_noisy():
    """Unequal column widths + ragged baselines + salt-and-pepper
    noise: reading order stays column-major left-to-right."""
    left = _ragged_page([["one", "two"], ["three", "four"]], 5, 36, seed=9)
    right = _ragged_page(
        [["a", "much", "wider", "right", "column"], ["with", "two", "lines"]],
        5,
        36,
        seed=10,
    )
    h = max(left.shape[0], right.shape[0])
    gutter = 140
    page = np.ones((h, left.shape[1] + gutter + right.shape[1]), dtype=np.float32)
    page[: left.shape[0], : left.shape[1]] = left
    page[: right.shape[0], left.shape[1] + gutter :] = right
    rng = np.random.Generator(np.random.PCG64(123))
    n = int(0.002 * page.size)  # salt-and-pepper impulses
    ys = rng.integers(0, page.shape[0], n)
    xs = rng.integers(0, page.shape[1], n)
    page[ys[: n // 2], xs[: n // 2]] = 0.25  # pepper (sub-despeckle specks)
    page[ys[n // 2 :], xs[n // 2 :]] = 1.0  # salt
    text, _ = Recognizer().recognize_page(page)
    assert text == (
        "one two three four a much wider right column with two lines"
    )


def test_segment_lines_cc_ragged_grouping():
    """Direct kernel check: boxes with ragged tops group by interval
    overlap and emit top-to-bottom, left-to-right."""
    from greenocr_ray import kernels

    mask = np.zeros((100, 120), dtype=bool)
    # line 1: three boxes, tops at 10/16/12 (ragged), heights 20
    for x0, y0 in ((5, 10), (45, 16), (85, 12)):
        mask[y0 : y0 + 20, x0 : x0 + 20] = True
    # line 2: two boxes, tops at 60/66
    for x0, y0 in ((20, 60), (70, 66)):
        mask[y0 : y0 + 20, x0 : x0 + 20] = True
    lines = kernels.segment_lines_cc(mask)
    assert [len(ln) for ln in lines] == [3, 2]
    assert [b[2] for b in lines[0]] == [5, 45, 85]  # x order within line
    assert [b[2] for b in lines[1]] == [20, 70]
