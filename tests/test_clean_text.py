import numpy as np
import pyarrow as pa

from greenocr_ray.fixtures.gen import make_html_span, make_pdf_span
from greenocr_ray.stages.clean_text import clean_html, clean_pdf, clean_text_spans


def test_clean_html_strips_boilerplate_and_tags():
    raw = (
        "<html><head><style>p{}</style></head><body><nav>Home</nav>"
        "<p>real  content</p><script>var x=1</script>"
        "<footer>Legal</footer></body></html>"
    )
    assert clean_html(raw) == "real content"


def test_clean_html_entities_after_tagstrip():
    assert clean_html("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"
    assert clean_html("x &amp;lt; y") == "x &lt; y"  # double-escape preserved


def test_clean_html_nested_drop_blocks():
    raw = "<nav>outer <nav>inner</nav> tail</nav><p>keep</p>"
    assert clean_html(raw) == "keep"


def test_clean_html_comments():
    assert clean_html("a <!-- hidden --> b") == "a b"


def test_clean_pdf_dehyphenates_and_drops_furniture():
    raw = "some exam-\nple text\n\x0cPage 3\nmore words"
    assert clean_pdf(raw) == "some example text more words"


def test_clean_pdf_hyphen_across_page_break():
    raw = "bro-\n\x0cPage 7\nken"
    # page furniture removed first, then the line-wrap hyphen joins
    assert clean_pdf(raw) == "broken"


def test_generator_spans_invert_exactly():
    for i in range(50):
        rng = np.random.Generator(np.random.PCG64([77, i]))
        raw, expected = make_html_span(rng)
        assert clean_html(raw) == expected
        raw, expected = make_pdf_span(rng)
        assert clean_pdf(raw) == expected


def test_clean_text_spans_batch():
    batch = pa.table(
        {
            "doc_id": ["d1", "d1", "d2"],
            "offset": pa.array([0, 1, 0], type=pa.int32()),
            "kind": ["text", "html", "pdf"],
            "text": ["  a  b ", "<p>x</p>", "y-\nz"],
            "media_ref": ["", "", ""],
        }
    )
    out = clean_text_spans(batch)
    assert out.column("text").to_pylist() == ["a b", "x", "yz"]
    assert out.column("kind").to_pylist() == ["text"] * 3
    assert out.column("media_ref").to_pylist() == [""] * 3
