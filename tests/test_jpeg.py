"""Pure-numpy baseline JPEG codec tests: lossy round-trips with
bounded error across shapes/samplings/restart intervals, spec-level
known values, malformed-input rejection, and the OCR decode path
(JPEG payload must recognize identically to its raw-gray source)."""

from __future__ import annotations

import numpy as np
import pytest

from greenocr_ray.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def _rng():
    return np.random.Generator(np.random.PCG64(77))


@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 24), (17, 23), (1, 1), (5, 300), (64, 200)]
)
def test_gray_roundtrip_bounded_error(shape):
    """Encoder (FDCT+quant+Huffman) and decoder (Huffman+dequant+IDCT)
    are independent inverse transforms — a bounded round-trip error on
    a smooth image validates both."""
    h, w = shape
    x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 40, h)[:, None]
    img = np.clip(x, 0, 255).astype(np.uint8)
    data = encode_jpeg(img, quality=95)
    assert is_jpeg(data)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_flat_image_near_exact():
    """A constant block has only a DC coefficient; the round-trip is
    exact up to one quantization-rounding LSB (255 lands on a .5
    quantization boundary at q=50 and comes back 254 — same as a
    libjpeg float FDCT), and the whole plane stays constant."""
    for v in (0, 128, 200, 255):
        img = np.full((24, 40), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=50))
        assert len(np.unique(out)) == 1
        assert abs(int(out[0, 0]) - v) <= 1


def test_known_dc_value():
    """Spec check independent of the encoder: hand-build the DC path.
    A flat 8x8 block of value v has FDCT DC = (v-128)*8/sqrt(64)... in
    the orthonormal basis DC = (v-128)*8; with luma q[0]=16 at q=50 the
    quantized DC is round((v-128)*8/16)."""
    v = 200
    img = np.full((8, 8), v, dtype=np.uint8)
    data = encode_jpeg(img, quality=50)
    out = decode_jpeg(data)
    # dequantized DC back through IDCT: value = round(q*16/8)+128
    dc_q = round((v - 128) * 8 / 16)
    expect = int(np.clip(round(dc_q * 16 / 8.0 + 128), 0, 255))
    assert np.all(out == expect)


def test_binary_text_image_survives():
    rng = _rng()
    img = (rng.random((32, 128)) > 0.5).astype(np.uint8) * 255
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 24  # q=95 on a worst-case image
    assert err.mean() < 3


def test_color_444_and_420_roundtrip():
    grad = np.zeros((33, 47, 3), np.uint8)
    grad[:, :, 0] = np.linspace(0, 255, 47)[None, :]
    grad[:, :, 1] = np.linspace(0, 255, 33)[:, None]
    grad[:, :, 2] = 80
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(grad, quality=95, subsample=sub))
        assert out.shape == grad.shape
        err = np.abs(out.astype(int) - grad.astype(int))
        assert err.max() <= 16, sub


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_intervals(interval):
    """DRI/RSTn: byte-aligned restarts with DC-predictor resets."""
    x = np.linspace(0, 255, 200)[None, :] + np.linspace(0, 40, 64)[:, None]
    img = np.clip(x, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=interval))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot-a-jpeg")
    # minimal stream with a progressive SOF2 marker
    img = np.full((8, 8), 99, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
    assert not is_jpeg(b"\xff\xd8")  # too short / wrong third byte


def test_extract_mixed_codec_media(ray_session):
    """One media table mixing raw-gray-u8, PNG and JPEG payloads
    extracts with exact span equality — the content-sniffing contract
    (no format column needed)."""
    import pyarrow as pa
    import ray.data as rd

    from greenocr_ray import png
    from greenocr_ray.fixtures.gen import make_corpus
    from greenocr_ray.pipelines.extract import ExtractOptions, extract_dataset
    from tests.test_pipeline import spans_key

    docs, media, expected = make_corpus(n_docs=15, seed=31)

    def mix(t: pa.Table) -> pa.Table:
        ws = t.column("width").to_numpy()
        hs = t.column("height").to_numpy()
        out = []
        for i, (raw, w, h) in enumerate(
            zip(t.column("pixels").to_pylist(), ws, hs)
        ):
            img = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w))
            if i % 3 == 1:
                out.append(png.encode_png(img))
            elif i % 3 == 2:
                out.append(encode_jpeg(img, quality=95))
            else:
                out.append(raw)
        j = t.schema.get_field_index("pixels")
        return t.set_column(j, "pixels", pa.array(out, type=pa.binary()))

    mixed = rd.from_arrow(media).map_batches(mix, batch_format="pyarrow")
    res = extract_dataset(
        rd.from_arrow(docs),
        mixed,
        ExtractOptions(ocr_concurrency=(1, 3), join_partitions=4),
    ).to_pandas().set_index("doc_id")
    exp = expected.to_pandas().set_index("doc_id")
    for doc_id in exp.index:
        assert spans_key(res.loc[doc_id, "spans"]) == spans_key(
            exp.loc[doc_id, "spans"]
        ), doc_id


def test_ocr_exact_through_jpeg(ray_session):
    """The OCR actor path recognizes a JPEG payload identically to its
    raw-gray source (the extract_jpeg_verify invariant, in miniature)."""
    from greenocr_ray.functions.multimodal import decode_raster
    from greenocr_ray.glyphs import render_line
    from greenocr_ray.recognize import Recognizer

    rec = Recognizer()
    for text in ("the quick fox 42", "part a row fast"):
        img = render_line(text)
        u8 = np.clip(np.round(np.asarray(img, dtype=np.float64) * 255), 0, 255).astype(
            np.uint8
        ) if img.dtype != np.uint8 else img
        data = encode_jpeg(u8, quality=95)
        dec = decode_raster(data, 0, 0)
        got, conf = rec.recognize(dec)
        assert got == text
        assert conf > 0.5
