"""Pure-numpy PNG codec tests: round-trips over every scanline filter
and color type, malformed-input rejection, and the OCR decode path
(PNG payload must recognize identically to its raw-gray source)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from greenocr_ray import png
from greenocr_ray.functions.multimodal import decode_raster
from greenocr_ray.png import SIGNATURE, decode_png, encode_png, is_png


def _rng():
    return np.random.Generator(np.random.PCG64(42))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_filters_and_color_types(filter_type, channels):
    rng = _rng()
    shape = (13, 17) if channels == 1 else (13, 17, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_png(img, filter_type=filter_type)
    assert is_png(data)
    np.testing.assert_array_equal(decode_png(data), img)


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (7, 1), (64, 1661)])
def test_roundtrip_edge_sizes(shape):
    rng = _rng()
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    for f in (0, 1, 2, 3, 4):
        np.testing.assert_array_equal(decode_png(encode_png(img, f)), img)


def test_mixed_filters_per_scanline():
    """Decoder handles a stream whose rows use different filters (the
    normal output of real encoders): re-assemble scanlines by hand."""
    import struct
    import zlib

    rng = _rng()
    img = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    per_row = []
    for f in (0, 1, 2, 3, 4):
        raw = zlib.decompress(
            _idat_payload(encode_png(img, filter_type=f))
        )
        stride = 9 + 1
        per_row.append(raw[0 * stride : 5 * stride])
    # row r taken from the encoding that used filter r
    stride = 9 + 1
    mixed = b"".join(
        per_row[r][r * stride : (r + 1) * stride] for r in range(5)
    )
    head = encode_png(img)[:8]
    ihdr = struct.pack(">IIBBBBB", 9, 5, 8, 0, 0, 0, 0)
    data = (
        head
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(mixed))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), img)


def _chunk(ctype, payload):
    import struct
    import zlib

    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _idat_payload(data: bytes) -> bytes:
    import struct

    pos = 8
    out = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            out += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return out


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((3, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated chunk stream
    with pytest.raises(ValueError):
        encode_png(img.astype(np.float32))  # wrong dtype


def test_decode_raster_sniffs_png():
    rng = _rng()
    img = rng.integers(0, 256, (16, 40), dtype=np.uint8)
    raw = img.tobytes()
    via_raw = decode_raster(raw, 40, 16)
    via_png = decode_raster(encode_png(img), 40, 16)  # metadata ignored
    np.testing.assert_array_equal(via_raw, via_png)
    assert via_png.dtype == np.float32


def test_rgba_composites_over_white():
    # fully transparent pixels must read as white (step.png RGBA case)
    img = np.zeros((2, 2, 4), dtype=np.uint8)  # black, alpha 0
    out = decode_raster(encode_png(img), 2, 2)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    # gray+alpha variant
    ga = np.zeros((2, 2, 2), dtype=np.uint8)
    out = decode_raster(encode_png(ga), 2, 2)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_ocr_png_payload_matches_raw():
    """A PNG-encoded line image recognizes to exactly the same text as
    its raw-gray source (the span-sequence-equality requirement holds
    for the reference's real input format)."""
    from greenocr_ray.glyphs import render_line
    from greenocr_ray.recognize import Recognizer

    img = render_line("the quick fox 42")
    u8 = np.round(img * 255.0).astype(np.uint8)
    rec = Recognizer()
    text_raw, conf_raw = rec.recognize(
        u8.astype(np.float32) / np.float32(255.0)
    )
    decoded = decode_raster(encode_png(u8), 0, 0)
    text_png, conf_png = rec.recognize(decoded)
    assert text_png == text_raw == "the quick fox 42"
    assert conf_png == conf_raw


def test_corrupt_idat_raises_valueerror_everywhere():
    """Corrupted IDAT must surface as ValueError (not zlib.error), so
    every skip-and-continue guard in the engine catches it (ADVICE r2)."""
    import pytest

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(png.encode_png(img))
    # flip bytes inside the IDAT payload -> zlib.decompress fails
    idat_at = bytes(data).find(b"IDAT")
    data[idat_at + 8] ^= 0xFF
    data[idat_at + 9] ^= 0xFF
    with pytest.raises(ValueError):
        png.decode_png(bytes(data))
    # truncated body: signature valid, missing IEND
    with pytest.raises(ValueError):
        png.decode_png(png.encode_png(img)[:20])


def test_stages_skip_corrupt_png_rows(ray_session):
    """OCR / resize / feature stages emit empty rows for corrupt PNG
    payloads instead of crashing the stage (ADVICE r2 items 1-2)."""
    from greenocr_ray.functions.multimodal import (
        ImageFeatureStage,
        ImageResizeStage,
    )
    from greenocr_ray.stages.ocr import OcrMediaActor

    good = np.full((16, 40), 255, dtype=np.uint8)
    good_png = png.encode_png(good)
    trunc = png.encode_png(good)[:24]  # valid signature, truncated body
    corrupt = bytearray(png.encode_png(good))
    at = bytes(corrupt).find(b"IDAT")
    corrupt[at + 8] ^= 0xFF

    batch = pa.table(
        {
            "media_ref": ["ok", "trunc", "bad"],
            "width": pa.array([40, 40, 40], type=pa.int32()),
            "height": pa.array([16, 16, 16], type=pa.int32()),
            "pixels": pa.array(
                [good_png, trunc, bytes(corrupt)], type=pa.binary()
            ),
        }
    )
    ocr = OcrMediaActor()(batch)
    assert ocr.column("text").to_pylist()[1:] == ["", ""]
    resized = ImageResizeStage(target_h=8)(batch)
    assert resized.column("width").to_pylist()[1:] == [0, 0]
    assert resized.column("pixels").to_pylist()[1:] == [b"", b""]
    feats = ImageFeatureStage()(batch)
    assert feats.column("ink_density").to_pylist()[1:] == [0.0, 0.0]
