"""Pure-numpy PNG codec (stdlib ``zlib`` + numpy scanline unfiltering).

The reference's real input format is PNG files read with
``cv2.imread`` (exe_t.py:482); every fixture in its ``test_images/``
is a PNG (gray / RGB / RGBA, SURVEY.md §5). This container has no
image codec library, but PNG needs none: DEFLATE is stdlib zlib and
the five scanline filters are short numpy recurrences.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the set the reference fixtures use. Palette
(type 3), 16-bit and Adam7 interlacing raise ``ValueError``.

The encoder exists for fixtures/tests (and the ``media_png`` table
derivation); it writes one IDAT chunk with a caller-chosen filter type
so the decoder's filter paths are all testable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def is_png(data: bytes) -> bool:
    return data[:8] == SIGNATURE


# ---------------------------------------------------------------- encode


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 HxW / HxWx{2,3,4} -> PNG bytes (single IDAT chunk).

    ``filter_type`` applies the same filter to every scanline — 0 is
    the default; 1..4 exist so tests can exercise every decoder path.
    """
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    x = a.astype(np.int32)
    left = np.zeros_like(x)
    left[:, 1:, :] = x[:, :-1, :]
    up = np.zeros_like(x)
    up[1:, :, :] = x[:-1, :, :]
    ul = np.zeros_like(x)
    ul[1:, 1:, :] = x[:-1, :-1, :]
    if filter_type == 0:
        filt = x
    elif filter_type == 1:
        filt = x - left
    elif filter_type == 2:
        filt = x - up
    elif filter_type == 3:
        filt = x - (left + up) // 2
    else:  # Paeth predictor
        filt = x - _paeth(left, up, ul)
    body = (filt % 256).astype(np.uint8).reshape(h, w * ch)
    raw = b"".join(
        bytes([filter_type]) + body[r].tobytes() for r in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4): nearest of a,b,c to
    p = a+b-c, ties broken a, then b, then c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


# ---------------------------------------------------------------- decode


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: HxW (gray) or HxWxC (2/3/4 channels).

    All decode failures — including corrupted IDAT (``zlib.error``) and
    malformed chunk headers (``struct.error``) — surface as
    ``ValueError`` so callers need exactly one skip-and-continue guard
    (the reference's per-row error policy, exe_t.py:319-336)."""
    try:
        return _decode_png(data)
    except (zlib.error, struct.error) as e:
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = None
    idat = bytearray()
    for ctype, payload in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    body = rows[:, 1:].astype(np.int32).reshape(height, width, ch)
    out = np.zeros_like(body)
    prev = np.zeros((width, ch), dtype=np.int32)
    for r in range(height):
        f = int(filters[r])
        row = body[r]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: recon[i] = x[i] + recon[i-1] -> cumsum mod 256
            cur = np.cumsum(row, axis=0) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average: sequential in the pixel dimension
            cur = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int32)
            for i in range(width):
                left = (row[i] + (left + prev[i]) // 2) % 256
                cur[i] = left
        elif f == 4:  # Paeth: sequential in the pixel dimension
            cur = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for i in range(width):
                left = (row[i] + _paeth(left, prev[i], upleft)) % 256
                cur[i] = left
                upleft = prev[i]
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[r] = cur
        prev = cur
    result = out.astype(np.uint8)
    return result[:, :, 0] if ch == 1 else result
