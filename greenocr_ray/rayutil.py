"""Small Ray Data utilities shared across the engine."""

from __future__ import annotations

import ray.data as rd


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Rebuild a MATERIALIZED dataset without its empty blocks
    (zero-copy: only block refs move, on the driver).

    Why this exists: ``groupby().map_groups`` emits schema-less empty
    blocks for empty hash partitions, ``map_batches`` silently skips
    empty blocks (the UDF is never called, so they can't be fixed
    in-stream), and Ray 2.49.2's hash-shuffle operator broadcasts the
    schema of whichever input block it shuffles FIRST — a schema-less
    one poisons every empty target partition, whose finalize key-sort
    then raises ``ArrowInvalid: No match for FieldRef``. Dropping the
    empties before the next shuffle removes the hazard.
    """
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return ds  # nothing non-empty; caller handles the empty result
    return rd.from_arrow_refs(refs)


# ------------------------------------------------ vectorized crc32

import numpy as np
import pyarrow as pa


def _crc32_table() -> "np.ndarray":
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1)
    return t


_CRC32_TABLE = _crc32_table()


def crc32_of_strings(arr) -> "np.ndarray":
    """Bit-identical ``zlib.crc32(s.encode())`` for every element of an
    Arrow string array/chunked array, computed VECTORIZED: the CRC
    state of all rows advances one byte position per numpy step over
    the column's flat utf8 buffer (zero-copy from Arrow offsets), so
    the Python-level loop is O(max_len), not O(rows). ~7x faster than
    the per-row to_pylist + zlib loop on uniform doc_id-shaped columns
    (24 ms vs 168 ms per 200k rows), ~2x on mixed-length text; used by
    every doc/media bucket partitioner on the hot span path."""
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            return crc32_of_strings(arr.chunk(0))
        return (
            np.concatenate([crc32_of_strings(c) for c in arr.chunks])
            if arr.num_chunks
            else np.array([], dtype=np.uint32)
        )
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    if arr.type == pa.large_string():
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    n = len(arr)
    if n == 0:
        return np.array([], dtype=np.uint32)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    max_len = int(lens.max()) if n else 0
    min_len = int(lens.min()) if n else 0
    # phase 1: no masking while every row is still alive — for
    # uniform-length id columns (the common case) this is the whole
    # computation: one gather + one xor/shift per byte position
    for j in range(min_len):
        b = data[starts + j].astype(np.uint32)
        crc = _CRC32_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    # phase 2: masked tail for rows longer than min_len
    alive = np.nonzero(lens > min_len)[0]
    for j in range(min_len, max_len):
        if not len(alive):
            break
        b = data[starts[alive] + j].astype(np.uint32)
        c = crc[alive]
        crc[alive] = _CRC32_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
        alive = alive[lens[alive] > j + 1]
    return crc ^ np.uint32(0xFFFFFFFF)


def hash_partition_of_int32(value: int, num_partitions: int) -> int:
    """Reproduce Ray 2.49.2's hash_partition assignment for an int32
    key value (transform_pyarrow.hash_partition hashes the tuple of
    pyarrow scalars; INT scalar hashing is PYTHONHASHSEED-independent,
    verified across seeds — strings would not be)."""
    arr = pa.array([value], type=pa.int32())
    return hash((arr[0],)) % num_partitions


def covering_bucket_values(nbuckets: int, num_partitions: int) -> list[int]:
    """Int32 bucket values whose hash-partition assignments cover
    EVERY partition of a ``groupby('bucket', num_partitions=...)``
    shuffle: all real values 0..nbuckets-1 (so every real group also
    contains one sentinel row) plus synthetic values >= nbuckets for
    partitions no real bucket hashes to (those would otherwise emit
    schema-less empty blocks that poison downstream shuffles — the
    Ray 2.49.2 schema-broadcast race; see drop_empty_blocks)."""
    values = list(range(nbuckets))
    covered = {hash_partition_of_int32(v, num_partitions) for v in values}
    v = nbuckets
    while len(covered) < num_partitions:
        p = hash_partition_of_int32(v, num_partitions)
        if p not in covered:
            covered.add(p)
            values.append(v)
        v += 1
    return values


# ----------------------------------------------------- vectorized MD5

_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * 2**32).astype(np.uint64).astype(np.uint32)
_MD5_G = np.concatenate(
    [
        np.arange(16),
        (5 * np.arange(16) + 1) % 16,
        (3 * np.arange(16) + 5) % 16,
        (7 * np.arange(16)) % 16,
    ]
).astype(np.int64)


def md5_digests(msgs: "list[bytes]") -> "np.ndarray":
    """(n, 16) uint8 MD5 digests, bit-exact with ``hashlib.md5``,
    computed VECTORIZED across rows (RFC 1321, public algorithm): all
    rows advance through the 64 rounds simultaneously as numpy uint32
    lanes, so the Python-level loop is O(64), not O(rows). Rows longer
    than 55 bytes (multi-block) fall back to hashlib individually —
    the callers hash doc-id strings and word tokens, which are short.
    Honest numbers (200k short rows): from a bytes list this is ~par
    with the hashlib loop (OpenSSL's C md5 is fast; the win is GIL-free
    numpy lanes), but via :func:`md5_digests_of_ints` — whose block
    fill is pure numpy — it is ~1.5x the full
    int(md5(str(id)).hexdigest()[:15], 16) parse loop and removes all
    per-row Python from the sampling/mixing hash rule."""
    import hashlib as _hl

    n = len(msgs)
    out = np.empty((n, 16), dtype=np.uint8)
    if n == 0:
        return out
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    long_rows = lens > 55
    short_idx = np.nonzero(~long_rows)[0]
    for i in np.nonzero(long_rows)[0]:
        out[i] = np.frombuffer(_hl.md5(msgs[i]).digest(), dtype=np.uint8)
    if not len(short_idx):
        return out
    m = len(short_idx)
    block = np.zeros((m, 64), dtype=np.uint8)
    slens = lens[short_idx]
    # vectorized scatter of all message bytes into the padded blocks:
    # one bytes-join + one fancy-index assignment, no per-row loop
    if long_rows.any():
        buf = b"".join(msgs[i] for i in short_idx)
    else:
        buf = b"".join(msgs)
    bufarr = np.frombuffer(buf, dtype=np.uint8)
    mask = np.arange(64, dtype=np.int64)[None, :] < slens[:, None]
    block[mask] = bufarr  # C-order boolean fill matches buffer order
    block[np.arange(m), slens] = 0x80
    # 8-byte little-endian bit length at offset 56 (single block)
    block[:, 56:64] = (
        (slens[:, None].astype(np.uint64) * 8)
        >> (np.arange(8, dtype=np.uint64) * 8)
    ).astype(np.uint8)
    out[short_idx] = _md5_rounds(block)
    return out


def _md5_rounds(block: "np.ndarray") -> "np.ndarray":
    """The 64 MD5 rounds over pre-padded (n, 64) uint8 single blocks,
    all rows as parallel uint32 lanes. -> (n, 16) uint8 digests."""
    m = block.shape[0]
    M = np.ascontiguousarray(block).view("<u4").reshape(m, 16)
    A = np.full(m, 0x67452301, dtype=np.uint32)
    B = np.full(m, 0xEFCDAB89, dtype=np.uint32)
    C = np.full(m, 0x98BADCFE, dtype=np.uint32)
    D = np.full(m, 0x10325476, dtype=np.uint32)
    a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                F = (b & c) | (~b & d)
            elif i < 32:
                F = (d & b) | (~d & c)
            elif i < 48:
                F = b ^ c ^ d
            else:
                F = c ^ (b | ~d)
            F = F + a + _MD5_K[i] + M[:, _MD5_G[i]]
            a, d, c = d, c, b
            s = int(_MD5_S[i])
            b = b + ((F << np.uint32(s)) | (F >> np.uint32(32 - s)))
    A += a
    B += b
    C += c
    D += d
    dig = np.empty((m, 4), dtype="<u4")
    dig[:, 0], dig[:, 1], dig[:, 2], dig[:, 3] = A, B, C, D
    return dig.view(np.uint8).reshape(m, 16)


def md5_digests_of_ints(ids: "np.ndarray") -> "np.ndarray":
    """(n, 16) uint8 ``md5(str(id).encode())`` digests with ZERO
    per-row Python: the decimal strings come from one numpy
    ``astype('U')`` cast whose fixed-width UCS4 buffer is viewed as
    the ASCII byte matrix directly (ids are decimal digits, all
    codepoints < 128), then fed to the vectorized single-block MD5."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    if n == 0:
        return np.empty((0, 16), dtype=np.uint8)
    su = ids.astype("U21")
    width = su.dtype.itemsize // 4
    codes = np.ascontiguousarray(su).view(np.uint32).reshape(n, width)
    lens = (codes != 0).sum(axis=1).astype(np.int64)
    block = np.zeros((n, 64), dtype=np.uint8)
    block[:, :width] = codes.astype(np.uint8)  # ASCII digits (+ '-')
    block[np.arange(n), lens] = 0x80
    block[:, 56:64] = (
        (lens[:, None].astype(np.uint64) * 8)
        >> (np.arange(8, dtype=np.uint64) * 8)
    ).astype(np.uint8)
    return _md5_rounds(block)


def md5_u60_of_ints(ids: "np.ndarray") -> "np.ndarray":
    """The repo's deterministic-uniform hash rule, vectorized:
    u = (int(md5(str(id)).hexdigest()[:15], 16) + 0.5) / 2**60 — the
    first 15 hex chars are the top 60 bits of the big-endian digest.
    Bit-exact with the hashlib form (shared by weighted/stratified
    sampling, source mixing and temperature mixing)."""
    dig = md5_digests_of_ints(ids)
    hi = dig[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
    return ((hi >> np.uint64(4)).astype(np.float64) + 0.5) / float(1 << 60)
