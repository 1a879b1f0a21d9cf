"""Hypothesis property tests (SURVEY.md §5.1): invariants that hold
for ALL inputs, not just fixtures. No Ray needed — pure kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from greenocr_ray import kernels
from greenocr_ray.functions.dedup import SimHasher, jaccard
from greenocr_ray.functions.relational import round_half_away
from greenocr_ray.state.lineage import partition_ids
from greenocr_ray.vocab import (
    BLANK_INDEX,
    VOCAB,
    ctc_greedy_decode,
    encode_text,
    indices_to_text,
    normalize_whitespace,
)

_CHARS = [c for c in VOCAB if len(c) == 1]  # drop the '<blank>' token
vocab_text = st.text(alphabet=_CHARS, max_size=40)
any_text = st.text(max_size=60)


@given(vocab_text)
def test_decode_encode_roundtrip(s):
    """decode(encode(s)) == s for in-vocab text (M4/M7 invariant) —
    after whitespace normalization, since CTC collapse merges repeats
    only when a blank separates them and encode inserts no blanks
    between identical chars; the engine's encode interleaves blanks
    exactly for repeated chars, so compare on the collapse-stable
    form."""
    idx = encode_text(s)
    # insert blanks between equal neighbours (CTC-well-formed sequence)
    seq: list[int] = []
    for i, v in enumerate(idx):
        if i and idx[i - 1] == v:
            seq.append(BLANK_INDEX)
        seq.append(v)
    assert indices_to_text(ctc_greedy_decode(seq)) == s


@given(any_text)
def test_normalize_whitespace_idempotent(s):
    once = normalize_whitespace(s)
    assert normalize_whitespace(once) == once
    assert once == once.strip()
    assert "  " not in once


@given(
    st.integers(20, 60),
    st.integers(20, 120),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_binarize_is_binary(h, w, seed):
    img = np.random.default_rng(seed).random((h, w)).astype(np.float32)
    for method in ("otsu", "sauvola"):
        mask = kernels.binarize(img, method)
        assert set(np.unique(mask)).issubset({0, 1})


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=15, deadline=None)
def test_clahe_range_and_shape(seed):
    img = np.random.default_rng(seed).random((40, 80)).astype(np.float32)
    out = kernels.clahe(img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0 + 1e-6


@given(any_text)
def test_simhash_token_permutation_invariant(s):
    """SimHash is a bag-of-tokens signature: shuffling word order must
    not change it."""
    sh = SimHasher()
    toks = s.split()
    assert sh.simhash(" ".join(toks)) == sh.simhash(" ".join(reversed(toks)))


@given(any_text, any_text)
@settings(max_examples=40)
def test_jaccard_bounds_and_symmetry(a, b):
    ab = jaccard(a, b)
    assert 0.0 <= ab <= 1.0
    assert ab == jaccard(b, a)
    assert jaccard(a, a) == 1.0


@given(
    st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=30),
    st.integers(1, 64),
)
def test_partition_ids_in_range_and_stable(ids, n_parts):
    pids = partition_ids(ids, n_parts)
    assert ((pids >= 0) & (pids < n_parts)).all()
    np.testing.assert_array_equal(pids, partition_ids(ids, n_parts))


@given(st.floats(-1e6, 1e6, allow_nan=False), st.integers(0, 6))
def test_round_half_away_magnitude(x, d):
    """|round(x)| >= |numpy banker's round(x)| and the result differs
    from x by at most half an ulp of the decimal grid."""
    r = float(round_half_away(x, d))
    assert abs(r - x) <= 0.5 * 10.0 ** (-d) + 1e-9 * max(1.0, abs(x))


@given(st.integers(0, 2**32 - 1), st.floats(-3.5, 3.5))
@settings(max_examples=10, deadline=None)
def test_vshear_roundtrip_center_preserved(seed, angle):
    """vshear(vshear(img, a), -a) ≈ img away from the padded borders
    — on a band-limited image (raw noise is worst-case for any
    bilinear resampler and bounds nothing useful)."""
    img = np.random.default_rng(seed).random((40, 120)).astype(np.float32)
    img = kernels.gaussian_blur(img, 1.5)
    back = kernels.vshear(kernels.vshear(img, angle, fill=0.5), -angle, fill=0.5)
    h, w = img.shape
    m = 12  # border rows touched by fill
    err = np.abs(back[m : h - m, :] - img[m : h - m, :]).max()
    assert err < 0.12


def test_vectorized_md5_bit_exact_and_u60_rule():
    """The numpy single-block MD5 (RFC 1321) is bit-exact with hashlib
    across lengths incl. the 55/56-byte single/multi-block boundary
    and non-ASCII bytes; the u60 sampling rule and the int fast path
    match the reference per-row forms exactly (incl. negatives)."""
    import hashlib

    import numpy as np

    from greenocr_ray.rayutil import (
        md5_digests,
        md5_digests_of_ints,
        md5_u60_of_ints,
    )

    msgs = (
        [str(i).encode() for i in range(300)]
        + [b"", b"a" * 54, b"a" * 55, b"b" * 56, b"x" * 200]
        + ["üñïçødé".encode(), b"\x00\xff" * 10]
    )
    got = md5_digests(msgs)
    for i, m in enumerate(msgs):
        assert bytes(got[i]) == hashlib.md5(m).digest()

    ids = np.concatenate(
        [np.arange(2000), np.array([-1, -987654321, 2**62, 0])]
    )
    dig = md5_digests_of_ints(ids)
    for i, d in enumerate(ids):
        assert bytes(dig[i]) == hashlib.md5(str(int(d)).encode()).digest()
    u = md5_u60_of_ints(ids)
    want = np.array(
        [
            (int(hashlib.md5(str(int(d)).encode()).hexdigest()[:15], 16) + 0.5)
            / float(1 << 60)
            for d in ids
        ]
    )
    assert np.array_equal(u, want)
