"""Byte-pair-encoding tokenizer training + corpus encoding.

The tokenizer-fitting step of a training-data pipeline (Sennrich et
al. 2016): learn merge rules from corpus word frequencies, then encode
the corpus with them. Distributed split mirrors how production BPE is
actually fit at scale: the corpus-wide statistics pass (exact top-V
word frequencies) is distributed; the merge-learning loop runs on the
driver over the BOUNDED top-V frequency table (vocabulary sketch, not
the corpus); the encode pass streams with the merge ranks broadcast
once via ``ray.put``.

No reference-parity slot — this extends SURVEY.md §2's
training-data-pipeline additions (tokenization / packing family).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_TOKEN_RE = re.compile(r"\w+", re.ASCII)

_EOW = "</w>"  # end-of-word marker, standard BPE


def top_word_counts(
    docs: rd.Dataset, top_v: int = 10_000, nbuckets: int = 32
) -> pd.DataFrame:
    """EXACT global top-``top_v`` words by count.

    Per-batch Counter partials -> crc32-bucketed shuffle (a word's
    partials co-locate, so in-bucket sums are exact) -> per-bucket
    partial top-``top_v`` (exact under monotone merge: the global
    top-V is a subset of the union of per-bucket top-Vs) -> driver
    merges ≤ top_v·nbuckets rows. Nothing vocabulary-scale on the
    driver.
    """
    from collections import Counter

    from ..rayutil import covering_bucket_values, crc32_of_strings

    num_partitions = min(nbuckets, 8)

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in pc.utf8_lower(t.column("text")).to_pylist():
            c.update(_TOKEN_RE.findall(s))
        words = pa.array(list(c.keys()), type=pa.string())
        return pa.table(
            {
                "bucket": pa.array(
                    (
                        crc32_of_strings(words) % np.uint32(nbuckets)
                    ).astype(np.int32),
                    type=pa.int32(),
                ),
                "word": words,
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    svals = covering_bucket_values(nbuckets, num_partitions)
    sentinels = pa.table(
        {
            "bucket": pa.array(svals, type=pa.int32()),
            "word": pa.array(
                ["\x00sentinel"] * len(svals), type=pa.string()
            ),
            "c": pa.array([0] * len(svals), type=pa.int64()),
        }
    )

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["c"] > 0]
        agg = g.groupby("word", sort=False)["c"].sum().reset_index()
        agg = agg.sort_values(
            ["c", "word"], ascending=[False, True]
        ).head(top_v)
        if not len(agg):  # sentinel-only group: typed carrier row
            return pd.DataFrame({"word": ["\x00sentinel"], "c": [0]})
        return agg[["word", "c"]]

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .union(rd.from_arrow(sentinels))
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()
    )
    merged = merged[merged["c"] > 0]
    return (
        merged.sort_values(["c", "word"], ascending=[False, True])
        .head(top_v)
        .reset_index(drop=True)
    )


def bpe_train(
    word_counts: pd.DataFrame, num_merges: int = 100
) -> list[tuple[str, str]]:
    """Classic frequency-table BPE (driver-side; the input is the
    BOUNDED top-V table, not the corpus). Deterministic: the best pair
    each round is (count desc, pair asc). Returns the ordered merge
    list."""
    from collections import Counter

    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): int(c)
        for w, c in zip(word_counts["word"], word_counts["c"])
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic: count desc, lexicographically smallest pair
        top_c = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top_c)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_stats(
    docs: rd.Dataset, merges: list[tuple[str, str]]
) -> pd.DataFrame:
    """Streaming corpus encode with the merge ranks broadcast once:
    per-doc (n_words, n_tokens, roundtrip_ok) where roundtrip_ok
    verifies that re-joining each word's BPE pieces reproduces the
    word — the lossless-ness invariant of BPE. A per-actor-process
    word->pieces cache makes the cost vocabulary-bounded per batch.
    """
    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})

    def encode(t: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        cache: dict[str, list[str]] = {}
        ids, nw, ntok, ok = [], [], [], []
        for did, s in zip(
            t.column("doc_id").to_pylist(),
            pc.utf8_lower(t.column("text")).to_pylist(),
        ):
            words = _TOKEN_RE.findall(s)
            total = 0
            good = True
            for w in words:
                pieces = cache.get(w)
                if pieces is None:
                    pieces = _encode_word(w, ranks)
                    cache[w] = pieces
                total += len(pieces)
                if "".join(pieces) != w + _EOW:
                    good = False
            ids.append(did)
            nw.append(len(words))
            ntok.append(total)
            ok.append(good)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_tokens": pa.array(ntok, type=pa.int64()),
                "roundtrip_ok": pa.array(ok, type=pa.bool_()),
            }
        )

    return (
        docs.map_batches(encode, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
