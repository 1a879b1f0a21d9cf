"""Text-analysis operators over the generic ``documents`` table
(doc_id:int64, text, lang, source, n_chars) — the large-scale
training-data-pipeline toolbox: token counting, quality scoring,
language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` transforms except
language-ID, which holds compiled profiles (actor-pool class).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .relational import round_half_away

_WS_RE = re.compile(r" +")
_WORD_RE = re.compile(r"\w+", re.ASCII)
# BPE-ish tokenizer: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
# ASCII-only \w to match the DuckDB/RE2 oracle (Python's default \w is
# unicode-aware and would not count non-ASCII letters as punctuation)
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be for on with as at by it".split()
)


def token_stats(batch: pa.Table) -> pa.Table:
    """Whitespace tokens + BPE-ish tokens per doc (vectorized-ish: two
    compiled-regex passes per doc, no model)."""
    # null text -> "" (skip-and-continue); empty string counts ONE
    # whitespace token, matching DuckDB's string_split_regex('', ' +')
    texts = [t or "" for t in batch.column("text").to_pylist()]
    n_ws = [len(_WS_RE.split(t)) for t in texts]
    n_bpe = [len(_BPE_RE.findall(t)) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_ws, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        }
    )


def quality_scores(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword quality heuristics per doc."""
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    words = text.str.split(" ")
    n_words = words.str.len().fillna(0).astype("int64")
    # flags must ride along explicitly: str.count re-compiles the
    # pattern string and would drop re.ASCII
    n_punct = text.str.count(_PUNCT_RE.pattern, flags=re.ASCII).astype("int64")
    stop = words.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_words": n_words,
            "punct_ratio": (n_punct / n_chars.clip(lower=1)).round(6),
            "stopword_ratio": (stop / n_words.clip(lower=1)).round(6),
            "mean_word_len": (
                (n_chars - (n_words - 1).clip(lower=0)) / n_words.clip(lower=1)
            ).round(6),
        }
    )
    return out


class LangId:
    """Character-n-gram language identifier (actor-pool stage).

    Profiles are built ONCE per actor in ``__init__`` from small
    hand-rolled trigram seed sets — the stateful-stage pattern
    (model-in-actor, SURVEY.md §2.3 M1).
    """

    PROFILES = {
        "en": ["the", "and", "ing", " th", "he ", "ion", " of"],
        "de": ["der", "ein", "sch", "ich", "und", " de", "en "],
        "fr": ["les", "ent", " de", "ion", "que", " le", "des"],
        "es": [" de", "los", "ent", "cio", " la", "que", "ado"],
        "zh": [],  # CJK detected by codepoint range
    }

    def __init__(self):
        self.trigrams = {
            lang: frozenset(t) for lang, t in self.PROFILES.items() if t
        }
        self.cjk = re.compile(r"[一-鿿]")

    def classify(self, text: str) -> str:
        text = text or ""
        if self.cjk.search(text):
            return "zh"
        t = text.lower()
        grams = {t[i : i + 3] for i in range(max(len(t) - 2, 0))}
        best, best_n = "en", -1
        for lang, prof in self.trigrams.items():
            n = len(grams & prof)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pred_lang"] = [self.classify(t) for t in batch["text"]]
        return batch


def fingerprint(batch: pa.Table, k: int = 8, window: int = 4) -> pa.Table:
    """Winnowing document fingerprint: rolling hash over k-grams, keep
    the min hash per sliding window (standard winnowing scheme);
    returns per-doc fingerprint count + a 64-bit digest."""
    texts = batch.column("text").to_pylist()
    counts = np.zeros(len(texts), dtype=np.int64)
    digests = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        t = t or ""  # null text -> no fingerprints
        if len(t) < k:
            continue
        data = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        n = len(data) - k + 1
        if n <= 0:
            continue
        # vectorized polynomial rolling hash over all k-grams
        h = np.zeros(n, dtype=np.uint64)
        B = np.uint64(1000003)
        for j in range(k):
            h = h * B + data[j : j + n].astype(np.uint64)
        if len(h) >= window:
            m = len(h) - window + 1
            idx = np.arange(window)[None, :] + np.arange(m)[:, None]
            mins = h[idx].min(axis=1)
            fps = np.unique(mins)
        else:
            fps = np.unique(h)
        counts[i] = len(fps)
        digests[i] = np.bitwise_xor.reduce(fps) if len(fps) else np.uint64(0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_fingerprints": pa.array(counts),
            "digest": pa.array(digests),
        }
    )


_LANGID_CACHE: dict = {}


def _cached_langid_call(df: pd.DataFrame) -> pd.DataFrame:
    clf = _LANGID_CACHE.get("langid")
    if clf is None:
        clf = LangId()
        _LANGID_CACHE["langid"] = clf
    return clf(df)


def langid_accuracy(docs: rd.Dataset) -> pd.DataFrame:
    """Accuracy of the n-gram langid vs the table's lang labels —
    per-lang partial counts in map_batches, driver fold (languages are
    a bounded-cardinality key)."""
    from .relational import combine_small_agg

    # task-based with a worker-process-cached classifier: LangId's
    # construct state is a handful of trigram frozensets, so an actor
    # pool paid ~2 s of spin-up per query for nothing
    scored = docs.map_batches(_cached_langid_call, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(correct=(df["pred_lang"] == df["lang"]).astype("int64"))
        g = df.groupby("lang", sort=True).agg(
            n_docs=("doc_id", "size"), n_correct=("correct", "sum")
        )
        return g.reset_index()

    parts = scored.map_batches(partial, batch_format="pandas")
    return combine_small_agg(parts, ["lang"], {"n_docs": "sum", "n_correct": "sum"})


def lexical_diversity(batch: pa.Table) -> pa.Table:
    """Per-doc type-token ratio and hapax fraction — the lexical-
    diversity quality signals (low TTR flags boilerplate/spam, high
    hapax flags OCR noise). Tokens are lowercase \\w+ (ASCII, matching
    the RE2 oracle); ratios round half-away at 6 dp. Empty docs emit
    0.0 for both (not null) so the filter contract stays total.
    """
    ids = batch.column("doc_id")
    ttrs, hapax = [], []
    for s in batch.column("text").to_pylist():
        toks = _WORD_RE.findall(s.lower())
        if not toks:
            ttrs.append(0.0)
            hapax.append(0.0)
            continue
        from collections import Counter

        c = Counter(toks)
        n = len(toks)
        ttrs.append(float(round_half_away(len(c) / n, 6)))
        ones = sum(1 for v in c.values() if v == 1)
        hapax.append(float(round_half_away(ones / n, 6)))
    return pa.table(
        {
            "doc_id": ids,
            "ttr": pa.array(ttrs, type=pa.float64()),
            "hapax_frac": pa.array(hapax, type=pa.float64()),
        }
    )


def hash_embed(batch: pa.Table, dim: int = 16) -> pa.Table:
    """Feature-hashing document embeddings (the hashing trick,
    Weinberger et al. 2009): each token t contributes
    sign(t)·count(t) to dimension md5(t) % dim — a deterministic,
    vocabulary-free doc representation computable in one stateless
    streaming pass (no model, no shuffle, nothing broadcast; the
    per-batch token->(dim, sign) cache is vocabulary-bounded).

    Emits sparse (doc_id, dim, value) rows — one row per dimension
    that received at least one token (a signed sum can legitimately
    be 0), values exact int64. dim index = first-8-hex-chars of
    md5(token) mod dim; sign = parity of the 9th hex char — both
    restated verbatim in the SQL oracle.
    """
    import hashlib

    from collections import Counter

    cache: dict[str, tuple[int, int]] = {}
    ids, dims, vals = [], [], []
    for did, s in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("text").to_pylist(),
    ):
        acc: dict[int, int] = {}
        for tok, c in Counter(_WORD_RE.findall(s.lower())).items():
            v = cache.get(tok)
            if v is None:
                hx = hashlib.md5(tok.encode("utf-8")).hexdigest()
                v = (int(hx[:8], 16) % dim, 1 if int(hx[8], 16) % 2 == 0 else -1)
                cache[tok] = v
            j, sign = v
            acc[j] = acc.get(j, 0) + sign * c
        for j in sorted(acc):
            ids.append(did)
            dims.append(j)
            vals.append(acc[j])
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "dim": pa.array(dims, type=pa.int64()),
            "value": pa.array(vals, type=pa.int64()),
        }
    )
