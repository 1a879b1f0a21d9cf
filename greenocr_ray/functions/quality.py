"""Training-data quality / safety operators over the ``documents``
table: repetition filters (Gopher-style), PII scrubbing, and benchmark
contamination checks (decontamination).

All three are stateless vectorized ``map_batches`` transforms; the
contamination check broadcasts the benchmark shingle set once via
``ray.put`` (a benchmark/test set is small by construction — that is
the decontamination use case), so the corpus-side pass is a pure
streaming scan with no shuffle.

Reference parity note: these extend the engine beyond the reference
repo (which has no corpus-quality tooling); semantics follow the
published Gopher repetition filters (Rae et al. 2021) and standard
n-gram decontamination practice.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from greenocr_ray.functions.relational import round_half_away

# ------------------------------------------------- repetition filters


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Per-doc duplicate-word fraction and top-bigram fraction.

    Matches the DuckDB oracle exactly: words = ``split(text, ' ')``
    (an empty text yields ONE empty-string word, as in SQL
    ``string_split``); a single-word doc has zero bigrams and reports
    ``top_bigram_frac = 0``.
    """
    doc_ids = batch.column("doc_id")
    texts = [t or "" for t in batch.column("text").to_pylist()]
    n_words, n_distinct, dup_frac = [], [], []
    top_bg_count, top_bg_frac = [], []
    for t in texts:
        words = t.split(" ")
        n = len(words)
        d = len(set(words))
        n_words.append(n)
        n_distinct.append(d)
        # DuckDB ROUND semantics (half away from zero), not Python's
        # banker's rounding — 1/128-style ratios land exactly on a half
        dup_frac.append(float(round_half_away(1.0 - d / n, 6)))
        if n < 2:
            top_bg_count.append(0)
            top_bg_frac.append(0.0)
            continue
        bg = Counter(zip(words, words[1:]))
        top = max(bg.values())
        top_bg_count.append(top)
        top_bg_frac.append(float(round_half_away(top / (n - 1), 6)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_distinct_words": pa.array(n_distinct, type=pa.int64()),
            "dup_word_frac": pa.array(dup_frac, type=pa.float64()),
            "top_bigram_count": pa.array(top_bg_count, type=pa.int64()),
            "top_bigram_frac": pa.array(top_bg_frac, type=pa.float64()),
        }
    )


# ------------------------------------------------------- PII scrubbing

# Patterns chosen to mean the same thing under Python re and DuckDB's
# RE2 (oracle uses regexp_replace(..., 'g')): no backrefs, no
# lookaround. Replacement tokens contain no digits/@/dots, so one
# pattern's replacement can never create a match for a later pattern,
# making the sequential scrub order-stable.
PII_PATTERNS: list[tuple[re.Pattern, str, str]] = [
    (
        re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        re.compile(r"\b\d{3}-\d{3}-\d{4}\b"),
        r"\b\d{3}-\d{3}-\d{4}\b",
        "[PHONE]",
    ),
    (
        re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
]


def pii_scrub(batch: pa.Table) -> pa.Table:
    """Redact emails/phones/IPv4s; emit scrubbed text + match count.

    ``n_redactions`` counts matches on the ORIGINAL text (patterns are
    mutually non-overlapping by construction, see PII_PATTERNS note),
    mirroring the oracle's ``len(regexp_extract_all(...))`` sums.
    """
    doc_ids = batch.column("doc_id")
    texts = [t or "" for t in batch.column("text").to_pylist()]
    out_text, n_red = [], []
    for t in texts:
        n = 0
        s = t
        for pat, _, repl in PII_PATTERNS:
            n += len(pat.findall(t))
            s = pat.sub(repl, s)
        out_text.append(s)
        n_red.append(n)
    return pa.table(
        {
            "doc_id": doc_ids,
            "text": pa.array(out_text, type=pa.string()),
            "n_redactions": pa.array(n_red, type=pa.int64()),
        }
    )


# ------------------------------------------- contamination / decontam


def _doc_shingles(text: str, k: int) -> set:
    if len(text) < k:
        return set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def benchmark_shingles(
    docs: rd.Dataset, bench_mod: int = 97, k: int = 20
) -> set:
    """Collect the distinct char-k-gram set of the benchmark subset
    (``doc_id % bench_mod == 0``). The benchmark is a test set — small
    by construction — so a driver set + ``ray.put`` broadcast is the
    scale-correct layout (same shape as the small-dim join maps)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        sh: set = set()
        for i, txt in zip(ids, texts):
            if i % bench_mod == 0:
                sh |= _doc_shingles(txt or "", k)
        return pa.table({"sh": pa.array(sorted(sh), type=pa.string())})

    shingles: set = set()
    parts = docs.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        shingles.update(b.column("sh").to_pylist())
    return shingles


def contamination_check(
    docs: rd.Dataset,
    bench_mod: int = 97,
    k: int = 20,
    threshold: int = 5,
) -> rd.Dataset:
    """Per-corpus-doc count of distinct char-k-grams shared with ANY
    benchmark doc, plus a contaminated flag at ``threshold``.

    One driver pass builds the benchmark shingle set (broadcast once);
    the corpus pass is a streaming ``map_batches`` — no shuffle, no
    corpus materialization.
    """
    bench_ref = ray.put(benchmark_shingles(docs, bench_mod, k))

    def scan(t: pa.Table) -> pa.Table:
        bench: set = ray.get(bench_ref)
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id, out_n, out_flag = [], [], []
        for i, txt in zip(ids, texts):
            if i % bench_mod == 0:  # benchmark rows are not scored
                continue
            n = len(_doc_shingles(txt or "", k) & bench)
            out_id.append(i)
            out_n.append(n)
            out_flag.append(n >= threshold)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_shared": pa.array(out_n, type=pa.int64()),
                "contaminated": pa.array(out_flag, type=pa.bool_()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


# ----------------------------------------- deterministic PII derivation


def inject_pii(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministically append synthetic PII tokens to a slice of
    docs (keyed on doc_id), used to derive the pii corpus that both
    the Ray query and the DuckDB oracle read. No randomness — the
    derived table is bit-identical across runs."""
    out = batch.copy()
    texts = []
    for i, t in zip(out["doc_id"], out["text"].fillna("")):
        i = int(i)
        parts = [t]
        if i % 7 == 0:
            parts.append(f"contact user{i}@example.com")
        if i % 5 == 0:
            parts.append(f"call 555-{i % 1000:03d}-{i % 10000:04d}")
        if i % 11 == 0:
            parts.append(f"from 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}")
        texts.append(" ".join(parts))
    out["text"] = texts
    return out[["doc_id", "text"]]


# --------------------------------------------------- entity extraction

# same RE2/Python-compatible discipline as PII_PATTERNS; url pattern
# avoids trailing-punctuation ambiguity by stopping at whitespace/quote
ENTITY_PATTERNS: list[tuple[str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("urls", r"https?://[^\s\"'<>]+"),
    ("numbers", r"\b\d+(?:\.\d+)?\b"),
]


def extract_entities(batch: pa.Table) -> pa.Table:
    """Per-doc entity counts (emails, urls, numbers) — the
    information-extraction scan shape. Fully Arrow-vectorized:
    ``pc.count_substring_regex`` runs the same RE2 engine DuckDB's
    ``regexp_extract_all`` uses, so counts agree by construction.
    """
    import pyarrow.compute as pc

    cols = {"doc_id": batch.column("doc_id")}
    for name, pat in ENTITY_PATTERNS:
        cols[name] = pc.cast(
            pc.count_substring_regex(batch.column("text"), pat), pa.int64()
        )
    return pa.table(cols)
