"""Stateless text-span cleanup stages (map_batches UDFs).

The reference's only text handling is whitespace normalization of the
OCR output (exe_t.py:531-533); the north star extends it to
main-content extraction for html/pdf spans (boilerplate strip, DOM
heuristics, layout cleanup). These are plain functions — stateless
tasks, not actors; regexes are compiled at module import (once per
worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..vocab import normalize_whitespace

# --- HTML main-content extraction -------------------------------------
# DOM heuristics: drop whole subtrees that are never main content
# (script/style and the nav/header/footer/aside boilerplate containers),
# then strip remaining tags and unescape the common entities.
# innermost-first: a block whose body contains no other drop-tag open;
# applied to a fixpoint so nested blocks peel from the inside out
_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>"
    r"(?:(?!<(?:script|style|nav|header|footer|aside)\b).)*?"
    r"</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_TAGS = re.compile(r"<[^>]+>")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so '&amp;lt;' decodes to '&lt;' not '<'
]


def clean_html(raw: str) -> str:
    """Boilerplate-strip + tag-strip + entity decode + ws-normalize."""
    s = _COMMENTS.sub(" ", raw)
    prev = None
    while prev != s:  # nested drop-blocks
        prev = s
        s = _DROP_BLOCKS.sub(" ", s)
    s = _TAGS.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return normalize_whitespace(s)


# --- PDF layout-text cleanup ------------------------------------------
_PAGE_FURNITURE = re.compile(r"^\x0c?\s*Page\s+\d+\s*$", re.MULTILINE)
_FORM_FEED = re.compile(r"\x0c")
_EOL_HYPHEN = re.compile(r"-\s*\n\s*")


def clean_pdf(raw: str) -> str:
    """De-hyphenate line wraps, drop page furniture, ws-normalize."""
    s = _PAGE_FURNITURE.sub(" ", raw)
    s = _FORM_FEED.sub(" ", s)
    s = _EOL_HYPHEN.sub("", s)
    return normalize_whitespace(s)


_CLEANERS = {
    "text": normalize_whitespace,
    "html": clean_html,
    "pdf": clean_pdf,
}


def clean_text_spans(batch: pa.Table) -> pa.Table:
    """map_batches UDF over flat span rows (doc_id, offset, kind, text,
    media_ref): clean each non-media span's text by kind; output kind is
    'text' for all cleaned spans (FIXTURES.md §3 output contract)."""
    kinds = batch.column("kind").to_pylist()
    texts = batch.column("text").to_pylist()
    cleaned = [
        _CLEANERS.get(k, normalize_whitespace)(t if t is not None else "")
        for k, t in zip(kinds, texts)
    ]
    n = batch.num_rows
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "offset": batch.column("offset"),
            "kind": pa.array(np.full(n, "text"), type=pa.string()),
            "text": pa.array(cleaned, type=pa.string()),
            "media_ref": pa.array(np.full(n, ""), type=pa.string()),
            "confidence": pa.array(np.ones(n, dtype=np.float64)),
        }
    )


def normalize_unicode(batch: pa.Table) -> pa.Table:
    """Unicode canonicalization over the documents table, matching
    trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g')):
    lower, NFC-compose, collapse whitespace runs, trim. Lower /
    collapse / trim are pyarrow.compute kernels; NFC goes through
    Python unicodedata ONLY for rows the vectorized [^ -~] probe flags
    as non-ASCII (pyarrow 16's utf8_normalize(form='NFC') does NOT
    compose e+U+0301 into é — verified empirically — so it cannot
    match DuckDB's nfc_normalize). ASCII rows, the bulk of a crawl,
    never leave Arrow. Emits a `changed` flag so downstream can count
    normalization work.
    """
    import unicodedata

    import pyarrow.compute as pc

    t = batch.column("text")
    n = pc.utf8_lower(t)
    mask = pc.match_substring_regex(n, r"[^\x00-\x7F]")
    if pc.any(mask).as_py():
        vals = n.to_pylist()
        flags = mask.to_pylist()
        vals = [
            unicodedata.normalize("NFC", v) if (f and v is not None) else v
            for v, f in zip(vals, flags)
        ]
        n = pa.array(vals, type=pa.string())
    n = pc.utf8_trim_whitespace(pc.replace_substring_regex(n, r"\s+", " "))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_norm": n,
            "changed": pc.not_equal(n, t),
        }
    )
