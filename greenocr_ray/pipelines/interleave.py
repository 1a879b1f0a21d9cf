"""Derive an interleaved text+media corpus from the generic testdata
``documents`` table (doc_id:int64, text, ...) — deterministically.

Used by ``__ray_entry__.entry()`` and ``bench.py``: the flagship
extraction pipeline needs input in the BASELINE.json ``input_hint``
shape; this module builds it FROM the driver's testdata, so the whole
flow runs off ``/root/testdata`` with no external data.

Structure derivation is a pure function of (doc_id, text): both passes
(document-structure pass, media-render pass) derive the same spans, so
the expensive rendering parallelizes as its own map_batches over the
source table without a join back.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..fixtures.gen import degrade
from ..glyphs import render_line, renderable_text
from ..vocab import normalize_whitespace

_SEED = 20260817
_BOILER = "Home About Contact Login"


def derive_structure(doc_id: int, text: str) -> list[dict]:
    """(doc_id, text) -> span specs: [{kind, body, media_text}] —
    deterministic, cheap (no rendering)."""
    rng = np.random.Generator(np.random.PCG64([_SEED, doc_id]))
    words = text.split()
    if not words:
        words = ["empty"]
    spans: list[dict] = []
    i = 0
    while i < len(words):
        n = int(rng.integers(5, 12))
        chunk = words[i : i + n]
        i += n
        r = rng.random()
        body = " ".join(chunk)
        if r < 0.3:
            media_text = renderable_text(" ".join(chunk[:4]))
            spans.append({"kind": "media", "body": "", "media_text": media_text})
        elif r < 0.5:
            spans.append({"kind": "html", "body": body, "media_text": ""})
        elif r < 0.7:
            spans.append({"kind": "pdf", "body": body, "media_text": ""})
        else:
            spans.append({"kind": "text", "body": body, "media_text": ""})
    return spans


def _wrap_html(body: str) -> str:
    return (
        f"<html><body><nav>{_BOILER}</nav><p>{body}</p>"
        f"<script>var x=1;</script></body></html>"
    )


def _wrap_pdf(body: str) -> str:
    ws = body.split()
    half = max(1, len(ws) // 2)
    return " ".join(ws[:half]) + "\n\x0cPage 1\n" + " ".join(ws[half:])


def build_documents(batch: pa.Table) -> pa.Table:
    """Structure pass: testdata docs -> interleaved documents rows."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids, span_lists, exp_lists = [], [], []
    for did, text in zip(ids, texts):
        specs = derive_structure(int(did), text)
        spans, exps = [], []
        for off, sp in enumerate(specs):
            if sp["kind"] == "media":
                ref = f"img-{did:08d}-{off:02d}"
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "offset": off}
                )
                exps.append(
                    {"kind": "ocr", "text": sp["media_text"], "media_ref": ref,
                     "offset": off}
                )
            else:
                raw = (
                    _wrap_html(sp["body"])
                    if sp["kind"] == "html"
                    else _wrap_pdf(sp["body"])
                    if sp["kind"] == "pdf"
                    else sp["body"]
                )
                spans.append(
                    {"kind": sp["kind"], "text": raw, "media_ref": "", "offset": off}
                )
                exps.append(
                    {"kind": "text", "text": normalize_whitespace(sp["body"]),
                     "media_ref": "", "offset": off}
                )
        doc_ids.append(f"doc-{did:08d}")
        span_lists.append(spans)
        exp_lists.append(exps)
    return pa.table(
        {"doc_id": doc_ids, "spans": span_lists, "expected_spans": exp_lists}
    )


def render_media_rows(batch: pa.Table) -> pa.Table:
    """Render pass: testdata docs -> media payload rows (parallel,
    CPU-heavy; same structure derivation, renders only media spans)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    refs, ws, hs, px, tt = [], [], [], [], []
    for did, text in zip(ids, texts):
        for off, sp in enumerate(derive_structure(int(did), text)):
            if sp["kind"] != "media":
                continue
            mrng = np.random.Generator(np.random.PCG64([_SEED, int(did), off, 7]))
            img = degrade(render_line(sp["media_text"]), mrng)
            u8 = np.round(img * 255.0).astype(np.uint8)
            refs.append(f"img-{did:08d}-{off:02d}")
            hs.append(u8.shape[0])
            ws.append(u8.shape[1])
            px.append(u8.tobytes())
            tt.append(sp["media_text"])
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "pixels": pa.array(px, type=pa.binary()),
            "true_text": pa.array(tt, type=pa.string()),
        }
    )


def write_expected_flat(doc_path: str, out_file: str) -> None:
    """Unnest documents.expected_spans into a flat
    (doc_id, offset, kind, text, media_ref) parquet file — the ground
    truth the DuckDB oracle reads to hash-compare the flagship
    extraction queries (the expected spans come from the corpus
    derivation, independent of the extraction pipeline)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    t = pads.dataset(doc_path, format="parquet").to_table(
        columns=["doc_id", "expected_spans"]
    )
    exps = t.column("expected_spans")
    if isinstance(exps, pa.ChunkedArray):
        exps = exps.combine_chunks()
    import pyarrow.compute as pc_

    parent = pc_.list_parent_indices(exps)
    flat = pc_.list_flatten(exps)
    out = pa.table(
        {
            "doc_id": pc_.take(t.column("doc_id"), parent),
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
    tmp = out_file + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_file)


_REPEAT_STRIDE = 10_000_000  # doc_id offset between repeated copies


def build_interleaved(
    sf_dir: str,
    out_dir: str,
    max_docs: int | None = None,
    repeat: int = 1,
    row_group_size: int = 24,
) -> dict[str, str]:
    """Build (documents, media) parquet under out_dir from
    ``{sf_dir}/documents.parquet``. Cached: skips if already built.
    Returns {'documents': path, 'media': path}.

    ``repeat`` unions shifted copies of the source (doc_ids offset by
    a fixed stride) — a deterministic corpus-size knob for scaling
    runs. ``row_group_size`` keeps documents row groups small so the
    co-partitioned shard planner (pipelines/sharded.py) gets
    fine-grained shards straight from parquet metadata."""
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(out_dir, "documents")
    media_path = os.path.join(out_dir, "media")
    marker = os.path.join(out_dir, "_SUCCESS")
    expected_flat = os.path.join(out_dir, "expected_flat.parquet")
    paths = {
        "documents": doc_path,
        "media": media_path,
        "expected_flat": expected_flat,
    }
    if os.path.exists(marker):
        if not os.path.exists(expected_flat):  # corpus cached by old code
            write_expected_flat(doc_path, expected_flat)
        return paths
    # no marker: any files present are leftovers of a crashed build —
    # Ray's write would APPEND fresh-uuid files next to them and
    # silently double the corpus, so clear first
    import shutil

    shutil.rmtree(doc_path, ignore_errors=True)
    shutil.rmtree(media_path, ignore_errors=True)
    src = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if max_docs is not None:
        src = src.limit(max_docs)
    if repeat > 1:
        import pyarrow.compute as pc_

        def shift(k: int):
            def fn(t: pa.Table) -> pa.Table:
                return t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc_.add(t.column("doc_id"), k * _REPEAT_STRIDE),
                )

            return fn

        base = src
        for k in range(1, repeat):
            src = src.union(base.map_batches(shift(k), batch_format="pyarrow"))
    src.map_batches(build_documents, batch_format="pyarrow").write_parquet(
        doc_path, row_group_size=row_group_size
    )
    src.map_batches(
        render_media_rows, batch_format="pyarrow", batch_size=64
    ).write_parquet(media_path)
    write_expected_flat(doc_path, expected_flat)
    with open(marker, "w") as fh:
        fh.write("ok")
    return paths
