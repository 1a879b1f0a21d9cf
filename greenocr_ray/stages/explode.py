"""Span explode / assemble stages — vectorized Arrow list ops.

``explode_spans`` unnests documents(doc_id, spans:list<struct>) into
flat span rows with ``pyarrow.compute`` (no Python row loop);
``assemble_docs`` is the inverse, the SINGLE implementation of the
§2.6 ordering contract (spans sort by offset) shared by the streaming
reassembly, the checkpointed partition writer, and the sharded path.

Documents whose spans list is empty (or null) would emit no flat rows
and silently vanish from the output; ``explode_spans`` therefore emits
one PLACEHOLDER row per such doc (offset = -1), which flows through
the text branch untouched and is dropped again at assembly — the doc
reappears in the output with spans == [].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

EMPTY_DOC_OFFSET = -1  # placeholder spans; dropped at assembly


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents rows -> flat (doc_id, offset, kind, text, media_ref)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    flat = pc.list_flatten(spans)
    out = pa.table(
        {
            "doc_id": doc_ids,
            # one canonical width engine-wide (inputs may carry int32
            # per the Lance schema): downstream unions/joins build
            # sentinel rows as int64 and must match exactly
            "offset": flat.field("offset").cast(pa.int64()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
    # placeholder rows for span-less docs so they survive reassembly
    lengths = pc.fill_null(pc.list_value_length(spans), 0).to_numpy()
    if (lengths == 0).any():
        empty_ids = batch.column("doc_id").filter(pa.array(lengths == 0))
        n = len(empty_ids)
        offset_type = out.schema.field("offset").type  # match input's width
        placeholder = pa.table(
            {
                "doc_id": empty_ids,
                "offset": pa.array(
                    np.full(n, EMPTY_DOC_OFFSET, dtype=np.int64)
                ).cast(offset_type),
                "kind": pa.array(["text"] * n, type=pa.string()),
                "text": pa.array([""] * n, type=pa.string()),
                "media_ref": pa.array([""] * n, type=pa.string()),
            }
        )
        out = pa.concat_tables([out, placeholder])
    return out


def assemble_docs(
    df: pd.DataFrame,
) -> tuple[list[str], list[list[dict]], list[float]]:
    """Flat span rows -> per-doc (doc_ids, span_lists, mean_confidences),
    docs sorted by doc_id, spans sorted by offset — THE ordering
    contract (span-sequence equality on (kind, text, media_ref,
    order)). Placeholder rows keep their doc present with spans == []
    and confidence 0.0."""
    df = df.sort_values(["doc_id", "offset"])
    doc_ids: list[str] = []
    span_lists: list[list[dict]] = []
    confs: list[float] = []
    for doc_id, dg in df.groupby("doc_id", sort=True):
        real = dg[dg["offset"] >= 0]
        doc_ids.append(doc_id)
        span_lists.append(
            [
                {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
                for k, t, m, o in zip(
                    real["kind"], real["text"], real["media_ref"], real["offset"]
                )
            ]
        )
        confs.append(float(real["confidence"].mean()) if len(real) else 0.0)
    return doc_ids, span_lists, confs


def assemble_docs_table(t: pa.Table) -> pa.Table:
    """Vectorized Arrow assembly — same §2.6 contract as
    :func:`assemble_docs` (property-tested equal), with NO per-row
    Python: one sort_indices/take, numpy reduceat for per-doc counts
    and confidence sums over run-length doc boundaries, and the spans
    ``list<struct>`` built directly from ListArray offsets. This is
    the hot reassembly kernel: every span row of the corpus passes
    through it, so the pandas conversion + per-doc dict loop of the
    frame version is the difference between a copy-per-row and a
    handful of O(n) kernels. -> (doc_id, spans, mean_confidence)."""
    from ..schema import SPAN_STRUCT

    spans_type = pa.list_(SPAN_STRUCT)
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "spans": pa.array([], type=spans_type),
                "mean_confidence": pa.array([], type=pa.float64()),
            }
        )
    idx = pc.sort_indices(
        t, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")]
    )
    t = t.take(idx).combine_chunks()
    n = t.num_rows
    dids = t.column("doc_id")
    if isinstance(dids, pa.ChunkedArray):
        dids = dids.combine_chunks()
    neq = pc.not_equal(dids.slice(1), dids.slice(0, n - 1))
    bmask = np.empty(n, dtype=bool)
    bmask[0] = True
    bmask[1:] = neq.to_numpy(zero_copy_only=False)
    starts = np.nonzero(bmask)[0]
    offs = t.column("offset").to_numpy(zero_copy_only=False)
    real = offs >= 0  # placeholders (empty docs) drop from span lists
    conf = t.column("confidence").to_numpy(zero_copy_only=False)
    cnt = np.add.reduceat(real.astype(np.int64), starts)
    csum = np.add.reduceat(np.where(real, conf, 0.0), starts)
    mean_conf = np.where(cnt > 0, csum / np.maximum(cnt, 1), 0.0)
    rt = t.filter(pa.array(real))

    def col(name: str, typ) -> pa.Array:
        c = pc.cast(rt.column(name), typ)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    struct = pa.StructArray.from_arrays(
        [
            col("kind", pa.string()),
            col("text", pa.string()),
            col("media_ref", pa.string()),
            col("offset", pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    loff = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum(cnt, out=loff[1:])
    spans = pa.ListArray.from_arrays(pa.array(loff, type=pa.int32()), struct)
    return pa.table(
        {
            "doc_id": dids.take(pa.array(starts)),
            "spans": spans,
            "mean_confidence": pa.array(mean_conf, type=pa.float64()),
        }
    )


def assemble_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn: one doc's flat spans -> one (doc_id, spans) row."""
    doc_ids, span_lists, confs = assemble_docs(g)
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "spans": span_lists,
            "mean_confidence": confs,
        }
    )
