"""Span explode / assemble stages — vectorized Arrow list ops.

``explode_spans`` unnests documents(doc_id, spans:list<struct>) into
flat span rows with ``pyarrow.compute`` (no Python row loop);
``assemble_spans`` is the inverse, used by the per-doc reassembly
groupby (SURVEY.md §2.6 ordering contract: spans sort by offset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents rows -> flat (doc_id, offset, kind, text, media_ref)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    flat = pc.list_flatten(spans)
    return pa.table(
        {
            "doc_id": doc_ids,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


def assemble_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn: one doc's flat spans -> one (doc_id, spans) row.

    Sorts by offset — the single ordering contract of the output
    (span-sequence equality on (kind, text, media_ref, order)).
    """
    g = g.sort_values("offset")
    spans = [
        {
            "kind": k,
            "text": t,
            "media_ref": m,
            "offset": int(o),
        }
        for k, t, m, o in zip(g["kind"], g["text"], g["media_ref"], g["offset"])
    ]
    return pd.DataFrame(
        {
            "doc_id": [g["doc_id"].iloc[0]],
            "spans": [spans],
            "mean_confidence": [float(np.mean(g["confidence"]))],
        }
    )
