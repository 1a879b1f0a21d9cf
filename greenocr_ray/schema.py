"""Arrow schemas for the engine's logical tables (SURVEY.md §1.2, FIXTURES.md).

The primary input shape is the authoritative ``input_hint`` from
BASELINE.json: interleaved text+media documents.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),  # 'text' | 'html' | 'pdf' | 'media'
        ("text", pa.string()),  # inline content; '' for media spans
        ("media_ref", pa.string()),  # payload key; '' for non-media spans
        ("offset", pa.int32()),  # 0-based document-order position
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# media payload side table (the reference reads PNG files from disk,
# exe_t.py:475,482; here payloads stream through Ray Data as binary cells)
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("pixels", pa.binary()),  # raw row-major uint8 grayscale, len == w*h
        ("true_text", pa.string()),  # generator ground truth (fixtures only)
    ]
)

# output span kinds: 'text' (incl. cleaned html/pdf) | 'ocr'
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_media", pa.int64()),
        ("wall_ms", pa.float64()),
        ("spans_per_sec", pa.float64()),
        ("mean_confidence", pa.float64()),
        ("status", pa.string()),  # 'done'
    ]
)
