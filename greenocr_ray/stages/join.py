"""Media-payload join: attach pixel payloads to media spans.

Both sides are large at 10^12-document scale (payloads dominate), so
this is a genuine hash-partitioned shuffle join on ``media_ref`` — the
one place the pipeline moves pixels across the exchange. Downstream of
the join only recognized TEXT shuffles (assembly by doc_id), never
pixels.

Primary path: ``Dataset.join`` (hash shuffle, Ray >= 2.46). Fallback
(older Ray): explicit bucketed join — tag both sides with
``bucket = crc32(media_ref) % B``, groupby bucket, match within group
(the portable pattern from the Ray Data guide).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _crc_bucket(vals, nbuckets: int) -> list[int]:
    from ..rayutil import crc32_of_strings

    return list(crc32_of_strings(vals) % nbuckets)


def join_media_payloads(
    media_spans: rd.Dataset, media: rd.Dataset, num_partitions: int = 16
) -> rd.Dataset:
    """(doc_id, offset, kind, text, media_ref) x (media_ref, width,
    height, pixels) -> flat rows with payloads. Inner join: spans whose
    payload is missing are dropped (skip-and-continue semantics)."""
    if hasattr(rd.Dataset, "join"):
        # Ray's hash join raises ArrowInvalid if the build side is
        # entirely empty (schema-less empty partitions); a sentinel row
        # whose key can never match a real media_ref keeps it non-empty.
        sentinel = rd.from_arrow(
            pa.table(
                {
                    "media_ref": pa.array(["\x00__no_such_ref__"], type=pa.string()),
                    "width": pa.array([1], type=pa.int32()),
                    "height": pa.array([1], type=pa.int32()),
                    "pixels": pa.array([b"\x00"], type=pa.binary()),
                }
            )
        )
        return media_spans.join(
            media.union(sentinel),
            join_type="inner",
            num_partitions=num_partitions,
            on=("media_ref",),
        )
    return _bucketed_join(media_spans, media, num_partitions)


def join_ocr_results(
    media_spans: rd.Dataset, ocr_text: rd.Dataset, num_partitions: int = 16
) -> rd.Dataset:
    """(doc_id, offset, media_ref) x (media_ref, text, confidence) ->
    flat OCR span rows (doc_id, offset, kind='ocr', text, media_ref,
    confidence).

    This is the scale path: the OCR stage already reduced payloads to
    text, so BOTH sides of this hash join are narrow string tables —
    the shuffle moves kilobytes per thousand spans, not rasters. Inner
    join keeps skip-and-continue semantics (spans whose payload never
    existed are dropped); a media_ref used by several spans fans its
    recognized text out to each of them (OCR ran once per payload).
    """
    left = media_spans.select_columns(["doc_id", "offset", "media_ref"])
    if hasattr(rd.Dataset, "join"):
        # sentinels guard the schema-less-empty-side crash on BOTH
        # sides (Ray 2.49.2 loses the schema of a fully-filtered
        # dataset; an all-text corpus or a fully-resumed run makes the
        # span side genuinely empty). The keys can never match a real
        # media_ref or each other, so the inner join drops them.
        left_sentinel = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(["\x00__no_such_doc__"], type=pa.string()),
                    # int64 matches explode_spans' canonical offset
                    # width — a narrower sentinel would rely on Arrow's
                    # silent integer promotion in the union
                    "offset": pa.array([0], type=pa.int64()),
                    "media_ref": pa.array(
                        ["\x00__no_such_span__"], type=pa.string()
                    ),
                }
            )
        )
        left = left.union(left_sentinel)
        sentinel = rd.from_arrow(
            pa.table(
                {
                    "media_ref": pa.array(["\x00__no_such_ref__"], type=pa.string()),
                    "text": pa.array([""], type=pa.string()),
                    "confidence": pa.array([0.0], type=pa.float64()),
                }
            )
        )
        joined = left.join(
            ocr_text.union(sentinel),
            join_type="inner",
            num_partitions=num_partitions,
            on=("media_ref",),
        )
    else:
        joined = _generic_bucketed_join(
            left, ocr_text, ["text", "confidence"], num_partitions
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "offset": t.column("offset"),
                "kind": pa.array(["ocr"] * t.num_rows, type=pa.string()),
                "text": t.column("text"),
                "media_ref": t.column("media_ref"),
                "confidence": t.column("confidence"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _generic_bucketed_join(
    left: rd.Dataset, right: rd.Dataset, right_cols: list[str], nbuckets: int
) -> rd.Dataset:
    """Portable bucketed inner join on media_ref (pre-2.46 fallback)."""

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            refs = batch.column("media_ref").to_pylist()
            return batch.append_column(
                "bucket", pa.array(_crc_bucket(refs, nbuckets), type=pa.int32())
            ).append_column("side", pa.array([side] * batch.num_rows))

        return fn

    lt = left.map_batches(tag("L"), batch_format="pyarrow")
    rt = right.map_batches(tag("R"), batch_format="pyarrow")
    all_cols = sorted(
        set(left.schema().names) | set(right.schema().names) | {"bucket", "side"}
    )

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in df.columns:
                df[c] = None
        return df[all_cols]

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["side"] == "L"]
        rg = g[g["side"] == "R"]
        out = lg.drop(columns=right_cols).merge(
            rg[["media_ref", *right_cols]], on="media_ref", how="inner"
        )
        return out.drop(columns=["bucket", "side"])

    return (
        lt.map_batches(pad, batch_format="pandas")
        .union(rt.map_batches(pad, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
    )


def _bucketed_join(
    media_spans: rd.Dataset, media: rd.Dataset, nbuckets: int
) -> rd.Dataset:
    """Pre-2.46 fallback for the payload join; delegates to the shared
    bucketed-join (its drop-before-merge avoids the pandas _x/_y
    suffixing a padded-columns merge would produce)."""
    return _generic_bucketed_join(
        media_spans, media, ["width", "height", "pixels"], nbuckets
    )
