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

import zlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _crc_bucket(vals: list[str], nbuckets: int) -> list[int]:
    return [zlib.crc32(v.encode()) % nbuckets for v in vals]


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


def _bucketed_join(
    media_spans: rd.Dataset, media: rd.Dataset, nbuckets: int
) -> rd.Dataset:
    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            refs = batch.column("media_ref").to_pylist()
            return batch.append_column(
                "bucket", pa.array(_crc_bucket(refs, nbuckets), type=pa.int32())
            ).append_column("side", pa.array([side] * batch.num_rows))

        return fn

    left = media_spans.map_batches(tag("L"), batch_format="pyarrow")
    right = media.map_batches(tag("R"), batch_format="pyarrow")

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["side"] == "L"]
        rg = g[g["side"] == "R"]
        out = lg.merge(
            rg[["media_ref", "width", "height", "pixels"]], on="media_ref", how="inner"
        )
        return out.drop(columns=["bucket", "side"])

    # union of heterogenous schemas: align by filling missing columns
    def pad(cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for c in cols:
                if c not in df.columns:
                    df[c] = None
            return df

        return fn

    all_cols = ["doc_id", "offset", "kind", "text", "media_ref", "width",
                "height", "pixels", "bucket", "side"]
    left = left.map_batches(pad(all_cols), batch_format="pandas")
    right = right.map_batches(pad(all_cols), batch_format="pandas")
    return left.union(right).groupby("bucket").map_groups(
        join_group, batch_format="pandas"
    )
