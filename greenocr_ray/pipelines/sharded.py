"""Co-partitioned shard extraction — the zero-shuffle fast path.

``extract.py`` is the general pipeline: media payloads may live
anywhere, so recognized text reaches its span rows through a hash
join (one all-to-all exchange). This module is the fast path for the
common INGEST-CO-PARTITIONED layout, where the media payload table is
written in document order next to the documents table (as any sane
ingest does — and as ``interleave.build_interleaved`` does): then a
contiguous range of documents maps to a contiguous range of
``media_ref`` keys, and each shard can be extracted END TO END with
no exchange at all:

    plan shards from parquet ROW-GROUP METADATA (doc_id min/max stats
    — no data read at planning time, holds at 10^12 docs)
    -> rd.from_items(shards).map_batches(ShardExtractor,
           batch_size=1, concurrency=N)     # actor pool
    -> each shard: filtered read of its doc range
         -> explode + clean (same stage fns as the streaming path)
         -> filtered read of its media_ref range (row-group pruning)
         -> recognize (Recognizer = actor state, loaded once)
         -> in-memory merge + per-doc assembly
         -> atomic partition write + lineage record (resume-compatible)

Scaling: shards are embarrassingly parallel; there is no shuffle to
pay a fixed cost on, so throughput tracks CPU count (the ≥0.8
N→4N efficiency criterion). Skew: shards are row-group-grained (many
more shards than workers) and the actor pool load-balances, so one
media-heavy shard does not pin the job.

The partitioning ASSUMPTION this relies on (documented per SURVEY.md
§2 custom-operator rule): ``media_ref`` ranges of distinct doc ranges
do not interleave — i.e. media is stored sorted by the same key
order as documents. Each shard reads media in
[min(its media_refs), max(its media_refs)]: always CORRECT (extra
rows are ignored), but only FAST when the layout clusters that range
into few row groups. For non-co-located layouts use
``run_extraction`` (hash join) instead.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from .. import png
from ..functions.multimodal import decode_raster
from ..recognize import Recognizer
from ..stages.clean_text import clean_text_spans
from ..stages.explode import assemble_docs, explode_spans
from ..state.lineage import check_run_meta, completed_partitions


@dataclass
class ShardSpec:
    shard_id: int
    doc_file: str
    row_group_start: int
    row_group_end: int  # exclusive
    doc_lo: str
    doc_hi: str


def _parquet_files(uri: str) -> list[str]:
    if os.path.isdir(uri):
        return sorted(
            os.path.join(uri, f)
            for f in os.listdir(uri)
            if f.endswith(".parquet")
        )
    return [uri]


def plan_shards(documents_uri: str, groups_per_shard: int = 1) -> list[ShardSpec]:
    """Metadata-only shard plan: one shard per ``groups_per_shard``
    consecutive row groups of each documents file, with doc_id bounds
    from the row-group column statistics."""
    shards: list[ShardSpec] = []
    sid = 0
    for f in _parquet_files(documents_uri):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        doc_idx = names.index("doc_id")
        rg = 0
        while rg < md.num_row_groups:
            end = min(rg + groups_per_shard, md.num_row_groups)
            stats = [md.row_group(i).column(doc_idx).statistics for i in range(rg, end)]
            # doc_id bounds are informational (plan inspection, tests);
            # extraction reads whole row groups and derives its media
            # range from the actual refs, so missing stats (a legal
            # parquet writer choice) degrade gracefully to "".
            has = [s for s in stats if s is not None and s.has_min_max]
            shards.append(
                ShardSpec(
                    shard_id=sid,
                    doc_file=f,
                    row_group_start=rg,
                    row_group_end=end,
                    doc_lo=min((s.min for s in has), default=""),
                    doc_hi=max((s.max for s in has), default=""),
                )
            )
            sid += 1
            rg = end
    return shards


class ShardExtractor:
    """Actor: processes whole shards. Recognizer (glyph atlas) and the
    media dataset handle are built once per actor (S9/M1 actor-state
    pattern, exe_t.py:461-471); each __call__ handles one shard spec
    batch end to end and returns its lineage rows."""

    def __init__(
        self,
        media_uri: str,
        out_dir: str,
        enhance: str = "clahe",
        binarization: str = "otsu",
    ):
        self.recognizer = Recognizer(enhance=enhance, binarization=binarization)
        self.media = pads.dataset(_parquet_files(media_uri), format="parquet")
        self.out_dir = out_dir
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    # ------------------------------------------------------- per shard

    def _ocr_media(self, lo: str, hi: str) -> dict[str, tuple[str, float]]:
        """Filtered media read (row-group stats pruning on media_ref)
        -> {media_ref: (text, confidence)}."""
        flt = (pc.field("media_ref") >= lo) & (pc.field("media_ref") <= hi)
        tbl = self.media.to_table(
            columns=["media_ref", "width", "height", "pixels"], filter=flt
        )
        out: dict[str, tuple[str, float]] = {}
        refs = tbl.column("media_ref").to_pylist()
        ws = tbl.column("width").to_numpy()
        hs = tbl.column("height").to_numpy()
        px = tbl.column("pixels").to_pylist()
        for i, ref in enumerate(refs):
            raw = px[i]
            if raw is None:
                out[ref] = ("", 0.0)  # skip-and-continue semantics
                continue
            if raw[:8] == png.SIGNATURE:  # PNG payload: dims from header
                try:
                    img = decode_raster(raw, 0, 0, fmt="png")
                except ValueError:
                    out[ref] = ("", 0.0)
                    continue
                out[ref] = self.recognizer.recognize(img)
                continue
            if not (np.isfinite(ws[i]) and np.isfinite(hs[i])):
                out[ref] = ("", 0.0)
                continue
            w, h = int(ws[i]), int(hs[i])
            if len(raw) != w * h:
                out[ref] = ("", 0.0)
                continue
            img = (
                np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(np.float32)
                / np.float32(255.0)
            )
            out[ref] = self.recognizer.recognize(img)
        return out

    def _process(self, s: ShardSpec) -> dict:
        t0 = time.monotonic()
        pf = pq.ParquetFile(s.doc_file)
        docs = pf.read_row_groups(
            list(range(s.row_group_start, s.row_group_end)),
            columns=["doc_id", "spans"],
        )
        flat = explode_spans(docs)
        is_media = pc.equal(flat.column("kind"), "media")
        text_spans = clean_text_spans(flat.filter(pc.invert(is_media)))
        media_spans = flat.filter(is_media)

        n_media = media_spans.num_rows
        ocr: dict[str, tuple[str, float]] = {}
        if n_media:
            refs = media_spans.column("media_ref").to_pylist()
            ocr = self._ocr_media(min(refs), max(refs))

        # in-memory merge: media span rows pick up their recognized text
        m_doc = media_spans.column("doc_id").to_pylist()
        m_off = media_spans.column("offset").to_pylist()
        m_ref = media_spans.column("media_ref").to_pylist()
        rows = {
            "doc_id": list(text_spans.column("doc_id").to_pylist()),
            "offset": list(text_spans.column("offset").to_pylist()),
            "kind": list(text_spans.column("kind").to_pylist()),
            "text": list(text_spans.column("text").to_pylist()),
            "media_ref": list(text_spans.column("media_ref").to_pylist()),
            "confidence": list(text_spans.column("confidence").to_pylist()),
        }
        dropped = 0
        for d, o, r in zip(m_doc, m_off, m_ref):
            hit = ocr.get(r)
            if hit is None:
                dropped += 1  # missing payload: drop span (join semantics)
                continue
            rows["doc_id"].append(d)
            rows["offset"].append(o)
            rows["kind"].append("ocr")
            rows["text"].append(hit[0])
            rows["media_ref"].append(r)
            rows["confidence"].append(hit[1])

        df = pd.DataFrame(rows)
        doc_ids, span_lists, confs = assemble_docs(df)
        table = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "spans": span_lists,
                "mean_confidence": pa.array(confs, type=pa.float64()),
            }
        )
        final = os.path.join(self.out_dir, f"part-{s.shard_id:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic, then lineage LAST
        wall_ms = (time.monotonic() - t0) * 1000.0
        real = df[df["offset"] >= 0]  # exclude empty-doc placeholders
        rec = {
            "partition_id": s.shard_id,
            "n_docs": len(doc_ids),
            "n_spans": int(len(real)),
            "n_media": int(n_media - dropped),
            "wall_ms": wall_ms,
            "spans_per_sec": len(real) / max(wall_ms / 1000.0, 1e-9),
            "mean_confidence": float(real["confidence"].mean()) if len(real) else 0.0,
            "status": "done",
        }
        import json

        lin_final = os.path.join(
            self.out_dir, "_lineage", f"part-{s.shard_id:05d}.json"
        )
        lin_tmp = lin_final + ".tmp"
        with open(lin_tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(lin_tmp, lin_final)
        return rec

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        recs = []
        for row in batch.to_pylist():
            recs.append(self._process(ShardSpec(**row)))
        return pd.DataFrame(recs)


@dataclass
class ShardedOptions:
    enhance: str = "clahe"
    binarization: str = "otsu"
    groups_per_shard: int = 1
    concurrency: tuple[int, int] | int = (4, 32)


def run_sharded_extraction(
    documents_uri: str,
    media_uri: str,
    out_dir: str,
    opts: ShardedOptions | None = None,
) -> pd.DataFrame:
    """Checkpointed co-partitioned extraction. Returns lineage rows of
    shards processed in THIS run (done shards skipped up front)."""
    opts = opts or ShardedOptions()
    shards = plan_shards(documents_uri, opts.groups_per_shard)
    # shard ids are positional in the plan: refuse a resume whose plan
    # arity changed (different groups_per_shard / input layout)
    check_run_meta(out_dir, len(shards))
    done = completed_partitions(out_dir)
    todo = [s for s in shards if s.shard_id not in done]
    if not todo:
        from ..state.lineage import empty_lineage

        return empty_lineage()
    specs = rd.from_items([vars(s) for s in todo])
    lineage = specs.map_batches(
        ShardExtractor,
        fn_constructor_kwargs={
            "media_uri": media_uri,
            "out_dir": out_dir,
            "enhance": opts.enhance,
            "binarization": opts.binarization,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=opts.concurrency,
        num_cpus=1,
    )
    return lineage.to_pandas()
