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

The partitioning ASSUMPTION this is optimized for (documented per
SURVEY.md §2 custom-operator rule): ``media_ref`` ranges of distinct
doc ranges do not interleave — i.e. media is stored sorted by the
same key order as documents. Each shard reads media in
[min(its media_refs), max(its media_refs)] — always CORRECT (extra
rows are ignored) and fast on that layout. A GUARD bounds the
failure mode on shuffled layouts: when row-group stats show the range
filter would admit > RANGE_OVERREAD_FACTOR x the groups that actually
contain needed refs, the shard switches to exact per-row-group reads
+ an ``is_in`` filter (see ShardExtractor._ocr_media), so read
amplification stays proportional to the shard's real footprint. For
persistently non-co-located layouts ``run_extraction`` (hash join)
remains the better path.
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
from ..stages.explode import assemble_docs_table, explode_spans
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

    # fall back to exact per-row-group reads when the [lo,hi] range
    # filter would admit more than this many times the row groups that
    # actually contain needed refs (shuffled / non-co-located layouts)
    RANGE_OVERREAD_FACTOR = 4

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
        # media_ref row-group stats index (metadata only, no data read):
        # (path, rg_idx, min, max) — None stats mean "must read"
        self._rg_index: list[tuple[str, int, str | None, str | None]] = []
        self._pf_cache: dict[str, pq.ParquetFile] = {}
        for path in _parquet_files(media_uri):
            pf = pq.ParquetFile(path)
            self._pf_cache[path] = pf
            ref_i = pf.schema_arrow.get_field_index("media_ref")
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(ref_i).statistics
                if st is None or not st.has_min_max:
                    self._rg_index.append((path, i, None, None))
                else:
                    self._rg_index.append((path, i, st.min, st.max))
        self.last_read_row_groups = 0  # guard observability (tests)

    # ------------------------------------------------------- per shard

    def _ocr_media(self, refs: list[str]) -> dict[str, tuple[str, float]]:
        """Media read for a shard's needed refs -> {media_ref: (text,
        confidence)}. Fast path: one [min,max] range filter (row-group
        stats pruning — optimal on co-partitioned layouts, where a
        shard's refs are contiguous). GUARD: when the range would
        admit > RANGE_OVERREAD_FACTOR x the row groups that actually
        contain needed refs (a shuffled layout can make [min,max] span
        the whole table — unbounded read amplification), switch to
        exact per-row-group reads + an is_in filter instead."""
        import bisect

        refs_sorted = sorted(set(refs))
        lo, hi = refs_sorted[0], refs_sorted[-1]
        range_rgs = []
        needed = []
        for path, i, mn, mx in self._rg_index:
            if mn is not None and (mx < lo or mn > hi):
                continue  # range filter prunes this group too
            range_rgs.append((path, i))
            if mn is None:
                needed.append((path, i))  # no stats: must read
                continue
            p = bisect.bisect_left(refs_sorted, mn)
            if p < len(refs_sorted) and refs_sorted[p] <= mx:
                needed.append((path, i))
        cols = ["media_ref", "width", "height", "pixels"]
        if len(range_rgs) <= self.RANGE_OVERREAD_FACTOR * max(1, len(needed)):
            self.last_read_row_groups = len(range_rgs)
            flt = (pc.field("media_ref") >= lo) & (pc.field("media_ref") <= hi)
            tbl = self.media.to_table(columns=cols, filter=flt)
        else:
            self.last_read_row_groups = len(needed)
            by_file: dict[str, list[int]] = {}
            for path, i in needed:
                by_file.setdefault(path, []).append(i)
            ref_arr = pa.array(refs_sorted, type=pa.string())
            parts = []
            for path, idxs in by_file.items():
                t = self._pf_cache[path].read_row_groups(idxs, columns=cols)
                parts.append(
                    t.filter(pc.is_in(t.column("media_ref"), ref_arr))
                )
            tbl = (
                pa.concat_tables(parts)
                if parts
                else self.media.schema.empty_table().select(cols)
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
            ocr = self._ocr_media(refs)

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

        flat_out = pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.string()),
                "offset": pa.array(rows["offset"], type=pa.int64()),
                "kind": pa.array(rows["kind"], type=pa.string()),
                "text": pa.array(rows["text"], type=pa.string()),
                "media_ref": pa.array(rows["media_ref"], type=pa.string()),
                "confidence": pa.array(rows["confidence"], type=pa.float64()),
            }
        )
        table = assemble_docs_table(flat_out)  # vectorized Arrow assembly
        final = os.path.join(self.out_dir, f"part-{s.shard_id:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic, then lineage LAST
        wall_ms = (time.monotonic() - t0) * 1000.0
        real_mask = pc.greater_equal(flat_out.column("offset"), 0)
        real = flat_out.filter(real_mask)  # exclude empty-doc placeholders
        n_real = real.num_rows
        rec = {
            "partition_id": s.shard_id,
            "n_docs": table.num_rows,
            "n_spans": int(n_real),
            "n_media": int(n_media - dropped),
            "wall_ms": wall_ms,
            "spans_per_sec": n_real / max(wall_ms / 1000.0, 1e-9),
            "mean_confidence": (
                float(pc.mean(real.column("confidence")).as_py())
                if n_real
                else 0.0
            ),
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
