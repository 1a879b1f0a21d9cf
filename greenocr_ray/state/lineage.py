"""Partition-granular lineage checkpoints + resume.

The reference's durable ideas — per-bucket best-state snapshots and
periodic global saves (train.py:1121-1122,1201-1207) — become, for an
extraction job, partition-granular atomic output plus a lineage record
written LAST:

    out_dir/part-00007.parquet          # the extracted spans
    out_dir/_lineage/part-00007.json    # written after the data file

On restart, completed partition ids are read from the lineage dir and
their documents filtered out of the input BEFORE execution, so a
resumed run re-processes only unfinished partitions and never
duplicates output (SURVEY.md §4 checkpoint row). Writes are atomic
(temp file + os.replace).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


LINEAGE_COLUMNS = [
    "partition_id",
    "n_docs",
    "n_spans",
    "n_media",
    "wall_ms",
    "spans_per_sec",
    "mean_confidence",
    "status",
]


def empty_lineage() -> pd.DataFrame:
    """Zero-row lineage frame with the full column set — what a resumed
    run returns when every partition is already done (callers index
    columns, so an empty frame must still carry them)."""
    return pd.DataFrame(columns=LINEAGE_COLUMNS)


def partition_id(doc_id: str, n_parts: int) -> int:
    """Stable partitioner (crc32, not Python's salted hash)."""
    return zlib.crc32(doc_id.encode()) % n_parts


def partition_ids(doc_ids, n_parts: int) -> np.ndarray:
    """Vectorized partitioner over an Arrow string array / chunked
    array / list of doc_ids — bit-identical to :func:`partition_id`
    per row (same crc32), computed with the table-driven numpy CRC so
    the hot span path never loops rows in Python."""
    from ..rayutil import crc32_of_strings

    return (crc32_of_strings(doc_ids) % n_parts).astype(np.int32)


def check_run_meta(out_dir: str, n_parts: int) -> None:
    """Persist the partitioner arity on first run; refuse a resume with
    a different ``n_parts`` — the hash partitioner would assign docs to
    different partitions and 'len(done) >= n_parts' could silently
    declare an incomplete job finished."""
    meta_path = os.path.join(out_dir, "_lineage", "_meta.json")
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if int(meta.get("n_parts", n_parts)) != n_parts:
            raise ValueError(
                f"resume with n_parts={n_parts} against an output dir "
                f"written with n_parts={meta['n_parts']} ({out_dir}); "
                "use the original n_parts or a fresh out_dir"
            )
        return
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"n_parts": int(n_parts)}, fh)
    os.replace(tmp, meta_path)


def completed_partitions(out_dir: str) -> set[int]:
    lin = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lin):
        return set()
    done = set()
    for f in os.listdir(lin):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(lin, f)) as fh:
                rec = json.load(fh)
            if rec.get("status") == "done":
                done.add(int(rec["partition_id"]))
    return done


def read_lineage(out_dir: str) -> pd.DataFrame:
    lin = os.path.join(out_dir, "_lineage")
    rows = []
    if os.path.isdir(lin):
        for f in sorted(os.listdir(lin)):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(lin, f)) as fh:
                    rows.append(json.load(fh))
    return pd.DataFrame(rows)


def _empty_lineage_typed() -> pd.DataFrame:
    """Zero-row lineage frame with the dtypes a real record produces,
    so sentinel-only map_groups outputs concat cleanly with 1-row
    record frames (object-dtype empties would clash at Arrow
    conversion)."""
    return pd.DataFrame(
        {
            "partition_id": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_spans": pd.Series([], dtype="int64"),
            "n_media": pd.Series([], dtype="int64"),
            "wall_ms": pd.Series([], dtype="float64"),
            "spans_per_sec": pd.Series([], dtype="float64"),
            "mean_confidence": pd.Series([], dtype="float64"),
            "status": pd.Series([], dtype="object"),
        }
    )


class PartitionWriter:
    """map_groups fn over part_id groups: assemble docs, write the
    partition file atomically, then the lineage record; returns the
    lineage row as the group result. ``sentinel_doc`` rows (typed
    shuffle sentinels pinned one-per-hash-partition upstream) are
    dropped first; a sentinel-only group (an already-done partition,
    or a covering-only part_id value >= n_parts) writes NOTHING and
    returns an empty typed frame — never clobbering a done
    partition's output."""

    def __init__(self, out_dir: str, sentinel_doc: str | None = None):
        self.out_dir = out_dir
        self.sentinel_doc = sentinel_doc
        self.__name__ = "PartitionWriter"  # map_groups wants a fn-like name
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    def __call__(self, g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        from ..stages.explode import assemble_docs_table

        if self.sentinel_doc is not None:
            g = g.filter(
                pc.not_equal(g.column("doc_id"), self.sentinel_doc)
            )
            if not g.num_rows:
                return _empty_lineage_typed()
        t0 = time.monotonic()
        pid = int(g.column("part_id")[0].as_py())
        table = assemble_docs_table(g)  # vectorized Arrow assembly
        n_docs = table.num_rows
        final = os.path.join(self.out_dir, f"part-{pid:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic
        wall_ms = (time.monotonic() - t0) * 1000.0
        # stats over real rows (empty-doc placeholders excluded)
        real = g.filter(pc.greater_equal(g.column("offset"), 0))
        n_spans = real.num_rows
        rec = {
            "partition_id": pid,
            "n_docs": n_docs,
            "n_spans": n_spans,
            "n_media": int(
                pc.sum(
                    pc.cast(
                        pc.equal(real.column("kind"), "ocr"), pa.int64()
                    )
                ).as_py()
                or 0
            ),
            "wall_ms": wall_ms,
            "spans_per_sec": n_spans / max(wall_ms / 1000.0, 1e-9),
            "mean_confidence": (
                float(pc.mean(real.column("confidence")).as_py())
                if n_spans
                else 0.0
            ),
            "status": "done",
        }
        lin_final = os.path.join(self.out_dir, "_lineage", f"part-{pid:05d}.json")
        lin_tmp = lin_final + ".tmp"
        with open(lin_tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(lin_tmp, lin_final)  # written last: data-then-lineage
        return pd.DataFrame([rec])
