"""Small Ray Data utilities shared across the engine."""

from __future__ import annotations

import ray.data as rd


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Rebuild a MATERIALIZED dataset without its empty blocks
    (zero-copy: only block refs move, on the driver).

    Why this exists: ``groupby().map_groups`` emits schema-less empty
    blocks for empty hash partitions, ``map_batches`` silently skips
    empty blocks (the UDF is never called, so they can't be fixed
    in-stream), and Ray 2.49.2's hash-shuffle operator broadcasts the
    schema of whichever input block it shuffles FIRST — a schema-less
    one poisons every empty target partition, whose finalize key-sort
    then raises ``ArrowInvalid: No match for FieldRef``. Dropping the
    empties before the next shuffle removes the hazard.
    """
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return ds  # nothing non-empty; caller handles the empty result
    return rd.from_arrow_refs(refs)
