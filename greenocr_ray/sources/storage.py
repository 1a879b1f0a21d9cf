"""Dual-path table storage: Lance when importable, Parquet fallback.

The north star streams documents with ``ray.data.read_lance``; this
sandbox has no ``lance`` package, so the same logical API transparently
falls back to Parquet (same schema, same call sites). The Lance branch
is real code, guarded by import, covered by an importorskip test.
"""

from __future__ import annotations

import ray.data as rd

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(uri: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read a table directory/file; prunes columns at the read."""
    if HAVE_LANCE and uri.endswith(".lance"):
        return rd.read_lance(uri, columns=columns, **kwargs)
    return rd.read_parquet(uri, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, uri: str, **kwargs) -> None:
    if HAVE_LANCE and uri.endswith(".lance"):
        ds.write_lance(uri, **kwargs)
        return
    ds.write_parquet(uri, **kwargs)
