"""Model-state weighted merge (SURVEY.md §2.3 M8).

The reference's "federated" weight merge is an element-wise
``Σ αᵢ·state_dictᵢ`` over per-bucket best models, applied pairwise
with α=0.5 and optionally restricted to a layer subset
(`train.py:202-247`). Re-expressed two ways:

- ``merge_states``: the in-memory exact semantics (numpy), for
  driver-side merges of a handful of states — what the reference
  actually does;
- ``merge_states_dataset``: the distributed shape — a Dataset of
  (layer, bucket, alpha, weights) rows grouped by layer with a
  weighted mean inside each group — for when per-layer tensors or the
  bucket count are too large for one process. One groupby on
  ``layer``; tensors never concatenate across layers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def merge_states(
    states: list[dict[str, np.ndarray]],
    alphas: list[float] | None = None,
    layers: list[str] | None = None,
) -> dict[str, np.ndarray]:
    """Element-wise weighted sum of state dicts. ``layers=None`` merges
    every key; otherwise only the named layers are merged and the rest
    are taken from the FIRST state (the reference's restricted-merge
    variant, train.py:219-247). Alphas default to uniform 1/n."""
    if not states:
        return {}
    n = len(states)
    if alphas is None:
        alphas = [1.0 / n] * n
    if len(alphas) != n:
        raise ValueError("len(alphas) must match len(states)")
    keys = states[0].keys()
    out: dict[str, np.ndarray] = {}
    for k in keys:
        if layers is not None and not any(k.startswith(p) for p in layers):
            out[k] = states[0][k].copy()
            continue
        acc = np.zeros_like(states[0][k], dtype=np.float64)
        for a, st in zip(alphas, states):
            acc += a * st[k].astype(np.float64)
        out[k] = acc.astype(states[0][k].dtype)
    return out


def states_to_dataset(
    states: dict[str, dict[str, np.ndarray]],
    alphas: dict[str, float] | None = None,
) -> rd.Dataset:
    """{bucket: state_dict} -> Dataset(layer, bucket, alpha, shape,
    weights:list<double>) — one row per (bucket, layer)."""
    if alphas is not None and set(alphas) != set(states):
        raise ValueError(
            f"alphas keys {sorted(alphas)} must exactly match state "
            f"buckets {sorted(states)}"
        )
    rows = []
    n = len(states)
    for bucket, st in states.items():
        a = alphas[bucket] if alphas is not None else 1.0 / max(n, 1)
        for layer, w in st.items():
            rows.append(
                {
                    "layer": layer,
                    "bucket": bucket,
                    "alpha": float(a),
                    "shape": list(w.shape),
                    "weights": w.astype(np.float64).ravel().tolist(),
                }
            )
    return rd.from_items(rows)


def merge_states_dataset(ds: rd.Dataset) -> dict[str, np.ndarray]:
    """Distributed grouped weighted mean: groupby(layer) keeps each
    layer's rows together; the weighted sum is vectorized per group.
    Returns the merged state dict."""

    def merge_layer(g: pd.DataFrame) -> pd.DataFrame:
        shape = g["shape"].iloc[0]
        acc = np.zeros(int(np.prod(shape)), dtype=np.float64)
        for a, w in zip(g["alpha"], g["weights"]):
            acc += float(a) * np.asarray(w, dtype=np.float64)
        return pd.DataFrame(
            {
                "layer": [g["layer"].iloc[0]],
                "shape": [list(shape)],
                "weights": [acc.tolist()],
            }
        )

    merged = ds.groupby("layer").map_groups(merge_layer, batch_format="pandas")
    out: dict[str, np.ndarray] = {}
    for r in merged.take_all():
        out[r["layer"]] = np.asarray(r["weights"], dtype=np.float64).reshape(
            [int(s) for s in r["shape"]]
        )
    return out
