"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read in every task) + driver-side
  merge of per-batch top-k partials — the all-reduce top-k pattern;
- LSH-bucketed variant: random-hyperplane signs bucket the corpus; a
  query only scans its own bucket (the scale path: the shuffle is ONE
  groupby on the bucket key, queries touch 1/2^nbits of the data).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(ids)
    return ids, flat.reshape(len(ids), dim)


def knn_cosine(
    embeddings: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    exclude: set[int] | None = None,
) -> pd.DataFrame:
    """Brute-force cosine top-k -> (vec_id, cos_sim), cos_sim float64
    rounded to 6 decimals, descending."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)
    excl = exclude or set()

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        order = np.argsort(-sims)[: k + len(excl)]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cos_sim": pa.array(sims[order], type=pa.float64()),
            }
        )

    parts = embeddings.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    ).take_all()
    heap = [
        (r["vec_id"], r["cos_sim"]) for r in parts if r["vec_id"] not in excl
    ]
    top = heapq.nlargest(k, heap, key=lambda t: (t[1], -t[0]))
    return pd.DataFrame(
        {
            "vec_id": [t[0] for t in top],
            "cos_sim": [round(t[1], 6) for t in top],
        }
    )


class LshIndexer:
    """Random-hyperplane LSH bucketer (stateful: plane matrix built
    once per actor)."""

    def __init__(self, dim: int = 64, nbits: int = 8, seed: int = 99):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((dim, nbits))
        self.powers = (1 << np.arange(nbits)).astype(np.int64)

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        return signs @ self.powers

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(batch)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "bucket": pa.array(self.bucket_of(m), type=pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def knn_cosine_lsh(
    embeddings: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    nbits: int = 8,
    dim: int = 64,
    exclude: set[int] | None = None,
) -> pd.DataFrame:
    """ANN top-k: scan only the query's LSH bucket. Approximate —
    recall < 1 by construction; the bucket scan is the 1/2^nbits
    scale path."""
    idx = LshIndexer(dim=dim, nbits=nbits)
    q = np.asarray(query, dtype=np.float64)
    qbucket = int(idx.bucket_of(q[None, :])[0])
    bucketed = embeddings.map_batches(
        LshIndexer,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pyarrow",
        concurrency=(2, 8),
    )

    def only_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("bucket"), qbucket))

    in_bucket = bucketed.map_batches(only_bucket, batch_format="pyarrow")
    return knn_cosine(in_bucket, query, k=k, exclude=exclude)
