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

from .relational import round_half_away as _round_half_away


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
            "cos_sim": [float(_round_half_away(t[1], 6)) for t in top],
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


# --------------------------------------------- embedding near-duplicates


def embedding_near_dup_pairs(
    embeddings: rd.Dataset, threshold: float = 0.8
) -> pd.DataFrame:
    """EXACT cosine near-duplicate pairs (vec_a < vec_b, sim >= t).

    Block-matmul all-pairs: the L2-normalized corpus matrix is
    broadcast ONCE (``ray.put``); each batch multiplies its rows
    against it and emits only pairs above threshold — O(n^2) flops but
    fully distributed, zero shuffle, and only the (sparse) qualifying
    pairs leave the tasks. Valid while the normalized matrix fits a
    worker's heap (~3 GB at 10M x 64-d float32); beyond that, use the
    LSH-bucketed approximate variant below.
    """
    ids_all: list[np.ndarray] = []
    mats: list[np.ndarray] = []
    for b in embeddings.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, m = _batch_matrix(b)
        ids_all.append(i)
        mats.append(m)
    if not ids_all:  # empty embeddings table -> empty pair frame
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"),
             "vec_b": pd.Series([], dtype="int64"),
             "cos_sim": pd.Series([], dtype="float64")}
        )
    ids = np.concatenate(ids_all)
    m = np.concatenate(mats).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    order = np.argsort(ids)
    ids, mn = ids[order], mn[order]
    ref = ray.put((ids, mn))  # float64: oracle compares at 6 decimals

    def pairs(batch: pa.Table) -> pd.DataFrame:
        all_ids, corpus = ray.get(ref)
        bids, bm = _batch_matrix(batch)
        bnorm = np.linalg.norm(bm, axis=1, keepdims=True)
        bnorm[bnorm == 0] = 1.0
        sims = (bm / bnorm) @ corpus.T
        out_a, out_b, out_s = [], [], []
        for r in range(sims.shape[0]):
            hit = np.nonzero(sims[r] >= threshold)[0]
            for c in hit:
                a, bb = int(bids[r]), int(all_ids[c])
                if a < bb:  # dedupe + drop self
                    out_a.append(a)
                    out_b.append(bb)
                    out_s.append(float(sims[r, c]))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out_a, dtype="int64"),
                "vec_b": pd.Series(out_b, dtype="int64"),
                # half-away rounding matches DuckDB ROUND (numpy
                # rounds half-to-even; diverges exactly on 6th-decimal
                # halves, the events_hourly-at-scale failure class)
                "cos_sim": pd.Series(_round_half_away(out_s, 6), dtype="float64"),
            }
        )

    return (
        embeddings.map_batches(pairs, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------- IVF index


class IvfIndex:
    """IVF (inverted-file) ANN: seeded k-means centroids on a corpus
    sample, per-vector nearest-centroid assignment, query probes only
    the ``nprobe`` closest lists — the classic scale path when one LSH
    bucket recalls too little. Deterministic: fixed seed, fixed Lloyd
    iteration count, ties break on lowest centroid index."""

    def __init__(self, sample: np.ndarray, nlist: int = 16, iters: int = 5,
                 seed: int = 7):
        rng = np.random.Generator(np.random.PCG64(seed))
        n = sample.shape[0]
        nlist = min(nlist, n)
        idx = rng.choice(n, size=nlist, replace=False)
        c = sample[np.sort(idx)].copy()
        for _ in range(iters):
            d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for j in range(nlist):
                pts = sample[assign == j]
                if len(pts):
                    c[j] = pts.mean(axis=0)
        self.centroids = c

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        d = ((vecs[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)


def knn_cosine_ivf(
    embeddings: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    exclude: set[int] | None = None,
) -> pd.DataFrame:
    """ANN top-k via IVF: train centroids on a bounded sample
    (driver-side, deterministic), broadcast them, assign every vector
    in a map_batches pass, scan only the query's nprobe nearest lists.
    Approximate (recall < 1); the exact variant is ``knn_cosine``."""
    sample_rows = embeddings.limit(sample_size).to_pandas()
    sample = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sample_rows["embedding"]]
    )
    index = IvfIndex(sample, nlist=nlist)
    idx_ref = ray.put(index)
    q = np.asarray(query, dtype=np.float64)
    qd = ((q[None, :] - index.centroids) ** 2).sum(axis=1)
    probe = set(np.argsort(qd)[:nprobe].tolist())

    def in_probed_lists(batch: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref)
        _, m = _batch_matrix(batch)
        keep = np.array([a in probe for a in ix.assign(m)])
        return batch.filter(pa.array(keep))

    candidates = embeddings.map_batches(in_probed_lists, batch_format="pyarrow")
    return knn_cosine(candidates, query, k=k, exclude=exclude)
