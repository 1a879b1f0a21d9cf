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


_LSH_CACHE: dict = {}


def _cached_lsh_indexer(dim: int, nbits: int) -> "LshIndexer":
    """One LshIndexer per (worker process, dim, nbits) — task stages
    reuse it across batches like actor state, without pool spin-up."""
    idx = _LSH_CACHE.get((dim, nbits))
    if idx is None:
        idx = LshIndexer(dim=dim, nbits=nbits)
        _LSH_CACHE[(dim, nbits)] = idx
    return idx


class LshIndexer:
    """Random-hyperplane LSH bucketer (stateful: plane matrix built
    once per worker — see _cached_lsh_indexer)."""

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
    probe_hamming: int = 0,
    exclude: set[int] | None = None,
) -> pd.DataFrame:
    """ANN top-k: scan the query's LSH bucket plus every bucket within
    ``probe_hamming`` sign flips (multi-probe). Approximate — recall
    rises with the probe radius at the cost of scanning
    sum_{i<=r} C(nbits,i) / 2^nbits of the corpus; radius 0 is the
    classic single-bucket 1/2^nbits scale path."""
    from itertools import combinations

    idx = LshIndexer(dim=dim, nbits=nbits)
    q = np.asarray(query, dtype=np.float64)
    qbucket = int(idx.bucket_of(q[None, :])[0])
    probes = {qbucket}
    for r in range(1, probe_hamming + 1):
        for flips in combinations(range(nbits), r):
            b = qbucket
            for f in flips:
                b ^= 1 << f
            probes.add(b)
    probe_arr = pa.array(sorted(probes), type=pa.int64())
    # task-based with a worker-process-cached indexer: the plane
    # matrix costs microseconds to build, so an actor pool paid ~2 s
    # of spin-up per query for nothing (same change as MinHasher)
    def bucket_batch(t: pa.Table) -> pa.Table:
        return _cached_lsh_indexer(dim, nbits)(t)

    bucketed = embeddings.map_batches(bucket_batch, batch_format="pyarrow")

    def only_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("bucket"), probe_arr))

    in_bucket = bucketed.map_batches(only_probed, batch_format="pyarrow")
    return knn_cosine(in_bucket, query, k=k, exclude=exclude)


def knn_cosine_batch(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Batched multi-query brute-force cosine top-k: the L2-normalized
    query MATRIX broadcasts once (``ray.put``); each corpus batch does
    ONE (batch x q) matmul and emits its per-query top-k partials; the
    driver merges k x blocks x q rows. Ties break on ascending vec_id.
    -> (query_id, vec_id, cos_sim) rows, k per query."""
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put(qn)
    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids, m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ qm.T  # (batch, q)
        out_q, out_v, out_s = [], [], []
        for j in range(qm.shape[0]):
            col = sims[:, j]
            order = np.lexsort((ids, -col))[: k + 1]  # sim desc, id asc
            out_q.extend([qid_arr[j]] * len(order))
            out_v.extend(ids[order])
            out_s.extend(col[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    parts = embeddings.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["vec_id"]]
    out = (
        parts.sort_values(
            ["query_id", "cos_sim", "vec_id"], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["cos_sim"] = _round_half_away(out["cos_sim"], 6)
    return out


def label_centroids(embeddings: rd.Dataset) -> pd.DataFrame:
    """Per-label embedding centroids in long form
    (label, dim, centroid) — the grouped weighted-mean shape of the
    reference's model-state merge (train.py:202-247) applied to
    vectors: per-batch partial (sum_vec, n) per label, driver fold of
    the bounded-cardinality partials, division once at the end."""

    def partial(t: pa.Table) -> pa.Table:
        labels = t.column("label").to_pylist()
        _, m = _batch_matrix(t)
        sums: dict[str, np.ndarray] = {}
        counts: dict[str, int] = {}
        for lab, row in zip(labels, m):
            if lab in sums:
                sums[lab] = sums[lab] + row
                counts[lab] += 1
            else:
                sums[lab] = row.copy()
                counts[lab] = 1
        keys = list(sums.keys())
        return pa.table(
            {
                "label": pa.array(keys, type=pa.int64()),
                "sum_vec": pa.array([sums[k].tobytes() for k in keys]),
                "n": pa.array([counts[k] for k in keys], type=pa.int64()),
            }
        )

    acc: dict[str, tuple[np.ndarray, int]] = {}
    for b in embeddings.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for lab, raw, n in zip(
            b.column("label").to_pylist(),
            b.column("sum_vec").to_pylist(),
            b.column("n").to_pylist(),
        ):
            v = np.frombuffer(raw, dtype=np.float64)
            if lab in acc:
                acc[lab] = (acc[lab][0] + v, acc[lab][1] + n)
            else:
                acc[lab] = (v.copy(), int(n))
    rows = []
    for lab in sorted(acc):
        s, n = acc[lab]
        c = _round_half_away(s / n, 6)
        rows.extend(
            {"label": int(lab), "dim": i + 1, "centroid": float(c[i])}
            for i in range(len(c))
        )
    out = pd.DataFrame(rows)
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    return out


def dedup_embeddings(
    embeddings: rd.Dataset, threshold: float = 0.8, **near_dup_kwargs
) -> pd.DataFrame:
    """Embedding-cosine near-dup FILTER: drop any vector that has a
    neighbor with a smaller vec_id at sim >= threshold (greedy
    keep-first). Composition: the exact blocked pair scan -> the drop
    set is exactly {vec_b of every (a < b) pair} -> anti-filter. The
    drop set is pair-bounded, never corpus-bounded.
    -> (vec_id) rows, ascending."""
    pairs = embedding_near_dup_pairs(embeddings, threshold, **near_dup_kwargs)
    drops = ray.put(set(pairs["vec_b"].tolist()))

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drops)
        ids = t.column("vec_id").to_pylist()
        return t.select(["vec_id"]).filter(
            pa.array([i not in d for i in ids])
        )

    out = (
        embeddings.map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return out


# --------------------------------------------- embedding near-duplicates


_EMPTY_PAIRS = {
    "vec_a": pd.Series([], dtype="int64"),
    "vec_b": pd.Series([], dtype="int64"),
    "cos_sim": pd.Series([], dtype="float64"),
}


def embedding_near_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.8,
    chunk_rows: int = 65536,
) -> pd.DataFrame:
    """EXACT cosine near-duplicate pairs (vec_a < vec_b, sim >= t) by
    blocked chunk-pair matmul.

    The corpus streams through the driver ONE CHUNK AT A TIME; each
    L2-normalized chunk goes straight into the object store
    (``ray.put``) and the driver keeps only its ObjectRef — the full
    matrix never materializes anywhere. The C*(C+1)/2 chunk pairs
    then fan out as a Dataset of (i, j) specs; each task pulls two
    chunks (zero-copy reads, spillable), multiplies, and emits only
    the sparse qualifying pairs. O(n^2) flops are inherent to EXACT
    all-pairs — for corpora where that is unaffordable use the
    LSH-bucketed ``embedding_near_dup_pairs_lsh`` below. Memory:
    driver O(refs) — normalization runs in map_batches tasks and the
    chunks are the materialized dataset's own blocks, so NO vector
    data ever moves through the driver; task O(2 chunks) (~64 MB at
    the default chunk_rows x 64-d float64)."""
    import math

    n_rows = embeddings.count()  # parquet footers / metadata, cheap
    if n_rows == 0:
        return pd.DataFrame(_EMPTY_PAIRS)

    def normalize_rows(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        m = m.astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "unit": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), type=pa.float64()), m.shape[1]
                ),
            }
        )

    n_chunks = max(1, math.ceil(n_rows / chunk_rows))
    normalized = (
        embeddings.map_batches(normalize_rows, batch_format="pyarrow")
        .repartition(n_chunks)
        .materialize()
    )
    # the chunks ARE the materialized blocks: the driver handles only
    # ObjectRefs (`normalized` must stay alive until the pair scan is
    # consumed — its driver handle owns the blocks)
    chunk_refs = [
        ref
        for bundle in normalized.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    if not chunk_refs:
        return pd.DataFrame(_EMPTY_PAIRS)

    specs = [
        {"i": i, "j": j}
        for i in range(len(chunk_refs))
        for j in range(i, len(chunk_refs))
    ]
    refs = chunk_refs  # captured by the closure; refs ship, not chunks

    def _unpack(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = tbl.column("vec_id").to_numpy()
        unit = tbl.column("unit")
        if isinstance(unit, pa.ChunkedArray):
            unit = unit.combine_chunks()
        m = np.asarray(unit.flatten()).reshape(len(ids), -1)
        return ids, m

    def chunk_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for i, j in zip(batch["i"], batch["j"]):
            ids_a, ma = _unpack(ray.get(refs[int(i)]))
            ids_b, mb = _unpack(ray.get(refs[int(j)]))
            sims = ma @ mb.T
            r, c = np.nonzero(sims >= threshold)
            if i == j:  # within-chunk: upper triangle only
                keep = ids_a[r] < ids_b[c]
            else:
                keep = np.ones(len(r), dtype=bool)
            ra, cb, s = ids_a[r[keep]], ids_b[c[keep]], sims[r[keep], c[keep]]
            lo = np.minimum(ra, cb)
            hi = np.maximum(ra, cb)
            drop_self = lo != hi
            frames.append(
                pd.DataFrame(
                    {
                        "vec_a": pd.Series(lo[drop_self], dtype="int64"),
                        "vec_b": pd.Series(hi[drop_self], dtype="int64"),
                        # half-away rounding matches DuckDB ROUND
                        "cos_sim": pd.Series(
                            _round_half_away(s[drop_self], 6), dtype="float64"
                        ),
                    }
                )
            )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(_EMPTY_PAIRS)
        )

    out = (
        rd.from_items(specs)
        .map_batches(chunk_pairs, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_near_dup_pairs_lsh(
    embeddings: rd.Dataset,
    threshold: float = 0.8,
    nbits: int = 6,
    n_tables: int = 8,
    dim: int = 64,
) -> pd.DataFrame:
    """APPROXIMATE cosine near-dup pairs: the 100-TB path.

    ``n_tables`` independent random-hyperplane tables bucket every
    vector (one flat_map-style explode, ONE groupby shuffle on
    (table, bucket)); all-pairs matmul runs only inside buckets and
    the union of tables is deduped. Recall for a pair at similarity s:
    1-(1-p^nbits)^n_tables with p = 1-arccos(s)/pi — ~0.999 at
    s >= 0.8 with the defaults, falling fast below s ~ 0.6: this is a
    NEAR-DUP detector, not an all-pairs scan (use the exact blocked
    variant when O(n^2) is affordable)."""
    indexers = [
        LshIndexer(dim=dim, nbits=nbits, seed=1000 + t) for t in range(n_tables)
    ]

    def bucket_rows(batch: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        n = len(ids)
        out_id = np.tile(ids, n_tables)
        out_tbl = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        out_bkt = np.concatenate([ix.bucket_of(mn) for ix in indexers])
        emb = np.tile(mn, (n_tables, 1))
        return pa.table(
            {
                "vec_id": pa.array(out_id, type=pa.int64()),
                "table_id": pa.array(out_tbl),
                "bucket": pa.array(out_bkt, type=pa.int64()),
                "embedding": pa.array(list(emb)),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pa.Table:
        # typed arrow output: empty pandas groups lose their schema in
        # Ray 2.49's hash-shuffle aggregators
        if len(g) < 2:
            return pa.table(
                {
                    "vec_a": pa.array([], type=pa.int64()),
                    "vec_b": pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        sims = m @ m.T
        r, c = np.nonzero(np.triu(sims >= threshold, k=1))
        keep = ids[r] != ids[c]  # a vec can share several buckets
        lo = np.minimum(ids[r[keep]], ids[c[keep]])
        hi = np.maximum(ids[r[keep]], ids[c[keep]])
        return pa.table(
            {
                "vec_a": pa.array(lo, type=pa.int64()),
                "vec_b": pa.array(hi, type=pa.int64()),
                "cos_sim": pa.array(
                    np.asarray(_round_half_away(sims[r[keep], c[keep]], 6)),
                    type=pa.float64(),
                ),
            }
        )

    out = (
        embeddings.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby(["table_id", "bucket"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "vec_a" not in out.columns:  # zero qualifying groups -> no schema
        return pd.DataFrame(_EMPTY_PAIRS)
    out = out.drop_duplicates(["vec_a", "vec_b"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


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


# ------------------------------------------------ distributed k-means


def kmeans_fit(
    embeddings: rd.Dataset,
    k: int = 8,
    iters: int = 8,
    seed: int = 11,
    sample_size: int = 2048,
) -> tuple[np.ndarray, list[float]]:
    """Full-corpus distributed Lloyd's k-means.

    Per iteration: centroids broadcast once via ``ray.put``; ONE
    streaming ``map_batches`` pass emits per-batch partial
    (cluster, vector-sum, count, sse) rows — k rows per batch, so the
    driver fold is O(k x blocks) regardless of corpus size; new
    centroids are the weighted partial means. No shuffle anywhere;
    the assignment math is one matmul per batch
    (||x||^2 - 2xC^T + ||c||^2, ties -> lowest cluster index, matching
    np.argmin). Deterministic: seeded init from a bounded sample (the
    IvfIndex pattern), fixed iteration count with early stop on
    centroid convergence. An empty cluster keeps its previous
    centroid. Returns (centroids, per-iteration inertia) — inertia is
    non-increasing across Lloyd iterations, which callers can assert
    as a machine-checkable invariant.
    """
    sample_rows = embeddings.limit(sample_size).to_pandas()
    sample = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sample_rows["embedding"]]
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    k = min(k, sample.shape[0])
    centroids = sample[np.sort(rng.choice(sample.shape[0], size=k, replace=False))].copy()
    dim = centroids.shape[1]
    inertia_per_iter: list[float] = []

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            _, m = _batch_matrix(batch)
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * m @ c.T
                + (c * c).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            sums = np.zeros((len(c), m.shape[1]))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c))
            sse = np.zeros(len(c))
            np.add.at(sse, assign, np.maximum(d2[np.arange(len(m)), assign], 0.0))
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), type=pa.int64()),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "n": pa.array(counts, type=pa.int64()),
                    "sse": pa.array(sse, type=pa.float64()),
                }
            )

        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        sse_total = 0.0
        for b in embeddings.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            cl = b.column("cluster").to_numpy()
            vs = np.stack(b.column("vsum").to_pylist())
            np.add.at(sums, cl, vs)
            np.add.at(counts, cl, b.column("n").to_numpy())
            sse_total += float(b.column("sse").to_numpy().sum())
        inertia_per_iter.append(sse_total)
        new_c = centroids.copy()
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new_c - centroids).max())
        centroids = new_c
        if shift < 1e-12:
            break
    return centroids, inertia_per_iter


def kmeans_assign(embeddings: rd.Dataset, centroids: np.ndarray) -> rd.Dataset:
    """Streaming nearest-centroid assignment pass (broadcast
    centroids, one matmul per batch) -> (vec_id, cluster, dist2)."""
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids, m = _batch_matrix(batch)
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * m @ c.T
            + (c * c).sum(axis=1)[None, :]
        )
        a = d2.argmin(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cluster": pa.array(a, type=pa.int64()),
                "dist2": pa.array(
                    np.maximum(d2[np.arange(len(ids)), a], 0.0),
                    type=pa.float64(),
                ),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------------------------- PCA


def pca_fit(
    embeddings: rd.Dataset, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Distributed PCA fit via streaming covariance partials — the
    dimensionality-reduction front end for embedding indexes (OPQ/IVF
    preprocessing) and redundancy analysis.

    ONE map_batches pass emits per-batch (Σx, Σ xᵀx, n) moment
    partials — a d-vector plus a d×d matrix per BATCH, so the driver
    fold is O(d² × blocks) and independent of corpus size (d = 64
    here; at 100 TB the fold is still megabytes). The d×d covariance
    eigendecomposition runs on the driver (trivial at embedding
    dims), components carry a deterministic sign convention (largest-
    |coefficient| entry made positive) so results are reproducible
    across block orders. No shuffle anywhere.

    Returns (mean, components[k,d] row-major, explained_var[k],
    n_rows); eigenvalues sorted descending."""
    def moments(batch: pa.Table) -> pa.Table:
        _, m = _batch_matrix(batch)
        s = m.sum(axis=0)
        ss = m.T @ m
        return pa.table(
            {
                "n": pa.array([m.shape[0]], type=pa.int64()),
                "s": pa.array([s], type=pa.list_(pa.float64())),
                "ss": pa.array([ss.ravel()], type=pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(
        moments, batch_format="pyarrow"
    ).to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    d = s.shape[0]
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    # E[xxᵀ] − μμᵀ, symmetrized against float drift
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) * 0.5
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    # deterministic sign: flip each component so its largest-|.|
    # coefficient is positive (eigh sign is arbitrary)
    for row in comps:
        j = np.argmax(np.abs(row))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, np.maximum(evals[order], 0.0), n


def pca_project(
    embeddings: rd.Dataset, mean: np.ndarray, components: np.ndarray
) -> rd.Dataset:
    """Streaming projection pass: components broadcast once via
    ``ray.put``, one matmul per batch. Emits (vec_id, proj, recon_err)
    — recon_err = ||x − (μ + Wᵀ(W(x−μ)))||², the per-row residual a
    caller can aggregate to verify the fit (Σ recon_err/n equals the
    discarded eigenvalue mass, a machine-checkable invariant)."""
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    def project(batch: pa.Table) -> pa.Table:
        mu, w = ray.get(ref)
        ids, m = _batch_matrix(batch)
        xc = m - mu[None, :]
        p = xc @ w.T
        resid = xc - p @ w
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "proj": pa.array(list(p), type=pa.list_(pa.float64())),
                "recon_err": pa.array(
                    (resid * resid).sum(axis=1), type=pa.float64()
                ),
            }
        )

    return embeddings.map_batches(project, batch_format="pyarrow")


# -------------------------------------------------------- SemDeDup


def semdedup_pairs(
    embeddings: rd.Dataset,
    k: int = 8,
    threshold: float = 0.4,
    iters: int = 8,
    probes: int = 2,
    fit: str = "sample",
    fit_sample_size: int = 4096,
) -> pd.DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic near-duplicate
    discovery restricted to k-means cluster interiors — the scale path
    for embedding dedup, O(probes²·Σ n_c²) flops instead of the exact
    all-pairs O(n²).

    Stage 1: distributed Lloyd fit (``kmeans_fit`` — broadcast
    centroids, O(k×blocks) driver fold). Stage 2: one streaming pass
    tags each row with its ``probes`` nearest centroids (multi-probe
    assignment: a near-dup pair split by a Voronoi boundary still
    meets in the shared second-nearest cluster — measured on the
    test embeddings, recall vs exact all-pairs rises from 0.44 at
    probes=1 to 0.93+ at probes=2 for the same k). Stage 3:
    cluster-hash shuffle; each cluster task L2-normalizes its members
    and emits the upper-triangle pairs with cosine ≥ threshold; pairs
    co-probed into two shared clusters dedupe at the final fold.
    Partitioning assumption: ONE CLUSTER FITS ONE TASK — at corpus
    scale pick k so probes·n/k member vectors fit a worker (the paper
    uses k in the tens of thousands for 100M+ corpora).

    -> (vec_a, vec_b, cos_sim) rows, vec_a < vec_b, sorted. Every
    returned pair is by construction also an exact-cosine near-dup
    pair (same normalize + matmul math as
    ``embedding_near_dup_pairs``), which the machine gate asserts.

    ``fit='sample'`` (default) runs Lloyd on a bounded
    ``fit_sample_size`` prefix entirely on the driver — the paper's
    own design, and the 100-TB one: centroid placement needs only a
    sketch of the density, so only the ONE assignment pass streams
    the corpus (vs iters× full passes for ``fit='full'``, which
    remains available when exact full-corpus centroids matter).
    Dedup recall is insensitive to the fit source (cluster interiors
    just need to co-locate neighborhoods).
    """
    if fit == "sample":
        sample_rows = embeddings.limit(fit_sample_size).to_pandas()
        sample = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                for v in sample_rows["embedding"]
            ]
        )
        rng = np.random.Generator(np.random.PCG64(11))
        kk = min(k, sample.shape[0])
        centroids = sample[
            np.sort(rng.choice(sample.shape[0], size=kk, replace=False))
        ].copy()
        for _ in range(iters):
            d2 = (
                (sample * sample).sum(axis=1)[:, None]
                - 2.0 * sample @ centroids.T
                + (centroids * centroids).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            new_c = centroids.copy()
            for j in range(kk):
                sel = assign == j
                if sel.any():
                    new_c[j] = sample[sel].mean(axis=0)
            if float(np.abs(new_c - centroids).max()) < 1e-12:
                centroids = new_c
                break
            centroids = new_c
    else:
        centroids, _ = kmeans_fit(embeddings, k=k, iters=iters)
    probes = min(probes, len(centroids))
    c_ref = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids, m = _batch_matrix(batch)
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * m @ c.T
            + (c * c).sum(axis=1)[None, :]
        )
        near = np.argsort(d2, axis=1)[:, :probes]
        idx = np.repeat(np.arange(len(ids)), probes)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, probes), type=pa.int64()),
                "cluster": pa.array(near.ravel(), type=pa.int64()),
                "embedding": batch.column("embedding").take(pa.array(idx)),
            }
        )

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sims = m @ m.T
        r, c = np.nonzero(sims >= threshold)
        keep = ids[r] < ids[c]
        lo, hi = ids[r[keep]], ids[c[keep]]
        return pd.DataFrame(
            {
                "vec_a": pd.Series(lo, dtype="int64"),
                "vec_b": pd.Series(hi, dtype="int64"),
                "cos_sim": pd.Series(
                    _round_half_away(sims[r[keep], c[keep]], 6),
                    dtype="float64",
                ),
            }
        )

    out = (
        embeddings.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cluster_pairs, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(_EMPTY_PAIRS)
    return (
        out.drop_duplicates(["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
