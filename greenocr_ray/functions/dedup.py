"""Deduplication operators for large text corpora.

- exact:      content-hash -> groupby(hash) -> keep min doc_id
- minhash:    shingle -> minhash -> LSH bands -> bucket groupby ->
              candidate pairs -> Jaccard verify
- simhash:    64-bit simhash per doc; near-dups = small Hamming distance
              within 4 rotated 16-bit band buckets (multi-probe)
- ngram_jaccard: verified Jaccard similarity on candidate pairs

Scale shape: all candidate generation is map_batches + ONE groupby on a
bucket key (bands/prefixes); pairwise work happens only inside small
groups, never all-pairs. Hashes are seeded/stable (no Python hash()).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..rayutil import drop_empty_blocks
from .relational import round_half_away

_TOKEN_RE = re.compile(r"\w+")

# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return batch.append_column("text_md5", pa.array(hashes, type=pa.string()))


def exact_dedup_groups(docs: rd.Dataset) -> rd.Dataset:
    """-> (text_md5, keeper, n_copies): one row per distinct text, the
    kept doc is the min doc_id (G7 take-first semantics)."""
    hashed = docs.map_batches(add_content_hash, batch_format="pyarrow")

    # pre-aggregate per batch, then a small groupby over partials
    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["text_md5", "doc_id"]).to_pandas()
        g = df.groupby("text_md5", sort=False)["doc_id"].agg(["min", "size"])
        return g.rename(columns={"min": "keeper", "size": "n_copies"}).reset_index()

    parts = hashed.map_batches(partial, batch_format="pyarrow")
    # adaptive combine (same policy as minhash candidate generation):
    # partial rows are ~50 bytes each, so below the threshold a driver
    # fold beats the shuffle's fixed actor cost; past it the hash
    # shuffle is the scale path (keys are data-sized)
    parts = parts.materialize()
    if parts.count() <= _BAND_ROWS_DRIVER_LIMIT:
        df = parts.to_pandas()
        out = (
            df.groupby("text_md5", sort=False)
            .agg(keeper=("keeper", "min"), n_copies=("n_copies", "sum"))
            .reset_index()
        )
        return rd.from_pandas(out)
    from ray.data.aggregate import Min, Sum

    return parts.groupby("text_md5").aggregate(
        Min("keeper", alias_name="keeper"), Sum("n_copies", alias_name="n_copies")
    )


def duplicated_group_keepers(groups: rd.Dataset) -> dict[str, int]:
    """(text_md5 -> keeper doc_id) for DUPLICATED groups only — the
    broadcastable small side of the dedup filter. Its size is the
    number of distinct duplicated texts (≈ n_dups), NOT corpus
    cardinality: a mostly-unique 100 TB crawl broadcasts megabytes."""
    out: dict[str, int] = {}
    for b in groups.iter_batches(batch_format="pyarrow"):
        mask = pc.greater(b.column("n_copies"), 1)
        dups = b.filter(mask)
        for m, k in zip(
            dups.column("text_md5").to_pylist(), dups.column("keeper").to_pylist()
        ):
            out[m] = k
    return out


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Dataset with duplicate-text rows dropped (keep min doc_id).

    Scale shape: only the DROP side is broadcast — a dict of
    (text_md5 -> keeper) for groups with n_copies > 1, built from the
    grouped partials. Rows whose hash isn't in the dict are unique and
    pass untouched; rows in a duplicated group pass iff they are the
    keeper. (The previous form broadcast one entry per DISTINCT text —
    corpus cardinality — which cannot ship at 100 TB.)"""
    import ray

    groups = exact_dedup_groups(docs)
    drop_ref = ray.put(duplicated_group_keepers(groups))

    def filt(t: pa.Table) -> pa.Table:
        keepers = ray.get(drop_ref)
        if not keepers:
            return t
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_pylist()
        keep = [
            (k := keepers.get(hashlib.md5(s.encode()).hexdigest())) is None
            or k == i
            for s, i in zip(texts, ids)
        ]
        return t.filter(pa.array(keep))

    return docs.map_batches(filt, batch_format="pyarrow")


# -------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)

# ~5M band rows = ~100 MB with ids: below this a driver fold beats the
# shuffle's fixed actor cost; above it the hash shuffle is the scale path
_BAND_ROWS_DRIVER_LIMIT = 5_000_000


class MinHasher:
    """Stateful shingler+minhasher: permutation coefficients are built
    once per actor (the stateful-stage pattern)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 1337):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def shingles(self, text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall(text.lower())
        if len(toks) < self.k:
            toks = toks + [""] * (self.k - len(toks))
        sh = {
            zlib.crc32(" ".join(toks[i : i + self.k]).encode())
            for i in range(len(toks) - self.k + 1)
        }
        return np.fromiter(sh, dtype=np.uint64, count=len(sh))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*x + b) mod p for each permutation; min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": [row.tobytes() for row in sigs],
            }
        )


_HASHER_CACHE: dict = {}


def _cached_minhasher(num_perm: int) -> "MinHasher":
    """One MinHasher per (worker process, num_perm) — task-based
    stages reuse it across batches exactly like actor state, without
    paying actor-pool spin-up."""
    mh = _HASHER_CACHE.get(("minhash", num_perm))
    if mh is None:
        mh = MinHasher(num_perm=num_perm)
        _HASHER_CACHE[("minhash", num_perm)] = mh
    return mh


def _cached_simhasher() -> "SimHasher":
    """Worker-process SimHasher singleton: its cross-batch token-hash
    cache survives task reuse the same way actor state would."""
    sh = _HASHER_CACHE.get("simhash")
    if sh is None:
        sh = SimHasher()
        _HASHER_CACHE["simhash"] = sh
    return sh


def _band_rows(batch: pa.Table, num_perm: int, bands: int) -> pa.Table:
    """signature -> one row per (band_id, band_hash) — the LSH explode."""
    rows_per_band = num_perm // bands
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("signature").to_pylist()
    out_doc, out_band, out_hash = [], [], []
    for d, s in zip(doc_ids, sigs):
        sig = np.frombuffer(s, dtype=np.uint64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            out_doc.append(d)
            out_band.append(b)
            out_hash.append(zlib.crc32(chunk.tobytes()))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
        }
    )


def _jaccard_sets(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def jaccard(a: str, b: str, k: int = 3) -> float:
    mh = MinHasher(shingle_k=k)
    return _jaccard_sets(set(mh.shingles(a).tolist()), set(mh.shingles(b).tolist()))


# verified-pair jaccard: below this many candidate pairs the texts are
# candidate-bounded and fold on the driver; above it the verification
# runs distributed (shingle sets joined onto pair halves via bucketed
# groupbys — nothing text-sized ever collects on the driver)
_PAIR_DRIVER_LIMIT = 100_000


def _empty_pairs_df() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64")}
    )


def _pair_bucket(a: np.ndarray, b: np.ndarray, nbuckets: int) -> np.ndarray:
    """Deterministic pair->bucket hash; all copies of (a, b) land in
    one bucket, so one groupby dedupes or co-locates a pair."""
    return ((a * np.int64(1_000_003) + b) % nbuckets).astype(np.int32)


def _final_collect(ds: rd.Dataset) -> pd.DataFrame:
    """The distributed dedup pipelines' ONLY driver collection — the
    final (thresholded) output. Kept as a named seam so tests can
    assert nothing pair-shaped reaches the driver before it."""
    return ds.to_pandas()


def distinct_pairs(
    cand: rd.Dataset, nbuckets: int = 32, force_distributed: bool = False
) -> rd.Dataset:
    """Distinct (doc_a, doc_b) rows AS A DATASET. A pair can fire in
    several LSH bands/blockers; all copies hash to one bucket, so ONE
    groupby dedupes without any driver-side pair frame. Below the pair
    limit a driver fold beats the shuffle's fixed actor cost (the
    result is still returned as a Dataset)."""
    # candidate sources end in map_groups, whose empty hash partitions
    # emit schema-less blocks that poison the next hash shuffle's
    # schema broadcast (Ray 2.49.2); drop them at the seam
    cand = drop_empty_blocks(cand.materialize())
    if cand.count() <= _PAIR_DRIVER_LIMIT and not force_distributed:
        df = cand.to_pandas()
        if len(df) == 0:
            return rd.from_pandas(_empty_pairs_df())
        return rd.from_pandas(
            df[["doc_a", "doc_b"]].drop_duplicates().reset_index(drop=True)
        )

    def bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "_bucket": pa.array(_pair_bucket(a, b, nbuckets)),
            }
        )

    # typed-arrow group output (empty pandas groups lose their schema
    # in Ray 2.49.2's hash-shuffle aggregators)
    def uniq(g: pd.DataFrame) -> pa.Table:
        u = g[["doc_a", "doc_b"]].drop_duplicates()
        return pa.table(
            {
                "doc_a": pa.array(u["doc_a"], type=pa.int64()),
                "doc_b": pa.array(u["doc_b"], type=pa.int64()),
            }
        )

    out = (
        cand.map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=nbuckets)
        .map_groups(uniq, batch_format="pandas")
        # break the plan: downstream verification adds two more hash
        # shuffles, and >1 HashShuffleOperator in one streaming plan
        # deadlocks small clusters (Ray 2.49.2)
        .materialize()
    )
    return drop_empty_blocks(out)


def verified_pairs(
    docs: rd.Dataset,
    cand: rd.Dataset,
    k: int = 3,
    nbuckets: int = 32,
    threshold: float | None = None,
) -> rd.Dataset:
    """Exact k-gram Jaccard for every candidate pair — END-TO-END
    DISTRIBUTED: shingle sets are computed per doc inside map_batches,
    attached to pair halves via a doc-bucketed groupby, then regrouped
    per pair to score. Candidates, shingles and scores only ever move
    through task-based shuffles; the driver never holds a pair frame
    (VERDICT r2 item 1). With ``threshold`` set, only pairs whose
    ROUNDED (6 dp) Jaccard clears it are emitted, so the output is
    result-bounded, not candidate-bounded.

    Scale note: every doc is shingled (one cheap vectorizable pass) and
    the shingle sets cross one exchange — a corpus-sized SHUFFLE
    replacing the corpus-sized driver BROADCAST of needed ids; at
    high-dup crawl scale the candidate doc set approaches the corpus
    anyway, so there is nothing to prune."""
    mh = MinHasher(shingle_k=k)

    def halves(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        doc = np.column_stack([a, b]).ravel()
        return pa.table(
            {
                "doc_a": pa.array(np.repeat(a, 2)),
                "doc_b": pa.array(np.repeat(b, 2)),
                "doc_id": pa.array(doc),
                "_bucket": pa.array((doc % nbuckets).astype(np.int32)),
                "shingles": pa.nulls(len(doc), type=pa.binary()),
                "_side": pa.array(["H"] * len(doc), type=pa.string()),
            }
        )

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sh = [mh.shingles(x).tobytes() for x in t.column("text").to_pylist()]
        n = len(ids)
        return pa.table(
            {
                "doc_a": pa.array([-1] * n, type=pa.int64()),
                "doc_b": pa.array([-1] * n, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "_bucket": pa.array(
                    [i % nbuckets for i in ids], type=pa.int32()
                ),
                "shingles": pa.array(sh, type=pa.binary()),
                "_side": pa.array(["S"] * n, type=pa.string()),
            }
        )

    def attach(g: pd.DataFrame) -> pa.Table:
        smap = dict(
            zip(g.loc[g["_side"] == "S", "doc_id"],
                g.loc[g["_side"] == "S", "shingles"])
        )
        h = g[g["_side"] == "H"]
        a = h["doc_a"].to_numpy(dtype=np.int64)
        b = h["doc_b"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "_pb": pa.array(_pair_bucket(a, b, nbuckets)),
                "shingles": pa.array(
                    [smap.get(d) for d in h["doc_id"]], type=pa.binary()
                ),
            }
        )

    def score(g: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for (a, b), pg in g.groupby(["doc_a", "doc_b"], sort=False):
            sets = [
                set(np.frombuffer(x, dtype=np.uint64).tolist())
                if x is not None
                else set()
                for x in pg["shingles"]
            ]
            while len(sets) < 2:  # a half lost its doc (missing text)
                sets.append(set())
            j = _jaccard_sets(sets[0], sets[1])
            if threshold is not None:
                j = float(round_half_away(j, 6))
                if j < threshold:
                    continue
            out_a.append(int(a))
            out_b.append(int(b))
            out_s.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    attached = (
        cand.map_batches(halves, batch_format="pyarrow")
        .union(docs.map_batches(shingle_rows, batch_format="pyarrow"))
        .groupby("_bucket", num_partitions=nbuckets)
        .map_groups(attach, batch_format="pandas")
        # break the plan between the two hash shuffles (see above)
        .materialize()
    )
    # map_groups emits SCHEMA-LESS empty blocks for its empty hash
    # partitions; if one of those shuffles first into the next groupby,
    # Ray broadcasts the EMPTY schema and the aggregators' key-sort
    # crashes ("No match for FieldRef.Name(doc_a)", Ray 2.49.2).
    attached = drop_empty_blocks(attached)
    return attached.groupby("_pb", num_partitions=nbuckets).map_groups(
        score, batch_format="pandas"
    )


def pair_jaccards(
    docs: rd.Dataset,
    cand: pd.DataFrame,
    k: int = 3,
    force_distributed: bool = False,
    nbuckets: int = 32,
) -> np.ndarray:
    """Exact k-gram Jaccard for each (doc_a, doc_b) candidate pair,
    aligned to ``cand`` row order.

    Driver path (small candidate sets): fetch only the candidate docs'
    texts (``pc.is_in`` filtered, candidate-bounded) and verify in a
    loop. Distributed path: delegate to ``verified_pairs`` and merge
    the scored pairs back onto the candidate frame."""
    import ray

    if len(cand) == 0:
        return np.array([], dtype=np.float64)
    if len(cand) <= _PAIR_DRIVER_LIMIT and not force_distributed:
        needed = set(cand["doc_a"]) | set(cand["doc_b"])
        need_arr = ray.put(pa.array(sorted(needed), type=pa.int64()))

        def grab(t: pa.Table) -> pa.Table:
            return t.select(["doc_id", "text"]).filter(
                pc.is_in(t.column("doc_id"), ray.get(need_arr))
            )

        texts = {
            r["doc_id"]: r["text"]
            for r in docs.map_batches(grab, batch_format="pyarrow").take_all()
        }
        return np.array(
            [jaccard(texts[a], texts[b], k=k)
             for a, b in zip(cand["doc_a"], cand["doc_b"])]
        )

    cand_ds = rd.from_pandas(
        cand[["doc_a", "doc_b"]].reset_index(drop=True)
    )
    scored = _final_collect(
        verified_pairs(docs, cand_ds, k=k, nbuckets=nbuckets)
    )
    merged = cand[["doc_a", "doc_b"]].merge(
        scored, on=["doc_a", "doc_b"], how="left"
    )
    return merged["jaccard_sim"].to_numpy()


def minhash_candidate_pairs(
    docs: rd.Dataset, num_perm: int = 64, bands: int = 16
) -> rd.Dataset:
    """LSH candidate pairs -> (doc_a, doc_b) rows, doc_a < doc_b; a
    pair appears ONCE PER FIRING BAND (dedupe happens driver-side in
    ``minhash_dedup_pairs``, where the pair count is already small)."""
    # task-based stage with a worker-process-cached hasher: the
    # MinHasher's only construct state is two 64-int coefficient
    # arrays (microseconds), so an actor POOL paid ~2 s of spin-up per
    # query for nothing — tasks schedule elastically and the cached
    # instance persists in each reused worker process
    def sig_batch(t: pa.Table) -> pa.Table:
        return _cached_minhasher(num_perm)(t)

    sigs = docs.map_batches(sig_batch, batch_format="pyarrow")
    banded = sigs.map_batches(
        lambda t: _band_rows(t, num_perm, bands), batch_format="pyarrow"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    # adaptive strategy: the band rows are 20 bytes each — when the
    # whole banded table is small (sub-~100 MB), a Ray groupby pays
    # seconds of shuffle-actor fixed cost to co-locate megabytes, so
    # stream the rows to the driver and bucket with one pandas groupby
    # instead. Past the threshold, the genuine hash shuffle takes over
    # (the scale path: pairwise work only ever happens inside buckets).
    banded = banded.materialize()  # count + fetch without re-executing
    n_rows = banded.count()
    if n_rows <= _BAND_ROWS_DRIVER_LIMIT:
        df = banded.to_pandas()
        frames = [
            pairs_in_bucket(g)
            for _, g in df.groupby(["band_id", "band_hash"], sort=False)
            if len(g) > 1
        ]
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        )
        return rd.from_pandas(out)
    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    return cand


def _verify_and_threshold(
    docs: rd.Dataset,
    cand_ds: rd.Dataset,
    threshold: float,
    k: int,
    force_distributed: bool,
) -> pd.DataFrame:
    """Shared verify step: exact Jaccard each distinct candidate pair,
    keep rounded sims >= threshold. Small candidate sets verify via the
    driver path; past the limit (or forced) the WHOLE flow — dedupe,
    shingle attach, scoring, thresholding — is Dataset-native and only
    the final thresholded pairs are collected (VERDICT r2 item 1)."""
    cand_ds = cand_ds.materialize()
    n_cand = cand_ds.count()
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "jaccard_sim": pd.Series([], dtype="float64")}
    )
    if n_cand == 0:
        return empty
    if n_cand <= _PAIR_DRIVER_LIMIT and not force_distributed:
        cand = cand_ds.to_pandas()[["doc_a", "doc_b"]].reset_index(drop=True)
        sims = pair_jaccards(docs, cand, k=k)
        cand = cand.assign(jaccard_sim=round_half_away(sims, 6))
        out = cand[cand["jaccard_sim"] >= threshold]
    else:
        out = _final_collect(
            verified_pairs(docs, cand_ds, k=k, threshold=threshold)
        )
        if len(out) == 0:
            return empty
    return (
        out[["doc_a", "doc_b", "jaccard_sim"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def minhash_dedup_pairs(
    docs: rd.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    force_distributed: bool = False,
) -> pd.DataFrame:
    """Verified near-duplicate pairs: LSH candidates (a pair fires once
    per matching band) -> Dataset-native distinct -> exact Jaccard
    verify -> threshold. No raw candidate-pair frame ever lands on the
    driver on the distributed path."""
    raw = minhash_candidate_pairs(docs, num_perm, bands)
    cand_ds = distinct_pairs(raw, force_distributed=force_distributed)
    return _verify_and_threshold(
        docs, cand_ds, threshold, k=3, force_distributed=force_distributed
    )


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash over token crc32 features. Stateful: the
    token->hash cache persists across batches (an actor-pool stage), so
    repeated vocabulary costs one crc32 pair ever per actor."""

    def __init__(self):
        self.bits = 64
        self._cache: dict[str, int] = {}
        self._bitpos = np.arange(64, dtype=np.uint64)

    _CACHE_CAP = 500_000  # bound actor memory on high-entropy vocab

    def _token_hash(self, t: str) -> int:
        h = self._cache.get(t)
        if h is None:
            h = zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
            if len(self._cache) < self._CACHE_CAP:
                self._cache[t] = h
        return h

    def simhash(self, text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        hs = np.fromiter(
            (self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        # vectorized bit vote: unpack all 64 bits of every token hash
        bits = (hs[:, None] >> self._bitpos[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) << self._bitpos).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hashes = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(hashes),
                # 16-bit prefix bucket for near-dup candidate grouping
                "bucket": pa.array((hashes >> np.uint64(48)).astype(np.int32)),
            }
        )


def simhash_table(docs: rd.Dataset) -> rd.Dataset:
    # task-based (see _cached_minhasher): the token-hash cache lives in
    # the worker process, so it still persists across batches without
    # actor-pool spin-up cost
    return docs.map_batches(
        lambda t: _cached_simhasher()(t), batch_format="pyarrow"
    )


_SIM_BANDS = 4  # 4 x 16-bit bands over the 64-bit simhash


def _simhash_band_rows(t: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> 4 rows per doc, one per 16-bit band —
    multi-probe blocking: a candidate pair fires if ANY band matches.
    Pigeonhole guarantee: a pair within Hamming distance d < 4 has at
    least one band with zero flipped bits, so recall is EXACT for
    max_hamming <= 3 (the single top-prefix bucket this replaces
    silently missed pairs whose flips landed in the top 16 bits)."""
    hs = t.column("simhash").to_numpy().astype(np.uint64)
    n = len(hs)
    doc = np.repeat(t.column("doc_id").to_numpy(), _SIM_BANDS)
    sim = np.repeat(hs, _SIM_BANDS)
    band = np.tile(np.arange(_SIM_BANDS, dtype=np.int32), n)
    vals = (sim >> (np.uint64(16) * band.astype(np.uint64))) & np.uint64(0xFFFF)
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "simhash": pa.array(sim),
            "band_id": pa.array(band),
            "band_val": pa.array(vals.astype(np.int32)),
        }
    )


def simhash_near_dups(docs: rd.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming; candidates
    from 4 rotated 16-bit band buckets (exact recall for
    max_hamming <= 3, high recall above). A pair can fire in several
    bands; the dedupe folds on the small pair set."""
    return simhash_near_dups_from_table(simhash_table(docs), max_hamming)


def simhash_near_dups_from_table(
    tbl: rd.Dataset, max_hamming: int = 3
) -> pd.DataFrame:
    """Pair-finding half of ``simhash_near_dups`` over a precomputed
    (doc_id, simhash) table."""
    raw = simhash_pair_candidates(tbl, max_hamming).to_pandas()
    out = raw.drop_duplicates(["doc_a", "doc_b"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_pair_candidates(
    tbl: rd.Dataset, max_hamming: int = 3
) -> rd.Dataset:
    """(doc_a, doc_b, hamming) candidate rows AS A DATASET (a pair can
    fire in several bands — dedupe downstream with ``distinct_pairs``
    or a driver drop_duplicates on small results)."""
    banded = tbl.map_batches(_simhash_band_rows, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    rows.append((a, b, d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]) if rows else \
            pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64"),
                          "hamming": pd.Series([], dtype="int64")})

    # adaptive combine, same policy as the minhash bands: band rows are
    # ~20 bytes, so small tables bucket on the driver instead of paying
    # the shuffle's fixed actor cost; past the limit the genuine
    # groupby shuffle is the scale path
    banded = banded.materialize()
    if banded.count() <= _BAND_ROWS_DRIVER_LIMIT:
        df = banded.to_pandas()
        frames = [
            pairs(g)
            for _, g in df.groupby(["band_id", "band_val"], sort=False)
            if len(g) > 1
        ]
        raw = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pairs(pd.DataFrame({"doc_id": [], "simhash": []}))
        )
        return rd.from_pandas(raw)
    return banded.groupby(["band_id", "band_val"]).map_groups(
        pairs, batch_format="pandas"
    )


# ------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    max_hamming: int = 8,
    num_perm: int = 64,
    lsh_bands: int = 32,
    force_distributed: bool = False,
) -> pd.DataFrame:
    """Verified n-gram-Jaccard near-dup pairs.

    Candidates are the UNION of two blockers — simhash band buckets
    (pairs within ``max_hamming`` bits; catches token-frequency-similar
    reorderings) and a high-recall minhash LSH tuned for low
    thresholds (rows-per-band = num_perm/lsh_bands = 2: miss
    probability (1-s^2)^32 ≈ 1e-4 at s = 0.5). Hamming distance gates
    CANDIDATE GENERATION only; the output filter is the exact k-gram
    Jaccard — a true pair blocked by one scheme is found by the other.
    Both blockers stay Datasets end-to-end: union -> one groupby
    dedupe -> distributed shingle-join verify -> threshold; only the
    final thresholded pairs reach the driver (small candidate sets
    take the cheaper driver verify)."""
    cand_sim = simhash_pair_candidates(
        simhash_table(docs), max_hamming=max_hamming
    )

    def strip_hamming(t: pa.Table) -> pa.Table:
        return t.select(["doc_a", "doc_b"])

    # materialize each blocker before the union: both end in hash
    # groupbys, and two HashShuffleOperators in one streaming plan
    # deadlock small clusters (Ray 2.49.2)
    cand_sim = cand_sim.map_batches(
        strip_hamming, batch_format="pyarrow"
    ).materialize()
    cand_mh = minhash_candidate_pairs(docs, num_perm, lsh_bands).materialize()
    cand_ds = distinct_pairs(
        cand_sim.union(cand_mh), force_distributed=force_distributed
    )
    return _verify_and_threshold(
        docs, cand_ds, threshold, k=k, force_distributed=force_distributed
    )


# ----------------------------------- transitive dedup groups (CC)


def _cc_driver(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over a small pair frame (path-compressed)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    return pd.DataFrame(
        {
            "doc_id": pd.array(nodes, dtype="int64"),
            "group_id": pd.array([find(n) for n in nodes], dtype="int64"),
        }
    )


def _cc_state_checksum(state: rd.Dataset) -> tuple[int, int]:
    """(row_count, order-independent hash) fold for convergence
    detection — O(#blocks) driver rows."""

    def partial(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy().astype(np.uint64)
        m = t.column("member").to_numpy().astype(np.uint64)
        h = (n * np.uint64(0x9E3779B97F4A7C15)) ^ (m * np.uint64(1000003))
        return pa.table(
            {
                "n": pa.array([len(t)], type=pa.int64()),
                "h": pa.array([int(np.bitwise_xor.reduce(h)) if len(h) else 0],
                              type=pa.uint64()),
            }
        )

    df = state.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(df["n"].sum()), int(np.bitwise_xor.reduce(df["h"].to_numpy().astype(np.uint64))) if len(df) else 0


def _cc_distributed(
    edges: rd.Dataset, nbuckets: int = 32, max_iters: int = 16
) -> pd.DataFrame:
    """Hash-to-Min connected components (Rastogi et al. 2013): state is
    flat (node, member) rows meaning member ∈ C(node); each round a
    single hash groupby on node computes m = min C(v) and re-emits
    (m, u) and (u, m) for u ∈ C(v). Converges in O(log diameter)
    rounds to C(min) = the full component and C(u≠min) = {min}. No
    joins — the only exchange per round is the groupby — and each
    round materializes (bounded state, two HashShuffleOperators in one
    plan deadlock small clusters)."""

    def seed(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b, a, b]), type=pa.int64()),
                "member": pa.array(np.concatenate([b, a, a, b]), type=pa.int64()),
            }
        )

    def spread(g: pd.DataFrame) -> pa.Table:
        # v ∈ C(v) must hold, or a node whose set collapses to {min}
        # stops re-emitting its own row and vanishes from the labels
        members = np.unique(
            np.append(g["member"].to_numpy(), int(g["node"].iloc[0]))
        )
        m = int(members.min())
        out_node = np.concatenate([np.full(len(members), m), members])
        out_member = np.concatenate([members, np.full(len(members), m)])
        return pa.table(
            {
                "node": pa.array(out_node, type=pa.int64()),
                "member": pa.array(out_member, type=pa.int64()),
            }
        )

    state = edges.map_batches(seed, batch_format="pyarrow").materialize()
    prev = None
    for _ in range(max_iters):
        state = (
            state.groupby("node", num_partitions=nbuckets)
            .map_groups(spread, batch_format="pandas")
            .materialize()
        )
        cur = _cc_state_checksum(state)
        if cur == prev:
            break
        prev = cur

    def label_partial(g: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([int(g["node"].iloc[0])], type=pa.int64()),
                "group_id": pa.array([int(g["member"].min())], type=pa.int64()),
            }
        )

    out = (
        state.groupby("node", num_partitions=nbuckets)
        .map_groups(label_partial, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def connected_dedup_groups(
    pairs: pd.DataFrame | rd.Dataset, force_distributed: bool = False
) -> pd.DataFrame:
    """Transitive closure of near-dup pairs into dedup groups:
    (doc_id, group_id = smallest doc_id in the component) for every
    doc that appears in at least one pair. The step dedup pipelines
    need between pairwise detection and keep-one-per-group filtering.

    Adaptive like pair_jaccards: union-find on the driver below
    _PAIR_DRIVER_LIMIT edges, Hash-to-Min label propagation
    (groupby-only, O(log diameter) rounds) above it.
    """
    if isinstance(pairs, rd.Dataset):
        n = pairs.count()
        if n == 0:
            return pd.DataFrame(columns=["doc_id", "group_id"])
        if n <= _PAIR_DRIVER_LIMIT and not force_distributed:
            return _cc_driver(pairs.select_columns(["doc_a", "doc_b"]).to_pandas())
        return _cc_distributed(pairs)
    if len(pairs) == 0:
        return pd.DataFrame(columns=["doc_id", "group_id"])
    if len(pairs) <= _PAIR_DRIVER_LIMIT and not force_distributed:
        return _cc_driver(pairs)
    return _cc_distributed(rd.from_pandas(pairs[["doc_a", "doc_b"]]))


def keep_best_per_group(
    groups: pd.DataFrame | rd.Dataset,
    docs: rd.Dataset,
    score_col: str = "n_chars",
) -> pd.DataFrame | rd.Dataset:
    """Quality-aware representative selection for near-dup groups:
    within each transitive dedup group keep the HIGHEST-scoring member
    (ties -> lowest doc_id) instead of the arbitrary lowest-id doc —
    the curation rule real pipelines want (keep the longest / most
    complete variant of a near-duplicated page).

    Adaptive like connected_dedup_groups: a pd.DataFrame ``groups``
    (bounded near-dup set) broadcasts a SORTED member id array and
    fetches scores with one streaming semi-join pass (np.isin per
    batch — no per-row Python) and folds the argmax in pandas on the
    bounded frame, returning a pd.DataFrame. A Dataset ``groups``
    (heavily duplicated crawl, membership too large to broadcast)
    takes the fully distributed path — doc-hash bucket semi-join then
    group-hash bucket argmax, two exchanges, nothing on the driver —
    and returns a Dataset.
    -> (doc_id, group_id, score, keep) sorted by doc_id.
    """
    import ray

    if isinstance(groups, rd.Dataset):
        return _keep_best_distributed(groups, docs, score_col)
    if not len(groups):
        return pd.DataFrame(columns=["doc_id", "group_id", "score", "keep"])
    members_ref = ray.put(
        np.unique(groups["doc_id"].to_numpy(dtype=np.int64))
    )

    def member_scores(t: pa.Table) -> pa.Table:
        members = ray.get(members_ref)  # sorted unique int64 array
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mask = np.isin(ids, members)
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], type=pa.int64()),
                "score": pc.cast(
                    t.column(score_col).filter(pa.array(mask)), pa.int64()
                ),
            }
        )

    scores = (
        docs.map_batches(member_scores, batch_format="pyarrow")
        .to_pandas()
    )
    out = groups.merge(scores, on="doc_id", how="left")
    out["score"] = out["score"].fillna(0).astype("int64")
    out = out.sort_values(
        ["group_id", "score", "doc_id"], ascending=[True, False, True]
    )
    out["keep"] = out.groupby("group_id", sort=False).cumcount() == 0
    out["doc_id"] = out["doc_id"].astype("int64")
    out["group_id"] = out["group_id"].astype("int64")
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "group_id", "score", "keep"]]
    )


def _keep_best_distributed(
    groups: rd.Dataset,
    docs: rd.Dataset,
    score_col: str,
    nbuckets: int = 32,
) -> rd.Dataset:
    """No-broadcast :func:`keep_best_per_group`: membership rows and
    (doc_id, score) rows meet in doc-hash bucket tasks (a distributed
    semi-join — the corpus ships one 16-byte row per doc, ONCE), then
    scored members re-bucket by group hash for a vectorized in-bucket
    argmax. Two exchanges, output bounded by |groups|; nothing lands
    on the driver. Used when the near-dup group set itself is too
    large to broadcast (a heavily duplicated crawl)."""
    from ..rayutil import covering_bucket_values

    num_partitions = min(nbuckets, 8)

    def g_rows(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (d % nbuckets).astype(np.int32), type=pa.int32()
                ),
                "doc_id": pa.array(d, type=pa.int64()),
                "group_id": pc.cast(t.column("group_id"), pa.int64()),
                "score": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(d), np.int8), pa.int8()),
            }
        )

    def s_rows(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (d % nbuckets).astype(np.int32), type=pa.int32()
                ),
                "doc_id": pa.array(d, type=pa.int64()),
                "group_id": pa.array(np.full(len(d), -1, np.int64)),
                "score": pc.cast(t.column(score_col), pa.int64()),
                "kind": pa.array(np.ones(len(d), np.int8), pa.int8()),
            }
        )

    svals = covering_bucket_values(nbuckets, num_partitions)
    sent = pa.table(
        {
            "bucket": pa.array(svals, type=pa.int32()),
            "doc_id": pa.array([-1] * len(svals), type=pa.int64()),
            "group_id": pa.array([-1] * len(svals), type=pa.int64()),
            "score": pa.array([0] * len(svals), type=pa.int64()),
            "kind": pa.array([-1] * len(svals), type=pa.int8()),
        }
    )

    def semi_join(g: pd.DataFrame) -> pa.Table:
        mem = g[g["kind"] == 0]
        if not len(mem):
            # typed carrier (group_id -1, filtered in the argmax task)
            return pa.table(
                {
                    "gbucket": pa.array([0], type=pa.int32()),
                    "doc_id": pa.array([-1], type=pa.int64()),
                    "group_id": pa.array([-1], type=pa.int64()),
                    "score": pa.array([0], type=pa.int64()),
                }
            )
        sc = g[g["kind"] == 1]
        j = mem[["doc_id", "group_id"]].merge(
            sc[["doc_id", "score"]], on="doc_id", how="left"
        )
        j["score"] = j["score"].fillna(0).astype("int64")
        gid = j["group_id"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "gbucket": pa.array(
                    (gid % nbuckets).astype(np.int32), type=pa.int32()
                ),
                "doc_id": pa.array(
                    j["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "group_id": pa.array(gid, type=pa.int64()),
                "score": pa.array(
                    j["score"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
            }
        )

    gsent = pa.table(
        {
            "gbucket": pa.array(svals, type=pa.int32()),
            "doc_id": pa.array([-1] * len(svals), type=pa.int64()),
            "group_id": pa.array([-1] * len(svals), type=pa.int64()),
            "score": pa.array([0] * len(svals), type=pa.int64()),
        }
    )

    def argmax(t: pa.Table) -> pa.Table:
        gid = t.column("group_id").to_numpy(zero_copy_only=False)
        mask = gid >= 0
        if not mask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "group_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.int64()),
                    "keep": pa.array([], type=pa.bool_()),
                }
            )
        gid = gid[mask]
        did = t.column("doc_id").to_numpy(zero_copy_only=False)[mask]
        sc = t.column("score").to_numpy(zero_copy_only=False)[mask]
        # (group asc, score desc, doc asc): first row per group wins
        order = np.lexsort((did, -sc, gid))
        gid, did, sc = gid[order], did[order], sc[order]
        first = np.empty(len(gid), dtype=bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table(
            {
                "doc_id": pa.array(did, type=pa.int64()),
                "group_id": pa.array(gid, type=pa.int64()),
                "score": pa.array(sc, type=pa.int64()),
                "keep": pa.array(first, type=pa.bool_()),
            }
        )

    scored = (
        groups.map_batches(g_rows, batch_format="pyarrow")
        .union(docs.map_batches(s_rows, batch_format="pyarrow"))
        .union(rd.from_arrow(sent))
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(semi_join, batch_format="pandas")
    )
    return (
        scored.union(rd.from_arrow(gsent))
        .groupby("gbucket", num_partitions=num_partitions)
        .map_groups(argmax, batch_format="pyarrow")
    )
