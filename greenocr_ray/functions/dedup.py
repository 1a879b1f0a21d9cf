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


def pair_jaccards(
    docs: rd.Dataset,
    cand: pd.DataFrame,
    k: int = 3,
    force_distributed: bool = False,
    nbuckets: int = 32,
) -> np.ndarray:
    """Exact k-gram Jaccard for each (doc_a, doc_b) candidate pair.

    Driver path (small candidate sets): fetch only the candidate docs'
    texts (``pc.is_in`` filtered, candidate-bounded) and verify in a
    loop. Distributed path: compute shingle sets for candidate docs in
    map_batches, attach them to pair halves with a doc-bucketed
    groupby, then regroup by pair to score — two task-based shuffles,
    no JoinOperator, no driver text collection."""
    import ray

    if len(cand) == 0:
        return np.array([], dtype=np.float64)
    mh = MinHasher(shingle_k=k)
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

    pair_ids = np.arange(len(cand), dtype=np.int64)
    half_docs = np.column_stack(
        [cand["doc_a"].to_numpy(), cand["doc_b"].to_numpy()]
    ).ravel().astype(np.int64)
    halves = pa.table(
        {
            "pair_id": pa.array(np.repeat(pair_ids, 2)),
            "doc_id": pa.array(half_docs),
            "_bucket": pa.array(
                (half_docs % nbuckets).astype(np.int32)
            ),
            "shingles": pa.nulls(len(half_docs), type=pa.binary()),
            "_side": pa.array(["H"] * len(half_docs), type=pa.string()),
        }
    )
    need_arr = ray.put(
        pa.array(np.unique(half_docs), type=pa.int64())
    )

    def shingle_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("doc_id"), ray.get(need_arr)))
        ids = t.column("doc_id").to_pylist()
        sh = [mh.shingles(x).tobytes() for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "pair_id": pa.array([-1] * len(ids), type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "_bucket": pa.array(
                    [i % nbuckets for i in ids], type=pa.int32()
                ),
                "shingles": pa.array(sh, type=pa.binary()),
                "_side": pa.array(["S"] * len(ids), type=pa.string()),
            }
        )

    sh_ds = docs.map_batches(shingle_rows, batch_format="pyarrow")

    # group fns return TYPED ARROW tables: an empty pandas frame loses
    # its schema in Ray's hash-shuffle aggregators (ArrowInvalid "No
    # match for FieldRef" at finalize, Ray 2.49.2); typed arrow keeps
    # empty groups well-schemaed
    def attach(g: pd.DataFrame) -> pa.Table:
        smap = dict(
            zip(g.loc[g["_side"] == "S", "doc_id"],
                g.loc[g["_side"] == "S", "shingles"])
        )
        h = g[g["_side"] == "H"]
        return pa.table(
            {
                "pair_id": pa.array(h["pair_id"], type=pa.int64()),
                "shingles": pa.array(
                    [smap.get(d) for d in h["doc_id"]], type=pa.binary()
                ),
            }
        )

    def score(g: pd.DataFrame) -> pa.Table:
        out_p, out_s = [], []
        for pid, pg in g.groupby("pair_id", sort=False):
            sets = [
                set(np.frombuffer(b, dtype=np.uint64).tolist())
                if b is not None
                else set()
                for b in pg["shingles"]
            ]
            while len(sets) < 2:  # a half lost its doc (missing text)
                sets.append(set())
            out_p.append(int(pid))
            out_s.append(_jaccard_sets(sets[0], sets[1]))
        return pa.table(
            {
                "pair_id": pa.array(out_p, type=pa.int64()),
                "jaccard_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    attached = (
        rd.from_arrow(halves)
        .union(sh_ds)
        .groupby("_bucket", num_partitions=nbuckets)
        .map_groups(attach, batch_format="pandas")
        # break the plan between the two hash shuffles: two
        # HashShuffleOperators in ONE streaming plan reserve enough
        # aggregator-actor CPU to deadlock small clusters (observed at
        # num_cpus=4, Ray 2.49.2). The staged table is pair halves +
        # shingle refs — candidate-bounded, not corpus-bounded.
        .materialize()
    )
    # map_groups emits SCHEMA-LESS empty blocks for its empty hash
    # partitions; if one of those shuffles first into the next groupby,
    # Ray broadcasts the EMPTY schema and the aggregators' key-sort
    # crashes ("No match for FieldRef.Name(pair_id)", Ray 2.49.2).
    attached = drop_empty_blocks(attached)
    scored = (
        attached.groupby("pair_id", num_partitions=nbuckets)
        .map_groups(score, batch_format="pandas")
        .to_pandas()
        .set_index("pair_id")["jaccard_sim"]
    )
    return scored.reindex(pair_ids).to_numpy()


def minhash_candidate_pairs(
    docs: rd.Dataset, num_perm: int = 64, bands: int = 16
) -> rd.Dataset:
    """LSH candidate pairs -> (doc_a, doc_b) rows, doc_a < doc_b; a
    pair appears ONCE PER FIRING BAND (dedupe happens driver-side in
    ``minhash_dedup_pairs``, where the pair count is already small)."""
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=(2, 8),
    )
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


def minhash_dedup_pairs(
    docs: rd.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> pd.DataFrame:
    """Verified near-duplicate pairs: LSH candidates + exact Jaccard
    verify (texts fetched via a broadcast of only the candidate docs —
    the candidate set is << corpus)."""
    raw = minhash_candidate_pairs(docs, num_perm, bands).to_pandas()
    # distinct pairs (a pair can fire in several bands): the candidate
    # set is << corpus, so the dedupe folds driver-side — no second
    # shuffle for a result this small
    cand = (
        raw.groupby(["doc_a", "doc_b"]).size().rename("n_bands").reset_index()
        if len(raw)
        else raw
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard_sim": pd.Series([], dtype="float64")}
        )
    sims = pair_jaccards(docs, cand)
    cand = cand.assign(jaccard_sim=round_half_away(sims, 6))
    out = cand[cand["jaccard_sim"] >= threshold][
        ["doc_a", "doc_b", "jaccard_sim"]
    ]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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
    return docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(2, 8))


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
    else:
        raw = (
            banded.groupby(["band_id", "band_val"])
            .map_groups(pairs, batch_format="pandas")
            .to_pandas()
        )
    out = raw.drop_duplicates(["doc_a", "doc_b"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    max_hamming: int = 8,
    num_perm: int = 64,
    lsh_bands: int = 32,
) -> pd.DataFrame:
    """Verified n-gram-Jaccard near-dup pairs.

    Candidates are the UNION of two blockers — simhash band buckets
    (pairs within ``max_hamming`` bits; catches token-frequency-similar
    reorderings) and a high-recall minhash LSH tuned for low
    thresholds (rows-per-band = num_perm/lsh_bands = 2: miss
    probability (1-s^2)^32 ≈ 1e-4 at s = 0.5). Hamming distance gates
    CANDIDATE GENERATION only; the output filter is the exact k-gram
    Jaccard — a true pair blocked by one scheme is found by the other.
    Every candidate is verified with exact Jaccard (``pair_jaccards``:
    driver fold for small sets, distributed shingle join beyond)."""
    cand_sim = simhash_near_dups(docs, max_hamming=max_hamming)[
        ["doc_a", "doc_b"]
    ]
    cand_mh = minhash_candidate_pairs(docs, num_perm, lsh_bands).to_pandas()
    cand = (
        pd.concat([cand_sim, cand_mh[["doc_a", "doc_b"]]], ignore_index=True)
        .drop_duplicates()
        .reset_index(drop=True)
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard_sim": pd.Series([], dtype="float64")}
        )
    sims = pair_jaccards(docs, cand, k=k)
    out = cand.assign(jaccard_sim=round_half_away(sims, 6))
    out = out[out["jaccard_sim"] >= threshold][
        ["doc_a", "doc_b", "jaccard_sim"]
    ]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
