"""Tests for the windowed/sessionization/as-of/top-k relational
operators and the similarity/dedup additions (SURVEY.md §2 extensions
for the training-data pipeline)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from greenocr_ray.functions.dedup import ngram_jaccard_pairs
from greenocr_ray.functions.relational import combine_small_agg
from greenocr_ray.functions.similarity import (
    IvfIndex,
    embedding_near_dup_pairs,
    knn_cosine,
    knn_cosine_ivf,
)


def _events_ds():
    # user 1: two sessions (gap > 30 min); user 2: one session
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00:00",
            "2024-01-01 10:10:00",
            "2024-01-01 11:00:00",  # 50-min gap -> new session
            "2024-01-01 09:00:00",
            "2024-01-01 09:05:00",
        ]
    )
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                "event_type": ["click", "purchase", "purchase", "view", "purchase"],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
    )


def test_sessionize_gap_split(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    # write a tiny events table and point the operator at it
    d = tmp_path / "sess"
    d.mkdir()
    _events_ds().write_parquet(str(d / "events.parquet"))
    out = R.q_sessionize(str(d))
    u1 = out[out["user_id"] == 1]
    assert list(u1["session_num"]) == [1, 2]
    assert list(u1["n_events"]) == [2, 1]
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [2]
    # session bounds are epoch seconds
    assert u1.iloc[0]["session_end"] - u1.iloc[0]["session_start"] == 600


def test_asof_prev_click(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "asof"
    d.mkdir()
    _events_ds().write_parquet(str(d / "events.parquet"))
    out = R.q_asof_prev_click(str(d)).set_index("event_id")
    # purchase 2 and 3 both follow user 1's click at 10:00
    click_epoch = pd.Timestamp("2024-01-01 10:00:00").timestamp()
    assert out.loc[2, "prev_click_epoch"] == click_epoch
    assert out.loc[3, "prev_click_epoch"] == click_epoch
    # user 2 never clicked
    assert np.isnan(out.loc[5, "prev_click_epoch"])


def test_combine_small_agg_matches_pandas(ray_session):
    df = pd.DataFrame(
        {"k": [f"g{i % 7}" for i in range(500)], "v": np.arange(500.0)}
    )
    ds = rd.from_pandas(df).repartition(8)

    def partial(t: pa.Table) -> pd.DataFrame:
        g = t.to_pandas().groupby("k", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max")
        )
        return g.reset_index()

    got = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k"],
        {"n": "sum", "s": "sum", "mn": "min", "mx": "max"},
    ).sort_values("k").reset_index(drop=True)
    want = (
        df.groupby("k", sort=True)
        .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _emb_ds():
    rng = np.random.Generator(np.random.PCG64(5))
    base = rng.standard_normal(8)
    vecs = [base, base + 0.01 * rng.standard_normal(8)]  # a near-dup pair
    vecs += [rng.standard_normal(8) for _ in range(20)]
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_embedding_near_dup_exact(ray_session):
    out = embedding_near_dup_pairs(_emb_ds(), threshold=0.99)
    assert list(zip(out["vec_a"], out["vec_b"])) == [(0, 1)]
    assert out.iloc[0]["cos_sim"] > 0.99


def test_embedding_near_dup_blocked_matches_single_chunk(ray_session):
    """Forcing many chunks (chunk_rows=5 -> 5 chunks, 15 chunk-pair
    tasks over 22 vecs) produces exactly the single-chunk result."""
    ds = _emb_ds()
    a = embedding_near_dup_pairs(ds, threshold=0.3)
    b = embedding_near_dup_pairs(ds, threshold=0.3, chunk_rows=5)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 1  # exercise more than the planted pair


def test_embedding_near_dup_lsh_finds_planted_dups(ray_session):
    """At a near-dup threshold the LSH path recalls exactly the
    planted pairs the exact scan finds."""
    from greenocr_ray.functions.similarity import embedding_near_dup_pairs_lsh

    rng = np.random.Generator(np.random.PCG64(11))
    vecs = []
    for i in range(10):  # 10 planted dup pairs + 30 random vecs
        base = rng.standard_normal(64)
        vecs += [base, base + 0.05 * rng.standard_normal(64)]
    vecs += [rng.standard_normal(64) for _ in range(30)]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
    )
    exact = embedding_near_dup_pairs(ds, threshold=0.9)
    approx = embedding_near_dup_pairs_lsh(ds, threshold=0.9)
    pd.testing.assert_frame_equal(exact, approx)
    assert list(zip(exact["vec_a"], exact["vec_b"])) == [
        (2 * i, 2 * i + 1) for i in range(10)
    ]


def test_ivf_subset_of_exact(ray_session):
    ds = _emb_ds()
    q = np.asarray(
        ds.take(1)[0]["embedding"], dtype=np.float64
    )
    exact = knn_cosine(ds, q, k=5, exclude={0})
    approx = knn_cosine_ivf(
        ds, q, k=5, nlist=4, nprobe=2, exclude={0}
    )
    # IVF results are a subset of the corpus ranked identically where
    # present; its top hit must appear in the exact top-5 (vec 1 is an
    # almost-identical copy of vec 0, so any sane probe finds it)
    assert approx.iloc[0]["vec_id"] == exact.iloc[0]["vec_id"] == 1


def test_ivf_deterministic():
    rng = np.random.Generator(np.random.PCG64(3))
    sample = rng.standard_normal((50, 8))
    a = IvfIndex(sample, nlist=4)
    b = IvfIndex(sample, nlist=4)
    np.testing.assert_array_equal(a.centroids, b.centroids)


def test_ngram_jaccard_pairs(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",  # near-dup
        "completely different content with other words entirely",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": texts,
            }
        )
    )
    out = ngram_jaccard_pairs(ds, threshold=0.5, max_hamming=16)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    assert out.iloc[0]["jaccard_sim"] > 0.5


def test_simhash_multiprobe_catches_top_bit_flips(ray_session):
    """Flips confined to the top 16 bits — invisible to the old single
    top-prefix bucket — are caught because the other three bands still
    match (pigeonhole: hamming <= 3 < 4 bands => exact recall)."""
    from greenocr_ray.functions.dedup import simhash_near_dups_from_table

    tbl = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "simhash": pa.array(
                    # 1 vs 2: two flips, both in the TOP band (bits 60, 50)
                    # 3: one flip in each of the 4 bands vs doc 1 -> ham 4
                    [0, (1 << 60) | (1 << 50),
                     (1 << 2) | (1 << 17) | (1 << 33) | (1 << 49)],
                    type=pa.uint64(),
                ),
            }
        )
    )
    out = simhash_near_dups_from_table(tbl, max_hamming=3)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    assert list(out["hamming"]) == [2]


def test_pair_jaccards_distributed_matches_driver(ray_session):
    """The distributed shingle-join verification scores pairs exactly
    like the driver fold (byte-identical floats)."""
    from greenocr_ray.functions.dedup import pair_jaccards

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",
        "completely different content with other words entirely",
        "the quick brown fox naps under the lazy dog today",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": texts,
            }
        )
    )
    cand = pd.DataFrame(
        {"doc_a": [1, 1, 2], "doc_b": [2, 3, 4]}, dtype="int64"
    )
    a = pair_jaccards(ds, cand)
    b = pair_jaccards(ds, cand, force_distributed=True)
    np.testing.assert_array_equal(a, b)
    assert a[0] > 0.5 > a[1]


def test_exact_dedup_broadcasts_only_dup_groups(ray_session):
    """The dedup filter's broadcast side is bounded by the number of
    DUPLICATED distinct texts, not corpus cardinality."""
    from greenocr_ray.functions.dedup import (
        duplicated_group_keepers,
        exact_dedup,
        exact_dedup_groups,
    )

    texts = [f"unique text {i}" for i in range(50)] + ["dup a"] * 3 + ["dup b"] * 2
    ids = list(range(len(texts)))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
    )
    keepers = duplicated_group_keepers(exact_dedup_groups(ds))
    assert len(keepers) == 2  # 'dup a' and 'dup b' only — not the 50 uniques
    assert sorted(keepers.values()) == [50, 53]  # min doc_id per group
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == list(range(51)) + [53]


def test_top_orders_per_segment_ties(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "topk"
    d.mkdir()
    rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], type=pa.int64()),
                "c_mktsegment": ["A", "A"],
            }
        )
    ).write_parquet(str(d / "customer.parquet"))
    rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 13], type=pa.int64()),
                "o_custkey": pa.array([1, 2, 1, 2], type=pa.int64()),
                # tie on 5.0: orderkey ascending breaks it
                "o_totalprice": [5.0, 5.0, 9.0, 1.0],
            }
        )
    ).write_parquet(str(d / "orders.parquet"))
    out = R.q_top_orders_per_segment(str(d), k=3)
    assert list(out["o_orderkey"]) == [12, 10, 11]
    assert list(out["rn"]) == [1, 2, 3]


def test_knn_batch_matches_single_query(ray_session):
    from greenocr_ray.functions.similarity import knn_cosine, knn_cosine_batch

    ds = _emb_ds()
    rows = ds.take_all()
    qmat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows[:3]]
    )
    out = knn_cosine_batch(ds, qmat, [0, 1, 2], k=5)
    assert list(out.groupby("query_id").size()) == [5, 5, 5]
    for q in (0, 1, 2):
        single = knn_cosine(
            ds, qmat[q], k=5, exclude={q}
        )
        mine = out[out["query_id"] == q]
        assert list(mine["vec_id"]) == list(single["vec_id"])
        np.testing.assert_allclose(mine["cos_sim"], single["cos_sim"], atol=1e-6)


def test_dedup_embeddings_drops_later_twin(ray_session):
    from greenocr_ray.functions.similarity import dedup_embeddings

    out = dedup_embeddings(_emb_ds(), threshold=0.99)
    kept = set(out["vec_id"])
    assert 0 in kept and 1 not in kept  # vec 1 is vec 0's near-copy
    assert len(kept) == 21  # 22 vecs, one dropped


def test_label_centroids_match_numpy(ray_session):
    from greenocr_ray.functions.similarity import label_centroids

    rng = np.random.Generator(np.random.PCG64(8))
    vecs = rng.standard_normal((30, 4))
    labels = np.arange(30) % 3
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(30), type=pa.int64()),
                "label": pa.array(labels, type=pa.int32()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
    ).repartition(4)
    out = label_centroids(ds)
    assert len(out) == 12  # 3 labels x 4 dims
    for lab in range(3):
        want = vecs[labels == lab].mean(axis=0)
        got = out[out["label"] == lab].sort_values("dim")["centroid"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def _planted_dup_corpus() -> "rd.Dataset":
    """8 clusters x 4 near-identical copies + 18 unique docs: a
    high-dup planted corpus where raw LSH candidates >> final pairs."""
    base = [
        "the quick brown fox jumps over the lazy dog in the yard",
        "pack my box with five dozen liquor jugs before noon today",
        "how vexingly quick daft zebras jump over fences at dawn",
        "sphinx of black quartz judge my vow said the old monk",
        "a wizard's job is to vex chumps quickly in fog each day",
        "the five boxing wizards jump quickly over the frozen pond",
        "jackdaws love my big sphinx of quartz said nobody ever",
        "crazy fredrick bought many very exquisite opal jewels",
    ]
    suffix = ["", " now", " again", " indeed"]
    texts = [b + s for b in base for s in suffix]
    texts += [
        f"unique document number {i} about topic {i*7} with words "
        f"alpha beta gamma delta {i} epsilon zeta"
        for i in range(18)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": texts,
            }
        )
    )


def test_minhash_distributed_end_to_end(ray_session, monkeypatch):
    """Forced-distributed near-dup dedup on a planted high-dup corpus:
    identical output to the driver path, and the ONLY pair-shaped
    frame that reaches the driver is the final thresholded result
    (VERDICT r2 item 1 done-criterion)."""
    import greenocr_ray.functions.dedup as D

    ds = _planted_dup_corpus()
    expected = D.minhash_dedup_pairs(ds, threshold=0.6)
    assert len(expected) >= 8 * 6  # every within-cluster pair verified

    monkeypatch.setattr(D, "_BAND_ROWS_DRIVER_LIMIT", 0)
    monkeypatch.setattr(D, "_PAIR_DRIVER_LIMIT", 0)
    frames = []
    orig_tp = rd.Dataset.to_pandas
    def spy(self, *a, **k):
        df = orig_tp(self, *a, **k)
        frames.append(frozenset(df.columns))
        return df
    monkeypatch.setattr(rd.Dataset, "to_pandas", spy)

    out = D.minhash_dedup_pairs(ds, threshold=0.6, force_distributed=True)
    pd.testing.assert_frame_equal(out, expected)
    pair_frames = [c for c in frames if {"doc_a", "doc_b"} <= c]
    assert len(pair_frames) == 1  # only the final output collects
    assert "jaccard_sim" in pair_frames[0]  # ...and it is the verified one


def test_ngram_jaccard_distributed_matches_driver(ray_session, monkeypatch):
    import greenocr_ray.functions.dedup as D

    ds = _planted_dup_corpus()
    expected = D.ngram_jaccard_pairs(ds, threshold=0.5, max_hamming=16)
    monkeypatch.setattr(D, "_BAND_ROWS_DRIVER_LIMIT", 0)
    monkeypatch.setattr(D, "_PAIR_DRIVER_LIMIT", 0)
    out = D.ngram_jaccard_pairs(
        ds, threshold=0.5, max_hamming=16, force_distributed=True
    )
    pd.testing.assert_frame_equal(out, expected)


def test_langid_accurate_on_genuine_languages(ray_session):
    """The sf tables' lang labels are synthetic (same word pool for
    every label), so the queries() gate checks stage-vs-driver
    consistency; ACCURACY is gated here, on genuinely distinct text."""
    from greenocr_ray.functions.textstats import LangId

    samples = {
        "en": "the cat sat on the mat and the dog ran along the lane",
        "de": "der hund und die katze schlafen ich bin ein berliner schnell",
        "fr": "les enfants que nous aimons sont dans le jardin des plantes",
        "es": "los ninos estan en la casa que adorado cancion de la nacion",
        "zh": "我们在花园里看书",
    }
    clf = LangId()
    preds = {lang: clf.classify(t) for lang, t in samples.items()}
    assert preds == {k: k for k in samples}


# ----------------------------------------------- round-4 additions


def test_corr_stats_matches_numpy(ray_session):
    """Chan-merged Welford partials match a single-machine
    np.corrcoef / covariance on the same data."""
    from greenocr_ray.functions.relational import q_corr_stats

    sf = "/root/testdata/sf0.001"
    out = q_corr_stats(sf).set_index("l_returnflag")

    import pyarrow.parquet as pq

    df = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    for flag, g in df.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy()
        y = g["l_extendedprice"].to_numpy()
        assert out.loc[flag, "n"] == len(g)
        assert abs(out.loc[flag, "corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-6
        want_cov = float(((x - x.mean()) * (y - y.mean())).mean())
        assert abs(out.loc[flag, "covar_pop"] - want_cov) < 1e-3


def test_local_supplier_volume_matches_pandas(ray_session):
    """Two shuffle joins + broadcast dims reproduce the pandas
    five-way merge with the local-supplier predicate."""
    from greenocr_ray.functions.relational import q_local_supplier_volume

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = q_local_supplier_volume(sf)

    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    supp = pq.read_table(f"{sf}/supplier.parquet").to_pandas()
    nation = pq.read_table(f"{sf}/nation.parquet").to_pandas()
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]].merge(
        nation, left_on="s_nationkey", right_on="n_nationkey"
    )
    j["rev"] = j["l_extendedprice"] * (1.0 - j["l_discount"])
    want = (
        j.groupby("n_name")
        .agg(revenue=("rev", "sum"), n_lines=("rev", "size"))
        .reset_index()
    )
    got = out.set_index("n_name")
    assert set(got.index) == set(want["n_name"])
    for _, r in want.iterrows():
        assert got.loc[r["n_name"], "n_lines"] == r["n_lines"]
        assert abs(got.loc[r["n_name"], "revenue"] - r["revenue"]) < 1e-2


def test_semdedup_subset_and_planted_recall(ray_session):
    """Cluster-interior pairs are a strict subset of the exact
    all-pairs set (same cosine math), and a planted near-identical
    pair is always found regardless of which cluster it lands in."""
    from greenocr_ray.functions.similarity import (
        embedding_near_dup_pairs,
        semdedup_pairs,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(400, 16))
    base[101] = base[100] + rng.normal(scale=1e-3, size=16)  # planted dup
    base[301] = base[300] + rng.normal(scale=1e-3, size=16)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(400), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in base],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    exact = embedding_near_dup_pairs(ds, threshold=0.8)
    clustered = semdedup_pairs(ds, k=4, threshold=0.8, probes=2)
    ex = set(zip(exact["vec_a"], exact["vec_b"]))
    cl = set(zip(clustered["vec_a"], clustered["vec_b"]))
    assert cl <= ex
    assert (100, 101) in cl
    assert (300, 301) in cl
    # no pair duplicated despite multi-probe overlap
    assert len(clustered) == len(cl)


def test_keep_best_per_group_selects_highest_score(ray_session):
    """Within each dedup group the highest-score member wins (ties ->
    lowest doc_id); non-members never appear; scores fetched with a
    members-only streaming pass."""
    from greenocr_ray.functions.dedup import keep_best_per_group

    groups = pd.DataFrame(
        {"doc_id": [1, 2, 3, 10, 11], "group_id": [1, 1, 1, 10, 10]}
    )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 10, 11], type=pa.int64()),
                "n_chars": pa.array([5, 9, 9, 100, 7, 7], type=pa.int64()),
            }
        )
    )
    out = keep_best_per_group(groups, docs)
    assert list(out["doc_id"]) == [1, 2, 3, 10, 11]
    kept = set(out.loc[out["keep"], "doc_id"])
    # group 1: docs 2 and 3 tie at 9 -> lowest doc_id (2) wins;
    # group 10: docs 10 and 11 tie at 7 -> 10 wins
    assert kept == {2, 10}
    assert list(out["score"]) == [5, 9, 9, 7, 7]


def test_keep_best_distributed_matches_broadcast(ray_session):
    """A Dataset groups input takes the no-broadcast semi-join +
    in-bucket argmax path and returns a Dataset equal to the
    broadcast pd path row-for-row."""
    from greenocr_ray.functions.dedup import keep_best_per_group

    rng = np.random.Generator(np.random.PCG64(3))
    n_docs, n_groups = 600, 80
    member = rng.random(n_docs) < 0.4
    ids = np.arange(n_docs, dtype=np.int64)[member]
    gids = rng.integers(0, n_groups, size=len(ids)).astype(np.int64)
    groups_pd = pd.DataFrame({"doc_id": ids, "group_id": gids})
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
                "n_chars": pa.array(
                    rng.integers(1, 50, size=n_docs), type=pa.int64()
                ),
            }
        )
    ).repartition(8)
    want = keep_best_per_group(groups_pd, docs)
    groups_ds = rd.from_pandas(groups_pd).repartition(4)
    got_ds = keep_best_per_group(groups_ds, docs)
    assert isinstance(got_ds, rd.Dataset)
    got = (
        got_ds.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "group_id", "score", "keep"]]
    )
    pd.testing.assert_frame_equal(got, want)


def test_retention_cohorts_matches_pandas(ray_session):
    """Bucketed per-user cohort fold equals the pandas reference on a
    corpus with users spanning multiple weeks and batches."""
    from greenocr_ray.functions.relational import q_retention_cohorts

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = q_retention_cohorts(sf)

    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    wk = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64") // (
        86_400_000_000 * 7
    )
    uw = (
        pd.DataFrame({"user_id": ev["user_id"], "wk": wk})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    coh = uw.groupby("user_id")["wk"].transform("min")
    want = (
        pd.DataFrame({"cohort_week": coh, "week_offset": uw["wk"] - coh})
        .groupby(["cohort_week", "week_offset"])
        .size()
        .reset_index(name="n_users")
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out, want.astype({"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"})
    )
    assert (out["week_offset"] >= 0).all()
