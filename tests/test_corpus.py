"""Tests for corpus-management operators (split / stats / search /
quantiles / HLL sketch)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from greenocr_ray.functions.corpus import (
    HllSketch,
    _token_hashes,
    approx_distinct_tokens,
    grouped_quantiles,
    keyword_search,
    split_of_ids,
    train_test_split,
)


def test_split_deterministic_and_ratioed(ray_session):
    ids = list(range(20000))
    a = split_of_ids(ids)
    b = split_of_ids(ids)
    assert a == b
    frac = pd.Series(a).value_counts(normalize=True)
    assert abs(frac["train"] - 205 / 256) < 0.01
    assert abs(frac["valid"] - 25 / 256) < 0.005
    assert abs(frac["test"] - 26 / 256) < 0.005
    # the dataset operator agrees with the scalar function
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids[:500], type=pa.int64())}))
    out = train_test_split(ds).to_pandas().sort_values("doc_id")
    assert list(out["split"]) == a[:500]


def test_keyword_search_counts(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["cat cat cat", "a cat here", "no felines"],
            }
        )
    )
    out = keyword_search(ds, "cat", k=10)
    assert list(zip(out["doc_id"], out["n_hits"])) == [(1, 3), (2, 1)]


def test_grouped_quantiles_match_numpy(ray_session):
    rng = np.random.Generator(np.random.PCG64(5))
    vals = rng.random(1000) * 100
    types = np.where(np.arange(1000) % 2 == 0, "a", "b")
    ds = rd.from_arrow(
        pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
    )
    out = grouped_quantiles(ds).set_index("event_type")
    for t in ("a", "b"):
        v = vals[types == t]
        assert abs(out.loc[t, "p50"] - np.percentile(v, 50)) < 1e-6
        assert abs(out.loc[t, "p95"] - np.percentile(v, 95)) < 1e-6


def test_hll_within_error_bound(ray_session):
    texts = [f"tok{i} tok{i+1} tok{i+2}" for i in range(0, 30000, 3)]
    exact = len(set(np.asarray(_token_hashes(texts)).tolist()))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(8)
    approx = int(approx_distinct_tokens(ds)["approx_distinct_tokens"][0])
    assert abs(approx - exact) / exact < 0.05  # p=12 -> ~1.6% stderr


def test_hll_merge_associative():
    rng = np.random.Generator(np.random.PCG64(1))
    hs = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    whole = HllSketch()
    whole.add_hashes(hs)
    a, b = HllSketch(), HllSketch()
    a.add_hashes(hs[:2000])
    b.add_hashes(hs[2000:])
    assert a.merge(b).estimate() == whole.estimate()


def test_stratified_sample_deterministic(ray_session):
    ids = list(range(200))
    langs = [("en", "de", "fr")[i % 3] for i in ids]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "lang": pa.array(langs, type=pa.string()),
            }
        )
    ).repartition(4)
    from greenocr_ray.functions.corpus import stratified_sample

    a = stratified_sample(ds, "lang", 3)
    b = stratified_sample(ds, "lang", 3)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.groupby("lang").size()) == [3, 3, 3]
    # matches a driver-side brute-force of the same rule
    import hashlib
    df = pd.DataFrame({"doc_id": ids, "lang": langs})
    df["h"] = [hashlib.md5(str(d).encode()).hexdigest() for d in df["doc_id"]]
    want = (
        df.sort_values(["h", "doc_id"]).groupby("lang", sort=True).head(3)
        .drop(columns="h").sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, want[["lang", "doc_id"]])


def test_tfidf_top_terms_golden(ray_session):
    from greenocr_ray.functions.corpus import tfidf_top_terms

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [
                    "apple apple banana",  # apple: tf2, only here
                    "banana cherry",
                    "cherry cherry cherry date",
                ],
            }
        )
    )
    out = tfidf_top_terms(ds, k=2)
    top1 = out.groupby("doc_id").first()
    # the doc-exclusive term dominates each doc
    assert top1.loc[1, "term"] == "apple"
    assert top1.loc[3, "term"] == "cherry"
    # idf = ln(3/1) for a term unique to one doc, tf=2
    assert abs(top1.loc[1, "tfidf"] - 2 * np.log(3.0)) < 1e-6


def test_props_stats_extracts_json_field(ray_session):
    from greenocr_ray.functions.corpus import props_stats

    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": ["a", "a", "b"],
                "props": ['{"k": 5}', '{"k": -2}', '{"k": 10}'],
            }
        )
    )
    out = props_stats(ds).set_index("event_type")
    assert out.loc["a", "sum_k"] == 3 and out.loc["a", "max_k"] == 5
    assert out.loc["a", "avg_k"] == 1.5
    assert out.loc["b", "n_events"] == 1


def test_bm25_prefers_term_density(ray_session):
    from greenocr_ray.functions.corpus import bm25_search

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": [
                    "data data data pipeline",      # dense in 'data'
                    "data appears once in a much longer document "
                    "with many many other words diluting it badly",
                    "nothing relevant here at all",
                    "system of record",
                ],
            }
        )
    )
    out = bm25_search(ds, ["data", "system"], k=10)
    ranks = list(out["doc_id"])
    # among the 'data' docs, term density beats the diluted long doc
    assert ranks.index(1) < ranks.index(2)
    assert set(ranks) == {1, 2, 4}              # non-matching doc absent
    assert (out["score"] > 0).all()


def test_keyword_partial_topk_bounds_driver_rows(ray_session):
    """A 100%-match corpus ships <= k rows per block to the driver,
    never the corpus (VERDICT r2 item 2)."""
    from greenocr_ray.functions.corpus import _keyword_hits

    n, k = 400, 5
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            # every doc matches, with distinct counts so top-k is unique
            "text": [("cat " * (1 + i % 17)).strip() for i in range(n)],
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    hits = _keyword_hits(ds, "cat", k)
    assert hits.count() <= 4 * k  # bounded by k x blocks
    out = keyword_search(ds, "cat", k=k)
    # exact despite truncation: matches a full pandas computation
    exp = (
        pd.DataFrame({"doc_id": range(n), "n_hits": [1 + i % 17 for i in range(n)]})
        .sort_values(["n_hits", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["n_hits"].tolist() == exp["n_hits"].tolist()


def test_bm25_partial_topk_bounds_driver_rows(ray_session):
    """Same bound for BM25: every scoring task emits at most k rows."""
    import ray

    from greenocr_ray.functions.corpus import _bm25_hits, bm25_search

    n, k = 300, 4
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": [
                ("data " * (1 + i % 7) + "filler " * (i % 3)).strip()
                for i in range(n)
            ],
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    full = bm25_search(ds, ["data"], k=k)
    assert len(full) == k
    params = ray.put(({"data": 1.0}, 5.0))
    hits = _bm25_hits(ds, params, 1.5, 0.75, k)
    assert hits.count() <= 3 * k


def _big_vocab_docs(n_docs: int = 120, terms_per_doc: int = 40):
    """Synthetic corpus whose vocabulary (~n_docs*terms_per_doc unique
    terms) vastly exceeds any sane broadcast cap, plus a few shared
    terms so df > 1 paths are exercised."""
    rng = np.random.Generator(np.random.PCG64(7))
    rows = []
    for d in range(n_docs):
        uniq = [f"w{d}x{j}" for j in range(terms_per_doc)]
        shared = ["common"] * int(rng.integers(1, 4)) + ["semi"] * int(
            d % 3 == 0
        )
        rows.append((d, " ".join(uniq + shared)))
    return rows


def test_tfidf_distributed_no_vocab_broadcast(ray_session):
    """The term fold must be distributed: no driver-side ray.put of a
    vocabulary-scale dict (the round-3 scale-killer), and results must
    match a brute-force on a corpus with vocab >> any broadcast cap."""
    import ray as _ray

    from greenocr_ray.functions.corpus import tfidf_top_terms, unigram_logprob

    rows = _big_vocab_docs()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )

    MAX_BROADCAST_TERMS = 64
    big_puts = []
    orig_put = _ray.put

    def spy_put(obj, *a, **kw):
        if isinstance(obj, (dict, set, frozenset)) and len(obj) > MAX_BROADCAST_TERMS:
            big_puts.append(len(obj))
        return orig_put(obj, *a, **kw)

    _ray.put = spy_put
    try:
        out_tfidf = tfidf_top_terms(ds, k=2)
        out_lm = unigram_logprob(ds)
    finally:
        _ray.put = orig_put
    assert big_puts == [], f"vocab-scale driver broadcast detected: {big_puts}"

    # brute-force reference (driver-side, test-only)
    import re as _re
    from collections import Counter

    tok = _re.compile(r"\w+", _re.ASCII)
    docs = {d: tok.findall(t.lower()) for d, t in rows}
    n = len(docs)
    df = Counter()
    for ws in docs.values():
        df.update(set(ws))
    want_top = {}
    for d, ws in docs.items():
        tf = Counter(ws)
        scored = sorted(
            ((c * np.log(n / df[w]), w) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        want_top[d] = [w for _, w in scored]
    got = out_tfidf.groupby("doc_id")["term"].apply(list).to_dict()
    assert got == want_top

    total = sum(len(ws) for ws in docs.values())
    cnt = Counter()
    for ws in docs.values():
        cnt.update(ws)
    lm = out_lm.set_index("doc_id")
    for d, ws in docs.items():
        want = np.mean([np.log(cnt[w] / total) for w in ws])
        assert abs(lm.loc[d, "avg_logprob"] - want) < 1e-5
        assert lm.loc[d, "n_tokens"] == len(ws)


# ---------------------------------------------- round-4 additions


def test_bigram_logprob_golden(ray_session):
    """Distributed bigram LM score matches a driver-side brute force
    (MLE P(w2|w1) over all bigram positions); <2-token docs emit no
    row."""
    from collections import Counter

    from greenocr_ray.functions.corpus import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "mat the cat the cat sat"),
        (4, "single"),          # 1 token -> no bigrams -> no row
        (5, ""),                # empty -> no row
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )
    out = bigram_logprob(ds).set_index("doc_id")

    docs = {d: t.lower().split() for d, t in rows}
    bg_all = Counter()
    left_all = Counter()
    for ws in docs.values():
        bg_all.update(zip(ws, ws[1:]))
        left_all.update(ws[:-1])
    for d, ws in docs.items():
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            assert d not in out.index
            continue
        want = np.mean(
            [np.log(bg_all[b] / left_all[b[0]]) for b in bgs]
        )
        assert out.loc[d, "n_bigrams"] == len(bgs)
        assert abs(out.loc[d, "avg_logprob"] - want) < 1e-6
    # a deterministic always-repeated bigram has logprob 0 contribution
    assert out.loc[2, "avg_logprob"] < 0  # 'the cat' is not the only pair


def test_bigram_logprob_no_vocab_broadcast(ray_session):
    """The conditional-LM fold is bucket-local: no vocabulary-scale
    driver broadcast even with vocab >> any cap."""
    import ray as _ray

    from greenocr_ray.functions.corpus import bigram_logprob

    rows = _big_vocab_docs()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )
    big_puts = []
    orig_put = _ray.put

    def spy_put(obj, *a, **kw):
        if isinstance(obj, (dict, set, frozenset)) and len(obj) > 64:
            big_puts.append(len(obj))
        return orig_put(obj, *a, **kw)

    _ray.put = spy_put
    try:
        out = bigram_logprob(ds)
    finally:
        _ray.put = orig_put
    assert big_puts == []
    assert len(out) == len(rows)
    assert (out["avg_logprob"] <= 1e-12).all()  # log-probs are <= 0


def test_inverted_index_golden(ray_session):
    from collections import defaultdict

    from greenocr_ray.functions.corpus import inverted_index

    rows = [
        (10, "alpha beta gamma"),
        (11, "alpha beta"),
        (12, "alpha delta delta"),   # dup term counts once for df
        (13, "beta alpha"),
        (14, "epsilon"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )
    out = (
        inverted_index(ds, min_df=2, k_postings=2)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    want = defaultdict(list)
    for d, t in rows:
        for w in set(t.split()):
            want[w].append(d)
    want = {
        w: sorted(ids) for w, ids in want.items() if len(ids) >= 2
    }
    assert list(out["term"]) == sorted(want)
    for _, r in out.iterrows():
        ids = want[r["term"]]
        assert r["df"] == len(ids)
        assert r["postings"] == ",".join(str(i) for i in ids[:2])


def test_temperature_mix_rates(ray_session):
    from greenocr_ray.functions.corpus import temperature_mix

    n_a, n_b = 4000, 250
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(n_a + n_b)), type=pa.int64()
                ),
                "source": ["big"] * n_a + ["small"] * n_b,
            }
        )
    )
    # alpha=1: identity (every rate is 1, u < 1 always)
    assert temperature_mix(ds, alpha=1.0).count() == n_a + n_b
    # alpha=0.5: small source fully kept, big source ~sqrt(n_min/n)
    out = temperature_mix(ds, alpha=0.5).to_pandas()
    kept = out["source"].value_counts()
    assert kept["small"] == n_b
    want_big = n_a * (n_a / n_b) ** -0.5
    assert abs(kept["big"] - want_big) < 4 * np.sqrt(want_big)
    # deterministic: same selection twice
    out2 = temperature_mix(ds, alpha=0.5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_pca_fit_matches_numpy(ray_session):
    """Distributed moment-partial PCA == driver numpy PCA on the same
    rows; Eckart-Young residual identity holds."""
    from greenocr_ray.functions.similarity import pca_fit, pca_project

    rng = np.random.Generator(np.random.PCG64(7))
    d, n, k = 6, 500, 3
    # anisotropic cloud: variance concentrated on the first axes
    scales = np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array(list(x), type=pa.list_(pa.float64())),
            }
        )
    )
    mean, comps, evar, n_fit = pca_fit(ds, k=k)
    assert n_fit == n
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    np.testing.assert_allclose(evar, evals[order], rtol=1e-9)
    for i, row in enumerate(comps):
        ref = evecs[:, order[i]]
        j = np.argmax(np.abs(ref))
        if ref[j] < 0:
            ref = -ref
        np.testing.assert_allclose(row, ref, atol=1e-8)
    # projection residual == discarded eigenvalue mass (per-mean)
    proj = pca_project(ds, mean, comps).to_pandas()
    assert len(proj) == n
    mean_err = proj["recon_err"].mean()
    assert abs(mean_err - evals[np.argsort(evals)[::-1][k:]].sum()) < 1e-9


def test_collocations_golden(ray_session):
    """Two-shuffle distributed PMI matches a driver-side brute force
    (full unigram counts, adjacent bigrams, min_count prune, top-k by
    the rank-equivalent score with (w1, w2) tie-break)."""
    from collections import Counter

    from greenocr_ray.functions.corpus import collocations

    texts = [
        "new york is big new york is far",
        "san francisco and new york",
        "san francisco fog san francisco hills",
        "the the the the the",
        "york new york new",
    ] * 3
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
    )
    out = collocations(ds, k=5, min_count=3)

    uni: Counter = Counter()
    big: Counter = Counter()
    nt = nb = 0
    for s in texts:
        ws = s.split()
        nt += len(ws)
        nb += len(ws) - 1
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    scored = [
        (
            np.log(c) - np.log(uni[a]) - np.log(uni[b]),
            a,
            b,
            c,
        )
        for (a, b), c in big.items()
        if c >= 3
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:5]
    assert len(out) == len(want)
    for i, (score, a, b, c) in enumerate(want):
        pmi = (score - np.log(nb)) + 2.0 * np.log(nt)
        assert out.loc[i, "w1"] == a
        assert out.loc[i, "w2"] == b
        assert out.loc[i, "n"] == c
        assert out.loc[i, "rank"] == i + 1
        assert abs(out.loc[i, "pmi"] - pmi) < 1e-6


def test_dedup_substrings_removes_noncanonical(ray_session):
    """Tokens covered by corpus-duplicated 5-grams are removed except
    the canonical first occurrence; short/clean docs pass through as
    their token-joined canonical form."""
    from greenocr_ray.functions.corpus import dedup_substrings

    texts = [
        "a b c d e f g h",   # canonical occurrence of every gram
        "x y a b c d e z",   # embedded dup passage -> 'x y z'
        "p q r s t u v",     # clean
        "a b c d e f g h",   # full dup -> empty
        "short one",         # < n tokens
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), type=pa.int64()),
                "text": texts,
            }
        )
    )
    out = (
        dedup_substrings(ds, n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["text"]) == [
        "a b c d e f g h",
        "x y z",
        "p q r s t u v",
        "",
        "short one",
    ]
    assert list(out["n_removed"]) == [0, 5, 0, 8, 0]


def test_dedup_substrings_randomized_matches_bruteforce(ray_session):
    """Seeded random corpora with planted repetition: distributed
    removal equals the driver brute force (canonical-first, coverage
    union) on every doc."""
    import re as _re
    from collections import defaultdict

    from greenocr_ray.functions.corpus import dedup_substrings

    TOK = _re.compile(r"\w+", _re.ASCII)
    n = 4
    for seed in (3, 17):
        rng = np.random.Generator(np.random.PCG64(seed))
        vocab = [f"w{i}" for i in range(12)]
        texts = []
        for _ in range(25):
            ln = int(rng.integers(0, 14))
            texts.append(" ".join(rng.choice(vocab, size=ln)))
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts,
                }
            )
        )
        out = (
            dedup_substrings(ds, n=n)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = {i: TOK.findall(t.lower()) for i, t in enumerate(texts)}
        occ = defaultdict(list)
        for d, ws in docs.items():
            for p in range(len(ws) - n + 1):
                occ[tuple(ws[p : p + n])].append((d, p + 1))
        cover = defaultdict(set)
        for g, os_ in occ.items():
            if len(os_) >= 2:
                for d, p in sorted(os_)[1:]:
                    cover[d].update(range(p, p + n))
        assert len(out) == len(texts)
        for d, ws in docs.items():
            kept = [w for i, w in enumerate(ws, 1) if i not in cover[d]]
            assert out.loc[d, "text"] == " ".join(kept), (seed, d)
            assert out.loc[d, "n_removed"] == len(ws) - len(kept)


def test_collocations_randomized_matches_bruteforce(ray_session):
    """Seeded random corpora: the two-shuffle PMI pipeline equals the
    driver brute force (same min_count, same tie-break) including the
    exact rounded PMI values."""
    from collections import Counter

    from greenocr_ray.functions.corpus import collocations

    for seed in (5, 23):
        rng = np.random.Generator(np.random.PCG64(seed))
        vocab = [f"t{i}" for i in range(8)]
        texts = [
            " ".join(rng.choice(vocab, size=int(rng.integers(2, 30))))
            for _ in range(30)
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts,
                }
            )
        )
        out = collocations(ds, k=8, min_count=3)
        uni: Counter = Counter()
        big: Counter = Counter()
        nt = nb = 0
        for s in texts:
            ws = s.split()
            nt += len(ws)
            nb += max(len(ws) - 1, 0)
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        scored = sorted(
            (
                (np.log(c) - np.log(uni[a]) - np.log(uni[b]), a, b, c)
                for (a, b), c in big.items()
                if c >= 3
            ),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:8]
        assert len(out) == len(scored), seed
        for i, (score, a, b, c) in enumerate(scored):
            assert (out.loc[i, "w1"], out.loc[i, "w2"], out.loc[i, "n"]) == (
                a,
                b,
                c,
            ), seed
            pmi = (score - np.log(nb)) + 2.0 * np.log(nt)
            assert abs(out.loc[i, "pmi"] - pmi) < 1e-6


def test_bpe_train_matches_reference_and_roundtrips(ray_session):
    """Distributed top-V word counts equal pandas value_counts; the
    driver BPE matches an independent reference simulation; encoding
    round-trips losslessly and compresses monotonically with merges."""
    from collections import Counter

    from greenocr_ray.functions.bpe import (
        _EOW,
        bpe_encode_stats,
        bpe_train,
        top_word_counts,
    )

    rng = np.random.Generator(np.random.PCG64(9))
    vocab = ["alpha", "alps", "beta", "bet", "gamma", "gam", "ab"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 20))))
        for _ in range(40)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
    )
    wc = top_word_counts(ds, top_v=100)
    ref_counts = Counter(w for t in texts for w in t.split())
    assert dict(zip(wc["word"], wc["c"])) == dict(ref_counts)

    merges = bpe_train(wc, num_merges=20)

    # independent reference simulation of the same deterministic rule
    vocab_syms = {tuple(w) + (_EOW,): c for w, c in ref_counts.items()}
    ref_merges = []
    for _ in range(20):
        pairs: Counter = Counter()
        for sym, c in vocab_syms.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        top_c = max(pairs.values())
        bp = min(p for p, c in pairs.items() if c == top_c)
        ref_merges.append(bp)
        a, b = bp
        nv = {}
        for sym, c in vocab_syms.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab_syms = nv
    assert merges == ref_merges

    s0 = bpe_encode_stats(ds, [])
    s20 = bpe_encode_stats(ds, merges)
    assert bool(s0["roundtrip_ok"].all()) and bool(s20["roundtrip_ok"].all())
    n_chars = sum(len(w) for t in texts for w in t.split())
    n_words = sum(len(t.split()) for t in texts)
    assert int(s0["n_tokens"].sum()) == n_chars + n_words
    assert int(s20["n_tokens"].sum()) < int(s0["n_tokens"].sum())


def test_logprob_ds_variants_match_pd(ray_session):
    """The Dataset-returning scorer variants (library API — nothing
    corpus-cardinality on the driver) agree row-for-row with the
    oracle-contract pd variants."""
    from greenocr_ray.functions.corpus import (
        bigram_logprob,
        bigram_logprob_ds,
        unigram_logprob,
        unigram_logprob_ds,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(80)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
    ).repartition(8)
    for pd_fn, ds_fn in (
        (unigram_logprob, unigram_logprob_ds),
        (bigram_logprob, bigram_logprob_ds),
    ):
        want = pd_fn(ds).reset_index(drop=True)
        got = (
            ds_fn(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[want.columns]
        )
        assert got.equals(want), pd_fn.__name__


def test_fold_partials_by_doc_vectorized(ray_session):
    """The shared doc-fold helper (unigram/bigram scorers) sums
    multi-bucket per-doc partials exactly like a pandas groupby-sum,
    across many docs per bucket task (ONE reduceat call per bucket,
    no per-doc Python callback), and keeps carrier rows typed."""
    from greenocr_ray.functions.corpus import _fold_partials_by_doc

    rng = np.random.Generator(np.random.PCG64(7))
    n = 5000
    doc = rng.integers(0, 800, size=n).astype(np.int64)
    a = rng.integers(0, 100, size=n).astype(np.int64)
    b = rng.normal(size=n)
    parts = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "n_tok": pa.array(a, type=pa.int64()),
                "logsum": pa.array(b, type=pa.float64()),
            }
        )
    ).repartition(16)
    out = (
        _fold_partials_by_doc(
            parts, {"n_tok": pa.int64(), "logsum": pa.float64()}, 32, 8
        )
        .to_pandas()
    )
    out = out[out["doc_id"] >= 0].sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    want = (
        pd.DataFrame({"doc_id": doc, "n_tok": a, "logsum": b})
        .groupby("doc_id", sort=True)
        .sum()
        .reset_index()
    )
    assert len(out) == len(want)
    assert (out["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (out["n_tok"].to_numpy() == want["n_tok"].to_numpy()).all()
    assert np.allclose(out["logsum"].to_numpy(), want["logsum"].to_numpy())


def test_cms_overestimates_and_merges_linearly(ray_session):
    """CMS point estimates are >= exact counts for every token (the
    overestimate property), and the distributed batch-partial merge
    equals a single-machine sketch of the same corpus (linearity)."""
    import hashlib
    from collections import Counter

    from greenocr_ray.functions.corpus import cms_estimate, cms_token_counts

    rng = np.random.Generator(np.random.PCG64(13))
    vocab = [f"v{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
        for _ in range(60)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
    )
    width, depth = 128, 4
    sk = cms_token_counts(ds, width=width, depth=depth)
    exact = Counter(w for t in texts for w in t.split())
    toks = sorted(exact)
    est = cms_estimate(sk, toks)
    ex = np.array([exact[t] for t in toks], dtype=np.int64)
    assert (est >= ex).all()
    # classic eps-bound holds per query only w.p. >= 1 - e^-depth
    # (~98% at depth=4); on this fixed fixture exactly 1 of 50 tokens
    # exceeds it — which is WHY the oracle gate asserts only the
    # provable overestimate property. Assert the probabilistic form.
    import math

    bound = math.ceil(math.e * sum(exact.values()) / width)
    assert ((est - ex) > bound).mean() <= 0.05
    # each row's cells sum to the total token count (linear sketch)
    total = int(sum(exact.values()))
    assert all(int(sk[r].sum()) == total for r in range(depth))
    # single-machine reference sketch is identical
    ref = np.zeros((depth, width), dtype=np.int64)
    for t, c in exact.items():
        dig = np.frombuffer(hashlib.md5(t.encode()).digest(), dtype="<u4")
        for r in range(depth):
            ref[r][int(dig[r % 4]) % width] += c
    assert (sk == ref).all()
