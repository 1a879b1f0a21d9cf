"""Quality/safety operators (repetition, PII scrub, contamination)
and the new relational ops (anti-join, rolling window, banded range
join) — edge-case unit tests; sf0.01 oracle parity is covered by the
driver gate and tools/check_oracle.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )


def test_repetition_stats_edges():
    from greenocr_ray.functions.quality import repetition_stats

    t = repetition_stats(
        _docs_table(
            [
                (1, ""),  # SQL split('') -> one empty-string word
                (2, "solo"),
                (3, "x x x x"),  # top bigram "x x" appears 3x of 3
                (4, "a b a b c"),
            ]
        )
    ).to_pandas().set_index("doc_id")
    assert t.loc[1, "n_words"] == 1 and t.loc[1, "top_bigram_frac"] == 0.0
    assert t.loc[2, "n_words"] == 1 and t.loc[2, "dup_word_frac"] == 0.0
    assert t.loc[3, "n_distinct_words"] == 1
    assert t.loc[3, "dup_word_frac"] == 0.75
    assert t.loc[3, "top_bigram_count"] == 3
    assert t.loc[3, "top_bigram_frac"] == 1.0
    # "a b" appears twice of 4 bigrams
    assert t.loc[4, "top_bigram_count"] == 2
    assert t.loc[4, "top_bigram_frac"] == 0.5


def test_pii_scrub_patterns():
    from greenocr_ray.functions.quality import pii_scrub

    t = pii_scrub(
        _docs_table(
            [
                (1, "mail a.b+c@ex-1.org now"),
                (2, "call 555-123-4567 or visit 10.0.0.255 ok"),
                # near-misses: short octet run, bad phone grouping
                (3, "ver 1.2.3 and 12-345-6789 stay"),
                (4, None),  # null text -> skip-and-continue
            ]
        )
    ).to_pandas().set_index("doc_id")
    assert t.loc[1, "text"] == "mail [EMAIL] now"
    assert t.loc[1, "n_redactions"] == 1
    assert t.loc[2, "text"] == "call [PHONE] or visit [IP] ok"
    assert t.loc[2, "n_redactions"] == 2
    assert t.loc[3, "text"] == "ver 1.2.3 and 12-345-6789 stay"
    assert t.loc[3, "n_redactions"] == 0
    assert t.loc[4, "text"] == "" and t.loc[4, "n_redactions"] == 0


def test_contamination_planted(ray_session):
    from greenocr_ray.functions.quality import contamination_check

    bench_text = "the quick brown fox jumps over the lazy dog again and again"
    clean_text = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh"
    # doc 200 embeds a 30-char run of the benchmark doc (doc_id 0 is
    # benchmark: 0 % 97 == 0) -> 11 shared 20-grams, over threshold
    dirty_text = "prefix " + bench_text[5:35] + " suffix padding words"
    docs = rd.from_arrow(
        _docs_table([(0, bench_text), (200, dirty_text), (300, clean_text)])
    )
    out = contamination_check(docs).to_pandas().set_index("doc_id")
    assert 0 not in out.index  # benchmark rows are not scored
    assert out.loc[200, "n_shared"] == 11
    assert bool(out.loc[200, "contaminated"])
    assert out.loc[300, "n_shared"] == 0
    assert not bool(out.loc[300, "contaminated"])


def _write(d, name, table):
    rd.from_arrow(table).write_parquet(str(d / f"{name}.parquet"))


def test_churned_customers_small(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "churn"
    d.mkdir()
    _write(
        d,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                "c_nationkey": pa.array([0, 0, 1], type=pa.int64()),
            }
        ),
    )
    _write(
        d,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
                "o_orderdate": pa.array(
                    np.array(
                        ["2001-03-01", "1999-01-01", "1999-06-01"],
                        dtype="datetime64[us]",
                    )
                ),
            }
        ),
    )
    _write(
        d,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], type=pa.int64()),
                "n_name": ["ALPHA", "BETA"],
            }
        ),
    )
    out = R.q_churned_customers(str(d))
    # cust 1 has a recent order; cust 2 (ALPHA) and 3 (BETA) are churned
    assert list(out["n_name"]) == ["ALPHA", "BETA"]
    assert list(out["n_customers"]) == [1, 1]


def test_rolling_avg_small(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "roll"
    d.mkdir()
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 10], type=pa.int64()),
                "ts": pa.array(
                    np.array(
                        ["2024-01-01T00:00:00"] * 0
                        + [
                            "2024-01-01T00:00:01",
                            "2024-01-01T00:00:02",
                            "2024-01-01T00:00:03",
                            "2024-01-01T00:00:04",
                            "2024-01-01T00:00:05",
                            "2024-01-01T00:00:01",
                        ],
                        dtype="datetime64[us]",
                    )
                ),
                "user_id": pa.array([7, 7, 7, 7, 7, 8], type=pa.int64()),
                "value": [2.0, 4.0, 6.0, 8.0, 10.0, 5.0],
            }
        ),
    )
    out = R.q_rolling_avg(str(d), window=4)
    got = dict(zip(out["event_id"], out["rolling_avg"]))
    assert got[1] == 2.0 and got[2] == 3.0 and got[3] == 4.0
    assert got[4] == 5.0  # full window (2+4+6+8)/4
    assert got[5] == 7.0  # window slides off the first event
    assert got[10] == 5.0  # separate user


def test_conversion_funnel_cross_bucket(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "funnel"
    d.mkdir()
    base = np.datetime64("2024-01-01T00:00:00", "us")
    W = np.timedelta64(6 * 3600, "s")
    rows = [
        # same-bucket pair, 30s lag -> a_u1m
        (1, base + np.timedelta64(100, "s"), 7, "click"),
        (2, base + np.timedelta64(130, "s"), 7, "purchase"),
        # pair straddling the 6h bucket boundary, 2s lag -> a_u1m
        (3, base + W - np.timedelta64(1, "s"), 7, "click"),
        (4, base + W + np.timedelta64(1, "s"), 7, "purchase"),
        # same timestamp: excluded (strict b.ts > a.ts)
        (5, base + np.timedelta64(9000, "s"), 8, "click"),
        (6, base + np.timedelta64(9000, "s"), 8, "purchase"),
        # lag beyond the window: excluded
        (7, base + np.timedelta64(50_000, "s"), 9, "click"),
        (8, base + np.timedelta64(50_000, "s") + W + np.timedelta64(1, "s"), 9, "purchase"),
        # 2h lag -> d_u6h (also checks purchase sees click from home copy)
        (9, base + np.timedelta64(40 * 3600, "s"), 10, "click"),
        (10, base + np.timedelta64(42 * 3600, "s"), 10, "purchase"),
        # other event types are ignored
        (11, base + np.timedelta64(101, "s"), 7, "view"),
    ]
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": [r[3] for r in rows],
            }
        ),
    )
    out = R.q_conversion_funnel(str(d))
    got = dict(zip(out["lag_bin"], out["n_pairs"]))
    # d_u6h = the 2h pair PLUS the cross pair click@100s -> purchase
    # @6h+1s (lag 21501s, inside the window) — every qualifying
    # click precedes every qualifying purchase of the same user
    assert got == {"a_u1m": 2, "d_u6h": 2}


def test_conversion_funnel_no_double_count(ray_session, tmp_path):
    """A click's k and k+1 copies must yield exactly ONE counted pair
    per purchase, and multiple clicks before one purchase each pair."""
    from greenocr_ray.functions import relational as R

    d = tmp_path / "funnel2"
    d.mkdir()
    base = np.datetime64("2024-01-01T01:00:00", "us")
    rows = [
        (1, base, 5, "click"),
        (2, base + np.timedelta64(60, "s"), 5, "click"),
        (3, base + np.timedelta64(90, "s"), 5, "purchase"),
    ]
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": [r[3] for r in rows],
            }
        ),
    )
    out = R.q_conversion_funnel(str(d))
    assert int(out["n_pairs"].sum()) == 2  # both clicks pair, once each


def test_event_outliers_planted(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "outl"
    d.mkdir()
    # 20 values at 10.0 +- 1 and one at 100 -> |z| >> 3 for the spike
    vals = [9.0, 11.0] * 10 + [100.0]
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array(list(range(len(vals))), type=pa.int64()),
                "event_type": ["click"] * len(vals),
                "value": vals,
            }
        ),
    )
    out = R.q_event_outliers(str(d))
    assert list(out["event_id"]) == [20]
    assert out["z"].iloc[0] > 3


def test_event_outliers_zero_std_excluded(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "outl0"
    d.mkdir()
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array([1, 2], type=pa.int64()),
                "event_type": ["view", "view"],
                "value": [5.0, 5.0],
            }
        ),
    )
    assert len(R.q_event_outliers(str(d))) == 0


def test_daily_active_users_dedups_within_day(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "dau"
    d.mkdir()
    base = np.datetime64("2024-03-01T00:00:00", "us")
    day = np.timedelta64(24 * 3600, "s")
    _write(
        d,
        "events",
        pa.table(
            {
                "ts": pa.array(
                    np.array(
                        [base, base + np.timedelta64(1, "h"), base + day, base],
                        dtype="datetime64[us]",
                    )
                ),
                "event_type": ["click", "click", "click", "view"],
                "user_id": pa.array([7, 7, 7, 7], type=pa.int64()),
            }
        ),
    )
    out = R.q_daily_active_users(str(d))
    # user 7 twice on day 1 counts once; day 2 separately; view separately
    assert list(out["n_users"]) == [1, 1, 1]
    assert list(out["event_type"]) == ["click", "click", "view"]


def test_unigram_logprob_hand_computed(ray_session):
    from greenocr_ray.functions.corpus import unigram_logprob

    docs = rd.from_arrow(_docs_table([(1, "a a b"), (2, "b"), (3, "")]))
    out = unigram_logprob(docs).set_index("doc_id")
    # corpus counts: a=2, b=2, total=4 -> logp = ln(0.5) for both
    lp = float(np.round(np.log(0.5), 6))
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "avg_logprob"] == lp
    assert out.loc[2, "n_tokens"] == 1 and out.loc[2, "avg_logprob"] == lp
    assert 3 not in out.index  # zero-token doc emits no row


def test_kmeans_recovers_planted_blobs(ray_session):
    from greenocr_ray.functions.similarity import kmeans_assign, kmeans_fit

    rng = np.random.Generator(np.random.PCG64(3))
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 15.0]])
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, size=(40, 2)) for c in centers]
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(pts))), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, p)) for p in pts],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    centroids, inertia = kmeans_fit(ds, k=3, iters=10)
    # Lloyd inertia never increases
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertia, inertia[1:]))
    out = kmeans_assign(ds, centroids).to_pandas().sort_values("vec_id")
    labels = out["cluster"].to_numpy()
    # each planted blob maps to exactly one cluster, blobs to distinct ones
    blob_labels = [set(labels[i * 40 : (i + 1) * 40]) for i in range(3)]
    assert all(len(s) == 1 for s in blob_labels)
    assert len(set().union(*blob_labels)) == 3
    # tight blobs -> tiny within-cluster distances
    assert float(out["dist2"].max()) < 4.0


def test_connected_groups_driver_matches_distributed(ray_session):
    from greenocr_ray.functions.dedup import (
        _cc_distributed,
        connected_dedup_groups,
    )

    # path 1-2-3-4, separate pair (10,11), triangle (20,21,22)
    pairs = pd.DataFrame(
        {
            "doc_a": [1, 2, 3, 10, 20, 21, 20],
            "doc_b": [2, 3, 4, 11, 21, 22, 22],
        }
    )
    drv = connected_dedup_groups(pairs)
    dist = _cc_distributed(rd.from_pandas(pairs))
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert dict(zip(drv["doc_id"], drv["group_id"])) == expect
    assert dict(zip(dist["doc_id"], dist["group_id"])) == expect


def test_connected_groups_empty_pairs(ray_session):
    from greenocr_ray.functions.dedup import connected_dedup_groups

    out = connected_dedup_groups(pd.DataFrame(columns=["doc_a", "doc_b"]))
    assert len(out) == 0 and list(out.columns) == ["doc_id", "group_id"]


def test_nation_top_customers_order_and_ties(ray_session, tmp_path):
    from greenocr_ray.functions import relational as R

    d = tmp_path / "stragg"
    d.mkdir()
    _write(
        d,
        "customer",
        pa.table(
            {
                "c_name": ["ann", "bob", "cat", "dan", "eve"],
                "c_nationkey": pa.array([0, 0, 0, 0, 1], type=pa.int64()),
                # tie at 5.0 between bob and cat -> name ascending
                "c_acctbal": [9.0, 5.0, 5.0, 1.0, 2.0],
            }
        ),
    )
    _write(
        d,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], type=pa.int64()),
                "n_name": ["ALPHA", "BETA"],
            }
        ),
    )
    out = R.q_nation_top_customers(str(d), k=3)
    assert list(out["n_name"]) == ["ALPHA", "BETA"]
    assert out["top_customers"].iloc[0] == "ann,bob,cat"
    assert out["top_customers"].iloc[1] == "eve"


def test_top_tokens_exact_under_tight_capacity(ray_session):
    from greenocr_ray.functions.corpus import top_tokens

    # 3 heavy tokens + 200 singletons; capacity far below vocab size
    # exercises the Misra-Gries compress on both batch and merge sides
    heavy = " ".join(["aaa"] * 50 + ["bbb"] * 30 + ["ccc"] * 20)
    rare = " ".join(f"tok{i:03d}" for i in range(200))
    docs = rd.from_arrow(_docs_table([(1, heavy), (2, rare), (3, heavy)]))
    out = top_tokens(docs, k=3, capacity=16)
    assert list(out["token"]) == ["aaa", "bbb", "ccc"]
    assert list(out["n"]) == [100, 60, 40]


def test_approx_quantiles_within_bound(ray_session, tmp_path):
    from greenocr_ray.functions.corpus import approx_grouped_quantiles

    d = tmp_path / "aq"
    d.mkdir()
    rng = np.random.Generator(np.random.PCG64(5))
    vals = np.concatenate([rng.normal(50, 10, 500), rng.exponential(20, 500)])
    types = ["norm"] * 500 + ["exp"] * 500
    _write(
        d,
        "events",
        pa.table({"event_type": types, "value": vals}),
    )
    ds = rd.read_parquet(str(d / "events.parquet"))
    out = approx_grouped_quantiles(ds)
    assert list(out["event_type"]) == ["exp", "norm"]
    assert list(out["n"]) == [500, 500]
    assert out["within_bound"].all()


def test_dup_ngram_stats_planted(ray_session):
    from greenocr_ray.functions.corpus import dup_ngram_stats

    shared = "one two three four five"  # exactly one 5-gram, in docs 1+2
    docs = rd.from_arrow(
        _docs_table(
            [
                (1, f"{shared} unique tail alpha beta gamma"),
                (2, f"prefix words here {shared}"),
                (3, "too short"),  # < 5 tokens -> 0 grams, ratio 0.0
                (4, f"{shared} and {shared}"),  # within-doc repeat counts
                (5, "wholly distinct text with no repeats at all"),
            ]
        )
    )
    out = dup_ngram_stats(docs, n=5).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "dup_ratio"] == 0.0
    assert out.loc[1, "n_grams"] == 6 and out.loc[1, "n_dup_grams"] == 1
    assert out.loc[2, "n_grams"] == 4 and out.loc[2, "n_dup_grams"] == 1
    # doc 4: 11 tokens -> 7 gram positions; the two literal `shared`
    # occurrences are dup (cross-doc AND within-doc); bridging grams
    # ("four five and ...") are unique to doc 4
    assert out.loc[4, "n_grams"] == 7 and out.loc[4, "n_dup_grams"] == 2
    assert out.loc[5, "n_dup_grams"] == 0


def test_weighted_sample_favors_heavy_and_is_exact(ray_session):
    import hashlib

    from greenocr_ray.functions.corpus import weighted_sample

    n = 2000
    w = np.where(np.arange(n) < 100, 5000, 1).astype("int64")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "n_chars": pa.array(w, type=pa.int64()),
        }
    )
    out = weighted_sample(rd.from_arrow(t), k=200)
    # heavy docs (5000x weight) should essentially all be selected
    assert (out["doc_id"] < 100).sum() >= 95
    # per-batch partial top-k truncation must equal the brute ranking
    u = np.array(
        [
            int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
            for d in range(n)
        ],
        dtype=np.float64,
    )
    key = -np.log((u + 0.5) / float(1 << 60)) / w
    expect = np.argsort(key, kind="stable")[:200]
    assert set(out["doc_id"]) == set(expect.tolist())


def test_grouped_top_k_across_blocks(ray_session):
    from greenocr_ray.functions.corpus import grouped_top_k

    # two blocks; group "a" global top-3 spans both blocks
    t1 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "source": ["a", "a", "b", "b"],
            "n_chars": pa.array([10, 50, 7, 7], type=pa.int64()),
        }
    )
    t2 = pa.table(
        {
            "doc_id": pa.array([5, 6, 7], type=pa.int64()),
            "source": ["a", "a", "b"],
            "n_chars": pa.array([40, 30, 9], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = grouped_top_k(ds, k=3)
    a = out[out["source"] == "a"]
    assert list(a["doc_id"]) == [2, 5, 6] and list(a["rank"]) == [1, 2, 3]
    b = out[out["source"] == "b"]
    # tie at 7 chars breaks on doc_id ascending
    assert list(b["doc_id"]) == [7, 3, 4]


def test_pack_sequences_invariants(ray_session):
    from greenocr_ray.functions.corpus import pack_sequences

    # sizes chosen so FFD must mix: 300+200=500, 256+256=512 exact fit,
    # 600 oversize (own pack), many small fillers
    texts = (
        ["w " * 300, "w " * 200, "w " * 256, "w " * 256, "w " * 600]
        + ["w " * 10] * 20
    )
    docs = rd.from_arrow(
        _docs_table([(i, t.strip()) for i, t in enumerate(texts)])
    )
    out = pack_sequences(docs, cap=512)
    assert out.loc[0, "n_docs"] == 25
    assert out.loc[0, "total_tokens"] == 300 + 200 + 256 + 256 + 600 + 200
    assert bool(out.loc[0, "cap_ok"])
    assert bool(out.loc[0, "conserved"])
    assert bool(out.loc[0, "packs_near_optimal"])


def test_adaptive_length_filter_per_group_bounds(ray_session):
    from greenocr_ray.functions.corpus import adaptive_length_filter

    # group "long" has 10x the lengths of group "short": a global
    # threshold would nuke one group; adaptive bounds keep both middles
    short = [(i, "s", c) for i, c in enumerate(range(10, 31))]
    long_ = [(100 + i, "l", c * 10) for i, c in enumerate(range(10, 31))]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in short + long_], type=pa.int64()),
            "source": [r[1] for r in short + long_],
            "n_chars": pa.array(
                [r[2] for r in short + long_], type=pa.int64()
            ),
        }
    )
    out = (
        adaptive_length_filter(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
    )
    kept_s = out[out["source"] == "s"]["n_chars"]
    kept_l = out[out["source"] == "l"]["n_chars"]
    assert len(kept_s) == 19 and len(kept_l) == 19  # p5/p95 trim one each
    assert kept_s.min() == 11 and kept_s.max() == 29
    assert kept_l.min() == 110 and kept_l.max() == 290


def test_global_row_number_across_blocks(ray_session):
    from greenocr_ray.functions.relational import global_row_number

    rng = np.random.Generator(np.random.PCG64(11))
    vals = rng.permutation(200).astype("float64")
    t1 = pa.table(
        {
            "event_id": pa.array(np.arange(100), type=pa.int64()),
            "value": vals[:100],
        }
    )
    t2 = pa.table(
        {
            "event_id": pa.array(np.arange(100, 200), type=pa.int64()),
            "value": vals[100:],
        }
    )
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = global_row_number(ds).to_pandas().sort_values("rank")
    assert list(out["rank"]) == list(range(1, 201))
    # rank order must equal value order (values are a permutation)
    assert list(out["value"]) == sorted(vals.tolist())


def test_profile_numeric_with_nulls(ray_session):
    from greenocr_ray.functions.relational import profile_numeric

    t = pa.table(
        {
            "a": pa.array([1.0, None, 3.0, None], type=pa.float64()),
            "b": pa.array([10.0, 20.0, 30.0, 40.0], type=pa.float64()),
        }
    )
    out = profile_numeric(rd.from_arrow(t), ["a", "b"]).set_index("col")
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 2
    assert out.loc["a", "vmin"] == 1.0 and out.loc["a", "vmax"] == 3.0
    assert out.loc["a", "mean"] == 2.0  # mean over non-null values
    assert out.loc["b", "n_null"] == 0 and out.loc["b", "mean"] == 25.0


def test_global_ntile_uneven(ray_session):
    from greenocr_ray.functions.relational import global_ntile

    # 23 rows over 10 tiles: first 3 tiles get 3 rows, rest get 2
    t = pa.table(
        {
            "event_id": pa.array(np.arange(23), type=pa.int64()),
            "value": np.arange(23).astype("float64"),
        }
    )
    out = (
        global_ntile(rd.from_arrow(t), tiles=10)
        .to_pandas()
        .sort_values("value")
    )
    sizes = out.groupby("tile").size()
    assert list(sizes[sizes.index <= 3]) == [3, 3, 3]
    assert list(sizes[sizes.index > 3]) == [2] * 7
    assert list(out["tile"]) == sorted(out["tile"])  # monotone in value


def test_mix_sources_rates_and_binding(ray_session):
    from greenocr_ray.functions.corpus import mix_sources

    # heavy: 1000 docs, light: 100 docs; targets 50/50 -> light binds
    # (T=200), heavy keeps at rate 0.1, light keeps everything
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1100), type=pa.int64()),
            "source": ["heavy"] * 1000 + ["light"] * 100 + [],
        }
    )
    out = (
        mix_sources(
            rd.from_arrow(t), {"heavy": 0.5, "light": 0.5}
        )
        .to_pandas()
    )
    n = out.groupby("source").size()
    assert n["light"] == 100  # binding source keeps all
    assert 70 <= n["heavy"] <= 140  # binomial(1000, 0.1)
    # unlisted sources drop entirely
    t2 = pa.table(
        {
            "doc_id": pa.array([5000], type=pa.int64()),
            "source": ["other"],
        }
    )
    out2 = mix_sources(
        rd.from_arrow(t).union(rd.from_arrow(t2)),
        {"heavy": 0.5, "light": 0.5},
    ).to_pandas()
    assert "other" not in set(out2["source"])


def test_chunk_documents_boundaries(ray_session):
    from greenocr_ray.functions.corpus import chunk_documents

    import pytest

    ten = " ".join(f"t{i}" for i in range(10))
    docs = rd.from_arrow(
        _docs_table([(1, ten), (2, "a b c"), (3, ""), (4, "solo")])
    )
    out = (
        chunk_documents(docs, chunk=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    # stride 3: starts 0,3,6,9 -> last chunk is the single token t9
    assert list(d1["n_tokens"]) == [4, 4, 4, 1]
    assert d1.iloc[0]["text"] == "t0 t1 t2 t3"
    assert d1.iloc[1]["text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert d1.iloc[3]["text"] == "t9"
    assert list(out[out["doc_id"] == 2]["n_tokens"]) == [3]
    assert 3 not in set(out["doc_id"])  # empty doc emits nothing
    assert list(out[out["doc_id"] == 4]["text"]) == ["solo"]
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=4, overlap=4)


def test_normalize_unicode_composition_and_collapse():
    from greenocr_ray.stages.clean_text import normalize_unicode

    # "Ame" + combining acute + "lie": NFC composes to é
    decomposed = "Amélie  WAS\there "
    t = normalize_unicode(
        _docs_table([(1, decomposed), (2, "plain text"), (3, "ÆØÅ ß")])
    ).to_pandas().set_index("doc_id")
    assert t.loc[1, "text_norm"] == "amélie was here"
    assert bool(t.loc[1, "changed"])
    assert t.loc[2, "text_norm"] == "plain text"
    assert not bool(t.loc[2, "changed"])
    assert t.loc[3, "text_norm"] == "æøå ß"  # ß lowercases to itself


def test_normalize_unicode_duckdb_parity_non_ascii():
    import duckdb

    from greenocr_ray.stages.clean_text import normalize_unicode

    rows = [
        (1, "Ame" + chr(0x301) + "lie  WAS\there "),
        (2, "ÆØÅ ß"),  # NBSP is \s in RE2? must match both sides
        (3, "już  składnia"),
    ]
    mine = normalize_unicode(_docs_table(rows)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    theirs = con.execute(
        r"""SELECT doc_id,
               trim(regexp_replace(nfc_normalize(lower(text)),
                    '\s+', ' ', 'g')) AS text_norm,
               trim(regexp_replace(nfc_normalize(lower(text)),
                    '\s+', ' ', 'g')) <> text AS changed
           FROM d ORDER BY doc_id"""
    ).df()
    assert list(mine["text_norm"]) == list(theirs["text_norm"])
    assert list(mine["changed"]) == list(theirs["changed"])


def test_llm_prep_composition(ray_session):
    from greenocr_ray.functions.corpus import llm_prep

    # docs 1 and 2 normalize to the SAME text (case/whitespace): dedup
    # must keep doc 1 only — and only AFTER normalization would they
    # collide, so this catches normalize-before-dedup ordering drift
    base = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, "s", len(base), base),
        (2, "s", len(base), base.upper() + "  "),
        (3, "s", len(base), "totally different words here ok"),
        # length outlier within its source -> filtered before chunking
        (4, "s", 10_000, "x " * 5000),
    ] + [(10 + i, "s", len(base) + i % 3, f"doc {i} unique filler text") for i in range(20)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": [r[1] for r in rows],
            "n_chars": pa.array([r[2] for r in rows], type=pa.int64()),
            "text": [r[3] for r in rows],
        }
    )
    out = llm_prep(rd.from_arrow(t), chunk=4, overlap=1).to_pandas()
    ids = set(out["doc_id"])
    assert 1 in ids and 2 not in ids  # post-normalization dedup
    assert 4 not in ids  # p95 length outlier dropped
    d1 = out[out["doc_id"] == 1].sort_values("chunk_id")
    assert list(d1["n_tokens"]) == [4, 4, 4, 1]  # 10 tokens, stride 3
    assert d1.iloc[0]["text"] == "w0 w1 w2 w3"


def test_priority_revenue_inner_join_semantics(ray_session, tmp_path):
    from greenocr_ray.functions.relational import q_priority_revenue

    d = tmp_path / "pj"
    d.mkdir()
    _write(
        d,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 99], type=pa.int64()),
                "l_quantity": [2.0, 3.0, 5.0, 7.0],  # 99 has no order
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
            }
        ),
    )
    _write(
        d,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_orderpriority": ["1-URGENT", "2-HIGH", "2-HIGH"],
            }
        ),
    )
    out = q_priority_revenue(str(d), num_partitions=4).set_index(
        "o_orderpriority"
    )
    assert out.loc["1-URGENT", "n_lines"] == 2
    assert out.loc["1-URGENT", "sum_qty"] == 5.0
    # order 3 has no lineitems, lineitem 99 has no order: both dropped
    assert out.loc["2-HIGH", "n_lines"] == 1
    assert len(out) == 2


def test_next_event_gap_user_boundaries(ray_session, tmp_path):
    from greenocr_ray.functions.relational import q_next_event_gap

    d = tmp_path / "gap"
    d.mkdir()
    base = np.datetime64("2024-01-01T00:00:00", "us")
    _write(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "ts": pa.array(
                    np.array(
                        [base, base + np.timedelta64(90, "s"),
                         base + np.timedelta64(5, "s"), base],
                        dtype="datetime64[us]",
                    )
                ),
                # users 7 and 23 collide mod 16 -> same bucket, the
                # boundary mask must still separate them
                "user_id": pa.array([7, 7, 23, 23], type=pa.int64()),
            }
        ),
    )
    out = (
        q_next_event_gap(str(d), nbuckets=16)
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[1, "gap_sec"] == 90.0
    assert out.loc[2, "gap_sec"] == -1.0  # last event of user 7
    assert out.loc[4, "gap_sec"] == 5.0
    assert out.loc[3, "gap_sec"] == -1.0


def test_bloom_no_false_negatives_and_filters(ray_session):
    from greenocr_ray.functions.relational import (
        bloom_build,
        bloom_contains,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    present = rng.choice(10_000_000, size=5000, replace=False).astype("int64")
    ds = rd.from_arrow(pa.table({"k": pa.array(present, type=pa.int64())}))
    m = 1 << 20
    bits = bloom_build(ds, "k", m_bits=m)
    # every inserted key must probe true (no false negatives)
    assert bloom_contains(present, bits, m).all()
    # absent keys mostly filtered: fpr ~ (1-e^{-kn/m})^4 << 1%
    absent = (present + 10_000_000).astype("int64")
    fpr = bloom_contains(absent, bits, m).mean()
    assert fpr < 0.01


def test_top_tokens_per_group_tight_capacity(ray_session):
    from greenocr_ray.functions.corpus import top_tokens_per_group

    heavy_a = " ".join(["aaa"] * 40 + ["bbb"] * 25)
    rare_a = " ".join(f"ar{i:03d}" for i in range(150))
    heavy_b = " ".join(["zzz"] * 30 + ["yyy"] * 10)
    t = pa.table(
        {
            "source": ["A", "A", "B"],
            "text": [heavy_a, rare_a, heavy_b],
        }
    )
    out = top_tokens_per_group(
        rd.from_arrow(t), k=2, capacity=16
    )
    a = out[out["source"] == "A"]
    assert list(a["token"]) == ["aaa", "bbb"] and list(a["n"]) == [40, 25]
    b = out[out["source"] == "B"]
    assert list(b["token"]) == ["zzz", "yyy"] and list(b["n"]) == [30, 10]
    assert list(b["rank"]) == [1, 2]


def test_detect_stopwords_threshold(ray_session):
    from greenocr_ray.functions.corpus import detect_stopwords

    # "the" in 3/4 docs, "rare" in 1/4, "half" in exactly 2/4 (boundary
    # df*2 == N must be INCLUDED)
    docs = rd.from_arrow(
        _docs_table(
            [
                (1, "the half cat"),
                (2, "the half dog"),
                (3, "the bird"),
                (4, "rare fish"),
            ]
        )
    )
    out = detect_stopwords(docs)
    assert list(out["token"]) == ["the", "half"]
    assert list(out["df"]) == [3, 2]
    assert out.loc[1, "df_frac"] == 0.5


def test_value_histogram_edges(ray_session):
    from greenocr_ray.functions.corpus import value_histogram

    vals = np.array([0.0, 0.49, 0.5, 0.99, 1.0] + [0.25] * 5)
    ds = rd.from_arrow(pa.table({"value": vals}))
    out = value_histogram(ds, bins=2).set_index("bin")
    # max value clamps into the LAST bin, not a phantom bins-th bin
    assert out.loc[0, "n"] == 7 and out.loc[1, "n"] == 3
    assert out.loc[0, "lo"] == 0.0 and out.loc[1, "lo"] == 0.5


def test_split_leakage_planted(ray_session):
    import hashlib as _h

    from greenocr_ray.functions.corpus import split_leakage, split_of_ids

    # find real train and test doc_ids under the md5 split rule
    train_id = next(i for i in range(1000) if split_of_ids([i]) == ["train"])
    test_id = next(i for i in range(1000) if split_of_ids([i]) == ["test"])
    test_id2 = next(
        i for i in range(test_id + 1, 2000) if split_of_ids([i]) == ["test"]
    )
    docs = rd.from_arrow(
        _docs_table(
            [
                (train_id, "the shared leaked document text"),
                (test_id, "the shared leaked document text"),  # leaked
                (test_id2, "clean unique test text"),
            ]
        )
    )
    out = split_leakage(docs)
    assert list(out["doc_id"]) == [test_id]


def test_snapshot_diff_statuses(ray_session):
    from greenocr_ray.functions.corpus import snapshot_diff

    a = rd.from_arrow(
        _docs_table([(1, "same"), (2, "old"), (3, "gone"), (18, "same2")])
    )
    # 18 and 2 collide mod 16 with 2... 18 % 16 == 2: same bucket as 2
    b = rd.from_arrow(
        _docs_table([(1, "same"), (2, "new"), (4, "born"), (18, "same2")])
    )
    out = snapshot_diff(a, b)
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {2: "changed", 3: "removed", 4: "added"}

    # identical snapshots -> typed empty frame
    empty = snapshot_diff(a, a)
    assert len(empty) == 0 and list(empty.columns) == ["doc_id", "status"]


def test_extract_entities_counts():
    from greenocr_ray.functions.quality import extract_entities

    t = extract_entities(
        _docs_table(
            [
                (1, "mail a@b.org and c.d+e@f-g.co.uk now"),
                (2, 'see https://x.io/p?q=1 and http://y.com, "https://z.net"'),
                (3, "pi is 3.14 and the year 2024; v1.2.3 has parts"),
                (4, "nothing here"),
            ]
        )
    ).to_pandas().set_index("doc_id")
    assert t.loc[1, "emails"] == 2
    assert t.loc[2, "urls"] == 3
    # 3.14, 2024, then "2.3" from v1.2.3 ("v1" has no \b before the 1,
    # so the scan first matches at the 2)
    assert t.loc[3, "numbers"] == 3
    assert t.loc[4, "emails"] == 0 and t.loc[4, "numbers"] == 0


def test_lexical_diversity_values():
    from greenocr_ray.functions.textstats import lexical_diversity

    t = lexical_diversity(
        _docs_table(
            [
                (1, "a a a a"),  # 1 type / 4 tokens, no hapax
                (2, "w x y z"),  # all distinct, all hapax
                (3, "a a b"),  # ttr 2/3, hapax 1/3
                (4, ""),  # empty -> 0.0, not null
            ]
        )
    ).to_pandas().set_index("doc_id")
    assert t.loc[1, "ttr"] == 0.25 and t.loc[1, "hapax_frac"] == 0.0
    assert t.loc[2, "ttr"] == 1.0 and t.loc[2, "hapax_frac"] == 1.0
    assert t.loc[3, "ttr"] == 0.666667 and t.loc[3, "hapax_frac"] == 0.333333
    assert t.loc[4, "ttr"] == 0.0 and t.loc[4, "hapax_frac"] == 0.0


def test_rollup_events_levels(ray_session, tmp_path):
    from greenocr_ray.functions.relational import q_rollup_events

    d = tmp_path / "ru"
    d.mkdir()
    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86400, "s")
    _write(
        d,
        "events",
        pa.table(
            {
                "event_type": ["click", "click", "view"],
                "ts": pa.array(
                    np.array([base, base + day, base], dtype="datetime64[us]")
                ),
                "value": [1.0, 2.0, 4.0],
            }
        ),
    )
    out = q_rollup_events(str(d))
    rows = {(r.event_type, r.day): (r.n, r.total) for r in out.itertuples()}
    d0 = 19723  # 2024-01-01 in epoch days
    assert rows[("click", d0)] == (1, 1.0)
    assert rows[("click", d0 + 1)] == (1, 2.0)
    assert rows[("click", -1)] == (2, 3.0)  # per-type subtotal
    assert rows[("view", -1)] == (1, 4.0)
    assert rows[("ALL", -1)] == (3, 7.0)  # grand total
    assert len(out) == 6


def test_dup_ngram_streams_on_heavy_dup_corpus(ray_session, monkeypatch):
    """VERDICT r3 #7: on a heavily duplicated crawl (every doc shares
    the same passage — the exact case the metric exists for) the plan
    must stay ONE stream: no Dataset.materialize, and the per-doc dup
    fold happens inside the gram buckets."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from greenocr_ray.functions.corpus import dup_ngram_stats

    passage = "the same duplicated passage appears in every single doc"
    texts = [f"{passage} unique{i} tail{i}" for i in range(40)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), type=pa.int64()),
                "text": texts,
            }
        )
    )
    calls = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    out = dup_ngram_stats(docs, n=5).to_pandas().set_index("doc_id")
    assert calls == [], "materialize barrier reappeared in dup_ngram_stats"
    # every doc's shared-passage grams are duplicated corpus-wide
    assert (out["n_dup_grams"] >= 5).all()
    assert (out["dup_ratio"] > 0).all() and (out["dup_ratio"] <= 1).all()


def test_detect_stopwords_shuffle_path_matches_driver_path(ray_session):
    """The vocab-scale branch (distributed term groupby + in-plan
    threshold filter, no full-vocab driver collect) returns the same
    stopword set as the small-corpus driver fold."""
    from greenocr_ray.functions.corpus import detect_stopwords

    docs = rd.from_arrow(
        _docs_table(
            [
                (1, "the half cat"),
                (2, "the half dog"),
                (3, "the bird"),
                (4, "rare fish"),
            ]
        )
    )
    small = detect_stopwords(docs)
    shuffled = detect_stopwords(docs, driver_limit=0)
    pd.testing.assert_frame_equal(small, shuffled)


def test_hash_embed_deterministic_and_sparse(ray_session):
    """Feature hashing is deterministic, int-exact, and emits one row
    per (doc, populated dim); signed counts sum correctly for a doc
    whose tokens collide into one dimension."""
    import hashlib

    from greenocr_ray.functions.textstats import hash_embed

    docs = rd.from_arrow(
        _docs_table([(1, "cat cat dog"), (2, ""), (3, "cat")])
    )
    out = (
        docs.map_batches(hash_embed, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "dim"])
        .reset_index(drop=True)
    )

    def hv(tok):
        hx = hashlib.md5(tok.encode()).hexdigest()
        return int(hx[:8], 16) % 16, 1 if int(hx[8], 16) % 2 == 0 else -1

    jc, sc = hv("cat")
    jd, sd = hv("dog")
    want = {}
    want[(1, jc)] = want.get((1, jc), 0) + 2 * sc
    want[(1, jd)] = want.get((1, jd), 0) + sd
    want[(3, jc)] = sc
    got = {(r.doc_id, r.dim): r.value for r in out.itertuples()}
    assert got == want
    assert 2 not in set(out["doc_id"])  # empty doc -> no rows
