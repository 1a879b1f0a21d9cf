"""Relational operator suite over the TPC-H-ish testdata tables.

Each function maps to a SURVEY.md §2 operator class and has a matching
DuckDB oracle in ``__ray_entry__.oracle_sql``:

- grouped aggregation w/ partial pre-aggregation (G1/G3/G6 analogs)
- broadcast hash join of small dimension tables (G5)
- sort / top-k (G2), distinct counting (G4)
- tumbling-window aggregate over the events stream (§2.6 note)

Scale pattern notes are inline; every read prunes columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def round_half_away(x, decimals: int = 6):
    """DuckDB-compatible ROUND: half away from zero. numpy/pandas
    round half-to-even, which disagrees with SQL exactly when a value
    lands on a half (e.g. 30.0465625 at 6 decimals)."""
    m = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def combine_small_agg(
    parts: rd.Dataset, keys: list[str], agg: dict[str, str]
) -> pd.DataFrame:
    """Final combine for SMALL-cardinality grouped aggregations.

    ``parts`` holds per-block partial aggregates (each block already
    collapsed to <= #groups rows by a map_batches partial), so total
    size is bounded by #groups x #blocks. For group counts in the
    hundreds-to-thousands, Ray's shuffle aggregate pays seconds of
    fixed actor-pool cost to move kilobytes; instead the partials are
    STREAMED to the driver and folded incrementally — O(#groups)
    driver memory regardless of block count, no shuffle at all.

    Use Ray's native ``groupby().aggregate()`` when the group count is
    itself data-sized (e.g. per-document keys): this helper's driver
    fold would then become the bottleneck.

    ``agg`` maps column -> 'sum' | 'min' | 'max' (partial counts are
    combined with 'sum').
    """
    acc: pd.DataFrame | None = None
    for batch in parts.iter_batches(batch_size=65536, batch_format="pandas"):
        acc = batch if acc is None else pd.concat([acc, batch], ignore_index=True)
        if len(acc) > 200_000:  # fold early: bound driver memory
            acc = acc.groupby(keys, sort=False).agg(agg).reset_index()
    if acc is None:
        return pd.DataFrame(columns=[*keys, *agg])
    return acc.groupby(keys, sort=False).agg(agg).reset_index()


# ------------------------------------------------------ Q1-style agg


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered grouped aggregation with per-batch
    partial aggregation before the (tiny) shuffle."""
    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        df = t.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["charge"] = df["disc_price"] * (1 + df["l_tax"])
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g.reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = combine_small_agg(
        parts,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": "sum",
            "sum_base_price": "sum",
            "sum_disc_price": "sum",
            "sum_charge": "sum",
            "sum_disc": "sum",
            "count_order": "sum",
        },
    )
    # the monetary inputs carry exactly 2 decimals, so every sum is
    # EXACT at 4 decimals (6 for the tax-on-discount charge); rounding
    # there first absorbs the summation-order ulps that otherwise flip
    # a 2-decimal half boundary vs the oracle, then round half-away
    # (DuckDB ROUND semantics) to the reported precision
    for c, d in (
        ("sum_qty", 4),
        ("sum_base_price", 4),
        ("sum_disc_price", 4),
        ("sum_charge", 6),
        ("sum_disc", 4),
    ):
        out[c] = round_half_away(out[c], d)
    out["avg_qty"] = round_half_away(out["sum_qty"] / out["count_order"], 6)
    out["avg_price"] = round_half_away(
        out["sum_base_price"] / out["count_order"], 6
    )
    out["avg_disc"] = round_half_away(out["sum_disc"] / out["count_order"], 6)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = round_half_away(out[c], 2)
    out = out.drop(columns=["sum_disc"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------- sort / top-k / filter


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort("o_totalprice", descending=True).limit(10).to_pandas()
    top["o_totalprice"] = round_half_away(top["o_totalprice"], 2)
    return top


def q_filter_events(sf_dir: str) -> pd.DataFrame:
    """Vectorized predicate inside map_batches (not row filter)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def pred(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t.column("event_type"), "click"),
            pc.greater(t.column("value"), 50.0),
        )
        return t.filter(m)

    out = (
        ds.map_batches(pred, batch_format="pyarrow")
        .sort("value", descending=True)
        .limit(20)
        .to_pandas()
    )
    out["value"] = round_half_away(out["value"], 6)
    return out


# --------------------------------------------------- broadcast joins


def q_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer via broadcast (customer segment dict is small:
    ray.put once, read in each task — no shuffle join)."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_map = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist())
    )
    seg_ref = ray.put(seg_map)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        df = t.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        g = df.groupby("c_mktsegment", sort=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )
        return g.reset_index()

    parts = orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = combine_small_agg(
        parts, ["c_mktsegment"], {"revenue": "sum", "n_orders": "sum"}
    )
    out["revenue"] = round_half_away(out["revenue"], 2)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_region_customers(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation ⋈ region — both dims broadcast; group by
    region name."""
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r_name = dict(
        zip(
            region.column("r_regionkey").to_pylist(),
            region.column("r_name").to_pylist(),
        )
    )
    nat_to_region = {
        nk: r_name[rk]
        for nk, rk in zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_regionkey").to_pylist(),
        )
    }
    ref = ray.put(nat_to_region)
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = ray.get(ref)
        df = t.to_pandas()
        df["r_name"] = df["c_nationkey"].map(m)
        g = df.groupby("r_name", sort=False).agg(
            n_customers=("c_acctbal", "size"), sum_acctbal=("c_acctbal", "sum")
        )
        return g.reset_index()

    parts = cust.map_batches(partial, batch_format="pyarrow")
    out = combine_small_agg(
        parts, ["r_name"], {"n_customers": "sum", "sum_acctbal": "sum"}
    )
    out["avg_acctbal"] = round_half_away(out["sum_acctbal"] / out["n_customers"], 6)
    out["sum_acctbal"] = round_half_away(out["sum_acctbal"], 2)
    return out.sort_values("r_name").reset_index(drop=True)


def q_supplier_nation(sf_dir: str) -> pd.DataFrame:
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    n_map = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    ref = ray.put(n_map)
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = ray.get(ref)
        df = t.to_pandas()
        df["n_name"] = df["s_nationkey"].map(m)
        return (
            df.groupby("n_name", sort=False)
            .agg(n_suppliers=("s_acctbal", "size"), total_acctbal=("s_acctbal", "sum"))
            .reset_index()
        )

    out = combine_small_agg(
        supp.map_batches(partial, batch_format="pyarrow"),
        ["n_name"],
        {"n_suppliers": "sum", "total_acctbal": "sum"},
    )
    out["total_acctbal"] = round_half_away(out["total_acctbal"], 2)
    return out.sort_values("n_name").reset_index(drop=True)


# ------------------------------------------------ distinct / grouping


def q_lang_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("lang", sort=False).agg(
            n_docs=("n_chars", "size"),
            total_chars=("n_chars", "sum"),
            min_chars=("n_chars", "min"),
            max_chars=("n_chars", "max"),
        )
        return g.reset_index()

    out = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        {
            "n_docs": "sum",
            "total_chars": "sum",
            "min_chars": "min",
            "max_chars": "max",
        },
    )
    return out.sort_values("lang").reset_index(drop=True)


def q_part_brand_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("p_brand", sort=False).agg(
            n_parts=("p_retailprice", "size"),
            sum_price=("p_retailprice", "sum"),
            max_size=("p_size", "max"),
        )
        return g.reset_index()

    out = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["p_brand"],
        {"n_parts": "sum", "sum_price": "sum", "max_size": "max"},
    )
    out["avg_price"] = round_half_away(out["sum_price"] / out["n_parts"], 6)
    out["sum_price"] = round_half_away(out["sum_price"], 2)
    return out.sort_values("p_brand").reset_index(drop=True)


# ------------------------------------------------ windowed aggregate


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type: GROUP BY (type, hour
    bucket). Window key computed vectorized; partial-aggregated before
    the shuffle (the streaming-shaped workload pattern)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        # unit-safe epoch-hour bucket (works for datetime64[ns] or [us])
        df["hour_bucket"] = (
            df["ts"].values.astype("datetime64[s]").astype("int64") // 3600
        )
        g = df.groupby(["event_type", "hour_bucket"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return g.reset_index()

    out = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "hour_bucket"],
        {"n_events": "sum", "sum_value": "sum"},
    )
    # avg from the ROUNDED sum: the raw float64 sum differs from the
    # oracle's by summation order in the last ulp, which flips the 6th
    # decimal at scale; rounding to cents first absorbs it
    out["sum_value"] = round_half_away(out["sum_value"], 2)
    out["avg_value"] = round_half_away(out["sum_value"] / out["n_events"], 6)
    return out.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)


# ------------------------------------------- sessionization (gap windows)


def q_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds ``gap_minutes``. The per-user event history
    must be contiguous -> genuine ``groupby(user_id).map_groups``
    shuffle (the one wide op here); session stats are computed
    vectorized inside each group. Session count is data-sized, so the
    result stays a Dataset-shaped output, not a driver fold.

    Reference analog: the size-bucket grouping + per-bucket sequential
    pass (train.py:899-1004) — grouping key swapped for user_id, order
    swapped for event time.
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sess = np.cumsum(new)
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "session_num": sess,
                    "epoch": ts.astype("datetime64[s]").astype("int64"),
                    "value": g["value"].to_numpy(),
                }
            )
            .groupby("session_num", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("epoch", "min"),
                session_end=("epoch", "max"),
                n_events=("value", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out["sum_value"] = round_half_away(out["sum_value"], 2)
        return out[
            ["user_id", "session_num", "session_start", "session_end",
             "n_events", "sum_value"]
        ]

    return (
        ds.groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session_num"])
        .reset_index(drop=True)
    )


# ----------------------------------------------- top-k per group (window)


def q_top_orders_per_segment(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k orders by price per market segment — the rank-window
    pattern without a global sort: broadcast the small dim, keep a
    per-segment top-k inside every batch (vectorized), merge the tiny
    partials driver-side. Ties break on o_orderkey for determinism."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_map = dict(
        zip(cust.column("c_custkey").to_pylist(),
            cust.column("c_mktsegment").to_pylist())
    )
    seg_ref = ray.put(seg_map)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        df = t.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        df = df.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return df.groupby("c_mktsegment", sort=False).head(k)[
            ["c_mktsegment", "o_orderkey", "o_totalprice"]
        ]

    parts = orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    allp = parts.to_pandas().sort_values(
        ["c_mktsegment", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    )
    out = allp.groupby("c_mktsegment", sort=True).head(k).reset_index(drop=True)
    out["rn"] = out.groupby("c_mktsegment").cumcount() + 1
    out["o_totalprice"] = round_half_away(out["o_totalprice"], 2)
    return out[["c_mktsegment", "rn", "o_orderkey", "o_totalprice"]]


# --------------------------------------------------------- as-of join


def q_asof_prev_click(sf_dir: str) -> pd.DataFrame:
    """As-of self-join: for every 'purchase' event, the timestamp of
    the user's most recent STRICTLY PRIOR 'click' (NULL if none).
    Ray shape: one groupby(user_id) shuffle, then a sorted single pass
    per group (running max of click time, shifted by one row) — the
    partitioning assumption is events-of-a-user fit one group."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        click_ts = g["ts"].where(g["event_type"] == "click")
        # rows are time-ascending, so the last prior click IS the max
        # prior click; ffill carries it forward (cummax would stall on
        # NaT), shift(1) makes it strictly prior
        prev = click_ts.ffill().shift(1)
        mask = (g["event_type"] == "purchase").to_numpy()
        prev_m = prev[mask]
        epoch = prev_m.to_numpy().astype("datetime64[s]").astype("float64")
        epoch[pd.isna(prev_m).to_numpy()] = np.nan  # NaT -> NULL
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[mask],
                "prev_click_epoch": epoch,
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(asof, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


# -------------------------------------------------- distinct char set (G4)


def q_distinct_chars(sf_dir: str) -> pd.DataFrame:
    """Global distinct character set over documents.text
    (uniqueLabels.py:4-13 semantics): per-batch set partials, driver
    union — distinct-value cardinality is alphabet-sized, so no
    shuffle."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        chars: set[str] = set()
        for s in t.column("text").to_pylist():
            chars.update(s)
        return pd.DataFrame({"ch": sorted(chars)})

    seen: set[str] = set()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pandas"
    ):
        seen.update(b["ch"])
    return pd.DataFrame({"ch": sorted(seen)})


# ------------------------------------------- sliding window aggregate


def q_events_sliding(sf_dir: str, window_hours: int = 2) -> pd.DataFrame:
    """Sliding ``window_hours``-hour window per event_type, stepping
    hourly: each output row covers (hour_bucket - window + 1 ..
    hour_bucket]. Built from the tumbling hourly partials (same
    distributed pre-aggregation as q_events_hourly); the window
    combine over the tiny per-type bucket series happens vectorized
    at the fold. Buckets with no events contribute zero (and emit no
    row of their own) — matching the SQL range-join oracle."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["hour_bucket"] = (
            df["ts"].values.astype("datetime64[s]").astype("int64") // 3600
        )
        g = df.groupby(["event_type", "hour_bucket"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return g.reset_index()

    # unrounded hourly partials: rounding happens once, AFTER the
    # window sum, or boundary sums drift off the oracle at 2 decimals
    hourly = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "hour_bucket"],
        {"n_events": "sum", "sum_value": "sum"},
    )

    out_frames = []
    for etype, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("hour_bucket").set_index("hour_bucket")
        # re-index over the full bucket range so gaps contribute zero
        full = range(int(g.index.min()), int(g.index.max()) + 1)
        n = g["n_events"].reindex(full, fill_value=0)
        s = g["sum_value"].reindex(full, fill_value=0.0)
        roll_n = n.rolling(window_hours, min_periods=1).sum().astype("int64")
        roll_s = round_half_away(s.rolling(window_hours, min_periods=1).sum(), 2)
        df = pd.DataFrame(
            {
                "event_type": etype,
                "hour_bucket": list(full),
                "w_events": roll_n.to_numpy(),
                "w_value": roll_s.to_numpy(),
            }
        )
        out_frames.append(df[df["w_events"] > 0])
    if not out_frames:  # empty events table -> empty result, like SQL
        return pd.DataFrame(
            columns=["event_type", "hour_bucket", "w_events", "w_value"]
        )
    out = pd.concat(out_frames, ignore_index=True)
    return out.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)


# ---------------------------------------------------------- anti-join


def q_churned_customers(sf_dir: str, since: str = "2001-01-01") -> pd.DataFrame:
    """Distributed anti-join: customers with NO order since ``since``,
    counted per nation (SQL NOT EXISTS). Both sides are corpus-scale,
    so no broadcast: project each to a shared (key, nationkey, src)
    schema, union, ONE hash groupby on the key, and a group fn that
    emits the customer row only when no order row is present. The
    per-nation count then folds through bounded partials (25 keys)."""
    since_us = pa.scalar(np.datetime64(since, "us"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def cust_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("c_custkey").cast(pa.int64()),
                "nationkey": t.column("c_nationkey").cast(pa.int64()),
                "src": pa.array([0] * len(t), type=pa.int8()),
            }
        )

    def order_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"), since_us))
        # distinct custkeys per batch: shrinks the shuffle to one row
        # per (batch, active customer) before the exchange
        keys = pc.unique(t.column("o_custkey")).cast(pa.int64())
        return pa.table(
            {
                "key": keys,
                "nationkey": pa.array([-1] * len(keys), type=pa.int64()),
                "src": pa.array([1] * len(keys), type=pa.int8()),
            }
        )

    both = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def anti(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        if (src == 1).any():  # customer has a recent order -> drop
            return pa.table({"nationkey": pa.array([], type=pa.int64())})
        nk = g.column("nationkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"nationkey": pa.array([int(nk[src == 0][0])], type=pa.int64())}
        )

    churned = both.groupby("key", num_partitions=16).map_groups(
        anti, batch_format="pyarrow"
    )

    def count_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return (
            df.groupby("nationkey", sort=False)
            .size()
            .rename("n_customers")
            .reset_index()
        )

    counts = combine_small_agg(
        churned.map_batches(count_partial, batch_format="pyarrow"),
        ["nationkey"],
        {"n_customers": "sum"},
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist())
    )
    counts["n_name"] = counts["nationkey"].map(names)
    out = counts[["n_name", "n_customers"]].sort_values("n_name")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.reset_index(drop=True)


# -------------------------------------------- rolling window aggregate


def q_rolling_avg(sf_dir: str, window: int = 4) -> pd.DataFrame:
    """Per-user rolling mean over the last ``window`` events (SQL
    ``AVG OVER (PARTITION BY user ORDER BY ts ROWS 3 PRECEDING)``).
    One groupby(user_id) shuffle; the window pass inside each group is
    a vectorized pandas rolling — partitioning assumption: one user's
    history fits a group (same contract as sessionize/asof)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        avg = g["value"].rolling(window, min_periods=1).mean()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "rolling_avg": round_half_away(avg.to_numpy(), 6),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(roll, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- banded range join


_FUNNEL_BINS_US = (60_000_000, 600_000_000, 3_600_000_000)
_FUNNEL_LABELS = ("a_u1m", "b_u10m", "c_u1h", "d_u6h")


def q_conversion_funnel(sf_dir: str, window_hours: int = 6) -> pd.DataFrame:
    """Banded range join (non-equi): every (click -> purchase) pair of
    the SAME user with 0 < lag <= ``window_hours``, histogrammed by
    conversion lag. Ray shape: time-bucket co-partitioning — bucket
    width = the window W; clicks are emitted to their home bucket k
    AND k+1, purchases to home only, so every qualifying pair meets in
    exactly one (user, bucket) group (the purchase's home bucket holds
    exactly one copy of each candidate click). No all-pairs shuffle —
    the exchange is one hash groupby on (user_id, bucket), and pair
    counting inside a group is a vectorized searchsorted. Skew bound:
    a group holds one user x one window of events."""
    W = window_hours * 3_600_000_000  # microseconds
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def route(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(("click", "purchase"))]
        epoch = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        bucket = epoch // W
        is_click = (df["event_type"] == "click").to_numpy()
        user = df["user_id"].to_numpy()
        # purchases: home bucket; clicks: home and home+1
        out_user = np.concatenate([user, user[is_click]])
        out_bucket = np.concatenate([bucket, bucket[is_click] + 1])
        out_epoch = np.concatenate([epoch, epoch[is_click]])
        out_click = np.concatenate(
            [is_click, np.ones(int(is_click.sum()), dtype=bool)]
        )
        return pa.table(
            {
                "user_id": pa.array(out_user, type=pa.int64()),
                "bucket": pa.array(out_bucket, type=pa.int64()),
                "epoch": pa.array(out_epoch, type=pa.int64()),
                "is_click": pa.array(out_click, type=pa.bool_()),
            }
        )

    routed = ds.map_batches(route, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        bucket = g.column("bucket")[0].as_py()
        epoch = g.column("epoch").to_numpy(zero_copy_only=False)
        is_click = g.column("is_click").to_numpy(zero_copy_only=False)
        clicks = np.sort(epoch[is_click])
        # purchases in their HOME bucket only (is_click False rows are
        # only ever emitted home, so no filter needed beyond the mask)
        purchases = epoch[~is_click]
        purchases = purchases[purchases // W == bucket]
        lags: list[np.ndarray] = []
        if len(clicks) and len(purchases):
            lo = np.searchsorted(clicks, purchases - W, side="left")
            hi = np.searchsorted(clicks, purchases, side="left")  # strict <
            for p, a, b in zip(purchases, lo, hi):
                if b > a:
                    lags.append(p - clicks[a:b])
        if lags:
            lag = np.concatenate(lags)
            bins = np.searchsorted(np.array(_FUNNEL_BINS_US), lag, side="left")
            lab, cnt = np.unique(bins, return_counts=True)
            return pa.table(
                {
                    "lag_bin": pa.array(
                        [_FUNNEL_LABELS[i] for i in lab], type=pa.string()
                    ),
                    "n_pairs": pa.array(cnt, type=pa.int64()),
                }
            )
        return pa.table(
            {
                "lag_bin": pa.array([], type=pa.string()),
                "n_pairs": pa.array([], type=pa.int64()),
            }
        )

    parts = routed.groupby(["user_id", "bucket"], num_partitions=16).map_groups(
        pairs, batch_format="pyarrow"
    )
    out = combine_small_agg(parts, ["lag_bin"], {"n_pairs": "sum"})
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values("lag_bin").reset_index(drop=True)


# ------------------------------------------- grouped z-score outliers


def q_event_outliers(sf_dir: str, z_cut: float = 3.0) -> pd.DataFrame:
    """Grouped anomaly detection: events whose value is more than
    ``z_cut`` population standard deviations from their event_type's
    mean. Two passes, no shuffle: (1) per-batch moment partials
    (n, sum, sumsq) folded to per-type mean/std — mergeable-sketch
    shape, O(#types) driver state; (2) a streaming filter with the
    tiny stats dict captured in the closure. z is rounded to 4
    decimals (the naive-moments variance agrees with the oracle's
    stable accumulator well past that)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("event_type", sort=False)["value"].agg(
            n="size", s="sum", ss=lambda v: float((v**2).sum())
        )
        return g.reset_index()

    stats = combine_small_agg(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=65536),
        ["event_type"],
        {"n": "sum", "s": "sum", "ss": "sum"},
    )
    stats["mu"] = stats["s"] / stats["n"]
    stats["sd"] = np.sqrt(
        np.maximum(stats["ss"] / stats["n"] - stats["mu"] ** 2, 0.0)
    )
    mu = dict(zip(stats["event_type"], stats["mu"]))
    sd = dict(zip(stats["event_type"], stats["sd"]))

    def flag(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        m = df["event_type"].map(mu)
        s = df["event_type"].map(sd)
        z = (df["value"] - m) / s
        keep = (s > 0) & (z.abs() > z_cut)
        out = df.loc[keep, ["event_id", "event_type"]].copy()
        out["value"] = round_half_away(df.loc[keep, "value"], 6)
        out["z"] = round_half_away(z[keep], 4)
        return out

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty blocks lose the schema in to_pandas
        return pd.DataFrame(columns=["event_id", "event_type", "value", "z"])
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------ ordered string aggregation


def q_nation_top_customers(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Ordered list aggregation (SQL string_agg with ORDER BY): per
    nation, the top-k customer names by account balance, comma-joined
    in rank order. Same partial-top-k shape as
    q_top_orders_per_segment: per-batch per-nation top-k (vectorized
    sort + head), driver merge of k x nations x blocks rows, broadcast
    nation-name map; ties break on c_name for determinism."""
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    names = dict(
        zip(nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist())
    )
    cust = _read(sf_dir, "customer", ["c_name", "c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df.sort_values(
            ["c_nationkey", "c_acctbal", "c_name"],
            ascending=[True, False, True],
        )
        return df.groupby("c_nationkey", sort=False).head(k)

    allp = cust.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    allp = allp.sort_values(
        ["c_nationkey", "c_acctbal", "c_name"], ascending=[True, False, True]
    )
    top = allp.groupby("c_nationkey", sort=True).head(k)
    out = (
        top.groupby("c_nationkey", sort=True)["c_name"]
        .agg(",".join)
        .rename("top_customers")
        .reset_index()
    )
    out["n_name"] = out["c_nationkey"].map(names)
    return out[["n_name", "top_customers"]].sort_values("n_name").reset_index(
        drop=True
    )


# --------------------------------------- exact grouped distinct count


def q_daily_active_users(sf_dir: str) -> pd.DataFrame:
    """Distinct users per (event_type, day) — exact grouped COUNT
    DISTINCT. Per-batch dedup of (type, day, user) triples shrinks
    the exchange to distinct-triple cardinality; one hash groupby on
    (type, day) then counts uniques inside each group. Skew bound:
    a group holds one day's distinct users of one type."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])

    def triples(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["day"] = (
            df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        return df[["event_type", "day", "user_id"]].drop_duplicates()

    def count_users(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": np.array([g["day"].iloc[0]], dtype="int64"),
                "n_users": np.array([g["user_id"].nunique()], dtype="int64"),
            }
        )

    return (
        ds.map_batches(triples, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "day"], num_partitions=16)
        .map_groups(count_users, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )


# ------------------------------------------------ global row number


def global_row_number(events: rd.Dataset) -> rd.Dataset:
    """Exact global row_number() OVER (ORDER BY value, event_id) — the
    total-order window shape Ray Data has no native operator for.
    Range-partitioned distributed sort, then rank = block offset +
    local index: the driver holds ONE integer per block (the block row
    counts, cumsummed into offsets) and per-block remote tasks append
    the rank column — rows never touch the driver, so the pattern
    holds at any scale where the sort itself does. Raw Ray tasks are
    used only because the Dataset API exposes no ordered block index
    (SURVEY §2 custom-operator rule (c)).
    """
    srt = (
        events.select_columns(["event_id", "value"])
        .sort(["value", "event_id"])
        .materialize()
    )
    refs = srt.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    @ray.remote
    def add_rank(t: pa.Table, off: int) -> pa.Table:
        rn = np.arange(off + 1, off + t.num_rows + 1, dtype=np.int64)
        return t.append_column("rank", pa.array(rn, type=pa.int64()))

    return rd.from_arrow_refs(
        [add_rank.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


# ------------------------------------------------- table profiling


def profile_numeric(
    ds: rd.Dataset, columns: list[str]
) -> pd.DataFrame:
    """One-pass data profiler over numeric columns: per-column row
    count, null count, min, max, mean — the sanity scan run before any
    100-TB job. A single streaming map_batches emits one partial row
    per (block, column); the driver folds #columns x #blocks rows
    (combine_small_agg), so cost is one read of just the profiled
    columns regardless of table size.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for c in columns:
            col = t.column(c)
            rows.append(
                {
                    "col": c,
                    "n": t.num_rows,
                    "n_null": col.null_count,
                    "vmin": pc.min(col).as_py(),
                    "vmax": pc.max(col).as_py(),
                    "vsum": pc.sum(col).as_py() or 0.0,
                }
            )
        return pd.DataFrame(rows)

    out = combine_small_agg(
        ds.select_columns(columns).map_batches(
            partial, batch_format="pyarrow", batch_size=65536
        ),
        ["col"],
        {"n": "sum", "n_null": "sum", "vmin": "min", "vmax": "max", "vsum": "sum"},
    )
    valid = (out["n"] - out["n_null"]).clip(lower=1)
    out["mean"] = round_half_away(out["vsum"] / valid, 4)
    # 4 dp, not 6: mean inherits float summation-order noise (~1e-9),
    # and discrete hundredths data can park the true mean within that
    # noise of a 6-dp half boundary (observed on l_tax), flipping the
    # last digit vs the SQL oracle
    out = out.sort_values("col").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out[["col", "n", "n_null", "vmin", "vmax", "mean"]]


def global_ntile(events: rd.Dataset, tiles: int = 10) -> rd.Dataset:
    """Exact SQL ntile(k) OVER (ORDER BY value, event_id): rank-based
    tile assignment (first N % k tiles get one extra row — ties split
    by rank, matching SQL, unlike threshold bucketing). Composes
    global_row_number, then a vectorized rank->tile map per block; the
    total row count is one integer from the sort's block metadata.
    """
    ranked = global_row_number(events).materialize()
    n = ranked.count()
    q, r = divmod(n, tiles)
    cut = r * (q + 1)  # ranks <= cut are in the (q+1)-sized tiles

    def assign(t: pa.Table) -> pa.Table:
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        big = (rank - 1) // max(q + 1, 1) + 1
        small = r + (rank - 1 - cut) // max(q, 1) + 1
        tile = np.where(rank <= cut, big, small).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value": t.column("value"),
                "tile": pa.array(tile, type=pa.int64()),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------- large-large shuffle join


def q_priority_revenue(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """lineitem ⋈ orders on orderkey — the one join shape the rest of
    the relational suite avoids by broadcasting: here BOTH sides are
    fact-table-sized, so this is a genuine hash-partitioned shuffle
    join (``Dataset.join``, the same exchange the flagship pipeline
    uses for media payloads in stages/join.py). Joined rows then
    pre-aggregate per batch onto the bounded o_orderpriority key.
    Scale note: at 100 TB both fan-ins shuffle once on orderkey;
    nothing broadcasts, nothing lands on the driver but the final
    5-row fold.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    # bloom semi-join pushdown: 128 KB bitmap built from the build
    # side's keys (per-batch OR-fold, never key-cardinality), probe
    # rows that cannot match are dropped BEFORE the exchange. No false
    # negatives, so the inner-join result is bit-identical (the SQL
    # oracle checks exactly that); false positives only waste shuffle.
    m_bits = 1 << 20
    bits_ref = ray.put(bloom_build(orders, "o_orderkey", m_bits=m_bits))

    def prefilter(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_contains(keys, bits, m_bits)))

    li = li.map_batches(prefilter, batch_format="pyarrow")
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("o_orderpriority", sort=False).agg(
            n_lines=("l_quantity", "size"),
            sum_qty=("l_quantity", "sum"),
            revenue=("l_extendedprice", "sum"),
        )
        return g.reset_index()

    out = combine_small_agg(
        j.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["o_orderpriority"],
        {"n_lines": "sum", "sum_qty": "sum", "revenue": "sum"},
    )
    out["sum_qty"] = round_half_away(out["sum_qty"], 2)
    out["revenue"] = round_half_away(out["revenue"], 2)
    out["n_lines"] = out["n_lines"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------- lead/lag window


def q_next_event_gap(sf_dir: str, nbuckets: int = 16) -> rd.Dataset:
    """Per-user lead(): seconds from each event to the same user's
    next event (-1.0 for the user's last event) — the lag/lead window
    shape. Users are data-sized keys, so grouping per user would call
    the UDF once per user; instead users hash into ``nbuckets`` groups
    and each bucket task sorts (user, ts, event_id) and diffs
    VECTORIZED, with user boundaries masked via shift-compare. One
    hash shuffle, no driver state.
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        b = (np.abs(u) % nbuckets).astype(np.int32)
        return t.append_column("bucket", pa.array(b, type=pa.int32()))

    def gaps(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        uid = g["user_id"].to_numpy()
        nxt = np.roll(ts, -1)
        same = np.roll(uid, -1) == uid
        same[-1:] = False
        gap = np.where(same, (nxt - ts) / 1e6, -1.0)
        return pa.table(
            {
                "event_id": pa.array(
                    g["event_id"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "gap_sec": pa.array(gap, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket", num_partitions=min(nbuckets, 8))
        .map_groups(gaps, batch_format="pandas")
    )


# ------------------------------------------- bloom semi-join pushdown

_BLOOM_SALTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def _bloom_hash(keys: np.ndarray, salt: int, m_bits: int) -> np.ndarray:
    h = keys.astype(np.uint64) * np.uint64(salt)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return (h % np.uint64(m_bits)).astype(np.int64)


def bloom_build(
    ds: rd.Dataset, col: str, m_bits: int = 1 << 20, k: int = 4
) -> np.ndarray:
    """Bloom filter over an int64 key column: per-batch bitmaps OR-fold
    on the driver (m_bits/8 bytes each — 128 KB at the default — NOT
    key-cardinality), so the build side never collects. False-positive
    rate ~ (1-e^{-kn/m})^k; false negatives impossible (every set bit
    survives the OR)."""
    nbytes = m_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        keys = t.column(col).to_numpy(zero_copy_only=False)
        for salt in _BLOOM_SALTS[:k]:
            idx = _bloom_hash(keys, salt, m_bits)
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    acc = np.zeros(nbytes, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("bits").to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint8)
    return acc


def bloom_contains(
    keys: np.ndarray, bits: np.ndarray, m_bits: int, k: int = 4
) -> np.ndarray:
    """Vectorized membership probe (no false negatives)."""
    ok = np.ones(len(keys), dtype=bool)
    for salt in _BLOOM_SALTS[:k]:
        idx = _bloom_hash(keys, salt, m_bits)
        ok &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
    return ok


# ---------------------------------------------------- rollup aggregate


def q_rollup_events(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(event_type, day): per-(type, day) aggregates
    plus per-type subtotals plus the grand total — the OLAP rollup
    shape. ONE streaming pass computes the finest level (per-batch
    partials onto the bounded (type, day) key); the coarser levels
    are derived from it on the driver by re-aggregating the tiny
    result, never by re-reading the data. NULL group markers render
    as 'ALL' / -1 so the output schema stays typed.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        # explicit us cast: under ns coercion (older pyarrow or
        # coerce_temporal_nanoseconds) the raw int64 is nanoseconds
        # and day values would silently be 1000x too large
        df["day"] = (
            df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        g = df.groupby(["event_type", "day"], sort=False)["value"].agg(
            n="size", total="sum"
        )
        return g.reset_index()

    base = combine_small_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "day"],
        {"n": "sum", "total": "sum"},
    )
    sub = (
        base.groupby("event_type", sort=False)
        .agg(n=("n", "sum"), total=("total", "sum"))
        .reset_index()
    )
    sub["day"] = -1
    grand = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": [-1],
            "n": [base["n"].sum()],
            "total": [base["total"].sum()],
        }
    )
    out = pd.concat([base, sub, grand], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["day"] = out["day"].astype("int64")
    out["total"] = round_half_away(out["total"], 4)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


# ------------------------------------------- grouped Pearson correlation


def q_corr_stats(sf_dir: str) -> pd.DataFrame:
    """Per-group Pearson correlation + covariance of
    (l_quantity, l_extendedprice), grouped by l_returnflag.

    Numerically stable distributed design: each batch emits one
    Welford-style partial per group — (n, mean_x, mean_y, M2x, M2y,
    Cxy) — and the driver folds partials with Chan's parallel-merge
    update. Driver state is O(#groups); no shuffle, no raw-moment
    cancellation (naive n·Σxy − Σx·Σy loses ~8 digits on
    price-scale data, which can straddle the 6 dp rounding the oracle
    compares at). Matches DuckDB's own single-pass stable corr/covar.
    """
    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=False):
            x = g["l_quantity"].to_numpy()
            y = g["l_extendedprice"].to_numpy()
            mx, my = x.mean(), y.mean()
            dx, dy = x - mx, y - my
            rows.append(
                {
                    "l_returnflag": flag,
                    "n": len(x),
                    "mean_x": mx,
                    "mean_y": my,
                    "m2x": float(dx @ dx),
                    "m2y": float(dy @ dy),
                    "cxy": float(dx @ dy),
                }
            )
        return pd.DataFrame(rows)

    def merge(a: dict, b: dict) -> dict:
        na, nb = a["n"], b["n"]
        n = na + nb
        d_x = b["mean_x"] - a["mean_x"]
        d_y = b["mean_y"] - a["mean_y"]
        return {
            "n": n,
            "mean_x": a["mean_x"] + d_x * nb / n,
            "mean_y": a["mean_y"] + d_y * nb / n,
            "m2x": a["m2x"] + b["m2x"] + d_x * d_x * na * nb / n,
            "m2y": a["m2y"] + b["m2y"] + d_y * d_y * na * nb / n,
            "cxy": a["cxy"] + b["cxy"] + d_x * d_y * na * nb / n,
        }

    acc: dict[str, dict] = {}
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    for batch in parts.iter_batches(batch_size=4096, batch_format="pandas"):
        for row in batch.to_dict("records"):
            k = row.pop("l_returnflag")
            acc[k] = merge(acc[k], row) if k in acc else row

    rows = []
    for flag in sorted(acc):
        s = acc[flag]
        denom = np.sqrt(s["m2x"] * s["m2y"])
        rows.append(
            {
                "l_returnflag": flag,
                "n": int(s["n"]),
                "corr_qty_price": round_half_away(
                    s["cxy"] / denom if denom > 0 else float("nan"), 6
                ),
                "covar_pop": round_half_away(s["cxy"] / s["n"], 4),
            }
        )
    return pd.DataFrame(rows)


# --------------------------------------- Q5-style multiway join volume


def q_local_supplier_volume(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    nation, keeping only order lines where the customer's nation equals
    the supplier's nation; revenue = Σ l_extendedprice·(1−l_discount)
    per nation name.

    Join plan: the two fact-fact edges (lineitem⋈orders on orderkey,
    then ⋈customer on custkey) are hash-partitioned ``Dataset.join``
    exchanges — both sides are data-sized, so they must shuffle; a
    bloom semi-join on orderkey prunes lineitem before the first
    exchange. The supplier→nation and nation→name edges broadcast
    (supplier is the smallest scaling table — ~1/15 of customer in
    TPC-H; the broadcast dict is keys→int16-sized and read once per
    task via ray.put). The c_nationkey = s_nationkey predicate is
    applied map-side right after the supplier lookup, BEFORE the
    grouped partial aggregation, so only matching rows reach the
    O(#nations) driver fold.
    """
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    supp_nat = dict(
        zip(supp.column("s_suppkey").to_pylist(), supp.column("s_nationkey").to_pylist())
    )
    nat_name = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    supp_ref = ray.put(supp_nat)
    nat_ref = ray.put(nat_name)

    m_bits = 1 << 20
    bits_ref = ray.put(bloom_build(orders, "o_orderkey", m_bits=m_bits))

    def prefilter(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_contains(keys, bits, m_bits)))

    j1 = li.map_batches(prefilter, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        s_map = ray.get(supp_ref)
        n_map = ray.get(nat_ref)
        df = t.to_pandas()
        df["s_nationkey"] = df["l_suppkey"].map(s_map)
        df = df[df["s_nationkey"] == df["c_nationkey"]]
        if df.empty:
            return pd.DataFrame(columns=["n_name", "revenue", "n_lines"])
        df["n_name"] = df["s_nationkey"].map(n_map)
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby("n_name", sort=False).agg(
            revenue=("rev", "sum"), n_lines=("rev", "size")
        )
        return g.reset_index()

    out = combine_small_agg(
        j2.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["n_name"],
        {"revenue": "sum", "n_lines": "sum"},
    )
    # intermediate round at the products' exact decimal precision
    # (2dp price x 2dp discount -> 4dp-exact terms) absorbs
    # summation-order ulps before the reported 2dp rounding — the
    # q1_pricing_summary idiom, mirrored in the SQL oracle
    out["revenue"] = round_half_away(round_half_away(out["revenue"], 4), 2)
    out["n_lines"] = out["n_lines"].astype("int64")
    return (
        out.sort_values(["revenue", "n_name"], ascending=[False, True])
        .reset_index(drop=True)[["n_name", "revenue", "n_lines"]]
    )


# ----------------------------------------------- retention cohorts


def q_retention_cohorts(sf_dir: str, nbuckets: int = 16) -> pd.DataFrame:
    """Weekly retention-cohort matrix — the product-analytics shape:
    cohort_week = a user's first active epoch-week, and for each
    week_offset >= 0 the number of that cohort's users active in
    cohort_week + offset (offset 0 row = cohort size).

    Users are data-sized keys, so per-user min/distinct resolve in
    user-hash bucket tasks (the next_event_gap pattern): one pass
    emits batch-deduped (bucket, user_id, week) rows, ONE hash
    shuffle co-locates each user's weeks, and bucket tasks emit
    partial (cohort_week, week_offset, n_users) counts — output per
    bucket is bounded by #weeks², so the driver fold is O(weeks² ×
    buckets) regardless of user count. Week arithmetic pins
    datetime64[us] explicitly (the rollup_events ns-coercion lesson).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    week_us = 86_400_000_000 * 7

    def user_weeks(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
            // week_us
        )
        pairs = np.unique(np.stack([u, wk], axis=1), axis=0)
        return pa.table(
            {
                "bucket": pa.array(
                    (pairs[:, 0] % nbuckets).astype(np.int32),
                    type=pa.int32(),
                ),
                "user_id": pa.array(pairs[:, 0], type=pa.int64()),
                "wk": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )

    def cohort_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["user_id"] >= 0]  # drop sentinel carrier rows
        if g.empty:
            return pd.DataFrame(
                {
                    "cohort_week": pd.array([], dtype="int64"),
                    "week_offset": pd.array([], dtype="int64"),
                    "n_users": pd.array([], dtype="int64"),
                }
            )
        g = g.drop_duplicates(["user_id", "wk"])
        coh = g.groupby("user_id", sort=False)["wk"].transform("min")
        out = (
            pd.DataFrame(
                {
                    "cohort_week": coh.to_numpy(),
                    "week_offset": g["wk"].to_numpy() - coh.to_numpy(),
                }
            )
            .groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return out

    # sentinel rows pin every hash partition of the bucket shuffle
    # (the _tf_sentinels idiom): empty upstream blocks or hash-empty
    # target partitions would otherwise hit the Ray 2.49.2
    # schema-broadcast/aggregator-finalize race (ADVICE r4 #3);
    # cohort_partial filters the user_id=-1 carrier rows.
    from ..rayutil import covering_bucket_values

    num_partitions = min(nbuckets, 8)
    svals = covering_bucket_values(nbuckets, num_partitions)
    sent = pa.table(
        {
            "bucket": pa.array(svals, type=pa.int32()),
            "user_id": pa.array([-1] * len(svals), type=pa.int64()),
            "wk": pa.array([0] * len(svals), type=pa.int64()),
        }
    )
    out = combine_small_agg(
        ds.map_batches(user_weeks, batch_format="pyarrow")
        .union(rd.from_arrow(sent))
        .groupby("bucket", num_partitions=num_partitions)
        .map_groups(cohort_partial, batch_format="pandas"),
        ["cohort_week", "week_offset"],
        {"n_users": "sum"},
    )
    out["cohort_week"] = out["cohort_week"].astype("int64")
    out["week_offset"] = out["week_offset"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return (
        out.sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
