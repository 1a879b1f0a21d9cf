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
