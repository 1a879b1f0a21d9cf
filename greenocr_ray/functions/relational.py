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
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


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
    out = (
        parts.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("sum_charge", alias_name="sum_charge"),
            Sum("sum_disc", alias_name="sum_disc"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(6)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(6)
    out["avg_disc"] = (out["sum_disc"] / out["count_order"]).round(6)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[c] = out[c].round(2)
    out = out.drop(columns=["sum_disc"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------- sort / top-k / filter


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort("o_totalprice", descending=True).limit(10).to_pandas()
    top["o_totalprice"] = top["o_totalprice"].round(2)
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
    out["value"] = out["value"].round(6)
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
    out = (
        parts.groupby("c_mktsegment")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
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
    out = (
        parts.groupby("r_name")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("sum_acctbal", alias_name="sum_acctbal"),
        )
        .to_pandas()
    )
    out["avg_acctbal"] = (out["sum_acctbal"] / out["n_customers"]).round(6)
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
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

    out = (
        supp.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("total_acctbal", alias_name="total_acctbal"),
        )
        .to_pandas()
    )
    out["total_acctbal"] = out["total_acctbal"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


# ------------------------------------------------ distinct / grouping


def q_lang_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def q_part_brand_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    out = (
        ds.groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("p_retailprice", alias_name="sum_price"),
            Max("p_size", alias_name="max_size"),
        )
        .to_pandas()
    )
    out["avg_price"] = (out["sum_price"] / out["n_parts"]).round(6)
    out["sum_price"] = out["sum_price"].round(2)
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

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour_bucket"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["avg_value"] = (out["sum_value"] / out["n_events"]).round(6)
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)
