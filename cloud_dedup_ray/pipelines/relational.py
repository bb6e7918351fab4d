"""Relational operator coverage over the TPC-H-ish testdata tables —
grouped aggregates, multi-way joins, broadcast joins, window-bucketed
event aggregation, filter+sort+limit. Every query here has an exact
DuckDB oracle twin in ``__ray_entry__.oracle_sql()`` (column names and
rounding matched on both sides).

Join strategy notes (scale):
  * dimension joins (region⋈nation, nation⋈customer) broadcast the
    small side via ``ray.put`` and map it inside ``map_batches`` — no
    shuffle;
  * the fact-fact join (orders⋈lineitem) pre-aggregates lineitem by
    l_orderkey FIRST (combiner before the wide groupby) so the join
    input is one row per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _revenue_partial(t: pa.Table, keys: np.ndarray | None = None) -> pa.Table:
    """Per-batch lineitem revenue combiner (shared by Q3 and the
    order-revenue join): optional sorted-key semi-join filter, then
    sum(extendedprice × (1 − discount)) per order key."""
    if keys is not None:
        mask = np.isin(np.asarray(t["l_orderkey"], np.int64), keys)
        t = t.filter(pa.array(mask))
    rev = pc.multiply(
        t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
    )
    df = pa.table({"o_orderkey": t["l_orderkey"], "rev": rev}).to_pandas()
    g = df.groupby("o_orderkey", as_index=False)["rev"].sum()
    return pa.Table.from_pandas(g, preserve_index=False)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style pricing summary with partial (in-batch) pre-agg.

    The money sums run in EXACT integer units (prices are 2-decimal,
    discounts 2-decimal, so disc_price is exact in 1e-4 units): float
    summation would make the cent-rounded output depend on block
    layout / summation ORDER — a 1-cent drift vs the SQL twin surfaced
    at sf0.001 where the block split differs — while integer sums are
    order-independent and agree with the twin at every scale."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )
    cutoff = np.datetime64("1998-09-02T00:00:00")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        ep_cents = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        disc_hund = pc.cast(
            pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))),
            pa.int64(),
        )
        t = t.append_column("ep_cents", ep_cents)
        t = t.append_column(
            "disc_units",  # 1e-4 currency units, exact
            pc.multiply(ep_cents,
                        pc.subtract(pa.scalar(100, pa.int64()), disc_hund)),
        )
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_cents=("ep_cents", "sum"),
            sum_disc_units=("disc_units", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_units", alias_name="sum_disc_units"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(4)
    out["sum_qty"] = out["sum_qty"].round(2)
    # identical integers → identical quotient doubles on both sides; NO
    # further rounding: the disc sum is exact 4-decimal money, so
    # half-cent TRUE ties occur and pandas (half-even) vs DuckDB
    # (half-away) would disagree on them — emitting the exact value
    # removes rounding from the contract entirely
    out["sum_base_price"] = out["sum_base_cents"] / 100.0
    out["sum_disc_price"] = out["sum_disc_units"] / 10000.0
    out = out.drop(columns=["sum_base_cents", "sum_disc_units"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q3_top_revenue_orders(sf_dir: str, m_bits: int = 1 << 20) -> pd.DataFrame:
    """customer ⋈ orders ⋈ lineitem, BUILDING segment, top-10 revenue.

    The customer dimension is broadcast (tiny in TPC-H); the BUILDING
    order keys — a fact-table-sized set at scale (~30% of orders) —
    never touch the driver: they fold into ONE broadcast bloom
    (``stages/bloomjoin.build_bloom``), lineitem batches are screened
    against it with per-batch partial revenue combines, and the exact
    verify rides the revenue groupby itself: building orders union in
    a zero-revenue MARKER row, so a group without a marker is a bloom
    false positive and drops, and a marker-only group (order with no
    lineitem) drops too — inner-join semantics, exact for any m_bits.
    Driver memory is m_bits/8 bytes + the top-10 row set, independent
    of fact-table size (replaces the round-3 driver-side
    ``np.concatenate`` over every building order key)."""
    from cloud_dedup_ray.functions.hashing import splitmix64
    from cloud_dedup_ray.functions.sketch import bloom_contains
    from cloud_dedup_ray.stages.bloomjoin import BLOOM_K, build_bloom

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    building = np.sort(
        cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"].to_numpy()
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    b_ref = ray.put(building)

    def filt_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(b_ref)
        mask = np.isin(np.asarray(t["o_custkey"], np.int64), keys)
        return t.filter(pa.array(mask)).select(["o_orderkey"])

    bo = orders.map_batches(filt_orders, batch_format="pyarrow").materialize()
    bloom = build_bloom(
        bo, lambda t: splitmix64(np.asarray(t["o_orderkey"], np.int64)),
        m_bits, k=BLOOM_K,
    )
    bloom_ref = ray.put(bloom)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial_rev(t: pa.Table) -> pa.Table:
        filt = ray.get(bloom_ref)
        keep = bloom_contains(
            filt, splitmix64(np.asarray(t["l_orderkey"], np.int64)), k=BLOOM_K
        )
        p = _revenue_partial(t.filter(pa.array(keep)))
        n = p.num_rows
        return p.append_column(
            "is_order", pa.array(np.zeros(n, np.int64))
        ).append_column("has_li", pa.array(np.ones(n, np.int64)))

    def order_markers(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "rev": pa.array(np.zeros(n, np.float64)),  # sum-neutral
                "is_order": pa.array(np.ones(n, np.int64)),
                "has_li": pa.array(np.zeros(n, np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(partial_rev, batch_format="pyarrow")
        .union(bo.map_batches(order_markers, batch_format="pyarrow"))
        .groupby("o_orderkey")
        .aggregate(
            Sum("rev", alias_name="revenue"),
            Sum("is_order", alias_name="n_ord"),
            Sum("has_li", alias_name="n_li"),
        )
        .filter(expr="n_ord >= 1 and n_li >= 1")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    agg = agg.drop(columns=["n_ord", "n_li"])
    agg["revenue"] = agg["revenue"].round(2)
    return agg


def orders_by_status(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "orders", ["o_orderstatus"])
        .groupby("o_orderstatus")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_orders"})
    )
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def events_hourly_windows(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per user over the events stream table
    (streaming-shaped workload → groupby(key, window) aggregate)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        secs = pc.cast(t["ts"], pa.int64())  # µs since epoch
        bucket = pc.divide(secs, pa.scalar(3_600_000_000, pa.int64()))
        df = pa.table(
            {"user_id": t["user_id"], "hour_bucket": bucket, "value": t["value"]}
        ).to_pandas()
        g = df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour_bucket"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out


def nations_per_region(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: 5-row region table shipped into the nation scan
    as sorted (key, name) arrays, mapped with one searchsorted per batch
    (the house vectorized-dim-join style)."""
    rows = _read(sf_dir, "region").take_all()
    keys = np.array([r["r_regionkey"] for r in rows], np.int64)
    names = np.array([r["r_name"] for r in rows], object)
    order = np.argsort(keys)
    r_ref = ray.put((keys[order], names[order]))
    ds = _read(sf_dir, "nation", ["n_regionkey"])

    def attach(t: pa.Table) -> pa.Table:
        ks, ns = ray.get(r_ref)
        idx = np.searchsorted(ks, np.asarray(t["n_regionkey"], np.int64))
        return pa.table({"r_name": pa.array(np.take(ns, idx))})

    out = (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_nations"})
    )
    return out.sort_values("r_name").reset_index(drop=True)


def customer_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast dimension join, vectorized: the 25-row nation table is
    shipped as sorted (key, name) arrays; the fact scan maps keys with
    one searchsorted per batch — no per-row Python."""
    rows = _read(sf_dir, "nation").take_all()
    nk = np.array([r["n_nationkey"] for r in rows], np.int64)
    nn = np.array([r["n_name"] for r in rows])
    order = np.argsort(nk)
    n_ref = ray.put((nk[order], nn[order]))
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def attach(t: pa.Table) -> pa.Table:
        keys, names = ray.get(n_ref)
        idx = np.searchsorted(keys, np.asarray(t["c_nationkey"], np.int64))
        return pa.table(
            {
                "n_name": pa.array(names[idx]),
                "c_acctbal": t["c_acctbal"],
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("c_acctbal", alias_name="total_bal"),
            Count(alias_name="n_customers"),
        )
        .to_pandas()
    )
    out["total_bal"] = out["total_bal"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Mean

    out = (
        _read(sf_dir, "part", ["p_type", "p_retailprice"])
        .groupby("p_type")
        .aggregate(
            Count(alias_name="n_parts"),
            Mean("p_retailprice", alias_name="avg_price"),
        )
        .to_pandas()
    )
    out["avg_price"] = out["avg_price"].round(4)
    return out.sort_values("p_type").reset_index(drop=True)


def top_click_events(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    out = (
        ds.filter(expr="event_type == 'click'")
        .sort(["value", "event_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    out["value"] = out["value"].round(4)
    return out[["event_id", "user_id", "value"]]


def order_revenue_join(sf_dir: str) -> pd.DataFrame:
    """Fact-fact shuffle hash join: lineitem revenue pre-aggregated per
    order key (combiner before the shuffle), then ``Dataset.join`` with
    orders — the wide-join path — and a grouped rollup by order status.
    """
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    order_rev = (
        li.map_batches(_revenue_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = orders.join(
        order_rev, join_type="inner", num_partitions=16, on=("o_orderkey",)
    )
    out = (
        joined.groupby("o_orderstatus")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("revenue", alias_name="total_revenue"),
        )
        .to_pandas()
    )
    out["total_revenue"] = out["total_revenue"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def top_orders_per_customer(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k window (ROW_NUMBER() ≤ k twin): the orders table
    grouped by customer, each group sorted by price desc and truncated —
    a ``groupby.map_groups`` windowed ranking."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64))
        return df

    out = (
        ds.groupby("o_custkey")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization per user (streaming-shaped stateful op):
    events sorted per user, a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Emits per-user session
    counts + the longest session's event count. Keyed state lives inside
    ``map_groups`` — partitioning assumption: one user's events fit in
    one group (true for event streams keyed by user)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].sort_values().to_numpy()
        # Compare gaps at native precision: truncating to whole seconds
        # would misclassify a gap in (1800s, 1801s) as same-session while
        # an exact INTERVAL comparison (the oracle) calls it a new session.
        gaps = np.diff(ts)
        new_session = np.concatenate(
            [[True], gaps > np.timedelta64(gap_minutes * 60, "s")]
        )
        sess_ids = np.cumsum(new_session)
        sizes = np.bincount(sess_ids)[1:]
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_sessions": [int(sess_ids[-1])],
                "max_session_events": [int(sizes.max())],
                "n_events": [len(ts)],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def distinct_part_types(sf_dir: str) -> pd.DataFrame:
    """DISTINCT via the Dataset unique path (shuffle dedup on the key)."""
    vals = _read(sf_dir, "part", ["p_type"]).unique("p_type")
    return pd.DataFrame({"p_type": sorted(vals)})


def events_asof_attribution(sf_dir: str) -> pd.DataFrame:
    """As-of join (attribution shape): for each *purchase* event, the
    most recent *click* event at-or-before it by the same user. Ray Data
    has no as-of join primitive, so it is composed as ONE co-partition
    shuffle: filter to the two event types, ``groupby(user_id)``, and a
    per-group sorted ``searchsorted`` merge inside ``map_groups``.
    Partitioning assumption: one user's events fit in one group (same
    assumption as sessionization; hot users would need ts-range salting
    with a boundary pass). Ties on click ts break to the max event_id —
    matched exactly by the oracle's ORDER BY ts DESC, event_id DESC."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        is_click = (df["event_type"] == "click").to_numpy()
        clicks = df[is_click].sort_values(["ts", "event_id"])
        buys = df[~is_click]
        if clicks.empty or buys.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                    "click_id": pd.Series([], dtype="int64"),
                    "click_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        cts = clicks["ts"].to_numpy()
        idx = np.searchsorted(cts, buys["ts"].to_numpy(), side="right") - 1
        ok = idx >= 0
        idx = idx[ok]
        buys = buys[ok]
        return pd.DataFrame(
            {
                "purchase_id": buys["event_id"].to_numpy(),
                "user_id": buys["user_id"].to_numpy(),
                "purchase_ts": buys["ts"].to_numpy(),
                "click_id": clicks["event_id"].to_numpy()[idx],
                "click_ts": cts[idx],
            }
        )

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(attribute, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("purchase_id").reset_index(drop=True)


def events_range_join_clicks(sf_dir: str, window_minutes: int = 60) -> pd.DataFrame:
    """Range (interval) join: for each purchase event, count the same
    user's click events with ts in ``(purchase_ts - window, purchase_ts]``
    and sum their values. Composed as one ``groupby(user_id)`` shuffle
    with a per-group double-``searchsorted`` over the time-sorted clicks
    — the standard distributed interval-join-on-a-key plan (no n×m
    blowup; per-task memory is one user's events)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    win = np.timedelta64(window_minutes * 60, "s")

    def count_window(df: pd.DataFrame) -> pd.DataFrame:
        is_click = (df["event_type"] == "click").to_numpy()
        clicks = df[is_click].sort_values("ts")
        buys = df[~is_click]
        if buys.empty:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n_clicks": pd.Series([], dtype="int64"),
                    "sum_click_value": pd.Series([], dtype="float64"),
                }
            )
        cts = clicks["ts"].to_numpy()
        cval = clicks["value"].to_numpy()
        bts = buys["ts"].to_numpy()
        lo = np.searchsorted(cts, bts - win, side="right")
        hi = np.searchsorted(cts, bts, side="right")
        sums = np.array([cval[a:b].sum() if b > a else 0.0 for a, b in zip(lo, hi)])
        return pd.DataFrame(
            {
                "purchase_id": buys["event_id"].to_numpy(),
                "user_id": buys["user_id"].to_numpy(),
                "n_clicks": (hi - lo).astype(np.int64),
                "sum_click_value": np.round(sums, 4),
            }
        )

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(count_window, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("purchase_id").reset_index(drop=True)


def orders_running_totals(sf_dir: str) -> pd.DataFrame:
    """Cumulative window aggregate (SUM OVER ... ROWS UNBOUNDED PRECEDING
    twin): per-customer running spend over orders in (o_orderdate,
    o_orderkey) order — keyed prefix scan via ``groupby.map_groups`` +
    ``np.cumsum`` (same left-to-right association as the SQL window)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderdate", "o_orderkey"])
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(),
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "o_orderdate": df["o_orderdate"].to_numpy(),
                "running_spend": np.round(np.cumsum(df["o_totalprice"].to_numpy()), 2),
            }
        )

    out = (
        ds.groupby("o_custkey")
        .map_groups(running, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Sequenced conversion funnel per user (view → click → purchase,
    each step at-or-after the previous step's first occurrence) — the
    order-sensitive aggregate product analytics pipelines run. ONE
    co-partition shuffle: groupby(user_id), vectorized step logic per
    group (same partitioning assumption as sessionize: one user's
    events fit in one group). Output avoids NULL timestamps (driver
    hash-compares values): funnel_depth counts completed steps."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(
            t["event_type"], value_set=pa.array(["view", "click", "purchase"])
        )
        return t.filter(m)

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy()
        et = df["event_type"].to_numpy()
        views = ts[et == "view"]
        cols = ["user_id", "first_view", "funnel_depth"]
        if not len(views):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "first_view": pd.Series([], dtype=ts.dtype),
                 "funnel_depth": pd.Series([], dtype="int64")}
            )[cols]
        tv = views.min()
        depth = 1
        clicks = ts[(et == "click") & (ts >= tv)]
        if len(clicks):
            depth = 2
            tc = clicks.min()
            purchases = ts[(et == "purchase") & (ts >= tc)]
            if len(purchases):
                depth = 3
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "first_view": [tv],
                "funnel_depth": [depth],
            }
        )[cols]

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_user_stats_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact distinct users + volume per event type in one shuffle
    family: each batch pre-aggregates its distinct (event_type,
    user_id) pairs by LEXSORTING the (type_code, user_id) pair columns
    and segment-reducing the runs — fully vectorized, no pandas groupby
    in the hot path, and deliberately NOT packed into one int64 key
    (arithmetic packing overflows on hash-style/negative user ids; the
    regression test pins this). ONE groupby((type, user)) sums the
    partials, and the per-type rollup runs over the distinct-pair
    table. The exact twin of the HLL pattern in
    ``textops.docs_hll_tokens_by_lang``: here distinct cardinality is
    users (bounded), so exact stays cheap at 100 TB."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "user_id": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64()),
                 "vsum": pa.array([], pa.float64())}
            )
        types = np.asarray(t["event_type"], dtype=object)
        users = np.asarray(t["user_id"], np.int64)
        vals = np.asarray(t["value"], np.float64)
        # factorize event_type (few distinct), then lexsort the
        # (type_code, user_id) pair directly — no arithmetic packing,
        # so arbitrary (hash-style or negative) int64 user ids can
        # never overflow into wrong groups
        codes, uniq_types = pd.factorize(types, sort=False)
        codes = codes.astype(np.int64)
        order = np.lexsort((users, codes))
        c_s, u_s, v_s = codes[order], users[order], vals[order]
        new_grp = np.concatenate(
            [[True], (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])]
        )
        starts = np.flatnonzero(new_grp)
        cnt = np.diff(np.append(starts, len(c_s)))
        csum = np.concatenate([[0.0], np.cumsum(v_s)])
        bounds = np.append(starts, len(c_s))
        vsum = csum[bounds[1:]] - csum[bounds[:-1]]
        return pa.table(
            {
                "event_type": pa.array(uniq_types[c_s[starts]]),
                "user_id": pa.array(u_s[starts], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "vsum": pa.array(vsum, pa.float64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("cnt", alias_name="n"), Sum("vsum", alias_name="v"))
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_users"),
            Sum("n", alias_name="n_events"),
            Sum("v", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values("event_type").reset_index(drop=True)


def events_sliding_windows(
    sf_dir: str, slide_minutes: int = 15, window_minutes: int = 60
) -> pd.DataFrame:
    """Sliding-window aggregation (1 h windows advancing every 15 min):
    each event replicates into window_minutes/slide_minutes overlapping
    windows — a vectorized np explode inside the batch, NOT a join —
    and the batch pre-aggregates per (window_start, event_type) before
    the single groupby. Shuffle volume is windows-per-event x distinct
    keys per batch, the streaming-engine shape for overlapping windows.
    window_start is int64 epoch seconds (same convention as
    ``events_hourly_windows``' integer bucket)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    slide_us = slide_minutes * 60 * 1_000_000
    k = window_minutes // slide_minutes

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"window_start": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "vsum": pa.array([], pa.float64())}
            )
        us = np.asarray(pc.cast(t["ts"], pa.int64()), np.int64)
        base = us // slide_us
        starts = (
            (base[None, :] - np.arange(k, dtype=np.int64)[:, None]).ravel()
            * (slide_us // 1_000_000)
        )
        df = pd.DataFrame(
            {
                "window_start": starts,
                "event_type": np.tile(np.asarray(t["event_type"], object), k),
                "value": np.tile(np.asarray(t["value"], np.float64), k),
            }
        )
        g = df.groupby(["window_start", "event_type"], as_index=False).agg(
            cnt=("value", "size"), vsum=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("cnt", alias_name="n_events"),
            Sum("vsum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def customers_without_big_orders(
    sf_dir: str, min_total: float = 465000.0, m_bits: int = 1 << 20
) -> pd.DataFrame:
    """Exact anti-join with a FILTERED build side: customers that never
    placed an order totaling >= min_total (~half of them at the default
    threshold). The qualifying orders fold into one broadcast bloom
    over splitmix64(o_custkey) (``stages.bloomjoin.build_bloom``);
    bloom-NEGATIVE customers are provably in the answer and exit with
    zero shuffle, and only the bloom-positive sliver (customers with a
    big order + ~FP rate) enters the exact groupby verify against the
    qualifying order keys. Same screened-anti-join primitive as
    ``textops.docs_novel_vs_train``, int keys instead of content
    hashes; the read is pruned to (o_custkey, o_totalprice) and the
    filter runs inside the scan batches."""
    from cloud_dedup_ray.functions.hashing import splitmix64
    from cloud_dedup_ray.functions.sketch import bloom_contains
    from cloud_dedup_ray.stages.bloomjoin import BLOOM_K, build_bloom

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def big_keys(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t["o_totalprice"], min_total))
        return pa.table({"o_custkey": kept["o_custkey"]})

    big = orders.map_batches(big_keys, batch_format="pyarrow").materialize()
    bloom = build_bloom(
        big, lambda t: splitmix64(np.asarray(t["o_custkey"], np.int64)),
        m_bits, k=BLOOM_K,
    )
    bloom_ref = ray.put(bloom)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    # ONE screen pass over customers: the verdict rides as a column on
    # the (small) materialized result, so hashing + bloom probing run
    # once per row, not once per downstream branch
    def screen(t: pa.Table) -> pa.Table:
        filt = ray.get(bloom_ref)
        maybe = bloom_contains(
            filt, splitmix64(np.asarray(t["c_custkey"], np.int64)), k=BLOOM_K
        )
        return pa.table(
            {"key": pc.cast(t["c_custkey"], pa.int64()),
             "c_name": t["c_name"],
             "maybe": pa.array(maybe)}
        )

    screened = cust.map_batches(screen, batch_format="pyarrow").materialize()

    def take_positive(t: pa.Table) -> pa.Table:
        kept = t.filter(t["maybe"])
        return pa.table({"key": kept["key"], "c_name": kept["c_name"]})

    def take_negative(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.invert(t["maybe"].combine_chunks()))
        return pa.table(
            {"c_custkey": kept["key"], "c_name": kept["c_name"]}
        )

    def order_markers(t: pa.Table) -> pa.Table:
        keys = np.unique(np.asarray(t["o_custkey"], np.int64))
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "c_name": pa.array([None] * len(keys), pa.string())}
        )

    def judge(t: pa.Table) -> pa.Table:
        names = t["c_name"]
        has_big_order = names.null_count > 0
        cust_rows = t.filter(pc.is_valid(names))
        if has_big_order or len(cust_rows) == 0:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()),
                 "c_name": pa.array([], pa.string())}
            )
        return pa.table(
            {"c_custkey": cust_rows["key"], "c_name": cust_rows["c_name"]}
        )

    verified = (
        screened.map_batches(take_positive, batch_format="pyarrow")
        .union(big.map_batches(order_markers, batch_format="pyarrow"))
        .groupby("key")
        .map_groups(judge, batch_format="pyarrow")
        .to_pandas()
    )
    negative = (
        screened.map_batches(take_negative, batch_format="pyarrow").to_pandas()
    )
    out = pd.concat([verified, negative], ignore_index=True)
    # an empty concat loses column names; rebuild the typed frame
    if out.empty:
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"),
             "c_name": pd.Series([], dtype=object)}
        )
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def orders_rolling_spend(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Bounded rolling window (SUM OVER ... ROWS 2 PRECEDING twin):
    per-customer moving total (a rolling SUM, as the output column
    says) of the last ``window`` order amounts in (o_orderdate,
    o_orderkey) order, carried as integer CENTS so the window
    arithmetic is exact — float rolling kernels differ between a
    sliding-sum implementation and a per-frame evaluation in the last
    ulp, which flips rounded values on hash compare (observed at
    sf0.01). The price→cents conversion uses np.round (banker's
    rounding): benign because 2-decimal prices ×100 never land on .5
    exactly, but that assumption is what makes it safe. Same keyed
    map_groups shape as the cumulative scan; per-key groups are small,
    so the window never spans partitions."""
    ds = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderdate", "o_orderkey"])
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        roll = (
            pd.Series(cents).rolling(window, min_periods=1).sum()
            .to_numpy().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(),
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "rolling_spend_cents": roll,
            }
        )

    out = (
        ds.groupby("o_custkey")
        .map_groups(rolling, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
