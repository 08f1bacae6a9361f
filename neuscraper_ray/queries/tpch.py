"""TPC-H-style relational queries over the orders/lineitem/customer star.

Split from the original single-module ``queries.py`` (see the package
``__init__`` for the registry); behavior-identical, same oracle SQL
contract per query (``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from neuscraper_ray.config import NUM_BUCKETS

from neuscraper_ray.queries._shared import _preagg_sum, _read


def order_totals_join(sf_dir: str):
    """Large x large co-partitioned hash join (orders x per-order
    lineitem totals), the one join shape broadcast can't cover.

    The many side collapses to per-batch combiner partials (vectorized
    pandas groupby, no shuffle), and the final per-key sum runs INSIDE
    the join's own bucket (``right_prepare``), so the whole
    agg-then-join costs exactly ONE all-to-all exchange and never
    touches ``Dataset.groupby().aggregate()`` on a high-cardinality
    key (per-group Python cost — see CLAUDE.md pitfalls). Quantities
    are cast to int64 pre-sum so Ray and DuckDB agree exactly."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "qty": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["qty"].sum()

    partials = li.map_batches(combiner, batch_format="pandas")
    joined = hash_join(
        orders,
        partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("qty", pa.int64())]),
        right_prepare=lambda rf: rf.group_by("o_orderkey").agg(
            pl.col("qty").sum()
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["qty"], 100))
        return t.rename_columns(["o_orderkey", "o_custkey", "sum_qty"])

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q5_region_volume(sf_dir: str):
    """TPC-H-Q5-shape local supplier volume: a SIX-table join
    (customer x orders x lineitem x supplier x nation x region) as two
    co-partitioned big x big hash joins plus broadcast dimensions —
    the multi-way join composition test of the engine. Revenue is
    fixed-point ``round(price*100) * (100 - round(disc*100))`` (1e-4
    dollars, exact int64 on both engines — prices carry 2 decimals so
    the cents rounding is unambiguous).

    Scale shape: region/nation/supplier broadcast once (tiny);
    customer is pre-filtered to the region's nations BEFORE its join
    (the filter commutes through the equijoin c_nationkey =
    s_nationkey); orders is date-pruned AT THE READ; lineitem is
    supplier-filtered and collapsed to per-batch (orderkey, s_nat,
    rev) combiner partials before its join. Exactly TWO all-to-all
    exchanges (orders x customer on custkey, lineitem x that on
    orderkey), then a 25-group aggregate over combiner partials."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].iloc[0])
    region_nations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    nation_name = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    supp_nation = {
        int(s): int(n)
        for s, n in zip(supp["s_suppkey"], supp["s_nationkey"])
        if int(n) in region_nations
    }
    dims_ref = ray.put((region_nations, nation_name, supp_nation))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q5_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q5_DATE_HI)),
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_prep(df: pd.DataFrame) -> pd.DataFrame:
        nations, _, _ = ray.get(dims_ref)
        df = df[df["c_nationkey"].isin(nations)].copy()
        df["c_nationkey"] = df["c_nationkey"].astype(np.int64)
        return df

    cust_f = cust.map_batches(cust_prep, batch_format="pandas")

    ordercust = hash_join(
        orders,
        cust_f,
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()), ("o_orderkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, _, s2n = ray.get(dims_ref)
        s_nat = df["l_suppkey"].map(s2n)
        keep = s_nat.notna().to_numpy()
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy()[keep],
                "s_nat": s_nat.to_numpy()[keep].astype(np.int64),
                "rev_e4": (cents * (100 - dpct))[keep],
            }
        )
        return out.groupby(["l_orderkey", "s_nat"], sort=False, as_index=False)[
            "rev_e4"
        ].sum()

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    joined = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("rev_e4", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
            ]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        _, n2name, _ = ray.get(dims_ref)
        keep = pc.equal(t["s_nat"], t["c_nationkey"])
        t = t.filter(keep)
        nats = t["s_nat"].to_numpy(zero_copy_only=False)
        names = pd.Series(nats).map(n2name)
        part = pd.DataFrame(
            {"n_name": names, "rev": t["rev_e4"].to_numpy(zero_copy_only=False)}
        ).groupby("n_name", sort=False, as_index=False)["rev"].sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = joined.map_batches(finish, batch_format="pyarrow", batch_size=None)
    agg = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue_e4"))
    df = agg.to_pandas()
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df = df.sort_values(
        ["revenue_e4", "n_name"], ascending=[False, True], kind="mergesort"
    )
    return df[["n_name", "revenue_e4"]].reset_index(drop=True)


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_SHIP_LO = "1996-01-01"
Q7_SHIP_HI = "1998-01-01"


def q7_volume_shipping(sf_dir: str):
    """TPC-H-Q7-shape volume shipping: revenue flowing BETWEEN two
    nations by (supp_nation, cust_nation, ship year) — the directional
    pair must cross (supplier in one nation, customer in the other,
    both directions reported separately). A new join shape vs Q5: the
    cross-pair predicate is applied AFTER the two big joins, and the
    group key includes a derived time dimension (ship year) carried
    through the lineitem combiner.

    Scale shape: nation/supplier broadcast once; customer projected to
    two int columns, pre-filtered to the two nations and broadcast as
    sorted (custkey -> nationkey) arrays probed by searchsorted inside
    the orders map (the Q3 pattern — a 2-of-25-nations customer slice
    is dimension-sized; if it ever outgrows broadcast, the
    co-partitioned ``hash_join`` on custkey is the tested fallback,
    see ``order_totals_join``); orders NOT date-pruned (Q7 filters on
    ship date, an order can straddle years) but projected to two
    columns; lineitem date-pruned AT THE READ and collapsed to
    per-batch (orderkey, s_nat, year, rev) combiner partials before
    its join. Exactly ONE all-to-all exchange — the final <=
    2x2xyears-group aggregate is fused into the join bucket
    (``post_join``) and finished on the driver over <= buckets x
    groups partial rows."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    name2key = dict(zip(nation["n_name"], nation["n_nationkey"].astype(int)))
    ka, kb = name2key[Q7_NATION_A], name2key[Q7_NATION_B]
    pair = {ka, kb}
    supp_nation = {
        int(s): int(n)
        for s, n in zip(supp["s_suppkey"], supp["s_nationkey"])
        if int(n) in pair
    }
    key2name = {ka: Q7_NATION_A, kb: Q7_NATION_B}
    # customer filtered AT THE READ (row-group predicate + distributed
    # scan) so only the 2-of-25-nations slice ever reaches the driver
    cust_pair = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(sorted(pair)),
    ).to_pandas()
    cust_keys = np.sort(cust_pair["c_custkey"].to_numpy().astype(np.int64))
    order_ck = cust_pair.sort_values("c_custkey")
    cust_nats = order_ck["c_nationkey"].to_numpy().astype(np.int64)
    dims_ref = ray.put((pair, supp_nation, key2name, cust_keys, cust_nats))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, _, _, ck, cn = ray.get(dims_ref)
        keys = df["o_custkey"].to_numpy().astype(np.int64)
        if len(ck) == 0:
            hit = np.zeros(len(keys), dtype=bool)
            nats = np.empty(0, np.int64)
        else:
            idx = np.minimum(np.searchsorted(ck, keys), len(ck) - 1)
            hit = ck[idx] == keys
            nats = cn[idx[hit]]
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy()[hit], "c_nationkey": nats}
        )

    ordercust = orders.map_batches(orders_prep, batch_format="pandas")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q7_SHIP_LO))
        & (pc.field("l_shipdate") < pd.Timestamp(Q7_SHIP_HI)),
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, s2n, _, _, _ = ray.get(dims_ref)
        s_nat = df["l_suppkey"].map(s2n)
        keep = s_nat.notna().to_numpy()
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy()[keep],
                "s_nat": s_nat.to_numpy()[keep].astype(np.int64),
                "l_year": df["l_shipdate"].dt.year.to_numpy()[keep].astype(np.int64),
                "rev_e4": (cents * (100 - dpct))[keep],
            }
        )
        return out.groupby(
            ["l_orderkey", "s_nat", "l_year"], sort=False, as_index=False
        )["rev_e4"].sum()

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    def bucket_finish(j):
        # in-bucket: the DIRECTIONAL cross-pair predicate + the final
        # aggregate collapsed to <= 2x2xyears partial rows per bucket
        import polars as pl

        return (
            j.filter(pl.col("s_nat") != pl.col("c_nationkey"))
            .group_by(["s_nat", "c_nationkey", "l_year"])
            .agg(pl.col("rev_e4").sum())
        )

    partials = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("s_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("rev_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        post_join=bucket_finish,
    ).to_pandas()
    if partials.empty:  # tiny scales can have no crossing pair in the window
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype=object),
                "cust_nation": pd.Series(dtype=object),
                "l_year": pd.Series(dtype="int64"),
                "revenue_e4": pd.Series(dtype="int64"),
            }
        )
    df = pd.DataFrame(
        {
            "supp_nation": partials["s_nat"].map(key2name),
            "cust_nation": partials["c_nationkey"].map(key2name),
            "l_year": partials["l_year"].astype("int64"),
            "rev_e4": partials["rev_e4"].astype("int64"),
        }
    )
    df = df.groupby(
        ["supp_nation", "cust_nation", "l_year"], sort=False, as_index=False
    )["rev_e4"].sum().rename(columns={"rev_e4": "revenue_e4"})
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df["l_year"] = df["l_year"].astype("int64")
    return df[
        ["supp_nation", "cust_nation", "l_year", "revenue_e4"]
    ].sort_values(
        ["supp_nation", "cust_nation", "l_year"], kind="mergesort"
    ).reset_index(drop=True)


Q8_REGION = "ASIA"
Q8_TARGET_NATION = "NATION_7"
Q8_PART_TYPE = "ECONOMY"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H-Q8-shape national market share: within one region's
    customers and one part type, the target nation's suppliers' share
    of revenue per order year — a RATIO of conditional sums per group,
    the shape Q5/Q7 don't cover. Share is fixed-point ppm (int64 exact
    on both engines).

    Scale shape: part filtered to the type and broadcast as a partkey
    set (the repo's Q17/Q19 disjunctive-pushdown pattern); supplier ->
    nation broadcast; customer pre-filtered to the region's nations
    and broadcast as a sorted custkey array probed by searchsorted in
    the orders map (the Q3 pattern — hash_join on custkey is the
    tested fallback if the slice outgrows broadcast); orders
    date-pruned AT THE READ; lineitem collapsed to per-batch
    (orderkey, is_target, rev) partials before its join. ONE
    all-to-all exchange — the per-year (rev, target_rev) aggregate is
    fused into the join bucket (``post_join``) and finished on the
    driver; the ratio is computed once per year at the end, never per
    row."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()

    rkey = int(region.loc[region["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    region_nations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    target_key = int(
        nation.loc[nation["n_name"] == Q8_TARGET_NATION, "n_nationkey"].iloc[0]
    )
    target_supps = set(
        supp.loc[supp["s_nationkey"] == target_key, "s_suppkey"].astype(int)
    )
    type_parts = set(part.loc[part["p_type"] == Q8_PART_TYPE, "p_partkey"].astype(int))
    # customer filtered AT THE READ — only the region's slice reaches
    # the driver, never the full table
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pc.field("c_nationkey").isin(sorted(region_nations)),
    ).to_pandas()
    region_custs = np.sort(cust["c_custkey"].to_numpy().astype(np.int64))
    dims_ref = ray.put((region_custs, target_supps, type_parts))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q8_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q8_DATE_HI)),
    )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        # semi-join against the broadcast region-customer key array
        # (the Q3 pattern; hash_join on custkey is the tested fallback
        # if a region's customer slice ever outgrows broadcast)
        rc, _, _ = ray.get(dims_ref)
        keys = df["o_custkey"].to_numpy().astype(np.int64)
        if len(rc) == 0:
            hit = np.zeros(len(keys), dtype=bool)
        else:
            idx = np.minimum(np.searchsorted(rc, keys), len(rc) - 1)
            hit = rc[idx] == keys
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy()[hit],
                "o_year": df["o_orderdate"].dt.year.to_numpy()[hit].astype(
                    np.int64
                ),
            }
        )

    ordercust = orders.map_batches(orders_prep, batch_format="pandas")

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, tsupp, tparts = ray.get(dims_ref)
        keep = df["l_partkey"].isin(tparts).to_numpy()
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "is_target": df["l_suppkey"].isin(tsupp).to_numpy().astype(np.int64),
                "rev_e4": cents * (100 - dpct),
            }
        )
        # vectorized conditional sum (no Python lambda in the hot path)
        t = (
            out.assign(trev=out["rev_e4"] * out["is_target"])
            .groupby("l_orderkey", sort=False, as_index=False)[["rev_e4", "trev"]]
            .sum()
        )
        return t.rename(columns={"trev": "target_e4"})

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    def bucket_finish(j):
        # in-bucket final aggregate: <= years partial rows per bucket
        import polars as pl

        return j.group_by("o_year").agg(
            pl.col("rev_e4").sum(), pl.col("target_e4").sum()
        )

    partials = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("rev_e4", pa.int64()),
                ("target_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
        ),
        post_join=bucket_finish,
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {
                "o_year": pd.Series(dtype="int64"),
                "revenue_e4": pd.Series(dtype="int64"),
                "target_revenue_e4": pd.Series(dtype="int64"),
                "mkt_share_ppm": pd.Series(dtype="int64"),
            }
        )
    df = (
        partials.groupby("o_year", sort=False, as_index=False)[
            ["rev_e4", "target_e4"]
        ]
        .sum()
        .rename(columns={"rev_e4": "revenue_e4", "target_e4": "target_revenue_e4"})
    )
    df["o_year"] = df["o_year"].astype("int64")
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df["target_revenue_e4"] = df["target_revenue_e4"].astype("int64")
    df["mkt_share_ppm"] = (
        df["target_revenue_e4"].astype(object) * 1_000_000
        // df["revenue_e4"].astype(object)
    ).astype("int64")
    return df[
        ["o_year", "revenue_e4", "target_revenue_e4", "mkt_share_ppm"]
    ].sort_values("o_year", kind="mergesort").reset_index(drop=True)


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-03-15"


def q3_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shape shipping priority: top-10 undelivered orders by
    revenue for one market segment. The high-cardinality-group
    pitfall solved the engine's way: the per-order revenue sum is
    finished INSIDE the join's own bucket (``right_prepare``), never
    a ``Dataset.groupby`` over orderkeys, and the top-10 is a partial
    per-block top-10 (global top-k is a subset of the union of
    per-block top-ks for ANY partitioning) merged on the driver.
    Revenue is the same fixed-point 1e-4-dollar int64 as Q5; the
    (revenue desc, o_orderdate asc, o_orderkey asc) order is total,
    so the top-10 set is unique and the SQL oracle reproduces it
    row-for-row. One all-to-all exchange end-to-end."""
    import pyarrow.compute as pc
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = set(
        cust.loc[cust["c_mktsegment"] == Q3_SEGMENT, "c_custkey"].astype(int)
    )
    seg_ref = ray.put(seg_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < pd.Timestamp(Q3_DATE),
    )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(seg_ref)
        df = df[df["o_custkey"].isin(keys)]
        return df[["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders_f = orders.map_batches(orders_prep, batch_format="pandas")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pd.Timestamp(Q3_DATE),
    )

    def li_combiner(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "revenue_e4": cents * (100 - dpct),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)[
            "revenue_e4"
        ].sum()

    li_partials = li.map_batches(li_combiner, batch_format="pandas")

    joined = hash_join(
        orders_f,
        li_partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
        right_prepare=lambda rf: rf.group_by("o_orderkey").agg(
            pl.col("revenue_e4").sum()
        ),
    )

    k = 10

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["revenue_e4", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        return df.head(k)

    cand = joined.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    cand = cand.sort_values(
        ["revenue_e4", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(k)
    return cand[
        ["o_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)




Q1_CUTOFF = "1998-09-02"


def q1_pricing(sf_dir: str):
    """TPC-H-Q1-style pricing summary (filter -> partial agg -> groupby)."""
    import pyarrow.compute as pc

    # shipdate cutoff pushed to the read (row-group pruning at scale)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
        filter=pc.field("l_shipdate") <= pd.Timestamp(Q1_CUTOFF),
    )

    def prep(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    agg = _preagg_sum(
        prepped,
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order",
    )
    df = agg.to_pandas().rename(
        columns={
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
        }
    )
    for c in ["sum_qty", "sum_base_price", "sum_disc_price"]:
        df[c] = df[c].round(2)
    df["count_order"] = df["count_order"].astype("int64")
    return df[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    ]


def segment_order_value(sf_dir: str):
    """orders x customer broadcast hash join (J1) -> per-segment totals.

    customer is the small side: shipped once via ray.put, looked up per
    batch with a pandas map — no shuffle join.
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        df["c_mktsegment"] = df["o_custkey"].map(lookup)
        return df[["c_mktsegment", "o_totalprice"]]

    joined = orders.map_batches(join_batch, batch_format="pandas")
    agg = _preagg_sum(joined, ["c_mktsegment"], ["o_totalprice"], count_alias="n_orders")
    df = agg.to_pandas().rename(columns={"o_totalprice": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df[["c_mktsegment", "n_orders", "total_value"]]


ANTI_JOIN_CUTOFF = "1995-12-01"


def customers_no_orders(sf_dir: str):
    """Anti join (J2): customers with no orders before the cutoff, via a
    broadcast key set built with predicate pushdown at the read.

    The distinct o_custkey set is bounded by customer cardinality, so it
    broadcasts; at larger dimension sizes swap in a Bloom filter."""
    import pyarrow.compute as pc

    early = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderdate") < pd.Timestamp(ANTI_JOIN_CUTOFF),
    )
    def batch_keys(t: pa.Table) -> pa.Table:
        # one list row per batch — never Dataset.unique (one Ray group
        # per distinct value); the driver unions <= n_batches lists
        u = np.unique(t.column("o_custkey").to_numpy())
        return pa.table({"ks": pa.array([u.tolist()], pa.list_(pa.int64()))})

    rows = early.map_batches(batch_keys, batch_format="pyarrow").take_all()
    keys = set(
        np.concatenate([np.asarray(r["ks"], dtype=np.int64) for r in rows]).tolist()
        if rows
        else []
    )
    keys_ref = ray.put(keys)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        return df[~df["c_custkey"].isin(k)]

    return cust.map_batches(anti, batch_format="pandas")


def order_line_concat(sf_dir: str):
    """G1 mirror: per-order return-flag string, descending line number,
    no separator — the reference's groupby-concat assembly
    (/root/reference/src/warc/get_text.py:36-37) over TPC-H shapes,
    using the same hash-bucketed map_groups pattern as page assembly."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["l_orderkey"] % NUM_BUCKETS).astype(np.int32)
        return df

    def concat_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # l_linenumber repeats within an order: tiebreak on the value
        # itself so the concat is deterministic on both engines
        df = df.sort_values(
            ["l_orderkey", "l_linenumber", "l_returnflag"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = (
            df.groupby("l_orderkey", sort=False)["l_returnflag"]
            .agg("".join)
            .rename("flags")
            .reset_index()
        )
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("bucket").map_groups(concat_bucket, batch_format="pandas")


def lineitem_global_metrics(sf_dir: str):
    """G3 mirror: global counters via partial + final aggregation."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "n_rows": pa.array([len(t)], pa.int64()),
                "total_qty": pa.array([pc.sum(t["l_quantity"]).as_py() or 0.0]),
                "total_revenue": pa.array([pc.sum(disc).as_py() or 0.0]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    row = partials.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("total_qty", alias_name="total_qty"),
        Sum("total_revenue", alias_name="total_revenue"),
    )
    return pd.DataFrame(
        [
            {
                "n_rows": int(row["n_rows"]),
                "total_qty": round(row["total_qty"], 2),
                "total_revenue": round(row["total_revenue"], 2),
            }
        ]
    )




def orders_rank_in_customer(sf_dir: str):
    """Windowed rank / top-N per group: each customer's 3 highest-value
    orders with their rank (``row_number() OVER (PARTITION BY custkey
    ORDER BY totalprice DESC, orderkey)``).

    Scale shape: ranked-window queries do NOT need the whole partition
    when only the top N survive — a key's global top-3 is a subset of
    the union of batch-local top-3s, so each batch prunes to <= 3 rows
    per key BEFORE the shuffle (the top-k combiner), then a custkey
    bucket co-locates each key's survivors and one vectorized
    sort + cumcount ranks every key in the bucket at once. The shuffle
    moves O(3 x keys-per-batch x batches), never the orders table."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = df[df.groupby("o_custkey", sort=False).cumcount() < 3].copy()
        out["bucket"] = (out["o_custkey"] % NUM_BUCKETS).astype(np.int32)
        return out

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df["rnk"] = (df.groupby("o_custkey", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return df.loc[
            df["rnk"] <= 3, ["o_custkey", "o_orderkey", "o_totalprice", "rnk"]
        ]

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


Q4_START = "1997-01-01"
Q4_END = "1997-04-01"
Q4_LATE_DAYS = 30


def q4_order_priority(sf_dir: str):
    """TPC-H-Q4-shape semi-join: orders in a quarter with at least one
    "late" lineitem (shipped > 30 days after the order date), counted
    per priority — SQL ``WHERE EXISTS (...)``.

    Scale shape: the correlated EXISTS folds into a max-aggregate —
    ``exists(l_shipdate > cutoff)  ==  max(l_shipdate) > cutoff`` — so
    the semi-join becomes per-batch MAX partials on lineitem (combiner:
    one row per orderkey per batch), ONE co-partitioned ``hash_join``
    against the quarter's orders with the max finished in-bucket
    (``right_prepare``), a vectorized lateness compare, and a tiny
    priority count. The quarter filter is pushed into the parquet read;
    lineitem is never shuffled raw."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    right_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("max_ship", pa.timestamp("us"))]
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=[f.name for f in left_schema],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q4_START))
        & (pc.field("o_orderdate") < pd.Timestamp(Q4_END)),
    )
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial_max(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by("l_orderkey")
            .agg(pl.col("l_shipdate").max().alias("max_ship"))
        )
        return g.to_arrow().cast(right_schema)

    def finish_max(rf):
        return rf.group_by("o_orderkey").agg(pl.col("max_ship").max())

    joined = hash_join(
        orders,
        line.map_batches(partial_max, batch_format="pyarrow"),
        "o_orderkey",
        "l_orderkey",
        left_schema,
        right_schema,
        right_prepare=finish_max,
    )

    def late_priority_counts(df: pd.DataFrame) -> pd.DataFrame:
        late = df["max_ship"] > (df["o_orderdate"] + pd.Timedelta(days=Q4_LATE_DAYS))
        return (
            df.loc[late]
            .groupby("o_orderpriority", sort=False)
            .size()
            .reset_index(name="order_count")
        )

    agg = (
        joined.map_batches(
            late_priority_counts, batch_format="pandas", batch_size=None
        )
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .to_pandas()
    )
    agg["order_count"] = agg["order_count"].astype("int64")
    return agg[["o_orderpriority", "order_count"]]


def q13_customer_distribution(sf_dir: str):
    """TPC-H-Q13-shape LEFT OUTER join + two-level aggregate: customers
    by how many (non-urgent) orders they placed, INCLUDING the
    zero-order customers the inner join would drop.

    Scale shape: per-batch order-count partials (combiner: one row per
    custkey per batch), ONE co-partitioned ``hash_join(how="left")``
    with the count finished in-bucket (``right_prepare``) — the outer
    join's null rows materialize as typed nulls inside the bucket, so
    zero-order customers cost nothing extra — then the distribution is
    a tiny second groupby keyed on the count value (cardinality ~ max
    orders per customer, corpus-size independent)."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema([("c_custkey", pa.int64())])
    right_schema = pa.schema([("o_custkey", pa.int64()), ("cnt", pa.int64())])

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != "1-URGENT",
    )

    def partial_cnt(t: pa.Table) -> pa.Table:
        g = pl.from_arrow(t).group_by("o_custkey").agg(pl.len().alias("cnt"))
        return g.to_arrow().cast(right_schema)

    def finish_cnt(rf):
        return rf.group_by("c_custkey").agg(pl.col("cnt").sum())

    joined = hash_join(
        cust,
        orders.map_batches(partial_cnt, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        left_schema,
        right_schema,
        how="left",
        right_prepare=finish_cnt,
    )

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["cnt"].fillna(0).astype(np.int64)
        return (
            df.groupby("n_orders", sort=False).size().reset_index(name="n_customers")
        )

    agg = (
        joined.map_batches(dist_partial, batch_format="pandas", batch_size=None)
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
    )
    agg["n_customers"] = agg["n_customers"].astype("int64")
    return agg[["n_orders", "n_customers"]]


Q14_START = "1997-06-01"
Q14_END = "1997-07-01"


def q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shape promo revenue share: of one ship-month's revenue,
    the fraction from ECONOMY-type parts, in exact ppm (fixed-point
    integer math — no float ROUND ties, per the oracle contract).

    Scale shape: lineitem is month-filtered AT THE READ (row-group
    pruning) and collapsed to per-partkey revenue partials per batch
    (combiner, ``left_prepare`` finishes the sum in-bucket); ONE
    co-partitioned ``hash_join`` attaches ``p_type`` — the part
    dimension rides the same single exchange instead of a broadcast
    (at web scale the part side is itself sharded); the share is a
    two-cell global sum of output-sized join rows."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema([("l_partkey", pa.int64()), ("rev_e4", pa.int64())])
    right_schema = pa.schema([("p_partkey", pa.int64()), ("p_type", pa.string())])

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q14_START))
        & (pc.field("l_shipdate") < pd.Timestamp(Q14_END)),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def partial_rev(t: pa.Table) -> pa.Table:
        ext = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        g = (
            pl.DataFrame(
                {
                    "l_partkey": t["l_partkey"].to_numpy(),
                    "rev_e4": ext * (100 - disc),
                }
            )
            .group_by("l_partkey")
            .agg(pl.col("rev_e4").sum())
        )
        return g.to_arrow().cast(left_schema)

    def finish_rev(lf):
        return lf.group_by("l_partkey").agg(pl.col("rev_e4").sum())

    joined = hash_join(
        line.map_batches(partial_rev, batch_format="pyarrow"),
        part,
        "l_partkey",
        "p_partkey",
        left_schema,
        right_schema,
        left_prepare=finish_rev,
    )

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        promo = int(df.loc[df["p_type"] == "ECONOMY", "rev_e4"].sum())
        return pd.DataFrame(
            {
                "promo_e4": np.asarray([promo], dtype=np.int64),
                "total_e4": np.asarray([int(df["rev_e4"].sum())], dtype=np.int64),
            }
        )

    row = joined.map_batches(sums, batch_format="pandas", batch_size=None).aggregate(
        Sum("promo_e4", alias_name="promo_e4"),
        Sum("total_e4", alias_name="total_e4"),
    )
    promo, total = int(row["promo_e4"]), int(row["total_e4"])
    return pd.DataFrame(
        [
            {
                "promo_revenue_e4": promo,
                "total_revenue_e4": total,
                "promo_share_ppm": (promo * 1_000_000) // total if total else 0,
            }
        ]
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shape forecast revenue: one global sum over a
    triple-predicate slice — the predicate-pushdown benchmark. All
    three filters (ship year, discount band, quantity cap) ride the
    ``read_parquet`` filter, so only matching row groups leave storage
    and only two columns are materialized; the sum is fixed-point
    ``round(price*100) * round(disc*100)`` (1e-4 dollars) over one
    combiner row per batch. Zero shuffle."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp("1997-01-01"))
        & (pc.field("l_shipdate") < pd.Timestamp("1998-01-01"))
        & (pc.field("l_discount") >= 0.05)
        & (pc.field("l_discount") <= 0.07)
        & (pc.field("l_quantity") < 24),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "revenue_e4": np.asarray([int((cents * dpct).sum())], dtype=np.int64),
                "n_items": np.asarray([len(cents)], dtype=np.int64),
            }
        )

    row = li.map_batches(partial, batch_format="pandas").aggregate(
        Sum("revenue_e4", alias_name="revenue_e4"),
        Sum("n_items", alias_name="n_items"),
    )
    row = row or {}
    return pd.DataFrame(
        [
            {
                "revenue_e4": int(row.get("revenue_e4") or 0),
                "n_items": int(row.get("n_items") or 0),
            }
        ]
    )


def orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth in exact basis points — the
    time-series widen-at-output shape: per-month totals come from
    combiner partials + a tiny groupby (|months| rows at any corpus
    size), and the LAG window runs on the output-sized frame on the
    driver. DuckDB's integer ``//`` TRUNCATES toward zero on signed
    values while numpy floors, so negative growth months use the
    explicit sign-split truncating division below to match
    bit-for-bit."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "month": df["o_orderdate"].dt.to_period("M").dt.to_timestamp(),
                "total_e2": np.rint(df["o_totalprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )
        g = out.groupby("month", sort=False, as_index=False).agg(
            total_e2=("total_e2", "sum"), n_orders=("total_e2", "size")
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("month")
        .aggregate(
            Sum("total_e2", alias_name="total_e2"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    df = agg.to_pandas().sort_values("month").reset_index(drop=True)
    prev = df["total_e2"].shift()
    growth = np.zeros(len(df), dtype=np.int64)
    ok = prev.notna().to_numpy()
    num = (
        df["total_e2"].to_numpy()[ok] - prev.to_numpy()[ok].astype(np.int64)
    ) * 10_000
    den = prev.to_numpy()[ok].astype(np.int64)
    growth[ok] = np.sign(num) * (np.abs(num) // den)  # truncate like DuckDB
    df["growth_bp"] = growth
    df["n_orders"] = df["n_orders"].astype("int64")
    df["total_e2"] = df["total_e2"].astype("int64")
    return df[["month", "n_orders", "total_e2", "growth_bp"]]


def orders_retention_cohort(sf_dir: str):
    """Retention cohort matrix: customers grouped by first-order year
    (the cohort), counted in every year they ordered again — the
    warehouse shape behind retention curves.

    Scale shape: ONE all-to-all co-partitions each customer's orders
    (``o_custkey % B``); the cohort year, the distinct (customer,
    year) pairs, and the per-(cohort, year) partial counts are all
    vectorized inside the bucket (every order of a customer lands in
    one bucket, so the in-bucket first-order min and dedup are
    global); only |cohorts| x |years| partial rows per bucket reach
    the final tiny groupby."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "c": df["o_custkey"].to_numpy(),
                "yr": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
            }
        )
        out["bucket"] = (out["c"] % NUM_BUCKETS).astype(np.int32)
        return out

    def cohort_bucket(df: pd.DataFrame) -> pd.DataFrame:
        first = (
            df.groupby("c", sort=False, as_index=False)["yr"]
            .min()
            .rename(columns={"yr": "cohort_year"})
        )
        d = df.merge(first, on="c")[["c", "cohort_year", "yr"]].drop_duplicates()
        g = (
            d.groupby(["cohort_year", "yr"], sort=False)
            .size()
            .reset_index(name="n_customers")
            .rename(columns={"yr": "order_year"})
        )
        return g

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .groupby(["cohort_year", "order_year"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )
    df = agg.to_pandas()
    df["n_customers"] = df["n_customers"].astype("int64")
    return df[["cohort_year", "order_year", "n_customers"]]


Q18_MIN_QTY = 250


def q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shape large-volume orders: orders whose lineitem
    quantity total reaches a threshold, with customer names attached.

    Scale shape: the HAVING filter runs INSIDE the join bucket —
    lineitem collapses to per-batch combiner partials, one
    co-partitioned ``hash_join`` against orders finishes the per-order
    sum AND applies ``sum_qty >= T`` in ``right_prepare``, so only
    qualifying orders (the extreme tail at any scale) leave the
    exchange. The qualifying set is output-sized, so customer names
    attach by collecting it, broadcasting its (tiny) custkey set, and
    scanning customer filtered to those keys — never broadcasting the
    full customer dimension."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "sum_qty": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["sum_qty"].sum()

    partials = li.map_batches(combiner, batch_format="pandas")

    def finish_having(rf):
        g = rf.group_by("o_orderkey").agg(pl.col("sum_qty").sum())
        return g.filter(pl.col("sum_qty") >= Q18_MIN_QTY)

    qual = hash_join(
        orders,
        partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("sum_qty", pa.int64())]),
        right_prepare=finish_having,
    ).to_pandas()  # output-sized: only orders past the HAVING tail

    keys_ref = ray.put(set(qual["o_custkey"].astype(int)))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"].isin(ray.get(keys_ref))]

    names = cust.map_batches(pick, batch_format="pandas").to_pandas()
    out = qual.merge(names, left_on="o_custkey", right_on="c_custkey")
    return out[["o_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"]]


Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shape top supplier: the supplier(s) achieving the
    global-max quarterly revenue — the argmax-of-an-aggregate shape.

    Scale shape: lineitem is date-pruned AT THE READ and collapsed to
    per-suppkey combiner partials per batch; the per-supplier totals
    merge in coarse crc buckets (never a high-cardinality
    ``groupby().aggregate()``) and the merged dataset — supplier
    cardinality, distributed — is materialized ONCE and scanned twice:
    pass 1 reduces to per-bucket maxima (B rows to the driver, global
    max by fold), pass 2 filters ``total == max`` in-stream. Winner
    names attach from the broadcast supplier dimension."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q15_DATE_LO))
        & (pc.field("l_shipdate") < pd.Timestamp(Q15_DATE_HI)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                "rev": cents * (100 - dpct),
            }
        )
        g = out.groupby("l_suppkey", sort=False, as_index=False)["rev"].sum()
        g["hb"] = (g["l_suppkey"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_suppkey", sort=False, as_index=False)["rev"].sum()

    totals = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .materialize()  # supplier-cardinality, stays distributed
    )

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame({"m": [int(df["rev"].max())]})

    maxima = totals.map_batches(bucket_max, batch_format="pandas").to_pandas()
    cols = ["s_suppkey", "s_name", "total_rev_e4"]
    if len(maxima) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64" if c != "s_name" else "object") for c in cols})
    gmax = int(maxima["m"].max())
    winners = totals.filter(
        expr=f"rev == {gmax}"
    ).to_pandas()  # output-sized: ties at the global max
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.rename(columns={"rev": "total_rev_e4"})
    return out[cols]


Q10_DATE_LO = "1996-10-01"
Q10_DATE_HI = "1997-01-01"


def q10_returned_revenue(sf_dir: str):
    """TPC-H-Q10-shape returned-item report: top-20 customers by
    revenue lost to returned items in one quarter.

    Scale shape: both fact sides are pruned at the read (orders by
    date via row-group filter, lineitem to ``l_returnflag = 'R'``);
    lineitem collapses to per-orderkey revenue partials
    (``left_prepare`` finishes the sum in-bucket); ONE co-partitioned
    ``hash_join`` attaches o_custkey; per-custkey totals merge in
    coarse crc buckets with a per-bucket top-20 (driver sees 20 x B
    rows, the ``docs_top_terms`` topology); names for the final 20
    keys come from a filtered customer scan + tiny nation broadcast."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q10_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q10_DATE_HI)),
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "rev": cents * (100 - dpct),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["rev"].sum()

    joined = hash_join(
        li.map_batches(rev_partial, batch_format="pandas"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        left_prepare=lambda lf: lf.group_by("l_orderkey").agg(pl.col("rev").sum()),
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c": t["o_custkey"].to_numpy(zero_copy_only=False),
                "rev": t["rev"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("c", sort=False, as_index=False)["rev"].sum()
        g["hb"] = (g["c"] % 16).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c", sort=False, as_index=False)["rev"].sum()
        g = g.sort_values(["rev", "c"], ascending=[False, True], kind="mergesort")
        return g.head(20)

    cand = (
        joined.map_batches(cust_partial, batch_format="pyarrow", batch_size=None)
        .groupby("hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # 20 x B rows
        .sort_values(["rev", "c"], ascending=[False, True], kind="mergesort")
        .head(20)
    )
    keys_ref = ray.put(set(cand["c"].astype(int)))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"].isin(ray.get(keys_ref))]

    names = cust.map_batches(pick, batch_format="pandas").to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    out = cand.merge(names, left_on="c", right_on="c_custkey")
    out["n_name"] = out["c_nationkey"].astype(int).map(n2name)
    out = out.rename(columns={"rev": "revenue_e4"})
    out = out.sort_values(
        ["revenue_e4", "c_custkey"], ascending=[False, True], kind="mergesort"
    )
    return out[["c_custkey", "c_name", "n_name", "revenue_e4"]].reset_index(drop=True)


Q17_BRAND = "Brand#4"


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-shape small-quantity-order revenue: total revenue of
    one brand's lineitems whose quantity is below 20% of that part's
    average — the decorrelated correlated-aggregate shape.

    Scale shape: the brand's partkeys (a ~0.1% slice of part) broadcast
    once; pass 1 builds per-part (sum_qty, n) from combiner partials
    merged in coarse crc buckets (brand-part cardinality, collected —
    output-bounded by the brand slice); pass 2 re-scans lineitem with
    the broadcast per-part stats and keeps ``5 * qty * n < sum_qty``
    (the exact-integer form of ``qty < 0.2 * avg``, no float division
    on either engine), reducing to one global sum. Zero all-to-all
    exchanges."""
    brand = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bkeys = brand.loc[brand["p_brand"] == Q17_BRAND, "p_partkey"].astype(int)
    bkeys_ref = ray.put(set(bkeys))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(ray.get(bkeys_ref))]
        out = pd.DataFrame(
            {
                "p": df["l_partkey"].to_numpy(),
                "s": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        g = out.groupby("p", sort=False, as_index=False).agg(
            s=("s", "sum"), n=("s", "size")
        )
        g["hb"] = (g["p"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p", sort=False, as_index=False)[["s", "n"]].sum()

    stats = (
        li.map_batches(stats_partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()  # brand-slice cardinality
    )
    stats_ref = ray.put(stats[["p", "s", "n"]].astype(np.int64))

    def small_qty(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        # vectorized pandas hash join against the broadcast stats frame
        m = df.merge(st, left_on="l_partkey", right_on="p", how="inner")
        qty = m["l_quantity"].to_numpy().astype(np.int64)
        keep = 5 * qty * m["n"].to_numpy() < m["s"].to_numpy()
        cents = np.rint(m["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "n_items": np.asarray([int(keep.sum())], dtype=np.int64),
                "revenue_e2": np.asarray([int(cents[keep].sum())], dtype=np.int64),
            }
        )

    row = li.map_batches(small_qty, batch_format="pandas").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_e2", alias_name="revenue_e2"),
    )
    row = row or {}
    return pd.DataFrame(
        [
            {
                "n_items": int(row.get("n_items") or 0),
                "revenue_e2": int(row.get("revenue_e2") or 0),
            }
        ]
    )


def q22_idle_rich_customers(sf_dir: str):
    """TPC-H-Q22-shape global-customer-relationship: per-nation count
    and balance of customers whose balance beats the global positive
    average and who never placed a 1-URGENT order — scalar-subquery
    broadcast + anti join + small group.

    Scale shape: the global average decorrelates into two scalars
    (sum_e2, n) from combiner partials, broadcast once; the comparison
    is the exact-integer cross-multiplication ``bal_e2 * n > sum_e2``
    (no float division on either engine); the anti join broadcasts the
    distinct-urgent-customer key set built from per-batch unique
    lists over a read pruned to the urgent slice (J2, the
    ``customers_no_orders`` machinery — swap in a Bloom filter beyond
    dimension scale); the final rollup is a 25-group aggregate over
    per-batch partials."""
    import pyarrow.compute as pc

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal = np.rint(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = bal[df["c_acctbal"].to_numpy() > 0]
        return pd.DataFrame(
            {
                "s": np.asarray([int(pos.sum())], dtype=np.int64),
                "n": np.asarray([len(pos)], dtype=np.int64),
            }
        )

    row = cust.map_batches(bal_partial, batch_format="pandas").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    s_pos, n_pos = int(row["s"] or 0), int(row["n"] or 0)

    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )

    def batch_keys(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("o_custkey").to_numpy())
        return pa.table({"ks": pa.array([u.tolist()], pa.list_(pa.int64()))})

    rows = urgent.map_batches(batch_keys, batch_format="pyarrow").take_all()
    have_urgent = set(
        np.concatenate([np.asarray(r["ks"], dtype=np.int64) for r in rows]).tolist()
        if rows
        else []
    )
    ctx_ref = ray.put((s_pos, n_pos, have_urgent))

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        s, n, ho = ray.get(ctx_ref)
        bal_e2 = np.rint(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = (
            (df["c_acctbal"].to_numpy() > 0)
            & (bal_e2 * n > s)
            & ~df["c_custkey"].isin(ho).to_numpy()
        )
        part = pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"].to_numpy()[keep].astype(np.int64),
                "bal_e2": bal_e2[keep],
            }
        )
        g = part.groupby("c_nationkey", sort=False, as_index=False).agg(
            n_custs=("bal_e2", "size"), total_acctbal_e2=("bal_e2", "sum")
        )
        return g

    agg = cust.map_batches(nation_partial, batch_format="pandas").groupby(
        "c_nationkey"
    ).aggregate(
        Sum("n_custs", alias_name="n_custs"),
        Sum("total_acctbal_e2", alias_name="total_acctbal_e2"),
    )
    df = agg.to_pandas()
    if df.empty:  # degenerate slice: keep the schema
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype="object"),
                "n_custs": pd.Series([], dtype="int64"),
                "total_acctbal_e2": pd.Series([], dtype="int64"),
            }
        )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    df["n_name"] = df["c_nationkey"].astype(int).map(n2name)
    df["n_custs"] = df["n_custs"].astype("int64")
    df["total_acctbal_e2"] = df["total_acctbal_e2"].astype("int64")
    return df[["n_name", "n_custs", "total_acctbal_e2"]]


def q12_priority_class(sf_dir: str):
    """TPC-H-Q12-shape conditional aggregation over a fact-fact join:
    per lineitem return flag, how many lines belong to high-priority
    orders (1-URGENT / 2-HIGH) vs low — Q12's CASE-sum split, keyed on
    l_returnflag because the synthetic lineitem has no l_shipmode.

    Scale shape: ONE co-partitioned ``hash_join`` exchange on orderkey
    (both sides fact-sized — no broadcast), then the joined stream
    collapses to (flag, high, low) combiner partials per output block;
    the final groupby sees 3 x n_blocks rows."""
    from neuscraper_ray.functions.joins import hash_join

    li_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_returnflag", pa.string())]
    )
    o_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
    )
    joined = hash_join(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=li_schema,
        right_schema=o_schema,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"], "hi": hi})
        out = g.groupby("l_returnflag", sort=False).agg(
            high_line_count=("hi", "sum"), low_line_count=("hi", "size")
        )
        out["low_line_count"] -= out["high_line_count"]
        return out.reset_index()

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("l_returnflag", as_index=False)[
        ["high_line_count", "low_line_count"]
    ].sum()
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q19_GROUPS = [  # (brand, max_size, qty_lo, qty_hi) — OR of conjunctions
    ("Brand#1", 10, 1, 15),
    ("Brand#3", 25, 10, 30),
    ("Brand#5", 40, 20, 50),
]


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H-Q19-shape disjunctive predicate over a part x lineitem
    join: revenue from lines matching ANY of three (brand, size-range,
    quantity-range) conjunction groups — the classic OR-of-ANDs that
    defeats naive predicate pushdown.

    Scale shape: the part side is pre-filtered to the three brands AT
    THE READ and broadcast as a sorted (partkey -> group) array (the
    Q17 brand-partkeys precedent; 3/|brands| of the part table), so
    the lineitem pass is ZERO-shuffle: per batch one searchsorted
    membership probe, per-group quantity bounds applied vectorized,
    one (revenue_e4, n_lines) partial row out."""
    import pyarrow.compute as pc

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin([g[0] for g in Q19_GROUPS]),
    ).to_pandas()
    brand_idx = {g[0]: i for i, g in enumerate(Q19_GROUPS)}
    sizes = np.array([g[1] for g in Q19_GROUPS], dtype=np.int64)
    part["grp"] = part["p_brand"].map(brand_idx).astype(np.int64)
    ps = part["p_size"].to_numpy()
    # BETWEEN 1 AND hi, matching the SQL twin's lower bound exactly
    part = part[(ps >= 1) & (ps <= sizes[part["grp"].to_numpy()])]
    order = np.argsort(part["p_partkey"].to_numpy(), kind="stable")
    keys_ref = ray.put(part["p_partkey"].to_numpy()[order])
    grp_ref = ray.put(part["grp"].to_numpy()[order])
    qlo = np.array([g[2] for g in Q19_GROUPS], dtype=np.float64)
    qhi = np.array([g[3] for g in Q19_GROUPS], dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, grp = ray.get(keys_ref), ray.get(grp_ref)
        pk = df["l_partkey"].to_numpy()
        if len(keys):
            pos_c = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
            m = keys[pos_c] == pk
        else:
            pos_c = np.zeros(len(pk), dtype=np.int64)
            m = np.zeros(len(pk), dtype=bool)
        qty = df["l_quantity"].to_numpy()
        g = np.where(m, grp[pos_c], 0)
        m &= (qty >= qlo[g]) & (qty <= qhi[g])
        cents = np.rint(df["l_extendedprice"].to_numpy()[m] * 100).astype(
            np.int64
        )
        dpct = np.rint(df["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "revenue_e4": [int((cents * (100 - dpct)).sum())],
                "n_lines": [int(m.sum())],
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([parts["revenue_e4"].sum()], dtype="int64"),
            "n_lines": pd.Series([parts["n_lines"].sum()], dtype="int64"),
        }
    )


def q21_sole_failing_supplier(sf_dir: str):
    """TPC-H-Q21-shape "suppliers who kept orders waiting": for each
    supplier, count multi-supplier orders where THIS supplier had a
    returned line ('R' — the synthetic lineitem has no
    commit/receipt dates) and NO other supplier did — Q21's correlated
    EXISTS + NOT-EXISTS pair. Top 20 by count desc, suppkey asc.

    Scale shape: ONE keyed exchange on an orderkey bucket co-locates
    every line of an order, so both correlated subqueries become
    vectorized in-bucket group facts (distinct suppliers per order,
    distinct R-suppliers per order); qualifying (suppkey, n) partials
    take a SECOND tiny exchange on a coarse suppkey bucket with
    per-bucket top-k (a suppkey's total lives in one bucket), so the
    driver folds k x B rows; names attach from the broadcast supplier
    dimension."""
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64

    def widen(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        return t.append_column(
            "ob", pa.array(_bucket_i64(ok, NUM_BUCKETS), pa.int32())
        )

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        facts = pf.group_by("l_orderkey").agg(
            pl.col("l_suppkey").n_unique().alias("n_supp"),
            pl.col("l_suppkey")
            .filter(pl.col("l_returnflag") == "R")
            .n_unique()
            .alias("n_rsupp"),
        )
        w = (
            pf.filter(pl.col("l_returnflag") == "R")
            .select(["l_orderkey", "l_suppkey"])
            .unique()
            .join(facts, on="l_orderkey")
            .filter((pl.col("n_supp") >= 2) & (pl.col("n_rsupp") == 1))
            .group_by("l_suppkey")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        out = w.to_pandas()
        out["sb"] = (out["l_suppkey"].to_numpy() % 16).astype(np.int32)
        return out

    K = 20

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", sort=False, as_index=False)["n"].sum()
        g = g.sort_values(
            ["n", "l_suppkey"], ascending=[False, True], kind="mergesort"
        )
        return g.head(K)

    cand = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(widen, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(per_order, batch_format="pandas")
        .groupby("sb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["n", "l_suppkey"], ascending=[False, True], kind="mergesort"
    ).head(K)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = cand.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["numwait"] = out["n"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


Q2_REGION = "EUROPE"
Q2_SIZE = 15
Q2_NAME_SUFFIX = "bolt"


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shape minimum-cost supplier (adapted: the synthetic
    schema has no partsupp table, so supply cost is each supplier's
    cheapest observed sale price — ``min(l_extendedprice)`` cents per
    (part, supplier) — among one region's suppliers; ref shape:
    correlated MIN subquery per part, top-100 by account balance).

    Scale shape: both dimension slices broadcast once (region's
    suppliers ~ |supplier|/5, filtered parts ~ |part|/250); lineitem is
    column-pruned and collapsed per batch to (part, supp) min partials;
    ONE keyed exchange on a partkey bucket co-locates every candidate
    of a part, so the correlated min resolves vectorized in-bucket with
    no second shuffle; only winner rows (output-sized) reach the
    driver."""
    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", None).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"]).to_pandas()

    rkey = int(region.loc[region["r_name"] == Q2_REGION, "r_regionkey"].iloc[0])
    n2name = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    esupp = supp[supp["s_nationkey"].isin(rnations)]
    sinfo = {
        int(r.s_suppkey): (
            r.s_name,
            int(round(r.s_acctbal * 100)),
            n2name[int(r.s_nationkey)],
        )
        for r in esupp.itertuples()
    }
    fpart = part[
        (part["p_size"] == Q2_SIZE)
        & part["p_name"].str.endswith(Q2_NAME_SUFFIX)
    ]
    pname = dict(zip(fpart["p_partkey"].astype(int), fpart["p_name"]))
    # membership as dense boolean arrays (keys are 0..N-1 dimension
    # surrogates): one vectorized gather per batch, no hashed isin
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[np.fromiter(sinfo, dtype=np.int64)] = True
    p_mask = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    p_mask[np.fromiter(pname, dtype=np.int64)] = True
    dims_ref = ray.put((s_mask, p_mask))

    from neuscraper_ray.functions.joins import _bucket_i64

    def cost_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m, p_m = ray.get(dims_ref)
        sk = df["l_suppkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        keep = (
            (sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]
            & (pk < len(p_m)) & p_m[np.minimum(pk, len(p_m) - 1)]
        )
        df = df[keep]
        out = pd.DataFrame(
            {
                "l_partkey": df["l_partkey"].to_numpy(),
                "l_suppkey": df["l_suppkey"].to_numpy(),
                "cost_e2": np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )
        g = out.groupby(["l_partkey", "l_suppkey"], sort=False, as_index=False)[
            "cost_e2"
        ].min()
        g["pb"] = _bucket_i64(g["l_partkey"].to_numpy(), 16)
        return g

    def bucket_winners(df: pd.DataFrame) -> pd.DataFrame:
        # every (part, supp) partial of a part is in this bucket: finish
        # the pair min, then the per-part min, keep the ties — the
        # correlated subquery, vectorized
        g = df.groupby(["l_partkey", "l_suppkey"], sort=False, as_index=False)[
            "cost_e2"
        ].min()
        pmin = g.groupby("l_partkey")["cost_e2"].transform("min")
        return g[g["cost_e2"] == pmin]

    cand = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
        )
        .map_batches(cost_partial, batch_format="pandas")
        .groupby("pb")
        .map_groups(bucket_winners, batch_format="pandas")
        .to_pandas()  # output-sized: winners only
    )
    info = cand["l_suppkey"].astype(int).map(sinfo)
    cand["s_name"] = [t[0] for t in info]
    cand["s_acctbal_e2"] = np.array([t[1] for t in info], dtype=np.int64)
    cand["n_name"] = [t[2] for t in info]
    cand["p_name"] = cand["l_partkey"].astype(int).map(pname)
    cand = cand.rename(columns={"l_partkey": "p_partkey"})
    cand = cand.sort_values(
        ["s_acctbal_e2", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).head(100)
    cand["p_partkey"] = cand["p_partkey"].astype("int64")
    return cand[
        ["s_acctbal_e2", "s_name", "n_name", "p_partkey", "p_name", "cost_e2"]
    ].reset_index(drop=True)


Q9_NAME_PREFIX = "red "


def q9_product_type_profit(sf_dir: str):
    """TPC-H-Q9-shape product-type profit by nation and year (adapted:
    no partsupp, so unit cost is the part's list price —
    ``p_retailprice`` cents — instead of ps_supplycost; profit =
    discounted revenue minus list-cost x quantity, exact e4 fixed
    point).

    Scale shape: filtered parts (name-prefix slice) and supplier ->
    nation broadcast once; lineitem collapses per batch to (orderkey,
    nation) profit partials — the ONE co-partitioned ``hash_join``
    attaches the order year; (nation, year) partials then merge in a
    tiny final groupby (25 x 7 groups)."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()

    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    # dense lookup arrays (dimension keys are 0..N-1 surrogates):
    # suppkey -> nationkey as one int gather per batch; the nation NAME
    # attaches only in the final |nations x years| fold
    s2natkey = np.full(int(supp["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    s2natkey[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    fpart = part[part["p_name"].str.startswith(Q9_NAME_PREFIX)]
    retail_arr = np.full(int(part["p_partkey"].max()) + 1, -1, dtype=np.int64)
    retail_arr[fpart["p_partkey"].to_numpy()] = np.rint(
        fpart["p_retailprice"].to_numpy() * 100
    ).astype(np.int64)
    dims_ref = ray.put((s2natkey, retail_arr))

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        s2n_a, retail_a = ray.get(dims_ref)
        pk = df["l_partkey"].to_numpy()
        cost_e2 = retail_a[np.minimum(pk, len(retail_a) - 1)]
        keep = (pk < len(retail_a)) & (cost_e2 >= 0)
        df = df[keep]
        cost_e2 = cost_e2[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "natkey": s2n_a[df["l_suppkey"].to_numpy()],
                "amount_e4": cents * (100 - dpct) - cost_e2 * 100 * qty,
            }
        )
        return out.groupby(["l_orderkey", "natkey"], sort=False, as_index=False)[
            "amount_e4"
        ].sum()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "o_year": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(orders_prep, batch_format="pandas"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("natkey", pa.int64()),
                ("amount_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
        ),
        left_prepare=lambda lf: lf.group_by(["l_orderkey", "natkey"]).agg(
            pl.col("amount_e4").sum()
        ),
    )

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["natkey", "o_year"], sort=False, as_index=False)[
            "amount_e4"
        ].sum()

    out = (
        joined.map_batches(year_partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # bounded: <= 25 nations x 7 years per bucket-batch
        .groupby(["natkey", "o_year"], as_index=False)["amount_e4"]
        .sum()
        .rename(columns={"amount_e4": "profit_e4"})
    )
    out["nation"] = out["natkey"].astype(int).map(n2name)
    out = out.sort_values(
        ["nation", "o_year"], ascending=[True, False], kind="mergesort"
    )
    return out[["nation", "o_year", "profit_e4"]].reset_index(drop=True)


Q11_REGION = "ASIA"
Q11_FRACTION_DEN = 1000  # keep parts with value > total/1000


def q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shape important stock (adapted: no partsupp, so a
    part's "value" is one region's suppliers' discounted revenue on
    it): parts whose value exceeds 1/1000 of the region-wide total —
    the global-total scalar-subquery shape.

    Scale shape: region suppliers broadcast as a key set; lineitem
    collapses to per-partkey revenue partials merged in coarse crc
    buckets; the part-cardinality totals materialize ONCE distributed
    and are scanned twice — pass 1 folds per-bucket sums to the global
    scalar (B rows to the driver), pass 2 is a streaming threshold
    filter (output-sized result)."""
    from neuscraper_ray.functions.joins import _bucket_i64

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q11_REGION, "r_regionkey"].iloc[0])
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[
        supp.loc[supp["s_nationkey"].isin(rnations), "s_suppkey"].to_numpy()
    ] = True
    skeys_ref = ray.put(s_mask)

    def value_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m = ray.get(skeys_ref)
        sk = df["l_suppkey"].to_numpy()
        df = df[(sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_partkey": df["l_partkey"].to_numpy(),
                "value_e4": cents * (100 - dpct),
            }
        )
        g = out.groupby("l_partkey", sort=False, as_index=False)["value_e4"].sum()
        g["pb"] = _bucket_i64(g["l_partkey"].to_numpy(), 16)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", sort=False, as_index=False)["value_e4"].sum()

    totals = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(value_partial, batch_format="pandas")
        .groupby("pb")
        .map_groups(merge_bucket, batch_format="pandas")
        .materialize()  # part-cardinality, stays distributed
    )

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["value_e4"].sum())]})

    grand = int(
        totals.map_batches(bucket_sum, batch_format="pandas").to_pandas()["s"].sum()
    )
    # value*1000 > grand  <=>  value >= grand//1000 + 1  (integers)
    thr = grand // Q11_FRACTION_DEN + 1
    out = totals.filter(expr=f"value_e4 >= {thr}").to_pandas()  # output-sized
    if len(out) == 0:  # heavy tail can be empty (column-less empty frame)
        return pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype="int64"),
                "value_e4": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values(
        ["value_e4", "l_partkey"], ascending=[False, True], kind="mergesort"
    )
    out["l_partkey"] = out["l_partkey"].astype("int64")
    return out[["l_partkey", "value_e4"]].reset_index(drop=True)


Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "ECONOMY"
Q16_SIZES = (1, 3, 9, 14, 19, 23, 36, 45)


def q16_part_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shape supplier counts per part attribute group:
    distinct suppliers per (brand, type, size) over a filtered part
    slice, excluding "delinquent" suppliers (s_acctbal < 0 — the
    NOT-IN-subquery shape; the synthetic supplier has no comment
    column).

    Scale shape: part attributes and the exclusion key set broadcast
    once; per batch the (group, suppkey) projection dedups BEFORE the
    exchange (combiner-style), then ONE keyed exchange on the
    group-string bucket makes the in-bucket distinct-count global —
    the count never sees raw lineitem rows."""
    from neuscraper_ray.functions.joins import str_buckets

    part = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    fpart = part[
        (part["p_brand"] != Q16_EXCL_BRAND)
        & (part["p_type"] != Q16_EXCL_TYPE)
        & part["p_size"].isin(Q16_SIZES)
    ]
    # dense attribute arrays (partkeys are 0..N-1 surrogates): three
    # vectorized gathers per batch instead of a per-row tuple map
    npart = int(part["p_partkey"].max()) + 1
    brand_arr = np.full(npart, "", dtype=object)
    type_arr = np.full(npart, "", dtype=object)
    size_arr = np.full(npart, -1, dtype=np.int64)
    fk = fpart["p_partkey"].to_numpy()
    brand_arr[fk] = fpart["p_brand"].to_numpy()
    type_arr[fk] = fpart["p_type"].to_numpy()
    size_arr[fk] = fpart["p_size"].to_numpy()
    good_mask = np.ones(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    good_mask[supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy()] = False
    dims_ref = ray.put((brand_arr, type_arr, size_arr, good_mask))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        brand_a, type_a, size_a, good_m = ray.get(dims_ref)
        pk = df["l_partkey"].to_numpy()
        sk = df["l_suppkey"].to_numpy()
        keep = (
            (pk < len(size_a)) & (size_a[np.minimum(pk, len(size_a) - 1)] >= 0)
            & (sk < len(good_m)) & good_m[np.minimum(sk, len(good_m) - 1)]
        )
        pk, sk = pk[keep], sk[keep]
        out = pd.DataFrame(
            {
                "p_brand": brand_a[pk],
                "p_type": type_a[pk],
                "p_size": size_a[pk],
                "l_suppkey": sk,
            }
        ).drop_duplicates()
        key = (
            out["p_brand"] + "|" + out["p_type"] + "|" + out["p_size"].astype(str)
        )
        out["gb"] = str_buckets(key.tolist(), 16)
        return out

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        g = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="supplier_cnt")
        )
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pair_partial, batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()  # group-cardinality: brands x types x 8 sizes
    )
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="mergesort",
    )
    return out.reset_index(drop=True)


Q20_NAME_PREFIX = "small "
Q20_REGION = "AMERICA"
Q20_YEAR_LO = "1997-01-01"
Q20_YEAR_HI = "1998-01-01"


def q20_heavy_shippers(sf_dir: str):
    """TPC-H-Q20-shape "suppliers with excess stock" (adapted: no
    partsupp availqty, so the semi-join predicate is shipping
    concentration — a supplier qualifies if, for some name-filtered
    part, MORE than half its all-time quantity shipped inside one
    year): one region's qualifying suppliers by name — the
    EXISTS-over-aggregated-subquery shape.

    Scale shape: filtered partkeys + the region's supplier keys
    broadcast once; lineitem collapses per batch to (supp, part)
    [qty_all, qty_yr] partials; ONE keyed exchange on a suppkey bucket
    finishes both sums, applies the 2x threshold and dedups to
    distinct suppkeys in-bucket — the driver sees at most |supplier|
    rows."""
    from neuscraper_ray.functions.joins import _bucket_i64

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", None).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q20_REGION, "r_regionkey"].iloc[0])
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    rsupp = supp[supp["s_nationkey"].isin(rnations)]
    sinfo = {
        int(r.s_suppkey): (r.s_name, int(round(r.s_acctbal * 100)))
        for r in rsupp.itertuples()
    }
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[np.fromiter(sinfo, dtype=np.int64)] = True
    p_mask = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    p_mask[
        part.loc[part["p_name"].str.startswith(Q20_NAME_PREFIX), "p_partkey"].to_numpy()
    ] = True
    dims_ref = ray.put((s_mask, p_mask))
    lo, hi = np.datetime64(Q20_YEAR_LO), np.datetime64(Q20_YEAR_HI)

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m, p_m = ray.get(dims_ref)
        sk = df["l_suppkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        keep = (
            (sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]
            & (pk < len(p_m)) & p_m[np.minimum(pk, len(p_m) - 1)]
        )
        df = df[keep]
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        ship = df["l_shipdate"].to_numpy()
        in_yr = (ship >= lo) & (ship < hi)
        out = pd.DataFrame(
            {
                "l_suppkey": df["l_suppkey"].to_numpy(),
                "l_partkey": df["l_partkey"].to_numpy(),
                "qty_all": qty,
                "qty_yr": qty * in_yr.astype(np.int64),
            }
        )
        g = out.groupby(["l_suppkey", "l_partkey"], sort=False, as_index=False)[
            ["qty_all", "qty_yr"]
        ].sum()
        g["sb"] = _bucket_i64(g["l_suppkey"].to_numpy(), 16)
        return g

    def bucket_qualify(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_suppkey", "l_partkey"], sort=False, as_index=False)[
            ["qty_all", "qty_yr"]
        ].sum()
        ok = g.loc[2 * g["qty_yr"] > g["qty_all"], ["l_suppkey"]].drop_duplicates()
        return ok

    cand = (
        _read(
            sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(qty_partial, batch_format="pandas")
        .groupby("sb")
        .map_groups(bucket_qualify, batch_format="pandas")
        .to_pandas()  # <= |region's suppliers| rows
    )
    info = cand["l_suppkey"].astype(int).map(sinfo)
    cand["s_name"] = [t[0] for t in info]
    cand["s_acctbal_e2"] = np.array([t[1] for t in info], dtype=np.int64)
    cand = cand.sort_values("s_name", kind="mergesort")
    return cand[["s_name", "s_acctbal_e2"]].reset_index(drop=True)
