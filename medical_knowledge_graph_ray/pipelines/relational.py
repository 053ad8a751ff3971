"""Relational operator pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator families against the
reference's inventory (SURVEY §2): partial-then-final aggregation (A1/A4),
broadcast-hash joins for small sides (J2-J5 "avoid the shuffle join"),
anti/semi joins by broadcast set (J6), global sort + limit (R1-R3), and
vectorized filters/projections (O-family scalar ops).

Float determinism contract: every SUM over monetary doubles is computed on
exactly-scaled int64 cents (``rint(x * 10^d)``) and divided back once at
the end — a single IEEE multiply + rint is bit-identical between numpy and
DuckDB, so the oracle hash matches regardless of summation order or
parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc

from ..functions.arrow import arrow_out

Q1_CUTOFF = "2001-09-01"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1999-01-01"


def _read(sf_dir: str, table: str, columns=None, filter=None):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, filter=filter
    )


# -- Q1: pricing summary (groupby aggregate with batch-local combiner) -------

def q1_pricing(sf_dir: str):
    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
        filter=pc.field("l_shipdate") <= pc.scalar(np.datetime64(Q1_CUTOFF, "us")),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        qty_c = np.rint(b["l_quantity"].to_numpy() * 100).astype("int64")
        price = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        tax = b["l_tax"].to_numpy()
        price_c = np.rint(price * 100).astype("int64")
        disc_price_c = np.rint(price * (1.0 - disc) * 10_000).astype("int64")
        charge_c = np.rint(price * (1.0 - disc) * (1.0 + tax) * 1_000_000).astype("int64")
        disc_c = np.rint(disc * 100).astype("int64")
        df = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_c": qty_c, "price_c": price_c, "disc_price_c": disc_price_c,
                "charge_c": charge_c, "disc_c": disc_c,
            }
        )
        return (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                qty_c=("qty_c", "sum"), price_c=("price_c", "sum"),
                disc_price_c=("disc_price_c", "sum"), charge_c=("charge_c", "sum"),
                disc_c=("disc_c", "sum"), n=("qty_c", "size"),
            )
            .reset_index()
        )

    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(arrow_out(partial), batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_price_c", alias_name="disc_price_c"),
            Sum("charge_c", alias_name="charge_c"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("n", alias_name="count_order"),
        )
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["count_order"]
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": df["qty_c"] / 100.0,
                "sum_base_price": df["price_c"] / 100.0,
                "sum_disc_price": df["disc_price_c"] / 10_000.0,
                "sum_charge": df["charge_c"] / 1_000_000.0,
                "avg_qty": df["qty_c"] / 100.0 / n,
                "avg_price": df["price_c"] / 100.0 / n,
                "avg_disc": df["disc_c"] / 100.0 / n,
                "count_order": n,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas").sort(
        ["l_returnflag", "l_linestatus"]
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
       SUM(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS sum_disc_price,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT))/1000000.0 AS sum_charge,
       SUM(CAST(round(l_quantity*100) AS BIGINT))/100.0/COUNT(*) AS avg_qty,
       SUM(CAST(round(l_extendedprice*100) AS BIGINT))/100.0/COUNT(*) AS avg_price,
       SUM(CAST(round(l_discount*100) AS BIGINT))/100.0/COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- Q3: shipping priority (broadcast-hash join chain + top-k) ----------------

def q3_top_orders(sf_dir: str, k: int = 10):
    """customer ⋈ orders ⋈ lineitem with both dimension sides broadcast:
    the only exchange is the per-orderkey aggregate of partials (J4/J5
    broadcast-dict pattern; no shuffle join)."""
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == Q3_SEGMENT,
    ).to_pandas()
    custkeys = set(cust["c_custkey"].tolist())

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < pc.scalar(np.datetime64(Q3_DATE, "us")),
    ).to_pandas()
    orders = orders[orders["o_custkey"].isin(custkeys)]
    odate = dict(zip(orders["o_orderkey"], orders["o_orderdate"]))

    import ray

    odate_ref = ray.put(odate)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > pc.scalar(np.datetime64(Q3_DATE, "us")),
    )

    class PartialRevenue:
        """Broadcast side fetched lazily from the object store on first
        batch (inside the task) — never materialized into the pickled
        closure, so the dict ships once per worker, not once per task."""

        def __init__(self, ref):
            self.ref = ref
            self.odate = None

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if self.odate is None:
                self.odate = ray.get(self.ref)
            b = b[b["l_orderkey"].isin(self.odate)]
            if not len(b):
                return pd.DataFrame({"l_orderkey": pd.array([], "int64"),
                                     "rev_c": pd.array([], "int64")})
            rev_c = np.rint(
                b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 10_000
            ).astype("int64")
            return (
                pd.DataFrame({"l_orderkey": b["l_orderkey"], "rev_c": rev_c})
                .groupby("l_orderkey", sort=False).agg(rev_c=("rev_c", "sum"))
                .reset_index()
            )

    from ..stages.shuffle import bucketed_group_map

    partials = li.map_batches(
        arrow_out(PartialRevenue(odate_ref)), batch_format="pandas"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("l_orderkey", sort=False).agg(rev_c=("rev_c", "sum")).reset_index()
        )

    agg = bucketed_group_map(partials, ["l_orderkey"], combine, num_buckets=32)
    top = agg.sort(["rev_c", "l_orderkey"], descending=[True, False]).limit(k)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        od = ray.get(odate_ref)
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "revenue": df["rev_c"] / 10_000.0,
                "o_orderdate": df["l_orderkey"].map(od),
            }
        )

    return top.map_batches(finalize, batch_format="pandas")


Q3_SQL = f"""
SELECT l_orderkey,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) DESC, l_orderkey
LIMIT 10
"""


# -- Q5-ish: region revenue (broadcast join chain through 4 dimensions) ------

def q5_region_revenue(sf_dir: str):
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    rkeys = set(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nation_by_key = dict(zip(nat["n_nationkey"], nat["n_name"]))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nation_by_key)]
    cust_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pc.scalar(np.datetime64(Q5_FROM, "us")))
            & (pc.field("o_orderdate") < pc.scalar(np.datetime64(Q5_TO, "us")))
        ),
    ).to_pandas()
    orders = orders[orders["o_custkey"].isin(cust_nation)]
    order_nation = {
        ok: cust_nation[ck] for ok, ck in zip(orders["o_orderkey"], orders["o_custkey"])
    }

    import ray

    on_ref = ray.put(order_nation)
    nk_ref = ray.put(nation_by_key)

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    class Partial:
        def __init__(self, on, nk):
            self.on_ref, self.nk_ref = on, nk
            self.order_nation = None
            self.nation_name = None

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if self.order_nation is None:
                self.order_nation = ray.get(self.on_ref)
                self.nation_name = ray.get(self.nk_ref)
            nk = b["l_orderkey"].map(self.order_nation)
            mask = nk.notna()
            if not mask.any():
                return pd.DataFrame({"n_name": pd.array([], "str"),
                                     "rev_c": pd.array([], "int64")})
            b = b[mask]
            names = nk[mask].astype("int64").map(self.nation_name)
            rev_c = np.rint(
                b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 10_000
            ).astype("int64")
            return (
                pd.DataFrame({"n_name": names.to_numpy(), "rev_c": rev_c})
                .groupby("n_name", sort=False).agg(rev_c=("rev_c", "sum"))
                .reset_index()
            )

    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(arrow_out(Partial(on_ref, nk_ref)), batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_name": df["n_name"], "revenue": df["rev_c"] / 10_000.0}
        )

    return agg.map_batches(finalize, batch_format="pandas").sort("n_name")


Q5_SQL = f"""
SELECT n_name,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
     JOIN customer ON c_nationkey = n_nationkey
     JOIN orders ON o_custkey = c_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
ORDER BY n_name
"""


# -- large-large partitioned hash join (J2) -----------------------------------

def orders_lineitem_join(sf_dir: str):
    """Revenue by order priority via a REAL two-sided shuffle join
    (stages/joins.py hash_join) — no broadcast side, exercising J2."""
    from ..stages.joins import hash_join
    from ..stages.shuffle import bucketed_group_map

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"l_orderkey": "o_orderkey"})
        b["rev_c"] = np.rint(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 10_000
        ).astype("int64")
        return b[["o_orderkey", "rev_c"]]

    li_keyed = li.map_batches(arrow_out(keyed), batch_format="pandas")
    joined = hash_join(orders, li_keyed, on=["o_orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby("o_orderpriority", sort=False)
            .agg(rev_c=("rev_c", "sum"), n_items=("rev_c", "size"))
            .reset_index()
        )

    partials = joined.map_batches(arrow_out(partial), batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("o_orderpriority", sort=False)
            .agg(rev_c=("rev_c", "sum"), n_items=("n_items", "sum"))
            .reset_index()
        )
        out["revenue"] = out["rev_c"] / 10_000.0
        return out[["o_orderpriority", "revenue", "n_items"]]

    return bucketed_group_map(partials, ["o_orderpriority"], combine, num_buckets=4)


ORDERS_LINEITEM_JOIN_SQL = """
SELECT o_orderpriority,
       SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""
