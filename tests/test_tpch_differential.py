"""Randomized differential tests for the TPC-H-shape relational operators:
each case draws windows/brands/thresholds from a seeded RNG and compares
the Ray pipeline against DuckDB on sf0.001 — parameter coverage beyond the
fixed-constant driver oracles in __ray_entry__.oracle_sql()."""

import datetime

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("customer", "supplier", "nation", "orders", "lineitem",
              "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _same(got: pd.DataFrame, want: pd.DataFrame):
    got = _norm(got)
    want = _norm(want.astype({c: got[c].dtype for c in got.columns}))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert got.equals(want), (got.head(), want.head())


@pytest.mark.usefixtures("ray_session")
def test_order_priority_semi_random_windows():
    import ray.data

    from pdf2doi_ray.stages.joins import order_priority_semi

    rng = np.random.RandomState(7)
    con = _con()
    for _ in range(3):
        y = int(rng.randint(1995, 2001))
        m = int(rng.randint(1, 10))
        start = datetime.datetime(y, m, 1)
        end = datetime.datetime(y, m + 3, 1)
        flag = str(rng.choice(["R", "A", "N"]))
        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag"])
        got = order_priority_semi(orders, li, start_us=start, end_us=end,
                                  flag=flag, num_partitions=2)
        want = con.execute(f"""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{start}'
              AND o_orderdate < TIMESTAMP '{end}'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = '{flag}')
            GROUP BY 1""").df()
        _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_forecast_revenue_random_params():
    import ray.data

    from pdf2doi_ray.stages.aggs import forecast_revenue

    rng = np.random.RandomState(11)
    con = _con()
    for _ in range(3):
        y = int(rng.randint(1995, 2001))
        lo = float(rng.choice([0.02, 0.04, 0.06]))
        hi = lo + 0.02
        q = float(rng.randint(10, 45))
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice", "l_discount",
                     "l_shipdate"])
        got = forecast_revenue(
            li, start_us=datetime.datetime(y, 1, 1),
            end_us=datetime.datetime(y + 1, 1, 1),
            disc_lo=lo, disc_hi=hi, max_qty=q)
        want = con.execute(f"""
            SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice
                   * l_discount * 1000.0) AS BIGINT)), 0) AS BIGINT)
                   AS revenue_milli,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{y}-01-01'
              AND l_shipdate < TIMESTAMP '{y + 1}-01-01'
              AND l_discount BETWEEN {lo} AND {hi}
              AND l_quantity < {q}""").df()
        _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_small_quantity_revenue_random_brands():
    import ray.data

    from pdf2doi_ray.stages.joins import small_quantity_revenue

    rng = np.random.RandomState(13)
    con = _con()
    brands = [r[0] for r in con.execute(
        "SELECT DISTINCT p_brand FROM part ORDER BY 1").fetchall()]
    for brand in rng.choice(brands, size=3, replace=False):
        part = ray.data.read_parquet(
            f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])
        got = small_quantity_revenue(part, li, brand=str(brand))
        want = con.execute(f"""
            WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice
                        FROM lineitem
                        WHERE l_partkey IN (SELECT p_partkey FROM part
                                            WHERE p_brand = '{brand}')),
            st AS (SELECT l_partkey AS k,
                          CAST(sum(l_quantity) AS BIGINT) AS s,
                          CAST(count(*) AS BIGINT) AS c
                   FROM bl GROUP BY 1)
            SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * 1000.0)
                        AS BIGINT)), 0) AS BIGINT) AS total_price_milli,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM bl JOIN st ON l_partkey = k
            WHERE CAST(l_quantity AS BIGINT) * 5 * c < s""").df()
        _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_top_supplier_revenue_random_windows_and_empty():
    import ray.data

    from pdf2doi_ray.stages.joins import top_supplier_revenue

    rng = np.random.RandomState(17)
    con = _con()
    windows = [(int(rng.randint(1995, 2001)), int(rng.randint(1, 10)))
               for _ in range(2)] + [(2050, 1)]        # empty window too
    for y, m in windows:
        start = datetime.datetime(y, m, 1)
        end = datetime.datetime(y, m + 3, 1)
        supp = ray.data.read_parquet(
            f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"])
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])
        got = top_supplier_revenue(supp, li, start_us=start, end_us=end)
        want = con.execute(f"""
            WITH rev AS (SELECT l_suppkey,
                         CAST(sum(CAST(floor(l_extendedprice
                              * (1.0 - l_discount) * 1000.0) AS BIGINT))
                              AS BIGINT) AS revenue_milli
                         FROM lineitem
                         WHERE l_shipdate >= TIMESTAMP '{start}'
                           AND l_shipdate < TIMESTAMP '{end}'
                         GROUP BY 1)
            SELECT s_suppkey, s_name, revenue_milli
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE revenue_milli = (SELECT max(revenue_milli) FROM rev)
            """).df()
        if len(want) == 0:
            assert len(got) == 0
        else:
            _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_empty_window_returns_empty_not_crash():
    """Windows outside the data range fully empty one join side; the
    sentinel guards must yield empty results, not the Ray empty-side
    hash-join crash."""
    import ray.data

    from pdf2doi_ray.stages.joins import (idle_rich_customers,
                                          order_priority_semi,
                                          returned_item_customers,
                                          returnflag_priority_counts,
                                          shipping_priority)

    far = datetime.datetime(2010, 1, 1)
    farther = datetime.datetime(2010, 4, 1)
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    li_flag = ray.data.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
    assert len(order_priority_semi(
        orders, li_flag, start_us=far, end_us=farther,
        num_partitions=2)) == 0
    # flag absent from the data empties the probe side instead
    assert len(order_priority_semi(
        orders, li_flag, start_us=datetime.datetime(1996, 1, 1),
        end_us=datetime.datetime(1997, 1, 1), flag="Z",
        num_partitions=2)) == 0

    li_ship = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate",
                 "l_extendedprice", "l_discount"])
    assert len(returnflag_priority_counts(
        orders, li_ship, start_us=far, end_us=farther,
        num_partitions=2)) == 0

    cust = ray.data.read_parquet(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"])
    nation = ray.data.read_parquet(f"{SF}/nation.parquet")
    assert len(returned_item_customers(
        cust, nation, orders, li_ship, start_us=far, end_us=farther,
        num_partitions=2)) == 0

    assert len(shipping_priority(
        cust, orders, li_ship, segment="BUILDING",
        cutoff_us=datetime.datetime(1901, 1, 1), num_partitions=2)) == 0

    # no orders since 2002 -> every rich customer is idle; compare to SQL
    got = idle_rich_customers(
        cust, orders, since_us=datetime.datetime(2002, 1, 1),
        num_partitions=2)
    want = _con().execute("""
        WITH c AS (SELECT c_custkey,
                          CAST(c_nationkey AS BIGINT) AS c_nationkey,
                          CAST(floor(c_acctbal * 100.0) AS BIGINT) AS b
                   FROM customer),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(b) AS BIGINT) AS s FROM c WHERE b > 0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(b) AS BIGINT) AS total_acctbal_c
        FROM c, st WHERE c.b * st.n > st.s
        GROUP BY c_nationkey""").df()
    _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_json_field_stats_all_absent_group_nulls_min_max():
    import ray.data

    from pdf2doi_ray.stages.aggs import json_field_stats

    ev = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a", "b"],
        "props": ['{"k": 4}', '{"k": 6}', '{"z": 1}'],
    })).repartition(2)
    out = json_field_stats(ev).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out.loc[1, "n_present"] == 0
    assert pd.isna(out.loc[1, "min_field"])
    assert pd.isna(out.loc[1, "max_field"])
    assert out.loc[0, "min_field"] == 4 and out.loc[0, "max_field"] == 6
