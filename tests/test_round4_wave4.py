"""Round-4 wave-4 operators: lexical diversity (TTR), anchor-text index,
and the Q3-style shipping-priority 3-table join."""

import datetime

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_lexical_diversity_handcomputed():
    import ray.data

    from pdf2doi_ray.stages.corpus import lexical_diversity

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "a b a b a",          # 5 tokens, 2 types -> 400
            "x  y",               # double space: 2 tokens, 2 types -> 1000
            "",                   # no tokens -> 0/0/0
            "w w w w",            # 4 tokens, 1 type -> 250
        ]),
    })
    out = (lexical_diversity(ray.data.from_arrow(t).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_tokens"]) == [5, 2, 0, 4]
    assert list(out["n_types"]) == [2, 2, 0, 1]
    assert list(out["ttr_permille"]) == [400, 1000, 0, 250]


@pytest.mark.usefixtures("ray_session")
def test_anchor_text_index_bruteforce():
    """Counts and per-host top-k agree with a Python brute force; the
    result is invariant to block count (combiner + groupby + stitch)."""
    import collections

    import ray.data

    from pdf2doi_ray.stages.corpus import anchor_text_index

    rows = []
    truth = collections.Counter()
    for i in range(60):
        h1 = f"h{i % 3}.example.org"
        a1 = f"guide part{i % 2}"
        h2 = "hub.example.org"
        a2 = f"hub page{i % 5}"
        rows.append(
            f'pad <a href="https://{h1}/p/{i}">{a1}</a> mid '
            f'<a href="https://{h2}/{i}">{a2}</a>')
        for t in a1.split():
            truth[(h1, t)] += 1
        for t in a2.split():
            truth[(h2, t)] += 1
    tbl = pa.table({"doc_id": pa.array(range(60), type=pa.int64()),
                    "text": pa.array(rows)})

    def run(n_blocks):
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        return (anchor_text_index(ds, k=2).to_pandas()
                .sort_values(["dst_host", "rank"]).reset_index(drop=True))

    a, b = run(1), run(5)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    # brute-force top-2 per host: count desc, term asc
    for host in {h for h, _ in truth}:
        want = sorted(((t, c) for (h, t), c in truth.items() if h == host),
                      key=lambda tc: (-tc[1], tc[0]))[:2]
        got = a[a["dst_host"] == host]
        assert list(got["term"]) == [t for t, _ in want]
        assert list(got["n_mentions"]) == [c for _, c in want]
        assert list(got["rank"]) == list(range(1, len(want) + 1))


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_bruteforce():
    """Synthetic 3-table fixture vs a pandas brute force; exactly-k and
    deterministic ordering under ties."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import shipping_priority

    n_cust, n_ord, n_li = 20, 50, 200
    cust = pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_mktsegment": pa.array(
            ["BUILDING" if i % 2 == 0 else "MACHINERY"
             for i in range(n_cust)]),
    })
    base = datetime.datetime(1998, 1, 1)
    cutoff = datetime.datetime(1998, 6, 15)
    orders = pa.table({
        "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
        "o_custkey": pa.array([i % n_cust for i in range(n_ord)],
                              type=pa.int64()),
        "o_orderdate": pa.array(
            [base + datetime.timedelta(days=7 * i) for i in range(n_ord)],
            type=pa.timestamp("us")),
        "o_orderpriority": pa.array([f"{i % 3}-P" for i in range(n_ord)]),
    })
    li = pa.table({
        "l_orderkey": pa.array([i % n_ord for i in range(n_li)],
                               type=pa.int64()),
        "l_extendedprice": pa.array(
            [100.0 + 3.7 * i for i in range(n_li)], type=pa.float64()),
        "l_discount": pa.array(
            [(i % 10) / 100.0 for i in range(n_li)], type=pa.float64()),
        "l_shipdate": pa.array(
            [base + datetime.timedelta(days=4 * i) for i in range(n_li)],
            type=pa.timestamp("us")),
    })

    out = shipping_priority(
        ray.data.from_arrow(cust).repartition(2),
        ray.data.from_arrow(orders).repartition(3),
        ray.data.from_arrow(li).repartition(4),
        segment="BUILDING", cutoff_us=cutoff, k=5)

    # pandas brute force with the same milli-integer revenue
    c = cust.to_pandas()
    o = orders.to_pandas()
    l = li.to_pandas()
    keep_c = set(c[c["c_mktsegment"] == "BUILDING"]["c_custkey"])
    o = o[(o["o_orderdate"] < cutoff) & o["o_custkey"].isin(keep_c)]
    l = l[l["l_shipdate"] > cutoff].copy()
    l["rev"] = np.floor(
        (l["l_extendedprice"].to_numpy()
         * (1.0 - l["l_discount"].to_numpy())) * 1000.0).astype(np.int64)
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = (j.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"],
                   as_index=False)["rev"].sum()
         .sort_values(["rev", "o_orderkey"], ascending=[False, True])
         .head(5).reset_index(drop=True))
    assert len(out) == min(5, len(g))
    assert list(out["o_orderkey"]) == list(g["o_orderkey"])
    assert list(out["revenue_milli"]) == list(g["rev"])
    assert list(out["rank"]) == list(range(1, len(g) + 1))
    days = (g["o_orderdate"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000).to_numpy()
    assert list(out["o_date_days"]) == list(days)
    assert list(out["o_orderpriority"]) == list(g["o_orderpriority"])


def test_levenshtein_dp_fuzz():
    """numpy row-DP vs a plain O(nm) reference on random short strings."""
    import random

    from pdf2doi_ray.stages.dedup import _levenshtein

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(42)
    alpha = "abc "
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        assert _levenshtein(a, b) == ref(a, b), (a, b)


@pytest.mark.usefixtures("ray_session")
def test_edit_distance_adjacent_blockcount_invariant():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.dedup import _levenshtein, edit_distance_adjacent

    texts = ["the quick brown fox", "the quick brown fix",
             "a completely different text", "a completely different text!",
             "short", "shirt"]
    t = pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                  "text": pa.array(texts)})

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (edit_distance_adjacent(ds).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    a, b = run(1), run(3)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["edit_next"]) == [
        _levenshtein(texts[i], texts[i + 1]) for i in range(5)]


@pytest.mark.usefixtures("ray_session")
def test_local_supplier_revenue_empty_window():
    """An empty date window must flow through all four joins and the
    groupby to a typed empty frame (column names + dtypes stable)."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import local_supplier_revenue

    sf = "/root/testdata/sf0.001"
    region = ray.data.read_parquet(f"{sf}/region.parquet")
    nation = ray.data.read_parquet(f"{sf}/nation.parquet")
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = ray.data.read_parquet(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    out = local_supplier_revenue(
        region, nation, cust, supp, orders, li, region_name="ASIA",
        start_us=datetime.datetime(1990, 1, 1),
        end_us=datetime.datetime(1990, 1, 1))
    assert list(out.columns) == ["n_name", "revenue_milli"]
    assert len(out) == 0
    assert out["revenue_milli"].dtype == "int64"


@pytest.mark.usefixtures("ray_session")
def test_seeded_shuffle_permutation_and_block_invariance():
    """Positions form a dense permutation, are identical across input
    block counts, and a different seed yields a different order."""
    import hashlib

    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.export import seeded_shuffle

    ids = list(range(0, 40, 3))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    def run(n_blocks, seed="s42"):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (seeded_shuffle(ds, seed=seed).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    a, b = run(1), run(5)
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["position"]) == list(range(len(ids)))

    def key(seed, d):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{d}".encode()).digest()[:8], "big") >> 1

    want = {d: r for r, d in enumerate(
        sorted(ids, key=lambda d: (key("s42", d), d)))}
    assert {d: p for d, p in zip(a["doc_id"], a["position"])} == want
    c = run(3, seed="s43")
    assert list(c["position"]) != list(a["position"])


@pytest.mark.usefixtures("ray_session")
def test_revenue_by_part_type_bruteforce():
    """Ray op vs a pandas brute force on a synthetic lineitem/part pair,
    block-count invariant."""
    import datetime

    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import revenue_by_part_type

    rng = np.random.default_rng(7)
    n = 400
    li = pd.DataFrame({
        "l_partkey": rng.integers(0, 30, n),
        "l_extendedprice": rng.uniform(10, 5000, n).round(2),
        "l_discount": rng.choice([0.0, 0.05, 0.1], n),
        "l_shipdate": pd.to_datetime("1996-03-01")
        + pd.to_timedelta(rng.integers(-20, 50, n), unit="D"),
    })
    part = pd.DataFrame({
        "p_partkey": np.arange(30),
        "p_type": [f"T{i % 4}" for i in range(30)],
    })
    start, end = datetime.datetime(1996, 3, 1), datetime.datetime(1996, 4, 1)

    sub = li[(li.l_shipdate >= start) & (li.l_shipdate < end)].merge(
        part, left_on="l_partkey", right_on="p_partkey")
    sub["rev"] = np.floor(
        (sub.l_extendedprice.to_numpy()
         * (1.0 - sub.l_discount.to_numpy())) * 1000.0).astype(np.int64)
    want = (sub.groupby("p_type")
            .agg(revenue_milli=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
            .sort_values(["revenue_milli", "p_type"],
                         ascending=[False, True]).reset_index(drop=True))

    for blocks in (1, 4):
        got = revenue_by_part_type(
            ray.data.from_pandas(part),
            ray.data.from_pandas(li).repartition(blocks),
            start_us=start, end_us=end)
        pd.testing.assert_frame_equal(
            got.astype({"revenue_milli": "int64", "n_items": "int64"}),
            want.astype({"revenue_milli": "int64", "n_items": "int64"}))
