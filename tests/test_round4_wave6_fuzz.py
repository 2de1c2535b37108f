"""Randomized differential tests for the wave-6 operators: parameters
drawn from a seeded RNG, Ray pipelines compared against DuckDB (or a
straight-Python reference) on sf0.001 — coverage beyond the
fixed-constant driver oracles."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con(tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
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
def test_waiting_suppliers_random_flags_statuses():
    import ray.data

    from pdf2doi_ray.stages.joins import waiting_suppliers

    rng = np.random.RandomState(11)
    con = _con(("orders", "lineitem", "supplier"))
    for _ in range(3):
        flag = str(rng.choice(["R", "A", "N"]))
        status = str(rng.choice(["F", "O", "P"]))
        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus"])
        supplier = ray.data.read_parquet(
            f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"])
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"])
        got = waiting_suppliers(orders, supplier, li, flag=flag,
                                status=status, num_partitions=2,
                                num_shards=4)
        want = con.execute(f"""
WITH ls AS (SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_returnflag = '{flag}' THEN 1 ELSE 0
                       END) AS late
            FROM lineitem GROUP BY 1, 2),
per_o AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
                 sum(l_suppkey * late) AS late_supp
          FROM ls GROUP BY 1),
w AS (SELECT p.late_supp AS s_suppkey, count(*) AS numwait
      FROM per_o p JOIN orders o ON o.o_orderkey = p.l_orderkey
      WHERE o.o_orderstatus = '{status}'
        AND p.n_supp >= 2 AND p.n_late = 1
      GROUP BY 1)
SELECT s.s_name, CAST(w.numwait AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey""").df()
        _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_proximity_random_terms_windows():
    import ray.data

    from pdf2doi_ray.stages.retrieval import proximity_cooccurrence

    rng = np.random.RandomState(13)
    vocab = ["the", "sort", "merge", "join", "key", "window", "scan"]
    con = _con()
    for _ in range(3):
        a, b = rng.choice(vocab, 2, replace=False)
        w = int(rng.randint(1, 7))
        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["doc_id", "text"])
        got = proximity_cooccurrence(docs, str(a), str(b),
                                     window=w).to_pandas()
        want = con.execute(f"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     unnest(generate_series(1,
                         len(string_split(text, ' ')))) AS ord
              FROM documents),
nz AS (SELECT doc_id, tok,
              row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS p
       FROM toks WHERE tok <> ''),
d AS (SELECT x.doc_id, min(abs(x.p - y.p)) AS md
      FROM (SELECT doc_id, p FROM nz WHERE tok = '{a}') x
      JOIN (SELECT doc_id, p FROM nz WHERE tok = '{b}') y
        USING (doc_id)
      GROUP BY 1)
SELECT doc_id, CAST(md AS BIGINT) AS min_dist FROM d
WHERE md <= {w}""").df()
        _same(got, want)


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunk_stats_random_mods_vs_python():
    """Straight-Python chunker reference (per-doc loop) vs the
    vectorized zero-copy operator, random k/mod, both ship modes."""
    import ray.data

    from pdf2doi_ray.stages.dedup import cdc_chunk_stats

    rng = np.random.RandomState(17)
    texts = pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"]).head(120)
    for _ in range(2):
        k = int(rng.randint(3, 8))
        mod = int(rng.choice([4, 8, 16, 32]))

        def py_chunks(s: str):
            cuts = set()
            for i in range(len(s) - k + 1):
                hv = 0
                for ch in s[i:i + k]:
                    hv = hv * 257 + ord(ch)
                if hv % mod == 0:
                    cuts.add(i + k)
            bounds = sorted(set([0, len(s)]) | cuts)
            return [s[a:b] for a, b in zip(bounds, bounds[1:])]

        all_chunks = []
        for s in texts["text"]:
            all_chunks.extend(py_chunks(s))
        uniq = set(all_chunks)
        want = {
            "n_chunks": len(all_chunks),
            "n_unique_chunks": len(uniq),
            "total_bytes": sum(len(c) for c in all_chunks),
            "unique_bytes": sum(len(c) for c in uniq),
        }
        want["dedup_ratio_permille"] = (
            want["unique_bytes"] * 1000 // want["total_bytes"])

        ds = ray.data.from_pandas(texts).repartition(3)
        for ship in ("bytes", "hash64"):
            got = cdc_chunk_stats(ds, k=k, mod=mod, ship=ship)
            for col, val in want.items():
                assert int(got[col][0]) == val, (ship, k, mod, col)


@pytest.mark.usefixtures("ray_session")
def test_crawl_budget_random_budgets():
    """Budget conservation and per-host value vs a straight-Python
    Hamilton apportionment at random budgets."""
    import ray.data

    from pdf2doi_ray.stages.skew import crawl_budget_apportion

    rng = np.random.RandomState(19)
    hosts = [f"h{i}.org" for i in range(9)]
    counts = rng.randint(1, 40, size=len(hosts))
    urls = [f"https://{h}/p{j}" for h, c in zip(hosts, counts)
            for j in range(c)]
    pages = pd.DataFrame({"url": urls})
    n_total = int(counts.sum())
    for _ in range(3):
        b = int(rng.randint(0, 200))
        got = (crawl_budget_apportion(ray.data.from_pandas(pages),
                                      total_budget=b)
               .to_pandas().sort_values("host").reset_index(drop=True))
        floors = [b * int(c) // n_total for c in counts]
        rems = [(b * int(c)) % n_total for c in counts]
        r = b - sum(floors)
        order = sorted(range(len(hosts)),
                       key=lambda i: (-rems[i], hosts[i]))
        bonus = set(order[:r])
        want = pd.DataFrame({
            "host": hosts,
            "n_pages": counts.astype(np.int64),
            "budget": np.array(
                [floors[i] + (1 if i in bonus else 0)
                 for i in range(len(hosts))], dtype=np.int64),
        }).sort_values("host").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert got["budget"].sum() == b


@pytest.mark.usefixtures("ray_session")
def test_exact_kth_value_random_doubles():
    """Radix-select vs np.sort over adversarial doubles: subnormals,
    ±inf, huge magnitudes, negative zero, heavy duplicates."""
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_kth_value

    rng = np.random.RandomState(23)
    pool = np.array([0.0, -0.0, np.inf, -np.inf, 1e308, -1e308,
                     5e-324, -5e-324, 1.5, -1.5, 3.0, 3.0, 3.0],
                    dtype=np.float64)
    for trial in range(3):
        vals = np.concatenate([
            rng.choice(pool, 20),
            rng.standard_normal(30) * 10 ** rng.randint(-8, 8)])
        want = np.sort(vals)
        ds = ray.data.from_pandas(
            pd.DataFrame({"value": vals})).repartition(3)
        for r in rng.choice(np.arange(1, len(vals) + 1), 4,
                            replace=False):
            got = float(exact_kth_value(ds, "value", int(r))["value"][0])
            w = float(want[r - 1])
            assert got == w or (np.isnan(got) and np.isnan(w)), \
                (trial, r, got, w)


@pytest.mark.usefixtures("ray_session")
def test_exact_weighted_kth_random_vs_python():
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_weighted_kth

    rng = np.random.RandomState(29)
    for _ in range(3):
        n = int(rng.randint(5, 40))
        vals = rng.standard_normal(n) * 100
        w = rng.randint(1, 9, size=n).astype(np.int64)
        order = np.argsort(vals, kind="stable")
        sv, sw = vals[order], w[order]
        cum = np.cumsum(sw)
        ds = ray.data.from_pandas(
            pd.DataFrame({"value": vals, "weight": w})).repartition(2)
        for kw in rng.choice(np.arange(1, int(cum[-1]) + 1),
                             size=3, replace=False):
            want = float(sv[int(np.searchsorted(cum, kw))])
            got = float(exact_weighted_kth(ds, "value", "weight",
                                           int(kw))["value"][0])
            assert got == want, (kw, got, want)
