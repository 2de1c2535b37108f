"""Round-4 wave-5 operators: redirect resolution, range windows, corpus
truncation, bucketed joins."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_resolve_redirects_handbuilt_chains():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import resolve_redirects

    # chains: 5->4->3->0 (terminal), 9->8 (terminal), 7->0, lone 2->1
    edges = pd.DataFrame({"src": [5, 4, 3, 9, 7, 2],
                          "dst": [4, 3, 0, 8, 0, 1]})
    for blocks in (1, 3):
        got = (resolve_redirects(
            ray.data.from_pandas(edges).repartition(blocks),
            num_partitions=2)
            .to_pandas().sort_values("src").reset_index(drop=True))
        want = pd.DataFrame({
            "src": [2, 3, 4, 5, 7, 9],
            "final": [1, 0, 0, 0, 0, 8],
            "n_hops": [1, 1, 2, 3, 1, 1]})
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_resolve_redirects_long_chain_log_rounds():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import resolve_redirects

    # one chain of 300 hops: 300->299->...->0; doubling must resolve it
    # within ceil(log2(300)) + 1 = 10 rounds, well under max_rounds
    n = 300
    edges = pd.DataFrame({"src": np.arange(1, n + 1),
                          "dst": np.arange(0, n)})
    got = (resolve_redirects(ray.data.from_pandas(edges).repartition(4),
                             max_rounds=12, num_partitions=2)
           .to_pandas().sort_values("src").reset_index(drop=True))
    assert (got["final"] == 0).all()
    assert got["n_hops"].tolist() == list(range(1, n + 1))


@pytest.mark.usefixtures("ray_session")
def test_resolve_redirects_cycle_raises():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import resolve_redirects

    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    with pytest.raises(RuntimeError, match="cycle|unresolved"):
        resolve_redirects(ray.data.from_pandas(edges),
                          max_rounds=4, num_partitions=2).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_rolling_time_sum_peers_and_blocks():
    """RANGE frames include ALL peers of the current ts — even rows the
    (ts, event_id) sort places after the current row — and the frame is
    value-bounded, not row-bounded.  Brute-force reference per row."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windowfns import rolling_time_user_sum

    rng = np.random.default_rng(7)
    n = 400
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 5, n),
        # coarse second grid => many exact-duplicate timestamps (peers)
        "ts": pd.Timestamp("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n) * 10, unit="s"),
        "value": rng.uniform(0, 10, n).round(3),
    })
    win_s = 60
    vm = np.floor(ev.value.to_numpy() * 1000).astype(np.int64)
    t_us = ev.ts.astype("int64").to_numpy() // 1000   # ns -> µs
    want = []
    for i in range(n):
        in_frame = ((ev.user_id == ev.user_id[i])
                    & (t_us >= t_us[i] - win_s * 1_000_000)
                    & (t_us <= t_us[i]))
        want.append(vm[in_frame].sum())
    want = pd.DataFrame({"event_id": np.arange(n),
                         "user_id": ev.user_id,
                         "range_sum": np.array(want, dtype=np.int64)})
    for blocks in (1, 7):
        got = (rolling_time_user_sum(
            ray.data.from_pandas(ev).repartition(blocks), window_s=win_s)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_token_budget_head_prefix_and_superset():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import token_budget_head

    docs = pd.DataFrame({
        "doc_id": np.arange(40),
        "text": [" ".join(f"w{j}" for j in range(3 + i % 7))
                 for i in range(40)],
    })
    ds = ray.data.from_pandas(docs).repartition(5)
    small = token_budget_head(ds, budget_tokens=50).to_pandas()
    big = token_budget_head(ds, budget_tokens=120).to_pandas()
    # budget-monotone: the 50-token cut is a strict prefix of the 120-token
    # cut in the same seeded order
    assert set(small.doc_id) < set(big.doc_id)
    assert small.cum_tok.max() <= 50 and big.cum_tok.max() <= 120
    # inclusive cumulative sums are consistent with the kept token counts
    assert small.cum_tok.sort_values().diff().dropna().gt(0).all()
    assert token_budget_head(ds, budget_tokens=0).to_pandas().empty
    total = int(docs.text.str.split().str.len().sum())
    allkept = token_budget_head(ds, budget_tokens=10_000).to_pandas()
    assert len(allkept) == 40 and allkept.cum_tok.max() == total


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_roundtrip_and_one_sided_buckets():
    import shutil

    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_join, write_bucketed

    root = "/tmp/pdf2doi_test_bucketed"
    shutil.rmtree(root, ignore_errors=True)
    # keys chosen so some buckets hold rows from only one side
    left = pd.DataFrame({"k": np.arange(0, 60), "lv": np.arange(0, 60) * 2})
    right = pd.DataFrame({"rk": np.arange(30, 90),
                          "rv": np.arange(30, 90) * 3})
    write_bucketed(ray.data.from_pandas(left).repartition(3), "k",
                   f"{root}/l", n_buckets=8)
    write_bucketed(ray.data.from_pandas(right).repartition(3), "rk",
                   f"{root}/r", n_buckets=8)
    got = (bucketed_join(f"{root}/l", f"{root}/r", on="k", right_on="rk",
                         n_buckets=8, project=["k", "lv", "rv"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (left.merge(right, left_on="k", right_on="rk")
            [["k", "lv", "rv"]].sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_robots_disallow_handbuilt():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import filter_robots_disallow

    pages = pd.DataFrame({
        "url": ["https://a.org/private/x.html",   # blocked (a.org /private)
                "https://a.org/public/x.html",    # kept
                "https://b.org/private/x.html",   # kept (no rule for b)
                "https://a.org/priv/x.html",      # kept (prefix mismatch)
                "https://c.org/p/q.html",         # blocked (c.org /p)
                "https://c.org/q/p.html"],        # kept
        "lang": ["en"] * 6,
    })
    rules = {"a.org": ("/private",), "c.org": ("/p",)}
    got = (filter_robots_disallow(ray.data.from_pandas(pages), rules)
           .to_pandas().sort_values("url").reset_index(drop=True))
    want = pages.iloc[[1, 2, 3, 5]].copy()
    want["host"] = want.url.str.extract(r"https://([^/]+)/")[0]
    want = want.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_equi_depth_histogram_ties_one_bucket():
    """Identical values must land in one bucket (never ntile-split), and
    bucket populations must cover the input exactly."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import equi_depth_histogram_milli

    # 100 copies of 1.0 + 100 spread values: the tie block must stay whole
    vals = np.concatenate([np.full(100, 1.0),
                           np.linspace(2, 50, 100)])
    ds = ray.data.from_pandas(pd.DataFrame({"value": vals})).repartition(4)
    got = (equi_depth_histogram_milli(ds, "value", k=4)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert got.n_rows.sum() == 200
    # the 100-row tie block is entirely inside the first bucket
    assert got.loc[0, "n_rows"] >= 100
    assert got.loc[0, "v_min"] == 1000 and got.v_max.max() == 50000
    # buckets are value-disjoint and ordered
    assert (got.v_min <= got.v_max).all()
    assert (got.v_max.to_numpy()[:-1] < got.v_min.to_numpy()[1:]).all()
    with pytest.raises(ValueError):
        equi_depth_histogram_milli(ds, "value", k=3)


@pytest.mark.usefixtures("ray_session")
def test_group_token_budget_bruteforce():
    import hashlib

    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import group_token_budget

    rng = np.random.default_rng(11)
    n = 120
    docs = pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": rng.choice(["aa", "bb", "cc"], n),
        "text": [" ".join("t" for _ in range(1 + int(x)))
                 for x in rng.integers(0, 9, n)],
    })
    budgets = {"aa": 60, "bb": 5, "cc": 10_000}

    def key(d):
        return int.from_bytes(
            hashlib.md5(f"budget:{d}".encode()).digest()[:8], "big") >> 1

    ref = docs.assign(n_tok=docs.text.str.split().str.len(),
                      skey=docs.doc_id.map(key))
    ref = ref.sort_values(["lang", "skey", "doc_id"])
    ref["cum_tok"] = ref.groupby("lang").n_tok.cumsum()
    want = (ref[ref.cum_tok <= ref.lang.map(budgets)]
            [["doc_id", "lang", "n_tok", "cum_tok"]]
            .rename(columns={"lang": "grp"})
            .sort_values("doc_id").reset_index(drop=True))
    for blocks in (1, 6):
        got = (group_token_budget(
            ray.data.from_pandas(docs).repartition(blocks), budgets)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_salted_join_hot_cold_and_explicit_keys():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import salted_join

    # key 7 is hyper-hot (60 rows); the rest have 1-3
    lk = np.concatenate([np.full(60, 7), np.repeat(np.arange(8), 3)])
    left = pd.DataFrame({"k": lk, "lv": np.arange(len(lk))})
    right = pd.DataFrame({"rk": np.arange(10), "rv": np.arange(10) * 100})
    want = (left.merge(right, left_on="k", right_on="rk")
            [["k", "lv", "rv"]]
            .sort_values(["k", "lv"]).reset_index(drop=True))
    for hot in (None, [7], []):      # detected / explicit / forced-cold
        got = (salted_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            on="k", right_on="rk", hot_keys=hot, hot_threshold=50,
            n_salts=3, num_partitions=2, project=["k", "lv", "rv"])
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype("int64"),
                                      want.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_warc_roundtrip_binary_payloads():
    """Payloads containing the record separator and exact-µs timestamps
    must survive: the parser frames by Content-Length, never by scan."""
    import shutil

    import pandas as pd
    import ray.data

    from pdf2doi_ray.sources.warc import export_warc, read_warc

    out = "/tmp/pdf2doi_test_warc"
    shutil.rmtree(out, ignore_errors=True)
    payloads = [b"plain", b"embedded\r\n\r\nseparator", b"",
                bytes(range(256))]
    pages = pa.table({
        "url": [f"https://w{i}.org/p" for i in range(4)],
        "warc_ts": pa.array([1_700_000_000_000_001 + i for i in range(4)],
                            type=pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(payloads, type=pa.binary()),
    })
    n = export_warc(ray.data.from_arrow(pages).repartition(2),
                    out).sum("n_records")
    assert n == 4
    got = (read_warc(out).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert got.url.tolist() == [f"https://w{i}.org/p" for i in range(4)]
    assert [bytes(b) for b in got.html] == payloads
    us = got.warc_ts.astype("datetime64[us]").astype("int64")
    assert (us == pd.Series([1_700_000_000_000_001 + i
                             for i in range(4)])).all()


@pytest.mark.usefixtures("ray_session")
def test_detect_moved_pages_and_empty_case():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import detect_moved_pages

    old = pd.DataFrame({
        "url": ["u/a", "u/b", "u/c", "u/d"],
        "text": ["A", "B", "C", "D"],
    })
    # a moved (u/a -> u/a2), b deleted, c unchanged, d changed in place,
    # e brand-new content
    new = pd.DataFrame({
        "url": ["u/a2", "u/c", "u/d", "u/e"],
        "text": ["A", "C", "D2", "E"],
    })
    got = (detect_moved_pages(ray.data.from_pandas(old).repartition(2),
                              ray.data.from_pandas(new).repartition(2),
                              num_partitions=2)
           .to_pandas().sort_values("old_url").reset_index(drop=True))
    assert got.old_url.tolist() == ["u/a"]
    assert got.new_url.tolist() == ["u/a2"]
    # no moves at all: empty result, no empty-side join crash
    same = ray.data.from_pandas(old)
    assert detect_moved_pages(same, same,
                              num_partitions=2).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_zscore_outliers_exact_vs_numpy_and_empty():
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import zscore_outliers_milli

    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(100.0, 10.0, 400), 2)
    vals[5], vals[77] = 900.0, -600.0  # planted outliers
    df = pd.DataFrame({"event_id": np.arange(400), "value": vals})
    got = (zscore_outliers_milli(
        ray.data.from_pandas(df).repartition(4), "value", k_sigma=3)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    # exact integer mirror of the decision
    vm = np.floor(vals * 1000).astype(object)
    n, s = len(vm), int(sum(vm))
    q = int(sum(v * v for v in vm))
    keep = [i for i in range(n)
            if (n * int(vm[i]) - s) ** 2 > 9 * (n * q - s * s)]
    assert got.event_id.tolist() == keep
    assert {5, 77} <= set(keep)
    # empty input: empty result with the carry schema, no crash
    empty = ray.data.from_pandas(df.iloc[:0])
    assert zscore_outliers_milli(empty, "value").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_bucketed_lookup_prunes_and_matches(tmp_path):
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_lookup, write_bucketed

    df = pd.DataFrame({"k": range(1000), "v": [i * 3 for i in range(1000)]})
    root = str(tmp_path / "layout")
    write_bucketed(ray.data.from_pandas(df).repartition(4), "k", root,
                   n_buckets=32)
    got = (bucketed_lookup(root, "k", [7, 500, 999], n_buckets=32)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == [7, 500, 999]
    assert got.v.tolist() == [21, 1500, 2997]
    # a key absent from the table returns nothing (bucket read, 0 hits)
    assert bucketed_lookup(root, "k", [100_000], n_buckets=32).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_orc_roundtrip_lossless(tmp_path):
    import pandas as pd
    import ray.data

    from pdf2doi_ray.sources.formats import export_orc, read_orc_dir

    df = pd.DataFrame({"a": range(50), "b": [f"s{i}," for i in range(50)]})
    out = str(tmp_path / "orc")
    bk = export_orc(ray.data.from_pandas(df).repartition(4),
                    out).materialize()
    assert bk.sum("n_rows") == 50
    got = (read_orc_dir(out).to_pandas()
           .sort_values("a").reset_index(drop=True))
    assert got.astype(df.dtypes.to_dict()).equals(df)


@pytest.mark.usefixtures("ray_session")
def test_histogram_drift_exact_counts():
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import histogram_drift_milli

    # side A uniform on [0, 10); side B shifted to [5, 15)
    a = pd.DataFrame({"value": np.arange(0.0, 10.0, 0.5)})    # 20 rows
    b = pd.DataFrame({"value": np.arange(5.0, 15.0, 0.25)})   # 40 rows
    got = histogram_drift_milli(
        ray.data.from_pandas(a).repartition(3),
        ray.data.from_pandas(b).repartition(3), "value", n_buckets=4)
    # shared range [0, 14750] milli, span 14751: bucket = vm*4 // 14751
    vm_a = np.floor(a.value.values * 1000).astype(np.int64)
    vm_b = np.floor(b.value.values * 1000).astype(np.int64)
    exp = {}
    for vm, side in ((vm_a, 0), (vm_b, 1)):
        for x in vm:
            k = int(x * 4 // 14751)
            exp.setdefault(k, [0, 0])[side] += 1
    assert got.bucket.tolist() == sorted(exp)
    for _, r in got.iterrows():
        ca, cb = exp[r.bucket]
        assert (r.cnt_a, r.cnt_b) == (ca, cb)
        assert r.drift_num == abs(ca * 40 - cb * 20)


@pytest.mark.usefixtures("ray_session")
def test_pareto_frontier_vs_bruteforce():
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import pareto_frontier

    rng = np.random.default_rng(11)
    p = rng.integers(0, 40, 300).astype(np.int64)
    d = rng.integers(0, 40, 300).astype(np.int64)
    # force exact-duplicate frontier candidates and a tie on each axis
    p[0] = p[1] = 39; d[0] = d[1] = 0
    df = pd.DataFrame({"rid": np.arange(300), "price_milli": p,
                       "date_us": d})
    got = (pareto_frontier(ray.data.from_pandas(df).repartition(7),
                           "price_milli", "date_us")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    keep = [i for i in range(300)
            if not any((p[j] >= p[i]) and (d[j] <= d[i])
                       and (p[j] > p[i] or d[j] < d[i])
                       for j in range(300))]
    assert got.rid.tolist() == keep
    assert {0, 1} <= set(keep)          # duplicates survive together
    # pure anti-chain: everything survives
    ac = pd.DataFrame({"rid": np.arange(20),
                       "price_milli": np.arange(20, dtype=np.int64),
                       "date_us": np.arange(20, dtype=np.int64)})
    assert pareto_frontier(ray.data.from_pandas(ac).repartition(4),
                           "price_milli", "date_us").count() == 20


@pytest.mark.usefixtures("ray_session")
def test_gini_skew_exact_on_skewed_keys():
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import gini_skew

    # keys with counts 1, 2, 4, ..., 64 (heavy skew)
    counts = [1, 2, 4, 8, 16, 32, 64]
    keys = sum(([f"h{i}"] * c for i, c in enumerate(counts)), [])
    df = pd.DataFrame({"k": keys})
    got = gini_skew(ray.data.from_pandas(df).repartition(5), "k")
    x = np.sort(np.array(counts))
    m, tot = len(x), x.sum()
    num = sum((2 * (i + 1) - m - 1) * int(x[i]) for i in range(m))
    assert got.iloc[0].tolist() == [m, tot, num, m * tot]
    # even distribution → gini_num == 0
    ev = pd.DataFrame({"k": ["a", "b", "c", "d"] * 10})
    assert gini_skew(ray.data.from_pandas(ev).repartition(3),
                     "k").gini_num.iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_bucketed_upsert_rewrites_only_dirty_buckets(tmp_path):
    import glob
    import os

    import pandas as pd
    import pytest as _pt
    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_upsert, write_bucketed

    base = pd.DataFrame({"k": range(200), "v": [i * 2 for i in range(200)]})
    base_dir, out_dir = str(tmp_path / "base"), str(tmp_path / "out")
    write_bucketed(ray.data.from_pandas(base).repartition(4), "k",
                   base_dir, n_buckets=8)
    # delta: update k=7, insert k=500
    delta = pd.DataFrame({"k": [7, 500], "v": [999, 1000]})
    bk = bucketed_upsert(base_dir, ray.data.from_pandas(delta), "k", 8,
                         out_dir).to_pandas()
    assert bk.rewritten.sum() <= 2          # ≤ #delta keys buckets dirty
    # untouched buckets copied byte-identically
    for b in bk[~bk.rewritten].bucket:
        for f in glob.glob(os.path.join(base_dir, f"bucket={b}", "*")):
            g = os.path.join(out_dir, f"bucket={b}", os.path.basename(f))
            assert open(f, "rb").read() == open(g, "rb").read()
    got = (ray.data.read_parquet(out_dir).select_columns(["k", "v"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = pd.concat([base[base.k != 7],
                     delta]).sort_values("k").reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))
    # duplicate keys in the delta must raise
    dup = pd.DataFrame({"k": [1, 1], "v": [5, 6]})
    with _pt.raises(Exception, match="duplicate keys"):
        bucketed_upsert(base_dir, ray.data.from_pandas(dup), "k", 8,
                        str(tmp_path / "out2")).materialize()


@pytest.mark.usefixtures("ray_session")
def test_jaccard_threshold_pairs_exact_recall():
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.dedup import jaccard_threshold_pairs

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    texts = list(base)
    texts.append(base[0])                      # exact dup of doc 0 → J=1
    toks = base[1].split()
    toks[5] = "CHANGED"                        # near dup of doc 1
    texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    got = (jaccard_threshold_pairs(
        ray.data.from_pandas(df).repartition(6), tau_permille=500)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    # brute-force oracle over shingle sets
    def sset(s):
        w = s.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    sets = [sset(s) for s in texts]
    exp = []
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and i * 1000 >= 500 * u:
                exp.append((a, b, i, u))
    assert list(map(tuple, got.values.tolist())) == exp
    assert (0, 40, 28, 28) in exp              # the exact dup pair
    # corpus with no similar pairs → empty result, no crash
    solo = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["a b c d e f", "q r s t u v"]})
    assert jaccard_threshold_pairs(
        ray.data.from_pandas(solo).repartition(2)).count() == 0
