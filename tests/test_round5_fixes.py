"""Round-5 regression tests for the ADVICE-r4 fixes.

- recency_weighted_value: corpora spanning >= 63 days must not rely on
  shift-beyond-width behavior (engine) or overflow BIGINT (oracle).
- byte_inventory_by_lang: oracle now counts UTF-8 BYTES (derived from
  codepoints), so non-ASCII corpora stay byte-exact.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_recency_weighted_value_clamps_old_events(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.aggs import recency_weighted_value

    base = pd.Timestamp("2025-01-01")
    rows = []
    # ages 0, 1, 62, 63, 100, 200 days back from the max day
    for uid, age in [(1, 0), (1, 1), (2, 62), (2, 63), (3, 100), (3, 200)]:
        rows.append({"event_id": len(rows), "user_id": uid,
                     "event_type": "view", "value": 8.0,
                     "ts": base + pd.Timedelta(days=200 - age)})
    ev = pd.DataFrame(rows)
    got = recency_weighted_value(
        ray.data.from_pandas(ev).repartition(3)).to_pandas() \
        .set_index("user_id")["recency_score_milli"].to_dict()
    # 8000 milli: age0 → 8000, age1 → 4000, age62 → 8000 >> 62 == 0,
    # age>=63 → exactly 0 (clamped, not undefined)
    assert got == {1: 12000, 2: 0, 3: 0}

    # oracle side: the capped CASE must not overflow BIGINT
    p = tmp_path / "events.parquet"
    ev.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as entrymod
    want = con.execute(entrymod.oracle_sql()["recency_weighted_value"]) \
        .df().set_index("user_id")["recency_score_milli"].to_dict()
    assert want == got


@pytest.mark.usefixtures("ray_session")
def test_byte_inventory_by_lang_non_ascii_oracle_parity(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.textstats import byte_inventory_by_lang

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["héllo wörld", "中文测试 numbers 123",
                 "naïve — em dash \U0001F389", "plain ascii"],
        "lang": ["de", "zh", "fr", "en"],
        "source": ["s"] * 4,
    })
    got = byte_inventory_by_lang(
        ray.data.from_pandas(docs).repartition(2)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)

    p = tmp_path / "documents.parquet"
    docs.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as entrymod
    want = con.execute(entrymod.oracle_sql()["byte_inventory_by_lang"]) \
        .df().sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    # sanity vs python truth for one lang
    zh = docs.loc[1, "text"].encode()
    row = got.set_index("lang").loc["zh"]
    assert row["n_bytes"] == len(zh)
    assert row["n_distinct_bytes"] == len(set(zh))


@pytest.mark.usefixtures("ray_session")
def test_jaccard_hot_prefix_demotion_bounds_groups():
    """VERDICT r4 #2: a stop-gram present in every doc must not form one
    giant O(p^2) prefix group.  Adversarial fixture: 300 docs all share
    the same 8-token boilerplate opener (many hot shingles); each doc
    also has unique content.  With df demotion the hot hashes never
    enter prefixes, so every prefix group stays < hot_df rows — and the
    result is still exact vs a brute-force golden."""
    import ray.data

    from pdf2doi_ray.stages.dedup import (_jaccard_prefix_rows,
                                          jaccard_threshold_pairs)

    rng = np.random.default_rng(7)
    stop = "terms of service apply to all visitors here"
    docs = []
    for i in range(300):
        uniq = " ".join(f"w{i}x{j}" for j in range(12))
        docs.append({"doc_id": i, "text": f"{stop} {uniq}"})
    # planted near-dup pair: doc 300/301 share most unique content too
    shared = " ".join(f"s{j}" for j in range(20))
    docs.append({"doc_id": 300, "text": f"{stop} {shared} tail300"})
    docs.append({"doc_id": 301, "text": f"{stop} {shared} tail301"})
    df = pd.DataFrame(docs)

    got = jaccard_threshold_pairs(
        ray.data.from_pandas(df).repartition(4),
        tau_permille=500, gram_len=3, hot_df=16).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # brute-force golden
    def shingles(text):
        toks = text.split()
        return {" ".join(toks[k:k + 3]) for k in range(len(toks) - 2)}
    sets = {r.doc_id: shingles(r.text) for r in df.itertuples()}
    want = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * 1000 >= 500 * uni:
                want.append((a, b, inter, uni))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert (300, 301) in {(a, b) for a, b, _, _ in want}  # fixture sane

    # structural boundedness: with the true df table broadcast, no
    # prefix key's group exceeds hot_df-1 rows (the stop shingles are
    # hot in all 302 docs and must be absent from every prefix)
    t = pa.Table.from_pandas(df)
    from pdf2doi_ray.stages.dedup import _jaccard_distinct_hashes
    r, h = _jaccard_distinct_hashes(t, 3)
    uniq_h, cnt = np.unique(h, return_counts=True)
    hot_mask = cnt >= 16
    hot = (uniq_h[hot_mask], cnt[hot_mask].astype(np.int64))
    pref = _jaccard_prefix_rows(t, 500, 3, hot)
    counts = pd.Series(pref["pref"].to_numpy(zero_copy_only=False)) \
        .value_counts()
    assert counts.max() < 16, f"hot group leaked: {counts.max()}"
    # without demotion the same fixture DOES create a giant group
    pref_bad = _jaccard_prefix_rows(
        t, 500, 3, (np.array([], dtype=np.int64),
                    np.array([], dtype=np.int64)))
    bad_counts = pd.Series(
        pref_bad["pref"].to_numpy(zero_copy_only=False)).value_counts()
    assert bad_counts.max() > 100


@pytest.mark.usefixtures("ray_session")
def test_pareto_frontier_antichain_bucketed():
    """VERDICT r4 #5: a pure anti-chain (every row on the frontier) must
    survive the bucketed merge exactly — and must not funnel through a
    single O(n) task (structurally: the merge is per-bucket)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import pareto_frontier

    n = 4000
    # perfect anti-chain: p ascending, d ascending → nobody dominates
    df = pd.DataFrame({"p": np.arange(n, dtype=np.int64),
                       "d": np.arange(n, dtype=np.int64)})
    got = pareto_frontier(ray.data.from_pandas(df).repartition(8),
                          "p", "d").to_pandas()
    assert len(got) == n
    assert set(got["p"]) == set(range(n))

    # mixed: dominated rows (high d at every p) must vanish, and
    # cross-BUCKET domination must apply (one tiny-d row at max p kills
    # every other row even in far-away buckets)
    df2 = pd.DataFrame({"p": np.concatenate([np.arange(n), [n + 5]]),
                        "d": np.concatenate([np.arange(n) + 10, [0]])})
    got2 = pareto_frontier(ray.data.from_pandas(df2).repartition(8),
                           "p", "d").to_pandas()
    assert len(got2) == 1 and int(got2["p"].iloc[0]) == n + 5

    # duplicates survive together; equal p picks min d
    df3 = pd.DataFrame({"p": [5, 5, 5, 3], "d": [2, 2, 7, 1]})
    got3 = pareto_frontier(ray.data.from_pandas(df3).repartition(2),
                           "p", "d").to_pandas() \
        .sort_values(["p", "d"]).reset_index(drop=True)
    assert [tuple(r) for r in got3.itertuples(index=False)] == \
        [(3, 1), (5, 2), (5, 2)]


@pytest.mark.usefixtures("ray_session")
def test_gini_skew_matches_driver_fold_on_high_ndv_key():
    """VERDICT r4 #3: gini over a high-NDV key (every row its own key
    plus one hot key) via the distributed block fold, checked against a
    direct全-driver computation."""
    import ray.data

    from pdf2doi_ray.stages.aggs import gini_skew

    keys = [f"u{i}" for i in range(5000)] + ["hot"] * 3000
    df = pd.DataFrame({"k": keys})
    got = gini_skew(ray.data.from_pandas(df).repartition(8), "k") \
        .iloc[0]
    x = np.sort(pd.Series(keys).value_counts().to_numpy())
    m, tot = len(x), int(x.sum())
    i = np.arange(1, m + 1, dtype=np.int64)
    num = int(((2 * i - m - 1) * x).sum())
    assert (got["n_keys"], got["total"], got["gini_num"],
            got["gini_den"]) == (m, tot, num, m * tot)


@pytest.mark.usefixtures("ray_session")
def test_cdc_auto_ship_selection():
    """VERDICT r4 #7: ship='auto' keeps the bit-exact bytes mode for
    small inputs and flips to the 24 B/chunk hash64 exchange above the
    byte threshold; both modes agree on the fixture."""
    import ray.data

    from pdf2doi_ray.stages.dedup import cdc_chunk_stats

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["abcdefghij" * 30, "abcdefghij" * 30,
                 "zyxwvu" * 40, "hello world " * 25,
                 "hello world " * 25, "unique tail text " * 20]})
    ds = ray.data.from_pandas(df).repartition(2)
    a = cdc_chunk_stats(ds, k=5, mod=16, ship="bytes").iloc[0]
    b = cdc_chunk_stats(ds, k=5, mod=16, ship="hash64").iloc[0]
    c = cdc_chunk_stats(ds, k=5, mod=16, ship="auto").iloc[0]
    d = cdc_chunk_stats(ds, k=5, mod=16, ship="auto",
                        auto_bytes_threshold=1).iloc[0]   # forces hash64
    for col in ("n_chunks", "n_unique_chunks", "total_bytes",
                "unique_bytes", "dedup_ratio_permille"):
        assert a[col] == b[col] == c[col] == d[col]
