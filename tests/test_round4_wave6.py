"""Round-4 wave-6 operators: HITS hubs/authorities, Q21-style blame join."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_hits_fixed_handbuilt_vs_numpy():
    """hits_fixed matches a straight numpy unroll of the same integer
    recurrence on a handbuilt weighted digraph, at every block split."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import hits_fixed

    edges = pd.DataFrame({
        "src": ["a", "a", "b", "c", "c", "d"],
        "dst": ["x", "y", "x", "x", "z", "y"],
        "n_links": [3, 1, 2, 1, 5, 1]})
    scale = 1_000_000
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for s, d, w in edges.itertuples(index=False):
        W[idx[s], idx[d]] += w
    h = np.full(len(nodes), scale, dtype=np.int64)
    for _ in range(2):
        a = W.T @ h
        a = a * scale // a.max()
        h = W @ a
        h = h * scale // h.max()
    want = pd.DataFrame({"node": nodes, "hub_scaled": h,
                         "auth_scaled": a}).sort_values("node") \
        .reset_index(drop=True)

    for blocks in (1, 4):
        got = (hits_fixed(ray.data.from_pandas(edges).repartition(blocks),
                          n_iters=2)
               .to_pandas().sort_values("node").reset_index(drop=True)
               [["node", "hub_scaled", "auth_scaled"]])
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_hits_fixed_empty_edges_raises():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import hits_fixed

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], type=pa.string()),
        "dst": pa.array([], type=pa.string()),
        "n_links": pa.array([], type=pa.int64())}))
    with pytest.raises(ValueError):
        hits_fixed(empty, n_iters=1)


@pytest.mark.usefixtures("ray_session")
def test_waiting_suppliers_handbuilt_blame():
    """Adversarial Q21 shapes: the blamed supplier's line items split
    across batches, an all-late order (no single blame), a single-supplier
    order (no other supplier), and a non-F order — only the clean case
    counts, at every block split."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import waiting_suppliers

    li = pd.DataFrame({
        # order 1: supp 10 late (twice, dup rows), supp 20 clean -> blame 10
        # order 2: supp 10 and 20 both late -> nobody (two late suppliers)
        # order 3: only supp 30, late -> nobody (single-supplier order)
        # order 4: supp 20 late, supp 30 clean, but order status 'O'
        # order 5: supp 20 late, supp 10 clean -> blame 20
        "l_orderkey": [1, 1, 1, 2, 2, 3, 4, 4, 5, 5],
        "l_suppkey": [10, 10, 20, 10, 20, 30, 20, 30, 20, 10],
        "l_returnflag": ["R", "R", "N", "R", "R", "R", "R", "N", "R", "N"],
    })
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_orderstatus": ["F", "F", "F", "O", "F"]})
    supplier = pd.DataFrame({
        "s_suppkey": [10, 20, 30],
        "s_name": ["Supplier#10", "Supplier#20", "Supplier#30"]})

    want = pd.DataFrame({"s_name": ["Supplier#10", "Supplier#20"],
                         "numwait": np.array([1, 1], dtype=np.int64)})
    for blocks in (1, 5):
        got = waiting_suppliers(
            ray.data.from_pandas(orders),
            ray.data.from_pandas(supplier),
            ray.data.from_pandas(li).repartition(blocks),
            num_partitions=2, num_shards=2)
        pd.testing.assert_frame_equal(
            got.astype({"numwait": "int64"}), want)


@pytest.mark.usefixtures("ray_session")
def test_waiting_suppliers_no_qualifying_orders():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import waiting_suppliers

    li = pd.DataFrame({"l_orderkey": [1, 1], "l_suppkey": [10, 20],
                       "l_returnflag": ["N", "N"]})
    orders = pd.DataFrame({"o_orderkey": [1], "o_orderstatus": ["F"]})
    supplier = pd.DataFrame({"s_suppkey": [10], "s_name": ["Supplier#10"]})
    got = waiting_suppliers(ray.data.from_pandas(orders),
                            ray.data.from_pandas(supplier),
                            ray.data.from_pandas(li),
                            num_partitions=2, num_shards=2)
    assert len(got) == 0
    assert list(got.columns) == ["s_name", "numwait"]


@pytest.mark.usefixtures("ray_session")
def test_proximity_cooccurrence_handbuilt():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.retrieval import proximity_cooccurrence

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "hash join now",             # dist 1
            "hash x y z join",           # dist 4 > window
            "join a hash b c join",      # min dist 2 (nearest B wins)
            "hash only here",            # no join
            "join only here",            # no hash
        ]})
    for blocks in (1, 3):
        got = (proximity_cooccurrence(
            ray.data.from_pandas(docs).repartition(blocks),
            "hash", "join", window=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = pd.DataFrame({"doc_id": [1, 3],
                             "min_dist": [1, 2]}).astype("int64")
        pd.testing.assert_frame_equal(got.astype("int64"), want)


@pytest.mark.usefixtures("ray_session")
def test_proximity_same_term_raises():
    import ray.data

    from pdf2doi_ray.stages.retrieval import proximity_cooccurrence

    with pytest.raises(ValueError):
        proximity_cooccurrence(
            ray.data.from_items([{"doc_id": 1, "text": "a"}]), "a", "a")


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunk_stats_invariants_and_dup_detection():
    """Chunks must partition the corpus bytes exactly; replicating a
    document must leave unique_bytes unchanged while total_bytes doubles;
    the result is block-split invariant (per-doc deterministic cuts)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.dedup import cdc_chunk_stats

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "pack my box with five dozen liquor jugs " * 2,
             "sphinx of black quartz judge my vow"]
    base = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    one = cdc_chunk_stats(ray.data.from_pandas(base), k=5, mod=8)
    assert int(one.total_bytes[0]) == sum(len(s) for s in texts)
    assert int(one.unique_bytes[0]) <= int(one.total_bytes[0])
    assert int(one.n_unique_chunks[0]) <= int(one.n_chunks[0])

    dup = pd.concat([base, base.assign(doc_id=[4, 5, 6])],
                    ignore_index=True)
    for blocks in (1, 4):
        two = cdc_chunk_stats(
            ray.data.from_pandas(dup).repartition(blocks), k=5, mod=8)
        assert int(two.total_bytes[0]) == 2 * int(one.total_bytes[0])
        # every chunk of the copy already exists -> unique set unchanged
        assert int(two.unique_bytes[0]) == int(one.unique_bytes[0])
        assert int(two.n_unique_chunks[0]) == int(one.n_unique_chunks[0])
        assert int(two.dedup_ratio_permille[0]) \
            == int(one.unique_bytes[0]) * 1000 // int(two.total_bytes[0])


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunk_stats_short_and_empty_docs():
    """Docs shorter than the gram size are whole-doc chunks; empty docs
    contribute nothing (matching the SQL oracle's list-distinct collapse)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.dedup import cdc_chunk_stats

    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["abc", "", "abc"]})
    got = cdc_chunk_stats(ray.data.from_pandas(docs), k=5, mod=8)
    assert int(got.n_chunks[0]) == 2
    assert int(got.n_unique_chunks[0]) == 1
    assert int(got.total_bytes[0]) == 6
    assert int(got.unique_bytes[0]) == 3


@pytest.mark.usefixtures("ray_session")
def test_byte_pair_counts_handbuilt():
    """Pairs crossing a space or a document edge must not count; ties
    break by byte order; block-split invariant."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import byte_pair_counts

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        # doc1: 'abab cd'  pairs: ab, ba, ab, cd  (b_space, space_c skip)
        # doc2: 'dab'      pairs: da, ab   (edge 'd'+'d' must NOT pair)
        "text": ["abab cd", "dab"]})
    want = pd.DataFrame({
        "rank": np.array([1, 2, 3, 4], dtype=np.int64),
        "pair": ["ab", "ba", "cd", "da"],
        "n_occurrences": np.array([3, 1, 1, 1], dtype=np.int64)})
    for blocks in (1, 2):
        got = byte_pair_counts(
            ray.data.from_pandas(docs).repartition(blocks), k=10)
        pd.testing.assert_frame_equal(
            got.astype({"n_occurrences": "int64"}), want)


@pytest.mark.usefixtures("ray_session")
def test_crawl_budget_apportion_exact_hamilton():
    """Budget conserves exactly; largest remainders win the bonus slots;
    remainder ties break by host ascending."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import crawl_budget_apportion

    # counts 5, 3, 2 over budget 7 and N=10:
    #   floors 3,2,1 (sum 6); remainders (7n mod 10): 5, 1, 4
    #   one bonus slot -> host a (rem 5)
    urls = (["https://a.org/p%d" % i for i in range(5)]
            + ["https://b.org/p%d" % i for i in range(3)]
            + ["https://c.org/p%d" % i for i in range(2)])
    pages = pd.DataFrame({"url": urls})
    got = (crawl_budget_apportion(ray.data.from_pandas(pages),
                                  total_budget=7)
           .to_pandas().sort_values("host").reset_index(drop=True))
    want = pd.DataFrame({"host": ["a.org", "b.org", "c.org"],
                         "n_pages": np.array([5, 3, 2], dtype=np.int64),
                         "budget": np.array([4, 2, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
    assert got["budget"].sum() == 7


@pytest.mark.usefixtures("ray_session")
def test_crawl_budget_zero_and_negative():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import crawl_budget_apportion

    pages = ray.data.from_pandas(
        pd.DataFrame({"url": ["https://a.org/1", "https://b.org/1"]}))
    got = crawl_budget_apportion(pages, total_budget=0).to_pandas()
    assert got["budget"].sum() == 0
    with pytest.raises(ValueError):
        crawl_budget_apportion(pages, total_budget=-1)


@pytest.mark.usefixtures("ray_session")
def test_collocation_lift_handbuilt():
    """Lift ranks a tight pair above a frequent-but-independent pair;
    min_count gates rare pairs; block-split invariant."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import collocation_lift

    # 'x y' always together (5 times); 'a b' appears but a and b are
    # everywhere; 'q z' appears once (gated by min_count=2)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x y a", "x y b a", "x y a b", "x y b", "x y q z a b"]})
    for blocks in (1, 3):
        got = collocation_lift(
            ray.data.from_pandas(docs).repartition(blocks),
            k=5, min_count=2)
        assert list(got["bigram"])[0] == "x y"
        assert "q z" not in set(got["bigram"])
        # exact integer check: n_xy=5, n_x=5, n_y=5, N=20
        # lift = 5*20*1000 // 25 = 4000
        row = got[got["bigram"] == "x y"].iloc[0]
        assert int(row["lift_scaled"]) == 5 * 20 * 1000 // 25
        assert int(row["n_ab"]) == 5


@pytest.mark.usefixtures("ray_session")
def test_host_crawl_overlap_handbuilt():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import host_crawl_overlap

    cur = pd.DataFrame({"url": [
        "https://a.org/1", "https://a.org/2", "https://a.org/2",  # dup row
        "https://b.org/1"]})
    prev = pd.DataFrame({"url": [
        "https://a.org/2", "https://a.org/3",
        "https://c.org/9"]})
    for blocks in (1, 2):
        got = (host_crawl_overlap(
            ray.data.from_pandas(cur).repartition(blocks),
            ray.data.from_pandas(prev))
            .to_pandas().sort_values("host").reset_index(drop=True))
        want = pd.DataFrame({
            "host": ["a.org", "b.org", "c.org"],
            "n_both": np.array([1, 0, 0], dtype=np.int64),
            "n_union": np.array([3, 1, 1], dtype=np.int64),
            "jaccard_permille": np.array([333, 0, 0], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_brand_bracket_revenue_handbuilt():
    """OR-of-ANDs bracket filter: a row counts only when brand AND
    quantity agree; revenue is exact integer milli."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import brand_bracket_revenue

    part = pd.DataFrame({"p_partkey": [1, 2, 3],
                         "p_brand": ["Brand#1", "Brand#2", "Brand#9"]})
    li = pd.DataFrame({
        "l_partkey": [1, 1, 2, 3],
        "l_quantity": [5.0, 50.0, 15.0, 5.0],   # in, out-of-bracket,
        "l_extendedprice": [100.0, 100.0, 200.0, 999.0],  # in, wrong brand
        "l_discount": [0.1, 0.1, 0.25, 0.0]})
    got = brand_bracket_revenue(
        ray.data.from_pandas(part), ray.data.from_pandas(li))
    # rows 0 and 2 qualify: floor(100*0.9*1000) + floor(200*0.75*1000)
    assert int(got.revenue_milli[0]) == 90000 + 150000
    assert int(got.n_items[0]) == 2


@pytest.mark.usefixtures("ray_session")
def test_late_event_accounting_handbuilt():
    """Watermark carried across sorted blocks: an event whose window
    closed before it arrived is late; the first arrival never is.
    Input arrives pre-shuffled to force the sort to do the work."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windows import late_event_accounting

    W = 10_000_000   # 10 s windows
    ev = pd.DataFrame({
        # arrival order 0..4; event times (us):
        # e0: 25s  (win 2)           -> first arrival, never late
        # e1: 31s  (win 3)           -> pm=25s, wm=25-5=20 < 40: on time
        # e2:  3s  (win 0)           -> pm=31s, wm=26 >= 10: LATE
        # e3: 19s  (win 1)           -> pm=31s, wm=26 >= 20: LATE
        # e4: 27s  (win 2)           -> pm=31s, wm=26 < 30: on time
        "event_id": [0, 1, 2, 3, 4],
        "event_type": ["a", "a", "a", "b", "a"],
        "us": [25_000_000, 31_000_000, 3_000_000, 19_000_000,
               27_000_000]})
    shuffled = ev.sample(frac=1.0, random_state=7)
    for blocks in (1, 3):
        got = (late_event_accounting(
            ray.data.from_pandas(shuffled).repartition(blocks),
            window_s=10, lateness_s=5)
            .to_pandas()
            .sort_values(["event_type", "window"]).reset_index(drop=True))
        want = pd.DataFrame({
            "event_type": ["a", "a", "a", "b"],
            "window": np.array([0, 2, 3, 1], dtype=np.int64),
            "n_events": np.array([1, 2, 1, 1], dtype=np.int64),
            "n_late": np.array([1, 0, 0, 1], dtype=np.int64)}) \
            .sort_values(["event_type", "window"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_fd_violation_audit_handbuilt():
    """A determinant seen with two dependents flags; duplicate pairs
    across blocks don't inflate the distinct count."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import fd_violation_audit

    df = pd.DataFrame({
        "host": ["a", "a", "a", "b", "b", "c"],
        "lang": ["en", "en", "de", "fr", "fr", "es"]})
    for blocks in (1, 3):
        got = (fd_violation_audit(
            ray.data.from_pandas(df).repartition(blocks), "host", "lang")
            .to_pandas().sort_values("det").reset_index(drop=True))
        want = pd.DataFrame({
            "det": ["a", "b", "c"],
            "n_distinct_dep": np.array([2, 1, 1], dtype=np.int64),
            "n_rows": np.array([3, 2, 1], dtype=np.int64),
            "is_violation": np.array([1, 0, 0], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunk_stats_hash64_matches_bytes_mode():
    """The hash-shipping scale path reports the identical audit as the
    byte-shipping exact mode on a duplicate-heavy fixture."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.dedup import cdc_chunk_stats

    texts = (["common boilerplate header row example " * 4] * 5
             + ["unique document %d body with its own words" % i
                for i in range(7)])
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(docs).repartition(3)
    a = cdc_chunk_stats(ds, k=5, mod=8, ship="bytes")
    b = cdc_chunk_stats(ds, k=5, mod=8, ship="hash64")
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        cdc_chunk_stats(ds, ship="zstd")


@pytest.mark.usefixtures("ray_session")
def test_bucket_sync_diff_statuses(tmp_path):
    """Handbuilt layouts covering every status: identical bucket →
    match; changed payload → mismatch; side-only buckets; row order
    inside a bucket must not matter (order-independent checksum)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.joins import bucket_sync_diff, write_bucketed

    n_buckets = 4
    # mix64 buckets for small ids (computed with the same arithmetic)
    mix = lambda k: int((np.uint64(k) * np.uint64(0x9E3779B97F4A7C15))
                        >> np.uint64(1)) % n_buckets
    ids = list(range(24))
    a = pd.DataFrame({"doc_id": ids,
                      "text": ["t%d" % i for i in ids]})
    # b: same rows shuffled, except one id's text changed; plus drop
    # every id in one particular bucket
    victim = ids[3]
    drop_bucket = mix(ids[5])
    b = a.sample(frac=1.0, random_state=3).copy()
    b.loc[b.doc_id == victim, "text"] = "CHANGED"
    b = b[[mix(i) != drop_bucket or i == victim
           for i in b.doc_id]]
    if mix(victim) == drop_bucket:   # keep the victim's mismatch visible
        pytest.skip("fixture degenerate for this n_buckets")

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_pandas(a), "doc_id", da,
                   n_buckets=n_buckets)
    write_bucketed(ray.data.from_pandas(b).repartition(3), "doc_id", db,
                   n_buckets=n_buckets)
    got = (bucket_sync_diff(da, db, "doc_id", n_buckets,
                            cols=["doc_id", "text"])
           .to_pandas().set_index("bucket").sort_index())
    assert got.loc[mix(victim), "status"] == "mismatch"
    assert got.loc[drop_bucket, "status"] == "only_a"
    others = [bk for bk in range(n_buckets)
              if bk not in (mix(victim), drop_bucket)]
    assert all(got.loc[bk, "status"] == "match" for bk in others)


@pytest.mark.usefixtures("ray_session")
def test_exact_kth_value_radix_select():
    """Every rank of a small set with negatives, duplicates and
    extremes matches a straight sort, at multiple block splits."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_kth_value

    vals = np.array([3.5, -2.25, 0.0, 1e300, -1e-308, 3.5, -2.25,
                     7.125, -0.0, 42.0], dtype=np.float64)
    want = np.sort(vals)
    for blocks in (1, 4):
        ds = ray.data.from_pandas(
            pd.DataFrame({"value": vals})).repartition(blocks)
        for r in (1, 2, 5, len(vals)):
            got = exact_kth_value(ds, "value", r)
            assert got["value"][0] == want[r - 1], (r, got["value"][0])
    ds = ray.data.from_pandas(pd.DataFrame({"value": vals}))
    with pytest.raises(ValueError):
        exact_kth_value(ds, "value", 0)
    with pytest.raises(ValueError):
        exact_kth_value(ds, "value", len(vals) + 1)


@pytest.mark.usefixtures("ray_session")
def test_bfs_depths_handbuilt_chain():
    """Min-hop semantics on a graph with a shortcut and a cycle; nodes
    beyond max_depth excluded; early exit on an exhausted frontier."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.graph import bfs_depths

    edges = pd.DataFrame({
        "src": ["a", "b", "c", "a", "d", "e"],
        "dst": ["b", "c", "a", "c", "e", "f"]})   # cycle a-b-c, chain d-e-f
    for blocks in (1, 3):
        got = (bfs_depths(ray.data.from_pandas(edges).repartition(blocks),
                          source="a", max_depth=5)
               .sort_values("node").reset_index(drop=True))
        want = pd.DataFrame({"node": ["a", "b", "c"],
                             "depth": np.array([0, 1, 1], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)
    got = bfs_depths(ray.data.from_pandas(edges), source="d", max_depth=1)
    assert set(zip(got["node"], got["depth"])) == {("d", 0), ("e", 1)}


@pytest.mark.usefixtures("ray_session")
def test_exact_weighted_kth_handbuilt():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_weighted_kth

    df = pd.DataFrame({"value": [10.0, -5.0, 30.0, 10.0],
                       "weight": [3, 2, 4, 1]})
    # ascending: -5(w2) 10(w3) 10(w1) 30(w4); cum: 2, 5, 6, 10
    cases = {1: -5.0, 2: -5.0, 3: 10.0, 6: 10.0, 7: 30.0, 10: 30.0}
    for blocks in (1, 2):
        ds = ray.data.from_pandas(df).repartition(blocks)
        for kw, want in cases.items():
            got = exact_weighted_kth(ds, "value", "weight", kw)
            assert got["value"][0] == want, (kw, got["value"][0])
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        exact_weighted_kth(ds, "value", "weight", 11)
    bad = ray.data.from_pandas(
        pd.DataFrame({"value": [1.0], "weight": [0]}))
    with pytest.raises(Exception):
        exact_weighted_kth(bad, "value", "weight", 1)


@pytest.mark.usefixtures("ray_session")
def test_continuation_counts_distinct_semantics():
    """A repeated (prev, tok) pair — within a doc or across docs/blocks —
    counts ONE context; distinct predecessors accumulate."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import continuation_counts

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b", "c b", "a b d b"]})
    # predecessors of b: {a, c, d} -> 3; of a: {b} -> 1; of d: {b} -> 1
    for blocks in (1, 3):
        got = continuation_counts(
            ray.data.from_pandas(docs).repartition(blocks), k=10)
        m = dict(zip(got["token"], got["n_contexts"]))
        assert m["b"] == 3 and m["a"] == 1 and m["d"] == 1
        assert list(got["token"])[0] == "b"


@pytest.mark.usefixtures("ray_session")
def test_co_citation_distinct_per_page():
    """Duplicate links to the same host from one page count the pair
    once; pairs are canonical-ordered; pages with one host emit none."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import co_citation_counts

    pages = pd.DataFrame({
        "url": ["https://x.org/1", "https://x.org/2", "https://x.org/3"],
        "text": [
            '<a href="https://b.org/p">l</a> <a href="https://a.org/q">l'
            '</a> <a href="https://b.org/r">dup</a>',
            '<a href="https://a.org/z">only one host</a>',
            '<a href="https://a.org/1">x</a> <a href="https://b.org/2">y'
            '</a> <a href="https://c.org/3">z</a>',
        ]})
    for blocks in (1, 3):
        got = co_citation_counts(
            ray.data.from_pandas(pages).repartition(blocks), k=10)
        want = {("a.org", "b.org"): 2, ("a.org", "c.org"): 1,
                ("b.org", "c.org"): 1}
        assert dict(zip(zip(got["host_a"], got["host_b"]),
                        got["n_pages"])) == want
        assert list(got["rank"]) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_exact_kth_by_group_handbuilt():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_kth_by_group

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "value": [5.0, -1.0, 3.0, 3.0, 100.0, 0.5, -0.25, 2.0]})
    # a sorted: -1, 3, 3, 5, 100 ; b sorted: -0.25, 0.5, 2.0
    for blocks in (1, 3):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = exact_kth_by_group(ds, "g", "value", {"a": 3, "b": 2})
        m = dict(zip(got["group"], got["value"]))
        assert m == {"a": 3.0, "b": 0.5}
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        exact_kth_by_group(ds, "g", "value", {"a": 6})


@pytest.mark.usefixtures("ray_session")
def test_ed1_correct_all_edit_types():
    """Deletion, insertion, substitution matches; smallest-word
    tie-break; in-vocab passthrough; no-match rows drop."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.textnorm import ed1_correct

    dictionary = ["cat", "cart", "car", "dog", "bat"]
    toks = pd.DataFrame({
        "token": ["catx",   # deletion  -> cat
                  "ca",     # insertion -> car or cat -> min = car
                  "cak",    # substitution -> car/cat -> min = car
                  "dog",    # in vocab -> dog
                  "zzz",    # no match -> dropped
                  "bat"],   # in vocab
        "n": [5, 4, 3, 2, 1, 9]})
    for blocks in (1, 3):
        got = (ed1_correct(ray.data.from_pandas(toks).repartition(blocks),
                           dictionary)
               .to_pandas().sort_values("token").reset_index(drop=True))
        want = pd.DataFrame({
            "token": ["bat", "ca", "cak", "catx", "dog"],
            "correction": ["bat", "car", "car", "cat", "dog"],
            "n": np.array([9, 4, 3, 5, 2], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_host_url_lcp_extremes_identity():
    """LCP computed from lex extremes only must equal the true set LCP,
    including a host whose extremes diverge at position 0 and a
    single-url host (LCP = whole url)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import host_url_lcp

    pages = pd.DataFrame({"url": [
        "https://a.org/docs/x1", "https://a.org/docs/x2",
        "https://a.org/docs/y",                         # lcp /docs/
        "https://b.org/zzz",                            # single url
        "https://c.org/1", "https://c.org/2",
    ]})
    for blocks in (1, 3):
        got = (host_url_lcp(ray.data.from_pandas(pages)
                            .repartition(blocks))
               .to_pandas().sort_values("host").reset_index(drop=True))
        want = pd.DataFrame({
            "host": ["a.org", "b.org", "c.org"],
            "lcp_len": np.array([19, 17, 14], dtype=np.int64),
            "lcp": ["https://a.org/docs/", "https://b.org/zzz",
                    "https://c.org/"]})
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_lang_vocab_overlap_handbuilt():
    """Bitmask histogram vs hand arithmetic on genuinely distinct
    vocabularies, including an all-pairs-empty language."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import lang_vocab_overlap

    docs = pd.DataFrame({
        "lang": ["en", "en", "de", "fr"],
        "text": ["the cat sat", "the dog", "the hund", "chat unique"]})
    # vocab: en={the,cat,sat,dog} de={the,hund} fr={chat,unique}
    for blocks in (1, 2):
        got = (lang_vocab_overlap(
            ray.data.from_pandas(docs).repartition(blocks))
            .sort_values(["lang_a", "lang_b"]).reset_index(drop=True))
        want = pd.DataFrame({
            "lang_a": ["de", "de", "en"],
            "lang_b": ["en", "fr", "fr"],
            "n_shared": np.array([1, 0, 0], dtype=np.int64),
            "n_union": np.array([5, 4, 6], dtype=np.int64),
            "jaccard_permille": np.array([200, 0, 0], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_image_signature_dedup_groups_by_fill():
    """Images with the same fill byte (after 4x4 downsample) group; the
    min doc_id wins as representative; group sizes exact."""
    from pdf2doi_ray.stages.multimodal import image_signature_dedup

    got = (image_signature_dedup("/root/testdata/sf0.001")
           .to_pandas().sort_values("rep_doc_id").reset_index(drop=True))
    # 500 docs over fill = doc_id % 251: ids 0..499 -> fills 0..250 with
    # ids 251..499 wrapping: groups of size 2 for fill 0..248, size 1
    # for 249, 250
    assert len(got) == 251
    assert got["n_images"].sum() == 500
    sizes = got.set_index("rep_doc_id")["n_images"]
    assert int(sizes[0]) == 2 and int(sizes[249]) == 1


@pytest.mark.usefixtures("ray_session")
def test_profile_columns_nulls_and_distincts():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import profile_columns

    df = pd.DataFrame({
        "a": [1, 2, 2, None],
        "b": ["x", None, "x", None]})
    for blocks in (1, 2):
        got = profile_columns(
            ray.data.from_pandas(df).repartition(blocks), ["a", "b"])
        a = got[got["column"] == "a"].iloc[0]
        b = got[got["column"] == "b"].iloc[0]
        assert (int(a.n_rows), int(a.n_null), int(a.n_distinct)) \
            == (4, 1, 2)
        assert (int(b.n_rows), int(b.n_null), int(b.n_distinct)) \
            == (4, 2, 1)
        assert b.min_value == "x" and b.max_value == "x"


@pytest.mark.usefixtures("ray_session")
def test_grouped_trend_components_exact():
    """Integer OLS components vs hand arithmetic: rising, falling, and
    degenerate (single-timestamp) groups; block-split invariant."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_trend_components

    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=20),
               base, base + pd.Timedelta(seconds=10),
               base + pd.Timedelta(seconds=5)],
        "value": [1.0, 2.0, 3.0,     # rising: slope 0.1/s
                  5.0, 3.0,          # falling
                  7.0]})             # single point -> den 0
    for blocks in (1, 3):
        got = (grouped_trend_components(
            ray.data.from_pandas(ev).repartition(blocks))
            .to_pandas().sort_values("group").reset_index(drop=True))
        g1 = got[got["group"] == 1].iloc[0]
        # t = 0,10,20; v = 1000,2000,3000
        # num = 3*(10*2000+20*3000) - 30*6000 = 3*80000-180000 = 60000
        # den = 3*(100+400) - 900 = 600 ; slope = 100 milli/s = 0.1/s
        assert (int(g1.slope_num), int(g1.slope_den)) == (60000, 600)
        g2 = got[got["group"] == 2].iloc[0]
        assert int(g2.slope_num) < 0
        g3 = got[got["group"] == 3].iloc[0]
        assert int(g3.slope_den) == 0


@pytest.mark.usefixtures("ray_session")
def test_bursty_hours_handbuilt():
    """A key with one clearly anomalous window flags exactly that
    window; a uniform key flags nothing (sigma 0 -> strict > fails)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windows import bursty_hours

    base = pd.Timestamp("2024-01-01")
    rows = []
    # key 'a': 10 windows of 1 event, 1 window of 30 events
    for w in range(10):
        rows.append(("a", base + pd.Timedelta(hours=w)))
    rows += [("a", base + pd.Timedelta(hours=10, minutes=m))
             for m in range(30)]
    # key 'b': perfectly uniform — never bursty
    for w in range(5):
        rows += [("b", base + pd.Timedelta(hours=w, minutes=j))
                 for j in range(3)]
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    for blocks in (1, 3):
        got = (bursty_hours(ray.data.from_pandas(ev).repartition(blocks),
                            "event_type", window_s=3600, k_sigma=2)
               .to_pandas())
        assert list(got["key"]) == ["a"]
        assert int(got["n_events"].iloc[0]) == 30


@pytest.mark.usefixtures("ray_session")
def test_session_conversion_handbuilt():
    """Within-session ordering: a purchase BEFORE the first view, or in
    a different session, doesn't convert; one after it does; equal-
    microsecond then-events don't count (strict time)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windows import session_conversion

    base = pd.Timestamp("2024-01-01")
    mk = lambda mins: base + pd.Timedelta(minutes=mins)
    ev = pd.DataFrame([
        # user 1, session 1: purchase, view, purchase -> converted
        (1, mk(0), "purchase"), (1, mk(1), "view"), (1, mk(2), "purchase"),
        # user 1, session 2 (gap > 30 min): view only -> not converted
        (1, mk(60), "view"),
        # user 2: view in session 1, purchase in session 2 -> neither
        (2, mk(0), "view"), (2, mk(60), "purchase"),
        # user 3: view and purchase at the IDENTICAL instant -> strict >
        (3, mk(0), "view"), (3, mk(0), "purchase"),
    ], columns=["user_id", "ts", "event_type"])
    for blocks in (1, 4):
        got = (session_conversion(
            ray.data.from_pandas(ev).repartition(blocks), gap_s=1800)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
        want = pd.DataFrame({
            "user_id": [1, 2, 3],
            "n_sessions": np.array([2, 2, 1], dtype=np.int64),
            "n_converted": np.array([1, 0, 0], dtype=np.int64)})
        pd.testing.assert_frame_equal(got, want)
