"""Round-3 widening ops: keyed dedup, inverted-index stats, quantile
filter, sorted head."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, n_blocks: int):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(n_blocks)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_first_per_key(n_blocks):
    from pdf2doi_ray.stages.dedup import first_per_key

    t = pa.table({
        "k": pa.array([f"k{i % 5}" for i in range(40)]),
        "doc_id": pa.array(list(range(100, 140))[::-1], type=pa.int64()),
    })
    out = first_per_key(_ds(t, n_blocks), "k", "doc_id").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # ids are descending, so min id per key k_j is 100 + (39 - j') where
    # j' is the LAST index with i%5==j → brute-force instead:
    want = {}
    for i in range(40):
        k = f"k{i % 5}"
        want[k] = min(want.get(k, 10**9), 139 - i)
    assert dict(zip(out["k"], out["doc_id"])) == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_inverted_index_stats_brute(n_blocks):
    from pdf2doi_ray.stages.corpus import inverted_index_stats

    texts = ["a b a", "b  c", "a", "", "c c c b"]
    t = pa.table({
        "doc_id": pa.array(list(range(10, 15)), type=pa.int64()),
        "text": pa.array(texts),
    })
    out = inverted_index_stats(_ds(t, n_blocks)).to_pandas() \
        .sort_values("term").reset_index(drop=True)

    brute = {}
    for did, tx in zip(range(10, 15), texts):
        toks = [x for x in tx.split(" ") if x]
        for term in set(toks):
            d = brute.setdefault(term, [0, 0, 10**9, -1])
            d[0] += 1
            d[2] = min(d[2], did)
            d[3] = max(d[3], did)
        for term in toks:
            brute[term][1] += 1
    got = {r.term: [r.df, r.cf, r.min_doc, r.max_doc]
           for r in out.itertuples()}
    assert got == brute


@pytest.mark.usefixtures("ray_session")
def test_filter_above_quantile_brute():
    from pdf2doi_ray.stages.textstats import filter_above_quantile

    rng = np.random.default_rng(7)
    counts = rng.integers(1, 30, size=60)
    texts = [" ".join(["w"] * int(c)) for c in counts]
    t = pa.table({"doc_id": pa.array(list(range(60)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = filter_above_quantile(_ds(t, 3), q_permille=750).to_pandas()
    # oracle definition: value at 1-based rank ceil(q*n/1000) ascending
    split_counts = np.array([len(tx.split(" ")) for tx in texts])
    thr = np.sort(split_counts)[int(-(-750 * 60 // 1000)) - 1]
    want = {i for i, c in enumerate(split_counts) if c > thr}
    assert set(out["doc_id"]) == want
    assert (out["n_tokens"] > thr).all()


@pytest.mark.usefixtures("ray_session")
def test_filter_above_quantile_empty():
    from pdf2doi_ray.stages.textstats import filter_above_quantile

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = filter_above_quantile(_ds(t, 1)).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_keep_columns():
    from pdf2doi_ray.stages.textnorm import canonicalize_urls

    t = pa.table({
        "url": pa.array(["HTTP://A.org:80/x#f", "https://b.org/"]),
        "doc_id": pa.array([7, 8], type=pa.int64()),
    })
    out = canonicalize_urls(_ds(t, 1), keep=("doc_id",)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["url", "canonical_url", "doc_id"]
    assert list(out["canonical_url"]) == ["http://a.org/x", "https://b.org"]
    assert list(out["doc_id"]) == [7, 8]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_grouped_summary_brute(n_blocks):
    from pdf2doi_ray.stages.aggs import grouped_summary

    rng = np.random.default_rng(11)
    keys = [f"t{i % 3}" for i in range(50)]
    vals = rng.uniform(0, 10, size=50)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = grouped_summary(_ds(t, n_blocks), "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)

    vm = np.floor(vals * 1000.0).astype(np.int64)
    for _, r in out.iterrows():
        sel = vm[np.array(keys) == r["k"]]
        assert r["n"] == len(sel)
        assert r["sum_milli"] == sel.sum()
        assert r["min_milli"] == sel.min()
        assert r["max_milli"] == sel.max()
        assert r["avg_milli"] == sel.sum() // len(sel)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_curate_quality_dedup_brute(n_blocks):
    import hashlib

    from pdf2doi_ray.pipelines.curate import curate_quality_dedup

    good = "the and of to is it " * 5            # 30 tokens, all stopwords
    short = "the and of"                          # < 20 tokens -> dropped
    nostop = "xx yy zz " * 10                     # no stopwords -> dropped
    texts = [good, good, short, nostop, good + "tail", short]
    t = pa.table({"doc_id": pa.array(list(range(6)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = curate_quality_dedup(_ds(t, n_blocks)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # survivors: doc 0 (dups 0,1 collapse; 2,3,5 fail the gate), doc 4
    assert list(out["doc_id"]) == [0, 4]
    assert list(out["text_hash"]) == [
        hashlib.md5(good.encode()).hexdigest(),
        hashlib.md5((good + "tail").encode()).hexdigest()]
    # trailing-space split yields an empty final token counted by the
    # SQL convention len(string_split(...)); parity with that is what the
    # oracle checks — here just assert both rows kept a positive count
    assert (out["n_tokens"] > 20).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_value_quantiles_milli_brute(n_blocks):
    from pdf2doi_ray.stages.aggs import value_quantiles_milli

    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 5, size=200)
    t = pa.table({"v": pa.array(vals)})
    out = value_quantiles_milli(_ds(t, n_blocks), "v")
    vm = np.sort(np.floor(vals * 1000.0).astype(np.int64))
    for q, got in zip(out["q_permille"], out["value"]):
        rank = -(-q * 200 // 1000)
        assert got == vm[rank - 1]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 5])
def test_uniform_sample_k_brute(n_blocks):
    from pdf2doi_ray.stages.corpus import HASH_MULT, uniform_sample_k

    ids = np.arange(300, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    out = uniform_sample_k(_ds(t, n_blocks), k=10)
    h = ((ids.astype(np.uint64) % np.uint64(2**32))
         * np.uint64(HASH_MULT)) % np.uint64(2**32)
    order = np.lexsort((ids, h.astype(np.int64)))[:10]
    assert list(out["doc_id"]) == list(ids[order])
    assert list(out["rank"]) == list(range(1, 11))
    # exactly-k even when k > block count x per-block survivors would allow
    assert len(out) == 10


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_embedding_centroids_brute(n_blocks):
    from pdf2doi_ray.stages.similarity import embedding_centroids

    rng = np.random.default_rng(5)
    n, d = 30, 8
    vecs = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    t = pa.table({
        "label": pa.array(labels, type=pa.int32()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    out = embedding_centroids(_ds(t, n_blocks)).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    vm = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    assert len(out) == 3 * d
    for lb in range(3):
        sel = vm[labels == lb]
        want = sel.sum(axis=0) // len(sel)       # numpy // floors (signed)
        got = out[out["label"] == lb].sort_values("dim")
        assert list(got["centroid_micro"]) == list(want)
        assert (got["n"] == len(sel)).all()


def test_canon_url_fuzz_vs_duckdb():
    """Differential fuzz: the Ray kernel and the oracle regex chain must
    agree byte-for-byte on randomized messy urls (RE2 both sides)."""
    import duckdb

    from pdf2doi_ray.stages.textnorm import _canon_url_kernel

    rng = np.random.default_rng(17)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://", ""]
    hosts = ["A.Example.ORG", "b.example.org", "WWW.x.Y"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/q", "/a/", "/a?Q=V", "/%2F.pdf"]
    frags = ["", "#f", "#a/b#c"]
    urls = ["".join([schemes[rng.integers(4)], hosts[rng.integers(3)],
                     ports[rng.integers(4)], paths[rng.integers(6)],
                     frags[rng.integers(3)]]) for _ in range(300)]
    got = _canon_url_kernel(pa.array(urls, type=pa.string())).to_pylist()
    con = duckdb.connect()
    sql = """
    WITH s AS (SELECT regexp_replace(?, '(?s)#.*$', '') AS nofrag),
    p AS (SELECT regexp_replace(regexp_replace(
              lower(regexp_replace(nofrag, '(?s)^([^/]*://[^/]*).*$', '\\1')),
              '^(http://[^/:]*):80$', '\\1'),
              '^(https://[^/:]*):443$', '\\1') AS prefix,
          CASE WHEN regexp_matches(nofrag, '^[^/]*://')
               THEN regexp_replace(nofrag, '^[^/]*://[^/]*', '')
               ELSE '' END AS suffix
          FROM s)
    SELECT regexp_replace(prefix || suffix, '(?s)^([^/]*://[^/]*)/$', '\\1')
    FROM p"""
    want = [con.execute(sql, [u]).fetchone()[0] for u in urls]
    assert got == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_first_per_key_sorted_matches_aggregate(n_blocks):
    from pdf2doi_ray.stages.dedup import first_per_key, first_per_key_sorted

    rng = np.random.default_rng(13)
    keys = [f"h{rng.integers(60):03d}" for _ in range(500)]
    ids = rng.permutation(500).astype(np.int64)
    extra = rng.integers(0, 1000, size=500).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "doc_id": pa.array(ids),
                  "x": pa.array(extra)})

    agg = first_per_key(_ds(t, n_blocks), "k", "doc_id").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    srt = first_per_key_sorted(_ds(t, n_blocks), "k", ["doc_id", "x"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(srt["k"]) == list(agg["k"])
    assert list(srt["doc_id"]) == list(agg["doc_id"])
    # independent brute-force for the second min column
    import collections
    want = collections.defaultdict(lambda: 10**9)
    for k, x in zip(keys, extra):
        want[k] = min(want[k], int(x))
    assert {k: int(x) for k, x in zip(srt["k"], srt["x"])} == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_first_per_key_sorted_empty():
    from pdf2doi_ray.stages.dedup import first_per_key_sorted

    t = pa.table({"k": pa.array([], type=pa.string()),
                  "doc_id": pa.array([], type=pa.int64())})
    out = first_per_key_sorted(_ds(t, 1), "k", ["doc_id"]).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_driver_merge_ops_tolerate_empty_input():
    """Fully-empty datasets yield SCHEMALESS frames from to_pandas(); every
    driver-merge operator must return an empty result, not KeyError."""
    import ray.data

    from pdf2doi_ray.stages.corpus import top_bigrams, uniform_sample_k
    from pdf2doi_ray.stages.sketch import heavy_hitters
    from pdf2doi_ray.stages.textstats import top_docs_by_tokens

    e = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    assert len(top_docs_by_tokens(e, k=5)) == 0
    assert len(top_bigrams(e, k=5)) == 0
    assert len(uniform_sample_k(e, k=5)) == 0
    tok = ray.data.from_arrow(pa.table({
        "token": pa.array([], type=pa.string())}))
    assert len(heavy_hitters(tok, "token")) == 0


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_excludes_nulls_from_data_and_marker():
    import ray.data

    from pdf2doi_ray.stages.sketch import heavy_hitters

    t = pa.table({"token": pa.array(["a", None, "a", "b", None, None])})
    out = heavy_hitters(ray.data.from_arrow(t).repartition(2), "token",
                        m=8, k=5)
    # nulls are excluded (count-of-value semantics) and never conflated
    # with the block-marker sentinel rows
    assert dict(zip(out["value"], out["est_count"])) == {"a": 2, "b": 1}
    assert (out["err_bound"] == 0).all()


def test_milli_rejects_nulls_loudly():
    from pdf2doi_ray.stages.windowfns import _milli

    with pytest.raises(ValueError, match="null/NaN"):
        _milli(pa.array([1.0, None, 2.0], type=pa.float64()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_rollup_counts_brute(n_blocks):
    import collections

    from pdf2doi_ray.stages.aggs import rollup_counts

    rng = np.random.default_rng(41)
    a = [f"a{rng.integers(3)}" for _ in range(80)]
    b = [f"b{rng.integers(2)}" for _ in range(80)]
    t = pa.table({"x": pa.array(a), "y": pa.array(b)})
    out = rollup_counts(_ds(t, n_blocks), "x", "y").to_pandas()

    fine = collections.Counter(zip(a, b))
    mid = collections.Counter(a)
    got = {(r.x if isinstance(r.x, str) else None,
            r.y if isinstance(r.y, str) else None): r.n
           for r in out.itertuples()}
    want = {(k[0], k[1]): v for k, v in fine.items()}
    want.update({(k, None): v for k, v in mid.items()})
    want[(None, None)] = 80
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_cube_counts_brute():
    import collections

    from pdf2doi_ray.stages.aggs import cube_counts

    rng = np.random.default_rng(47)
    a = [f"a{rng.integers(3)}" for _ in range(60)]
    b = [f"b{rng.integers(2)}" for _ in range(60)]
    t = pa.table({"x": pa.array(a), "y": pa.array(b)})
    out = cube_counts(_ds(t, 3), "x", "y").to_pandas()
    got = {(r.x if isinstance(r.x, str) else None,
            r.y if isinstance(r.y, str) else None): r.n
           for r in out.itertuples()}
    want = dict(collections.Counter(zip(a, b)))
    want.update({(k, None): v for k, v in collections.Counter(a).items()})
    want.update({(None, k): v for k, v in collections.Counter(b).items()})
    want[(None, None)] = 60
    assert got == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_weighted_sample_brute(n_blocks):
    from pdf2doi_ray.stages.corpus import knuth_hash32, weighted_sample

    rng = np.random.default_rng(53)
    counts = rng.integers(1, 400, size=200)
    texts = [" ".join(["w"] * int(c)) for c in counts]
    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    out = weighted_sample(_ds(t, n_blocks), weight_cap=200).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    n_tok = np.array([len(tx.split(" ")) for tx in texts])
    w = np.minimum(n_tok, 200)
    h = knuth_hash32(pa.array(ids)).astype(np.int64)
    keep = (h % 200) < w
    assert list(out["doc_id"]) == list(ids[keep])
    assert list(out["weight"]) == list(w[keep])
    # docs at/above the cap always survive (p = 1)
    assert set(ids[n_tok >= 200]) <= set(out["doc_id"])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_value_quantiles_by_group_brute(n_blocks):
    from pdf2doi_ray.stages.aggs import value_quantiles_milli_by_group

    rng = np.random.default_rng(59)
    keys = [f"g{i % 3}" for i in range(90)]
    vals = rng.uniform(0, 8, size=90)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = value_quantiles_milli_by_group(_ds(t, n_blocks), "k", "v",
                                         quantiles_permille=(500, 900))
    vm = np.floor(vals * 1000.0).astype(np.int64)
    karr = np.array(keys)
    for _, r in out.iterrows():
        sel = np.sort(vm[karr == r["k"]])
        rank = -(-r["q_permille"] * len(sel) // 1000)
        assert r["value"] == sel[rank - 1]
    assert len(out) == 6


@pytest.mark.usefixtures("ray_session")
def test_rollup_sentinel_collision_raises():
    import pytest as _pytest

    from pdf2doi_ray.stages.aggs import _ROLLUP_ALL, rollup_counts

    t = pa.table({"x": pa.array(["ok", _ROLLUP_ALL]),
                  "y": pa.array(["a", "b"])})
    with _pytest.raises(Exception, match="sentinel"):
        rollup_counts(_ds(t, 1), "x", "y").to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_top_bigram_repetition(n_blocks):
    from pdf2doi_ray.stages.corpus import top_bigram_repetition

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "buy now buy now buy now buy now",   # "buy now" 4x, "now buy" 3x
            "the quick brown fox jumps",          # all bigrams distinct
            "one",                                # no bigrams
            "",                                   # empty
        ]),
    })
    out = top_bigram_repetition(_ds(t, n_blocks)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 1: 7 bigrams, top=4 -> 571 permille -> filtered
    assert out["n_bigrams"].tolist() == [7, 4, 0, 0]
    assert out["top_bigram_count"].tolist() == [4, 1, 0, 0]
    assert out["top_bigram_permille"].tolist() == [571, 250, 0, 0]
    assert out["keep"].tolist() == [False, False, True, True]
    # custom threshold flips doc 2
    out2 = top_bigram_repetition(_ds(t, n_blocks),
                                 keep_below_permille=600).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2["keep"].tolist() == [True, True, True, True]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_contamination_flags(n_blocks):
    from pdf2doi_ray.stages.corpus import contamination_flags

    bench_text = "a b c d e f g h i j"           # grams: a..h, b..i, c..j
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 97], type=pa.int64()),
        "text": pa.array([
            bench_text,                           # benchmark doc (0 % 97)
            "x a b c d e f g h y b c d e f g h i z",  # hits a..h and b..i
            "totally clean text with no overlap at all here",
            "q r s t u v w x y z",                # benchmark doc (97 % 97)
        ]),
    })
    out = contamination_flags(_ds(t, n_blocks)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # benchmark docs 0 and 97 are excluded from the output
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_contaminated_grams"].tolist() == [2, 0]
    assert out["contaminated"].tolist() == [True, False]


@pytest.mark.usefixtures("ray_session")
def test_contamination_short_and_empty_benchmark():
    from pdf2doi_ray.stages.corpus import contamination_flags

    # no doc_id % 97 == 0 rows at all -> nothing can be contaminated
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a b c d e f g h i", "short one"]),
    })
    out = contamination_flags(_ds(t, 1)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [False, False]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_distinct_setops(n_blocks):
    from pdf2doi_ray.stages.setops import distinct_except, distinct_intersect

    a = pa.table({"k": pa.array([1, 1, 2, 3, 5, 5, 7], type=pa.int64())})
    b = pa.table({"k": pa.array([2, 3, 3, 4, 9], type=pa.int64())})
    inter = sorted(distinct_intersect(_ds(a, n_blocks), _ds(b, n_blocks),
                                      "k").to_pandas()["k"].tolist())
    exc = sorted(distinct_except(_ds(a, n_blocks), _ds(b, n_blocks),
                                 "k").to_pandas()["k"].tolist())
    assert inter == [2, 3]
    assert exc == [1, 5, 7]
    # EXCEPT is asymmetric
    exc_ba = sorted(distinct_except(_ds(b, n_blocks), _ds(a, n_blocks),
                                    "k").to_pandas()["k"].tolist())
    assert exc_ba == [4, 9]


@pytest.mark.usefixtures("ray_session")
def test_distinct_setops_null_key_raises():
    from pdf2doi_ray.stages.setops import distinct_intersect

    a = pa.table({"k": pa.array([1, None], type=pa.int64())})
    b = pa.table({"k": pa.array([1], type=pa.int64())})
    with pytest.raises(Exception, match="contains nulls"):
        distinct_intersect(_ds(a, 1), _ds(b, 1), "k").to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_grouped_mode_with_ties(n_blocks):
    from pdf2doi_ray.stages.aggs import grouped_mode

    t = pa.table({
        "user_id": pa.array([1]*5 + [2]*4 + [3]*1, type=pa.int64()),
        "event_type": pa.array(
            ["click", "click", "view", "view", "buy",    # tie click/view x2
             "view", "view", "view", "click",            # clear winner view
             "zzz"]),                                    # singleton group
    })
    out = grouped_mode(_ds(t, n_blocks), "user_id", "event_type") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    # user 1: click=2, view=2 tie -> lexicographically smallest "click"
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["event_type"].tolist() == ["click", "view", "zzz"]
    assert out["n_events"].tolist() == [2, 3, 1]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks,shards", [(1, 1), (4, 1), (4, 8)])
def test_grouped_string_agg_blocks(n_blocks, shards):
    import pandas as pd

    from pdf2doi_ray.stages.aggs import grouped_string_agg

    rng = np.random.default_rng(31)
    n = 200
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(rng.integers(0, 10**6, size=n),
                                      unit="s").astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 6, size=n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["click", "view", "buy"])[rng.integers(0, 3, size=n)]),
    })
    out = grouped_string_agg(_ds(t, n_blocks), stitch_shards=shards) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = df.groupby("user_id").agg(
        n_events=("event_type", "size"),
        path=("event_type", ",".join)).reset_index()
    assert out["user_id"].tolist() == want["user_id"].tolist()
    assert out["n_events"].tolist() == want["n_events"].tolist()
    assert out["path"].tolist() == want["path"].tolist()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_pivot_counts(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.pivot import pivot_counts

    rng = np.random.default_rng(31)
    n = 200
    cats = ["a", "b", "c"]
    t = pa.table({
        "g": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
        "cat": pa.array(
            [["a", "b", "c", "zz"][i] for i in rng.integers(0, 4, size=n)]),
    })
    out = (pivot_counts(_ds(t, n_blocks), "g", "cat", cats).to_pandas()
           .sort_values("g").reset_index(drop=True))
    df = t.to_pandas()
    want = (df[df["cat"].isin(cats)]
            .pivot_table(index="g", columns="cat", aggfunc="size",
                         fill_value=0)
            .reindex(columns=cats, fill_value=0)
            .reindex(sorted(df["g"].unique()), fill_value=0))
    assert out["g"].tolist() == list(want.index)
    for c in cats:
        assert out[f"n_{c}"].tolist() == want[c].tolist(), c
    # 'zz' never appears as a column; groups with only 'zz' rows still
    # appear (they were seen), with all-zero counts
    assert set(out.columns) == {"g", "n_a", "n_b", "n_c"}


@pytest.mark.usefixtures("ray_session")
def test_pivot_counts_null_key_raises():
    from pdf2doi_ray.stages.pivot import pivot_counts

    t = pa.table({
        "g": pa.array([1, None], type=pa.int64()),
        "cat": pa.array(["a", "a"]),
    })
    with pytest.raises(Exception, match="null"):
        pivot_counts(_ds(t, 1), "g", "cat", ["a"]).to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_value_histogram_milli(n_blocks):
    from pdf2doi_ray.stages.aggs import value_histogram_milli

    vals = np.array([-0.5, 0.0, 0.049, 0.05, 0.75, 0.999, 1.0, 2.5])
    t = pa.table({"v": pa.array(vals)})
    out = value_histogram_milli(_ds(t, n_blocks), "v",
                                lo_milli=0, hi_milli=1000, n_bins=10)
    got = dict(zip(out["bin"], out["n"]))
    # -0.5 underflows; 0.0/0.049 -> bin 0; 0.05 -> bin 0? floor(50*10/1000)=0
    # (0.05*1000=50, 50*10//1000=0); 0.75 -> 7; 0.999 -> 9; 1.0, 2.5 overflow
    assert got[-1] == 1 and got[0] == 3 and got[7] == 1 and got[9] == 1
    assert got[10] == 2
    assert sum(got.values()) == len(vals)
    assert len(out) == 12                       # every bin present
    row0 = out[out["bin"] == 0].iloc[0]
    assert row0["bin_lo_milli"] == 0 and row0["bin_hi_milli"] == 100
    # open tail edges encode as int64 extremes (plain-int64 contract —
    # NULL edges would desync the frame dtype from the float64-decayed
    # SQL side); dtype itself pinned to non-nullable int64
    i64 = np.iinfo(np.int64)
    assert (out[out["bin"] == -1]["bin_lo_milli"] == i64.min).all()
    assert (out[out["bin"] == 10]["bin_hi_milli"] == i64.max).all()
    assert str(out["bin_lo_milli"].dtype) == "int64"
    assert str(out["bin_hi_milli"].dtype) == "int64"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_funnel_conversion(n_blocks):
    import pandas as pd

    from pdf2doi_ray.stages.aggs import funnel_conversion

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 4], type=pa.int64()),
        "event_type": pa.array(["click", "purchase", "purchase",
                                "purchase", "click", "click", "view"]),
        "ts": pa.array(pd.to_datetime([10, 5, 20, 1, 8, 30, 2], unit="s")
                       .astype("datetime64[us]")),
    })
    out = (funnel_conversion(_ds(t, n_blocks), "click", "purchase")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # user 1: purchase@5 is BEFORE the click@10 — only @20 converts;
    # user 2's only purchase precedes the click; user 4 never entered
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["first_ts_us"].tolist() == [10_000_000, 8_000_000,
                                           30_000_000]
    assert out["converted"].tolist() == [True, False, False]
    assert out["conv_ts_us"].tolist()[0] == 20_000_000
    assert out["conv_ts_us"].isna().tolist() == [False, True, True]


@pytest.mark.usefixtures("ray_session")
def test_funnel_conversion_degenerate_inputs():
    import pandas as pd

    from pdf2doi_ray.stages.aggs import funnel_conversion

    clicks_only = pa.table({
        "user_id": pa.array([1], type=pa.int64()),
        "event_type": pa.array(["click"]),
        "ts": pa.array(pd.to_datetime([1], unit="s")
                       .astype("datetime64[us]")),
    })
    out = funnel_conversion(_ds(clicks_only, 1), "click",
                            "purchase").to_pandas()
    assert out["converted"].tolist() == [False]

    no_entry = clicks_only.set_column(1, "event_type", pa.array(["view"]))
    out2 = funnel_conversion(_ds(no_entry, 1), "click",
                             "purchase").to_pandas()
    assert len(out2) == 0
    # (Ray's to_pandas drops columns on a fully-empty dataset; the arrow
    # schema the operator builds is asserted via the non-empty cases)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 4])
def test_contamination_distributed_matches_broadcast(n_blocks):
    """The no-broadcast (hash-join) decontamination variant is exact: same
    output as the broadcast variant on a fixture with multi-hit docs,
    duplicate grams within one doc (counted per occurrence), clean docs,
    and a benchmark-only doc — invariant under block count."""
    from pdf2doi_ray.stages.corpus import (contamination_flags,
                                           contamination_flags_distributed)

    bench_text = "a b c d e f g h i j"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 97], type=pa.int64()),
        "text": pa.array([
            bench_text,
            "x a b c d e f g h y b c d e f g h i z",   # two distinct hits
            "a b c d e f g h a b c d e f g h w q a b c d e f g h",
            "totally clean text with no overlap at all here",
            "q r s t u v w x y z",
        ]),
    })
    got = contamination_flags_distributed(_ds(t, n_blocks),
                                          num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = contamination_flags(_ds(t, n_blocks)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.to_dict("records") == want.to_dict("records")
    assert got["doc_id"].tolist() == [1, 2, 3]
    # doc 2 repeats gram "a b c d e f g h" three times -> three occurrences
    assert got["n_contaminated_grams"].tolist() == [2, 3, 0]
    assert got["contaminated"].tolist() == [True, True, False]


@pytest.mark.usefixtures("ray_session")
def test_contamination_distributed_empty_benchmark():
    from pdf2doi_ray.stages.corpus import contamination_flags_distributed

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a b c d e f g h i", "short one"]),
    })
    out = contamination_flags_distributed(_ds(t, 1),
                                          num_partitions=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["contaminated"].tolist() == [False, False]


@pytest.mark.usefixtures("ray_session")
def test_event_transitions_tiny_blocks_match_pandas():
    """Boundary stress: 40-way repartition over 200 rows forces nearly
    every adjacent pair to straddle a block edge; the stitch must
    reconstruct exactly the single-partition answer and the pandas
    reference."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import event_transitions

    rng = np.random.default_rng(7)
    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**6, n), unit="s").astype("datetime64[us]"),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "event_type": rng.choice(list("abcd"), n),
    })
    want = (df.sort_values(["user_id", "ts", "event_id"])
            .assign(nxt=lambda d: d.groupby("user_id")["event_type"]
                    .shift(-1))
            .dropna(subset=["nxt"])
            .groupby(["event_type", "nxt"]).size().reset_index(name="n")
            .rename(columns={"event_type": "from_type", "nxt": "to_type"})
            .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    for parts in (1, 40):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (event_transitions(ds).to_pandas()
               .sort_values(["from_type", "to_type"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64"}), want.astype({"n": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_event_type_cooccurrence_tiny_blocks_match_pandas():
    """Boundary + duplicate stress: heavy repartition AND duplicated
    (user, type) rows across blocks; the sorted-block dedup + edge
    stitch must reproduce the pandas distinct self-join."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.aggs import event_type_cooccurrence

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n).astype(np.int64),
        "event_type": rng.choice(list("abcde"), n),
    })
    d = df.drop_duplicates()
    m = d.merge(d, on="user_id")
    m = m[m["event_type_x"] < m["event_type_y"]]
    want = (m.groupby(["event_type_x", "event_type_y"]).size()
            .reset_index(name="n_users")
            .rename(columns={"event_type_x": "type_a",
                             "event_type_y": "type_b"})
            .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    for parts in (1, 37):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (event_type_cooccurrence(ds).to_pandas()
               .sort_values(["type_a", "type_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n_users": "int64"}),
            want.astype({"n_users": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_interval_coverage_tiny_blocks_match_bruteforce():
    """Heavy overlap + 40-way repartition: the segmented-cummax sweep
    and the edge stitch must reproduce a brute-force per-user union."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.windows import interval_coverage

    rng = np.random.default_rng(3)
    n = 250
    ts = pd.to_datetime(rng.integers(0, 5000, n), unit="s") \
        .astype("datetime64[us]")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        # mix of zero/negative (dropped) and long (overlapping) spans
        "value": rng.choice([-1.0, 0.0004, 2.0, 30.0, 900.0], n),
    })

    def brute(g):
        s = g["ts"].astype("int64").to_numpy()
        d = np.floor(g["value"].to_numpy() * 1000).astype(np.int64) * 100000
        keep = d > 0
        s, e = s[keep], s[keep] + d[keep]
        iv = sorted(zip(s, e))
        covered, hi = 0, -1
        for a, b in iv:
            a2 = max(a, hi)
            covered += max(b - a2, 0)
            hi = max(hi, b)
        return pd.Series({"covered_us": covered,
                          "n_intervals": int(keep.sum())})

    want = (df.groupby("user_id").apply(brute, include_groups=False)
            .reset_index().astype({"covered_us": "int64",
                                   "n_intervals": "int64"}))
    want = want[want["n_intervals"] > 0].reset_index(drop=True)
    for parts in (1, 40):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (interval_coverage(ds).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"covered_us": "int64", "n_intervals": "int64"}),
            want)


@pytest.mark.usefixtures("ray_session")
def test_group_split_is_leakage_free_and_matches_oracle():
    """Every source maps to exactly one split, and the per-(lang, split)
    counts match the DuckDB md5 oracle."""
    import duckdb
    import pandas as pd
    import ray.data

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = (entrymod.queries()["group_split_stats"](sf).to_pandas()
           .sort_values(["lang", "split"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(entrymod.oracle_sql()["group_split_stats"]).df()
            .sort_values(["lang", "split"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"n_docs": "int64"}),
                                  want.astype({"n_docs": "int64"}))
    # leakage check: per-source split assignment is a pure function of
    # the source string, so distinct (source, split) pairs == sources
    n_src, n_pairs = con.execute("""
      SELECT count(DISTINCT source),
             count(DISTINCT (source,
               CASE WHEN ('0x' || substr(md5(source), 1, 16))::UBIGINT
                         % 1000 < 900 THEN 'train' ELSE 'test' END))
      FROM documents""").fetchone()
    assert n_src == n_pairs


@pytest.mark.usefixtures("ray_session")
def test_zorder_layout_clusters_blocks():
    """The z-sorted output's per-block zone maps must be tight on BOTH
    dimensions: with 8 output blocks over a 64x64 grid, the mean
    per-block x16 range must be far below the unsorted ~full range."""
    import pandas as pd
    import ray
    import ray.data

    from pdf2doi_ray.stages.export import zorder_layout

    rng = np.random.default_rng(5)
    n = 4096
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 64, n).astype(np.int64),
        "value": rng.integers(0, 64, n) / 1000.0,
    })
    out = zorder_layout(ray.data.from_pandas(df).repartition(8)) \
        .repartition(8).materialize()
    spans_x, spans_y = [], []
    lo_prev = -1
    for ref in out.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        z = np.asarray(t["zkey"])
        assert z.min() >= lo_prev  # blocks are globally range-ordered
        lo_prev = z.max()
        spans_x.append(np.ptp(np.asarray(t["x16"])))
        spans_y.append(np.ptp(np.asarray(t["y16"])))
    # random data spans ~63 per dim; z-clustered 8-way blocks must be
    # tighter on average on both dimensions at once
    assert np.mean(spans_x) <= 40 and np.mean(spans_y) <= 40


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_random_vocab_matches_bruteforce():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import inverted_index

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(120)]
    docs = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.integers(1, 12)))
                 for _ in range(400)],
    })
    rows = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        for tok in set(txt.split()):
            rows.setdefault(tok, []).append(int(did))
    want = pd.DataFrame({
        "token": list(rows),
        "df": [len(v) for v in rows.values()],
        "postings": [",".join(str(x) for x in sorted(v)[:8])
                     for v in rows.values()],
    }).sort_values("token").reset_index(drop=True)
    got = (inverted_index(ray.data.from_pandas(docs).repartition(16))
           .to_pandas().sort_values("token").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"df": "int64"}),
                                  want.astype({"df": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_flesch_readability_edge_rows():
    """Empty / punctuation-only / trailing-empty rows exercise the
    reduceat clipping; values match a row-by-row Python reference."""
    import re

    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.textstats import flesch_readability

    texts = ["", "Hello world. How are you?", "!!!", "one",
             "a e i o u y.", "  ", "ends empty", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    def ref(t):
        w = max(sum(1 for x in t.split(" ") if x != ""), 1)
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = len(re.findall(r"[aeiouy]+", t.lower()))
        return (w, s, syl,
                206835 - (1015 * (w * 1000 // s)) // 1000
                - (84600 * (syl * 1000 // w)) // 1000)

    want = pd.DataFrame(
        [(i,) + ref(t) for i, t in enumerate(texts)],
        columns=["doc_id", "n_words", "n_sentences", "n_syllables",
                 "flesch_milli"]).astype("int64")
    got = (ray.data.from_pandas(df).repartition(3)
           .map_batches(flesch_readability, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_token_pairs_blocking_matches_bruteforce():
    """Synthetic typo vocabulary: blocking + verify must find exactly
    the brute-force Levenshtein-1 pairs (incl. rejecting the classic
    shared-bucket ED-2 false candidates like ab/ba)."""
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.corpus import fuzzy_token_pairs

    vocab = ["cat", "cta", "cart", "car", "ca", "act", "dog", "dig",
             "dg", "dogs", "ab", "ba", "hello", "helo", "hell", "x", ""]
    vocab = [v for v in vocab if v]
    rng = np.random.default_rng(2)
    texts = [" ".join(rng.choice(vocab, 6)) for _ in range(100)]
    docs = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                         "text": texts})

    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    used = sorted(set(" ".join(texts).split()))
    want = sorted((a, b) for i, a in enumerate(used)
                  for b in used[i + 1:] if lev(a, b) == 1)
    got = fuzzy_token_pairs(
        ray.data.from_pandas(docs).repartition(7)).to_pandas()
    got_pairs = sorted(map(tuple, got.values))
    assert got_pairs == want and len(want) > 5


@pytest.mark.usefixtures("ray_session")
def test_union_by_name_rejects_type_conflicts():
    import ray.data

    from pdf2doi_ray.stages.setops import union_by_name

    a = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"k": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError, match="conflicting"):
        union_by_name(a, b)


@pytest.mark.usefixtures("ray_session")
def test_host_crawl_gaps_tiny_blocks_and_single_fetch_null():
    import pandas as pd
    import ray.data

    from pdf2doi_ray.stages.skew import host_crawl_gaps

    rng = np.random.default_rng(17)
    n = 120
    hosts = rng.choice([f"h{i}.org" for i in range(7)], n).tolist() \
        + ["lonely.org"]
    ts = np.concatenate([rng.choice(10**6, n, replace=False),
                         [999999]]).astype("int64")
    df = pd.DataFrame({
        "url": [f"https://{h}/p" for h in hosts],
        "warc_ts": pd.to_datetime(ts, unit="s").astype("datetime64[us]"),
    })
    g = df.assign(host=hosts, s=ts).sort_values(["host", "s"])
    gaps = g.groupby("host")["s"].diff().dropna()
    want = (g.groupby("host")
            .agg(n_fetches=("s", "size"))
            .join(gaps.groupby(g["host"]).agg(["min", "max"]))
            .reset_index()
            .rename(columns={"min": "min_gap_s", "max": "max_gap_s"}))
    got = (host_crawl_gaps(ray.data.from_pandas(df).repartition(30))
           .to_pandas().sort_values("host").reset_index(drop=True))
    assert got.loc[got["host"] == "lonely.org", "min_gap_s"].isna().all()
    for _, row in want.iterrows():
        sub = got[got["host"] == row["host"]].iloc[0]
        assert sub["n_fetches"] == row["n_fetches"]
        if row["n_fetches"] > 1:
            assert sub["min_gap_s"] == row["min_gap_s"]
            assert sub["max_gap_s"] == row["max_gap_s"]
