"""Round-4 new operators: exact duplicated-span detection, host blocklist
filter, deterministic shard export (their SQL oracles are exercised by
test_oracle_parity.py; these tests pin semantics the SQL cannot —
brute-force span parity, writer layout, resume skip)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest


def _brute_dup_spans(texts_by_id: dict[int, str], n: int = 5):
    """Independent reference: first (doc,pos) occurrence of each gram."""
    occ = {}
    rows = []
    for d in sorted(texts_by_id):
        toks = texts_by_id[d].split()
        for i in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[i:i + n])
            h = int.from_bytes(
                hashlib.md5(g.encode()).digest()[:8], "big") >> 1
            first = occ.setdefault(h, (d, i))
            rows.append((d, i, h, first == (d, i)))
    return sorted(rows)


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_spans_matches_brute_force():
    import ray.data

    from pdf2doi_ray.stages.corpus import dup_ngram_spans

    texts = {
        0: "a b c d e f g h",               # grams at pos 0..3
        1: "x a b c d e f y",               # shares 'a b c d e' & 'b c d e f'
        2: "a b c d e f g h",               # full duplicate of doc 0
        3: "q r s",                          # too short: no grams
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[k] for k in sorted(texts)],
    })).repartition(3)
    out = dup_ngram_spans(ds, num_partitions=2).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "pos", "gram_hash",
                                 "keep"]].values.tolist()))
    assert got == _brute_dup_spans(texts)
    # the duplicate doc keeps NOTHING (every gram first occurred in doc 0)
    assert not out[out["doc_id"] == 2]["keep"].any()


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_spans_budget_guards():
    import ray.data

    from pdf2doi_ray.stages.corpus import dup_ngram_spans

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1 << 42], type=pa.int64()),
        "text": ["a b c d e f"],
    }))
    with pytest.raises(Exception, match="encoding budget"):
        dup_ngram_spans(ds).materialize()


def _brute_merge_spans(texts_by_id: dict[int, str], n: int = 5):
    """Independent islands reference over the brute span flags: coalesce
    non-first gram positions per doc when the gap is <= n tokens."""
    dups = [(d, p) for d, p, _h, keep in _brute_dup_spans(texts_by_id, n)
            if not keep]
    out, cur = [], None
    for d, p in sorted(dups):
        if cur and cur[0] == d and p - cur[2] <= n:
            cur = (d, cur[1], p, cur[3] + 1)
        else:
            if cur:
                out.append((cur[0], cur[1], cur[2] + n, cur[3]))
            cur = (d, p, p, 1)
    if cur:
        out.append((cur[0], cur[1], cur[2] + n, cur[3]))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_merge_dup_spans_matches_brute_force():
    import ray.data

    from pdf2doi_ray.stages.corpus import merge_dup_spans

    texts = {
        0: "a b c d e f g h",                # all first occurrences
        1: "x a b c d e f y",                # one island of 2 grams
        2: "a b c d e f g h",                # full-dup: one island, 4 grams
        3: "q r s",                          # no grams
        # two SEPARATE islands in one doc: dup grams at pos 1-2, then a
        # fresh 7-token run, then dup grams again (gap > n)
        4: "z a b c d e f z0 z1 z2 z3 z4 z5 z6 a b c d e f",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[k] for k in sorted(texts)],
    })).repartition(4)
    for shards in (1, 3):
        out = merge_dup_spans(ds, num_partitions=2,
                              stitch_shards=shards).to_pandas()
        got = sorted(map(tuple, out[["doc_id", "span_start", "span_end",
                                     "n_grams"]].values.tolist()))
        assert got == _brute_merge_spans(texts)
    assert (4, 1, 7, 2) in got and any(r[0] == 4 and r[1] > 7 for r in got), \
        "doc 4 must produce two disjoint islands"


@pytest.mark.usefixtures("ray_session")
def test_filter_blocked_hosts():
    import ray.data

    from pdf2doi_ray.stages.skew import filter_blocked_hosts

    urls = [f"https://site{i}.example.org/docs/p{i}.html" for i in range(6)]
    ds = ray.data.from_arrow(pa.table({
        "url": urls, "lang": ["en"] * 6}))
    out = filter_blocked_hosts(
        ds, ["site1.example.org", "site4.example.org"]).to_pandas()
    assert sorted(out["host"]) == [f"site{i}.example.org"
                                   for i in (0, 2, 3, 5)]
    assert list(out.columns) == ["url", "lang", "host"]
    # everything blocked -> empty result, no crash
    empty = filter_blocked_hosts(
        ds, [f"site{i}.example.org" for i in range(6)]).count()
    assert empty == 0


@pytest.mark.usefixtures("ray_session")
def test_export_training_shards_stream_layout(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.export import (_shard_hash_vec,
                                           export_training_shards)

    ids = np.arange(200, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "text": [f"doc {i}" for i in ids],
    })).repartition(4)
    out = str(tmp_path / "shards")
    export_training_shards(ds, out, n_shards=8)
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 200
    assert sorted(back["doc_id"]) == list(ids)
    # hive partitioning: shard recovered from the path must equal the hash
    h = _shard_hash_vec(back["doc_id"].to_numpy())
    assert (back["shard"].astype(np.int64) == h % 8).all()
    assert sorted(os.listdir(out)) == sorted(
        f"shard={s}" for s in set(h % 8))


@pytest.mark.usefixtures("ray_session")
def test_export_training_shards_resume_skips_done(tmp_path):
    import ray.data

    from pdf2doi_ray.stages.export import export_training_shards

    ids = np.arange(40, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": [f"d{i}" for i in ids]}))
    out = str(tmp_path / "resume")
    first = export_training_shards(ds, out, n_shards=4, resume=True)
    assert first == [0, 1, 2, 3]
    again = export_training_shards(ds, out, n_shards=4, resume=True)
    assert again == []                       # every shard already stamped
    back = ray.data.read_parquet(
        out, file_extensions=["parquet"]).to_pandas()
    assert sorted(back["doc_id"]) == list(ids)


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_planted_clusters():
    """SemDeDup end-to-end on unambiguous geometry: 4 well-separated
    centers; within each, near-identical members must collapse to the min
    vec_id while a distinct member survives."""
    import ray.data

    from pdf2doi_ray.stages.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    centers = np.eye(4, 8) * 10.0            # far apart in 8-d
    ids, vecs = [], []
    expect_survivors = set()
    vid = 0
    for c in range(4):
        base = centers[c] + rng.normal(0, 0.01, 8)
        group = []
        for m in range(3):                    # 3 near-identical copies
            vecs.append(base + rng.normal(0, 1e-4, 8))
            group.append(vid)
            ids.append(vid)
            vid += 1
        expect_survivors.add(min(group))
        # one genuinely different member of the same k-means cluster
        # (same center, orthogonal-ish offset -> cosine far below 0.95)
        other = centers[c] + rng.normal(0, 0.01, 8)
        other[(c + 5) % 8] += 9.0
        vecs.append(other)
        expect_survivors.add(vid)
        ids.append(vid)
        vid += 1
    # seeds: kmeans_fixed requires vec_id 0..k-1 -> k=4 seeds are the
    # first four rows (one per planted cluster is NOT needed; Lloyd's
    # iterations separate them from any start given the 10x gaps)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    out = semantic_dedup(ray.data.from_arrow(t).repartition(3),
                         k=4, iters=8, threshold=0.95)
    got = set(out.to_pandas()["vec_id"])
    assert got == expect_survivors, (sorted(got),
                                     sorted(expect_survivors))


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_no_dups_is_identity():
    import ray.data

    from pdf2doi_ray.stages.similarity import semantic_dedup

    rng = np.random.RandomState(9)
    vecs = rng.normal(0, 1, (12, 6))          # random: no cosine >= 0.95
    t = pa.table({
        "vec_id": pa.array(np.arange(12), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    out = semantic_dedup(ray.data.from_arrow(t), k=3, iters=4,
                         threshold=0.95).to_pandas()
    assert sorted(out["vec_id"]) == list(range(12))


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_rewrite():
    import ray.data

    from pdf2doi_ray.stages.corpus import remove_dup_spans

    texts = {
        0: "a b c d e f g h",
        1: "x a b c d e f y",               # middle 7 tokens covered
        2: "a b c d e f g h",               # full duplicate -> empty
        3: "q r s",                          # short: untouched
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[k] for k in sorted(texts)],
    })).repartition(2)
    out = remove_dup_spans(ds, num_partitions=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "text_deduped"] == "a b c d e f g h"
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[1, "text_deduped"] == "x y"
    assert out.loc[1, "n_removed"] == 6
    assert out.loc[2, "text_deduped"] == ""
    assert out.loc[2, "n_removed"] == 8
    assert out.loc[3, "text_deduped"] == "q r s"
    assert out.loc[3, "n_removed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_clean_corpus_identity():
    import ray.data

    from pdf2doi_ray.stages.corpus import remove_dup_spans

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": ["p q r s t u", "u t s r q p"],   # no shared 5-gram
    }))
    out = remove_dup_spans(ds).to_pandas().set_index("doc_id").sort_index()
    assert (out["n_removed"] == 0).all()
    assert out.loc[0, "text_deduped"] == "p q r s t u"


def _brute_remove_spans(texts_by_id: dict[int, str], n: int = 5):
    occ = {}
    for d in sorted(texts_by_id):
        toks = texts_by_id[d].split()
        for i in range(max(len(toks) - n + 1, 0)):
            occ.setdefault(" ".join(toks[i:i + n]), (d, i))
    out = {}
    for d in sorted(texts_by_id):
        toks = texts_by_id[d].split()
        covered = [False] * len(toks)
        for i in range(max(len(toks) - n + 1, 0)):
            if occ[" ".join(toks[i:i + n])] != (d, i):
                for j in range(i, i + n):
                    covered[j] = True
        out[d] = (" ".join(t for t, c in zip(toks, covered) if not c),
                  sum(covered))
    return out


@pytest.mark.usefixtures("ray_session")
def test_remove_dup_spans_fuzz_vs_brute_force():
    """Seeded differential fuzz: tiny vocab + short docs force heavy
    cross-document gram collisions, overlapping spans and whole-doc
    wipeouts; engine must match the naive reference on every doc."""
    import ray.data

    from pdf2doi_ray.stages.corpus import remove_dup_spans

    rng = np.random.RandomState(1234)
    vocab = [f"w{i}" for i in range(7)]      # tiny: collisions guaranteed
    texts = {}
    for d in range(60):
        m = rng.randint(3, 18)
        texts[d] = " ".join(vocab[rng.randint(7)] for _ in range(m))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": [texts[k] for k in sorted(texts)],
    })).repartition(5)
    out = remove_dup_spans(ds, num_partitions=2).to_pandas() \
        .set_index("doc_id").sort_index()
    want = _brute_remove_spans(texts)
    assert len(out) == len(texts)
    for d, (wt, wr) in want.items():
        assert out.loc[d, "text_deduped"] == wt, d
        assert out.loc[d, "n_removed"] == wr, d


@pytest.mark.usefixtures("ray_session")
def test_quality_model_scorer_task_and_actor_paths_agree():
    import ray.data

    from pdf2doi_ray.stages.inference import (N_BUCKETS, QualityModelScorer,
                                              score_quality_model, _weights)

    texts = ["good tokens here", "bad", "", "x y z good good"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()), "text": texts}))
    task_out = score_quality_model(ds).to_pandas() \
        .set_index("doc_id").sort_index()
    actor_out = score_quality_model(ds, concurrency=1).to_pandas() \
        .set_index("doc_id").sort_index()
    pd_testing_cols = ["score", "keep"]
    assert (task_out[pd_testing_cols] == actor_out[pd_testing_cols]) \
        .all().all()
    # independent scalar recompute
    w = _weights()
    for d, s in enumerate(texts):
        want = sum(int(w[int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:8], "big") % N_BUCKETS])
            for tok in s.split())
        assert task_out.loc[d, "score"] == want, d
        assert bool(task_out.loc[d, "keep"]) == (want > 0), d


@pytest.mark.usefixtures("ray_session")
def test_large_volume_orders_rejects_fractional_quantities():
    import ray.data

    from pdf2doi_ray.stages.joins import large_volume_orders

    li = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_quantity": pa.array([1.5], type=pa.float64()),
    }))
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array([0], type=pa.timestamp("us")),
        "o_totalprice": pa.array([10.0], type=pa.float64()),
    }))
    cust = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1], type=pa.int64()),
        "c_name": ["a"],
    }))
    with pytest.raises(Exception, match="non-integral quantity"):
        large_volume_orders(cust, orders, li, qty_threshold=0)


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary_empty_window_returns_typed_empty():
    import datetime

    import ray.data

    from pdf2doi_ray.stages.aggs import pricing_summary

    li = ray.data.from_arrow(pa.table({
        "l_returnflag": ["N"], "l_linestatus": ["O"],
        "l_quantity": pa.array([3.0]), "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.05]), "l_tax": pa.array([0.02]),
        "l_shipdate": pa.array([datetime.datetime(1998, 1, 1)],
                               type=pa.timestamp("us")),
    }))
    out = pricing_summary(li, cutoff_us=datetime.datetime(1990, 1, 1))
    assert len(out) == 0
    assert list(out.columns)[:2] == ["l_returnflag", "l_linestatus"]
    full = pricing_summary(li, cutoff_us=datetime.datetime(1999, 1, 1))
    assert len(full) == 1 and int(full["sum_qty"][0]) == 3
    # charge = 10·0.95·1.02 = 9.69 → 9690 milli, floor-exact
    assert int(full["sum_charge_milli"][0]) == 9690


@pytest.mark.usefixtures("ray_session")
def test_nation_pair_volume_survives_supplierless_nation():
    """A nation with zero suppliers leaves the lineitem side of the fact
    join FULLY empty — the sentinel union must keep the hash join alive
    and yield an empty result instead of the schema-less-side crash."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import nation_pair_volume

    sf = "/root/testdata/sf0.001"
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = ray.data.read_parquet(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = ray.data.read_parquet(f"{sf}/nation.parquet")
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])
    # sf0.001 has suppliers only in nations {3,8,12,13,15,18,19,20,21,24}
    out = nation_pair_volume(
        cust, supp, nation, orders, li,
        nation_a="NATION_5", nation_b="NATION_17",
        start_us=datetime.datetime(1996, 1, 1),
        end_us=datetime.datetime(1998, 1, 1), num_partitions=2)
    assert len(out) == 0
    assert list(out.columns) == ["supp_nation", "cust_nation", "l_year",
                                 "revenue_milli"]


@pytest.mark.usefixtures("ray_session")
def test_json_field_stats_counts_missing_and_negative():
    import ray.data

    from pdf2doi_ray.stages.aggs import json_field_stats

    ev = ray.data.from_arrow(pa.table({
        "event_type": ["a", "a", "a", "b", "b"],
        "props": ['{"k": 7}', '{"j": 1}', '{ "k" : -3 }',
                  '{"k": 10}', 'not json'],
    })).repartition(2)
    out = json_field_stats(ev).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert out["n_present"].tolist() == [2, 1]
    assert out["n_missing"].tolist() == [1, 1]
    assert out["sum_field"].tolist() == [4, 10]
    assert out["min_field"].tolist() == [-3, 10]
    assert out["max_field"].tolist() == [7, 10]
