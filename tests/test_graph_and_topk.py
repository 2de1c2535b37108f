"""Distributed connected components (dedup clustering) and the
sort-free global top-k."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_connected_components_basic():
    import ray.data

    from pdf2doi_ray.stages.graph import connected_components

    # two clusters {1,2,3,9} (via chain) and {5,6}; 3-hop chain 1-2-3-9
    pairs = pa.table({
        "doc_a": pa.array([1, 2, 3, 5], type=pa.int64()),
        "doc_b": pa.array([2, 3, 9, 6], type=pa.int64()),
    })
    out = connected_components(
        ray.data.from_arrow(pairs).repartition(2)).to_pandas()
    got = dict(zip(out["node"].astype(int), out["component"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_long_chain_converges():
    import ray.data

    from pdf2doi_ray.stages.graph import connected_components

    # a 12-node path: worst-case diameter for label propagation
    a = list(range(100, 111))
    b = [x + 1 for x in a]
    pairs = pa.table({"doc_a": pa.array(a, type=pa.int64()),
                      "doc_b": pa.array(b, type=pa.int64())})
    out = connected_components(ray.data.from_arrow(pairs)).to_pandas()
    assert set(out["component"].astype(int)) == {100}
    assert len(out) == 12


@pytest.mark.usefixtures("ray_session")
def test_connected_components_chain_converges_in_log_rounds():
    import ray.data

    from pdf2doi_ray.stages.graph import connected_components

    # 64-node path, diameter 63: plain min-label propagation needs ~62
    # rounds; pointer jumping doubles the known distance each round, so
    # log2(64)=6 rounds reach the minimum and one more detects the
    # fixpoint.  max_iters=7 would RAISE without the jump shortcut.
    a = list(range(0, 63))
    b = [x + 1 for x in a]
    pairs = pa.table({"doc_a": pa.array(a, type=pa.int64()),
                      "doc_b": pa.array(b, type=pa.int64())})
    out = connected_components(ray.data.from_arrow(pairs).repartition(4),
                               max_iters=7).to_pandas()
    assert len(out) == 64
    assert set(out["component"].astype(int)) == {0}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_raises_past_iteration_bound():
    import ray.data

    from pdf2doi_ray.stages.graph import connected_components

    a = list(range(0, 8))
    b = [x + 1 for x in a]
    pairs = pa.table({"doc_a": pa.array(a, type=pa.int64()),
                      "doc_b": pa.array(b, type=pa.int64())})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ray.data.from_arrow(pairs), max_iters=2)


@pytest.mark.usefixtures("ray_session")
def test_top_docs_by_tokens_matches_sorted():
    import ray.data

    from pdf2doi_ray.stages.textstats import top_docs_by_tokens

    rng = np.random.RandomState(3)
    texts = [" ".join(["w"] * int(n)) for n in rng.randint(1, 200, size=300)]
    t = pa.table({"doc_id": pa.array(np.arange(300), type=pa.int64()),
                  "text": pa.array(texts)})
    out = top_docs_by_tokens(ray.data.from_arrow(t).repartition(5), k=10)
    n = np.array([len(x.split(" ")) for x in texts])
    order = np.lexsort((np.arange(300), -n))[:10]
    assert out["doc_id"].tolist() == list(order)
    assert out["n_tokens"].tolist() == n[order].tolist()
    assert out["rank"].tolist() == list(range(1, 11))


@pytest.mark.usefixtures("ray_session")
def test_pagerank_fixed_matches_numpy_golden():
    import ray.data

    from pdf2doi_ray.stages.graph import pagerank_fixed

    # deterministic 12-node directed graph, self-loops removed; multi-block
    # edges exercise the per-batch degree partials + groupby merge
    n = 12
    src = np.repeat(np.arange(n), 2)
    dst = np.concatenate([[(i * 5 + 1) % n, (i * 3 + 2) % n]
                          for i in range(n)])
    keep = src != dst
    src, dst = src[keep], dst[keep]

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64())})).repartition(3)
    nodes = ray.data.from_arrow(pa.table({
        "node": pa.array(np.arange(n), type=pa.int64())})).repartition(2)

    # independent golden: same exact-integer recurrence in pure numpy
    scale, damp = 1_000_000, 85
    base = (scale * (100 - damp)) // 100
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, scale, dtype=np.int64)
    for _ in range(3):
        contrib = (r[src] * damp) // (100 * outdeg[src])
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib)
        r = base + s

    # both execution modes must agree bit-for-bit with the golden
    for mode in ("broadcast", "shuffle"):
        out = pagerank_fixed(edges, nodes, n_iters=3, mode=mode).to_pandas()
        out = out.sort_values("node").reset_index(drop=True)
        assert (out["node"].to_numpy() == np.arange(n)).all(), mode
        assert (out["rank_micro"].to_numpy() == r).all(), mode


@pytest.mark.usefixtures("ray_session")
def test_pagerank_dangling_and_isolated_nodes():
    import ray.data

    from pdf2doi_ray.stages.graph import pagerank_fixed

    # 1 -> 2 -> 3 (3 is dangling: its mass drops); 4 is isolated (base only)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2], type=pa.int64()),
        "dst": pa.array([2, 3], type=pa.int64())}))
    nodes = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 2, 3, 4], type=pa.int64())}))

    for mode in ("broadcast", "shuffle"):
        out = pagerank_fixed(edges, nodes, n_iters=2, mode=mode).to_pandas()
        got = dict(zip(out["node"].astype(int),
                       out["rank_micro"].astype(int)))
        # round 1: r=[150000, 150000+850000, 150000+850000, 150000]
        # round 2: contrib(1->2)=127500, contrib(2->3)=850000
        assert got == {1: 150_000, 2: 277_500, 3: 1_000_000,
                       4: 150_000}, mode


@pytest.mark.usefixtures("ray_session")
def test_pagerank_rejects_bad_inputs():
    import ray.data

    from pdf2doi_ray.stages.graph import pagerank_fixed

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1], type=pa.int64()),
        "dst": pa.array([99], type=pa.int64())}))  # 99 not a node
    nodes = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(Exception, match="absent from the node list"):
        pagerank_fixed(edges, nodes, n_iters=1).to_pandas()

    dup_nodes = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 1, 2], type=pa.int64())}))
    ok_edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1], type=pa.int64()),
        "dst": pa.array([2], type=pa.int64())}))
    with pytest.raises(ValueError, match="duplicate node ids"):
        pagerank_fixed(ok_edges, dup_nodes, n_iters=1)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_known_graph():
    """K4 on {1,2,3,4} has C(4,3)=4 triangles; adding a pendant edge
    (4,5) and an open wedge (5,6) adds none."""
    import ray.data

    from pdf2doi_ray.stages.graph import triangle_count

    pairs = pa.table({
        "vec_a": pa.array([1, 1, 1, 2, 2, 3, 4, 5], type=pa.int64()),
        "vec_b": pa.array([2, 3, 4, 3, 4, 4, 5, 6], type=pa.int64()),
    })
    out = triangle_count(ray.data.from_arrow(pairs).repartition(3),
                         num_partitions=2)
    assert out["n_triangles"].tolist() == [4]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_rejects_unoriented_edges():
    import ray.data

    from pdf2doi_ray.stages.graph import triangle_count

    pairs = pa.table({
        "vec_a": pa.array([2], type=pa.int64()),
        "vec_b": pa.array([1], type=pa.int64()),
    })
    with pytest.raises(Exception, match="oriented"):
        triangle_count(ray.data.from_arrow(pairs), num_partitions=2)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_empty_and_triangle_free():
    import ray.data

    from pdf2doi_ray.stages.graph import triangle_count

    empty = pa.table({
        "vec_a": pa.array([], type=pa.int64()),
        "vec_b": pa.array([], type=pa.int64()),
    })
    assert triangle_count(ray.data.from_arrow(empty),
                          num_partitions=2)["n_triangles"].tolist() == [0]

    path = pa.table({  # 1-2-3-4 path: wedges exist, no closure
        "vec_a": pa.array([1, 2, 3], type=pa.int64()),
        "vec_b": pa.array([2, 3, 4], type=pa.int64()),
    })
    assert triangle_count(ray.data.from_arrow(path),
                          num_partitions=2)["n_triangles"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
def test_prune_near_dups_keeps_one_per_component():
    import ray.data

    from pdf2doi_ray.stages.graph import prune_near_dups

    # components: {1,2,3} (chain), {7,9}; 5 and 8 untouched
    pairs = pa.table({
        "vec_a": pa.array([1, 2, 7], type=pa.int64()),
        "vec_b": pa.array([2, 3, 9], type=pa.int64()),
    })
    items = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3, 5, 7, 8, 9], type=pa.int64()),
        "payload": pa.array(list("abcdefg")),
    })).repartition(3)
    out = (prune_near_dups(items, ray.data.from_arrow(pairs)).to_pandas()
           .sort_values("vec_id"))
    assert out["vec_id"].tolist() == [1, 5, 7, 8]
    assert out["payload"].tolist() == ["a", "d", "e", "f"]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_edges_but_no_wedges():
    """A perfect matching has edges but zero wedges: the first join's
    empty output must short-circuit, not crash the second join."""
    import ray.data

    from pdf2doi_ray.stages.graph import triangle_count

    pairs = pa.table({
        "vec_a": pa.array([1, 3], type=pa.int64()),
        "vec_b": pa.array([2, 4], type=pa.int64()),
    })
    out = triangle_count(ray.data.from_arrow(pairs), num_partitions=2)
    assert out["n_triangles"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
def test_prune_near_dups_no_duplicates():
    """A corpus with zero near-dup pairs is ordinary input: everything
    survives."""
    import ray.data

    from pdf2doi_ray.stages.graph import prune_near_dups

    empty = pa.table({
        "vec_a": pa.array([], type=pa.int64()),
        "vec_b": pa.array([], type=pa.int64()),
    })
    items = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
    }))
    out = prune_near_dups(items, ray.data.from_arrow(empty)).to_pandas()
    assert sorted(out["vec_id"]) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_prune_near_dups_distributed_matches_broadcast(n_blocks):
    """The hash-join anti variant keeps exactly the broadcast variant's
    survivors: min-id representative per component, untouched singletons,
    and extra payload columns carried through the join."""
    import ray.data

    from pdf2doi_ray.stages.graph import (prune_near_dups,
                                          prune_near_dups_distributed)

    items = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(10)), type=pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(10)]),
    })).repartition(n_blocks)
    pairs = ray.data.from_arrow(pa.table({
        "vec_a": pa.array([0, 1, 5, 6], type=pa.int64()),
        "vec_b": pa.array([1, 2, 6, 5], type=pa.int64()),
    }))
    want = prune_near_dups(items, pairs).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    got = prune_near_dups_distributed(items, pairs, num_partitions=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert got[["vec_id", "payload"]].to_dict("records") == \
        want[["vec_id", "payload"]].to_dict("records")
    assert got["vec_id"].tolist() == [0, 3, 4, 5, 7, 8, 9]


@pytest.mark.usefixtures("ray_session")
def test_prune_near_dups_distributed_no_pairs():
    import ray.data

    from pdf2doi_ray.stages.graph import prune_near_dups_distributed

    items = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64())}))
    pairs = ray.data.from_arrow(pa.table({
        "vec_a": pa.array([], type=pa.int64()),
        "vec_b": pa.array([], type=pa.int64())}))
    out = prune_near_dups_distributed(items, pairs).to_pandas()
    assert sorted(out["vec_id"]) == [1, 2]
