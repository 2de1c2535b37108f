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
