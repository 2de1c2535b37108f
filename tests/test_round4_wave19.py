"""Round-4 wave-19: event debounce, batch padding plan, personalized PR."""

import numpy as np
import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


def _debounce_ref(df, gap_s=60):
    """Row-at-a-time reference: keep iff first-of-key or gap > gap_s."""
    keep = []
    last = {}
    for r in df.sort_values(["user_id", "event_type", "ts",
                             "event_id"]).itertuples():
        k = (r.user_id, r.event_type)
        if k not in last or (r.ts - last[k]).total_seconds() > gap_s:
            keep.append(r.event_id)
        last[k] = r.ts
    return sorted(keep)


@pytest.mark.usefixtures("ray_session")
def test_event_debounce_cross_block_and_ties():
    from pdf2doi_ray.stages.windows import event_debounce

    rng = np.random.RandomState(7)
    n = 400
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 5, n).astype(np.int64),
        "event_type": rng.choice(["a", "b"], n),
        # coarse grid → many exact ties and many sub-threshold gaps
        "ts": base + pd.to_timedelta(rng.randint(0, 3000, n), unit="s"),
    })
    exp = _debounce_ref(df)
    for blocks in (1, 13):
        got = event_debounce(_rd(df, blocks), min_gap_s=60).to_pandas()
        assert sorted(got["event_id"].tolist()) == exp


@pytest.mark.usefixtures("ray_session")
def test_event_debounce_tie_suppressed():
    from pdf2doi_ray.stages.windows import event_debounce

    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [9, 9, 9],
        "event_type": ["a", "a", "a"],
        # exact tie then exactly-at-threshold: both suppressed (strict >)
        "ts": [ts, ts, ts + pd.Timedelta(seconds=60)],
    })
    got = event_debounce(_rd(df, 1), min_gap_s=60).to_pandas()
    assert got["event_id"].tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_batch_padding_plan_matches_reference():
    from pdf2doi_ray.stages.corpus import batch_padding_plan

    rng = np.random.RandomState(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": [" ".join(["w"] * int(k))
                 for k in rng.randint(1, 50, 100)],
    })
    ntok = docs["text"].str.split(" ").map(len)
    order = sorted(range(100), key=lambda i: (-ntok[i], i))
    B = 8
    exp = {}
    for rank, i in enumerate(order):
        b = rank // B
        nd, mx, sm = exp.get(b, (0, 0, 0))
        exp[b] = (nd + 1, max(mx, ntok[i]), sm + ntok[i])
    for blocks in (1, 9):
        got = batch_padding_plan(_rd(docs, blocks), batch_docs=B) \
            .to_pandas().sort_values("batch_id").reset_index(drop=True)
        assert len(got) == len(exp)
        for r in got.itertuples():
            nd, mx, sm = exp[r.batch_id]
            assert (r.n_docs, r.max_tokens, r.sum_tokens) == (nd, mx, sm)
            assert r.pad_waste == nd * mx - sm


@pytest.mark.usefixtures("ray_session")
def test_personalized_pagerank_seed_mass_only():
    import ray.data

    from pdf2doi_ray.stages.graph import personalized_pagerank

    # path graph 0-1-2 plus isolated 3; seed = node 0 only
    edges = pd.DataFrame({"src": [0, 1, 1, 2], "dst": [1, 0, 2, 1]})
    nodes = pd.DataFrame({"node": [0, 1, 2, 3],
                          "seed": [1, 0, 0, 0]})
    got = personalized_pagerank(
        ray.data.from_pandas(edges).repartition(2),
        ray.data.from_pandas(nodes), n_iters=3).to_pandas() \
        .set_index("node")["rank_micro"].to_dict()
    # hand-unrolled integer rounds (scale 1e6, damping 85):
    r = {0: 1_000_000, 1: 0, 2: 0, 3: 0}
    for _ in range(3):
        s = {0: 0, 1: 0, 2: 0, 3: 0}
        deg = {0: 1, 1: 2, 2: 1}
        for u, v in [(0, 1), (1, 0), (1, 2), (2, 1)]:
            s[v] += (r[u] * 85) // (100 * deg[u])
        r = {n: (150000 if n == 0 else 0) + s[n] for n in s}
    assert got == r
    assert got[3] == 0  # unreachable node keeps zero mass
