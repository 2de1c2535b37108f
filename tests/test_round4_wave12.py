"""Round-4 wave-12: single-pass gate grid, shard-skew audit,
crawl-frontier top-k."""

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_gate_grid_single_pass_matches_per_config():
    from pdf2doi_ray.stages.corpus import gate_grid_report

    docs = pd.DataFrame({"text": [
        " ".join(["the"] * 30),          # 30 tokens, all stopwords
        " ".join(["zz"] * 30),           # 30 tokens, none
        " ".join(["the"] + ["zz"] * 9),  # 10 tokens, 10% stop
    ]})
    got = gate_grid_report(_rd(docs, 2),
                           grid=((10, 50), (20, 50), (10, 90))) \
        .to_pandas().sort_values(["min_tokens", "stop_permille_min"]) \
        .reset_index(drop=True)
    assert got["n_docs"].unique().tolist() == [3]
    by = {(r.min_tokens, r.stop_permille_min): r.n_pass
          for r in got.itertuples()}
    # (10,50): doc1 passes (1000‰ stop), doc3 passes (100‰ ≥ 50‰)
    assert by[(10, 50)] == 2
    # (20,50): doc3 too short now
    assert by[(20, 50)] == 1
    # (10,90): doc3's 100‰ ≥ 90‰ still passes
    assert by[(10, 90)] == 2


@pytest.mark.usefixtures("ray_session")
def test_shard_skew_report_counts_and_imbalance():
    from pdf2doi_ray.stages.export import shard_skew_report

    docs = pd.DataFrame({"doc_id": list(range(64))})
    got = shard_skew_report(_rd(docs, 3), n_shards=4).to_pandas()
    assert got["total_rows"].tolist() == [64]
    assert int(got["n_shards_used"].iloc[0]) <= 4
    # imbalance ≥ 1000 permille by definition (max ≥ mean)
    assert int(got["imbalance_permille"].iloc[0]) >= 1000


@pytest.mark.usefixtures("ray_session")
def test_crawl_frontier_prefers_rare_hosts():
    from pdf2doi_ray.stages.corpus import crawl_frontier_topk
    import ray.data

    pages = pd.DataFrame({"url": (
        [f"https://big.example.org/p{i}" for i in range(5)]
        + ["https://rare.example.org/only"])})
    got = crawl_frontier_topk(
        ray.data.from_pandas(pages).repartition(3), k=3).to_pandas()
    assert got["rank"].tolist() == [1, 2, 3]
    assert got["url"].iloc[0] == "https://rare.example.org/only"
    assert got["host_pages"].tolist() == [1, 5, 5]
