"""Round-4 wave-28: RANK-ties top-k, token-weighted length quantiles."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_grouped_top_k_ties_rank_semantics():
    import ray.data

    from pdf2doi_ray.stages.windowfns import grouped_top_k_ties

    df = pd.DataFrame({
        "lang": ["en"] * 6 + ["fr"] * 3,
        #         values 9 9 8 8 8 7  → ranks 1 1 3 3 3 6 (rank 6 excluded at k=3? no: k=3 keeps rank<=3)
        "n_tokens": [9, 9, 8, 8, 8, 7, 5, 5, 5],
    })
    for blocks in (1, 4):
        got = grouped_top_k_ties(
            ray.data.from_pandas(df).repartition(blocks),
            "lang", "n_tokens", k=3).to_pandas()
        en = got[got["lang"] == "en"].sort_values(
            ["rank", "n_tokens"]).reset_index(drop=True)
        # rank<=3 keeps both 9s (rank 1) and all three 8s (rank 3); the 7
        # would be rank 6 > 3
        assert en["rank"].tolist() == [1, 1, 3, 3, 3]
        assert en["n_tokens"].tolist() == [9, 9, 8, 8, 8]
        fr = got[got["lang"] == "fr"]
        assert fr["rank"].tolist() == [1, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_token_weighted_char_quantiles_walk():
    import ray.data

    from pdf2doi_ray.stages.textstats import token_weighted_char_quantiles

    docs = pd.DataFrame({
        # lengths 1,3,5 chars with 1,2,3 tokens → total 6 tokens;
        # cum by length: 1→1, 3→3, 5→6
        "text": ["a", "a b", "a b c"],
    })
    got = token_weighted_char_quantiles(
        ray.data.from_pandas(docs).repartition(3),
        quantiles_permille=(166, 500, 1000))
    by = {r.quantile_permille: (r.n_chars, r.cum_tokens, r.total_tokens)
          for r in got.itertuples()}
    assert by[166] == (1, 1, 6)    # 1*1000 >= 166*6 (996)
    assert by[500] == (3, 3, 6)    # 3*1000 >= 3000
    assert by[1000] == (5, 6, 6)
