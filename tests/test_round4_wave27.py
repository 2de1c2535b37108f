"""Round-4 wave-27: per-lang byte inventory (tokenizer alphabet census)."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_byte_inventory_counts_and_modal_tiebreak():
    import ray.data

    from pdf2doi_ray.stages.textstats import byte_inventory_by_lang

    docs = pd.DataFrame({
        "text": ["aab", "ba", "zzz"],
        "lang": ["en", "en", "fr"],
    })
    for blocks in (1, 3):
        got = byte_inventory_by_lang(
            ray.data.from_pandas(docs).repartition(blocks)).to_pandas() \
            .set_index("lang")
        en = got.loc["en"]
        # en bytes: a×3, b×2 → 2 distinct, 5 total, modal 'a'
        assert (en.n_distinct_bytes, en.n_bytes) == (2, 5)
        assert (en.top_byte, en.top_byte_count) == (ord("a"), 3)
        fr = got.loc["fr"]
        assert (fr.n_distinct_bytes, fr.n_bytes,
                fr.top_byte, fr.top_byte_count) == (1, 3, ord("z"), 3)


@pytest.mark.usefixtures("ray_session")
def test_byte_inventory_tie_breaks_to_smaller_byte():
    import ray.data

    from pdf2doi_ray.stages.textstats import byte_inventory_by_lang

    docs = pd.DataFrame({"text": ["ba"], "lang": ["en"]})  # a=1, b=1 tie
    got = byte_inventory_by_lang(ray.data.from_pandas(docs)).to_pandas()
    assert got.iloc[0]["top_byte"] == ord("a")
