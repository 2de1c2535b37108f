"""Round-4 wave-29: strip-tags baseline extractor vs DOM extraction."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_strip_tags_baseline_chrome_share():
    import numpy as np
    import ray.data

    from pdf2doi_ray.sources.pages import synthesize_pages
    from pdf2doi_ray.stages.skew import strip_tags_baseline

    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": ["body < & > words"] * 20,   # forces entity escaping
        "lang": ["en"] * 20,
    })
    pages = synthesize_pages(docs)
    got = strip_tags_baseline(
        ray.data.from_pandas(pages).repartition(3)).to_pandas()
    assert len(got) == 20
    for r in got.itertuples():
        # stripped html ⊇ escaped main text: chrome share strictly between
        # 0 and 1000 for this template
        assert 0 < r.chrome_permille < 1000
        assert r.n_stripped_chars > r.n_main_chars > 0
        assert r.chrome_permille == 1000 * (
            r.n_stripped_chars - r.n_main_chars) // r.n_stripped_chars
    # escaping is counted on both sides: '<' in the body must appear as
    # '&lt;' (4 chars) in n_main_chars
    base = got.iloc[0]
    raw = "body < & > words"
    esc = raw.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # slot-0 pages get no text suffix beyond the base text
    slot0 = got[got["url"].str.contains("page-0.html")].iloc[0]
    assert slot0.n_main_chars == len(esc)
