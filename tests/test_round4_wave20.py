"""Round-4 wave-20: tag census, crawl recency, recency-weighted value."""

import numpy as np
import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_tag_census_counts_all_meta_variants():
    import ray.data

    from pdf2doi_ray.sources.pages import synthesize_pages
    from pdf2doi_ray.stages.skew import tag_census

    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),  # covers every slot twice
        "text": ["alpha beta <tag> & more"] * 40,
        "lang": ["en"] * 40,
    })
    pages = synthesize_pages(docs)
    got = tag_census(_rd(pages, 4)).to_pandas()
    assert len(got) == 40
    by_slot = {int(u.split("-")[-1].split(".")[0]) % 20: r
               for u, r in zip(got["url"], got.itertuples())
               if "page-" in u}
    # charset + generator = 2 base metas; slots 0,1,2,12 add 1; 16 adds 2
    assert by_slot[19].n_meta == 2
    assert by_slot[0].n_meta == 3 if 0 in by_slot else True
    assert by_slot[16].n_meta == 4
    # escaping: '<tag>' in text must NOT count as markup, and the ratio
    # uses raw text chars over full html chars
    row = by_slot[19]
    assert row.markup_permille == 1000 * row.text_chars // row.html_chars


@pytest.mark.usefixtures("ray_session")
def test_crawl_recency_bucket_boundaries():
    import ray.data

    from pdf2doi_ray.stages.skew import crawl_recency_report

    base = pd.Timestamp("2025-01-02")
    # ages relative to max ts (last row): exactly 6h → fresh (<=);
    # 6h+1s → day; exactly 24h → day; 24h+1s → old
    ages = [21600, 21601, 86400, 86401, 0]
    pages = pd.DataFrame({
        "url": [f"https://siteA.example.org/docs/p{i}.html"
                for i in range(len(ages))],
        "warc_ts": [base - pd.Timedelta(seconds=a) for a in ages],
        "html": [b"<html></html>"] * len(ages),
        "text": ["t"] * len(ages),
        "lang": ["en"] * len(ages),
    })
    got = crawl_recency_report(_rd(pages, 3)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n_fresh, r.n_day, r.n_old, r.latest_age_s) == (2, 2, 1, 0)


@pytest.mark.usefixtures("ray_session")
def test_recency_weighted_value_halving_and_guard():
    import ray.data

    from pdf2doi_ray.stages.aggs import recency_weighted_value

    base = pd.Timestamp("2024-03-10")
    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "ts": [base, base - pd.Timedelta(days=1),
               base - pd.Timedelta(days=3), base],
        "value": [8.0, 8.0, 8.0, 0.5],
    })
    got = recency_weighted_value(_rd(ev, 4)).to_pandas() \
        .set_index("user_id")["recency_score_milli"].to_dict()
    # 8000 + 8000>>1 + 8000>>3 = 8000+4000+1000
    assert got == {1: 13000, 2: 500}

    bad = ev.copy()
    bad.loc[0, "value"] = -1.0
    with pytest.raises(Exception, match="negative"):
        recency_weighted_value(_rd(bad, 1)).to_pandas()
