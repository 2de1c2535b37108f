"""Round-4 wave-32: incremental components, title-template diversity."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_components_incremental_merges_old_clusters():
    import ray.data

    from pdf2doi_ray.stages.graph import (components_incremental,
                                          connected_components)

    # yesterday: clusters {1,2} and {5,6}; delta bridges 2-5 and adds 8-9
    old_pairs = pd.DataFrame({"doc_a": [1, 5], "doc_b": [2, 6]})
    old = connected_components(ray.data.from_pandas(old_pairs))
    delta = ray.data.from_pandas(
        pd.DataFrame({"doc_a": [2, 8], "doc_b": [5, 9]}))
    got = components_incremental(old, delta).to_pandas() \
        .set_index("node")["component"].to_dict()
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 8: 8, 9: 8}

    # transparency: equals the full recompute over all raw pairs
    full = connected_components(ray.data.from_pandas(pd.concat(
        [old_pairs, pd.DataFrame({"doc_a": [2, 8], "doc_b": [5, 9]})]))) \
        .to_pandas().set_index("node")["component"].to_dict()
    assert got == full


@pytest.mark.usefixtures("ray_session")
def test_title_template_diversity_mixed_templates():
    import ray.data

    from pdf2doi_ray.stages.skew import title_template_diversity

    def page(url, title):
        return {"url": url,
                "warc_ts": pd.Timestamp("2025-01-01"),
                "html": (f"<html><head><title>{title}</title></head>"
                         f"<body><main>x</main></body></html>").encode(),
                "text": "x", "lang": "en"}

    pages = pd.DataFrame([
        page("https://a.example.org/1", "Post 17 comments"),
        page("https://a.example.org/2", "Post 99 comments"),
        page("https://a.example.org/3", "About us"),
        page("https://b.example.org/1", "Item 5"),
    ])
    got = title_template_diversity(
        ray.data.from_pandas(pages).repartition(2)).to_pandas() \
        .set_index("host")
    a = got.loc["a.example.org"]
    # 'Post # comments' (2 pages) + 'About us' → 2 templates over 3 pages
    assert (a.n_pages, a.n_templates, a.pages_per_template) == (3, 2, 1)
    b = got.loc["b.example.org"]
    assert (b.n_pages, b.n_templates) == (1, 1)


@pytest.mark.usefixtures("ray_session")
def test_title_template_diversity_multiline_and_missing_title():
    """ADVICE r4: multi-line HTML and pages with no <title> must not
    degrade to the whole digit-collapsed document as the template —
    non-matching rows map to an explicit empty template."""
    import ray.data

    from pdf2doi_ray.stages.skew import title_template_diversity

    def page(url, html):
        return {"url": url, "warc_ts": pd.Timestamp("2025-01-01"),
                "html": html.encode(), "text": "x", "lang": "en"}

    pages = pd.DataFrame([
        # multi-line html, title on its own line
        page("https://m.example.org/1",
             "<html>\n<head>\n<title>Post 17</title>\n</head>\n"
             "<body>\nnumbers 123 456\n</body>\n</html>"),
        page("https://m.example.org/2",
             "<html>\n<head>\n<title>Post 99</title>\n</head>\n"
             "<body>\nother 789\n</body>\n</html>"),
        # no <title> at all → empty template
        page("https://m.example.org/3",
             "<html>\n<body>\nno title 42 here\n</body>\n</html>"),
        page("https://m.example.org/4",
             "<html><body>also 43 untitled</body></html>"),
    ])
    got = title_template_diversity(
        ray.data.from_pandas(pages).repartition(2)).to_pandas() \
        .set_index("host")
    m = got.loc["m.example.org"]
    # 'Post #' (2 pages) + '' (2 untitled pages) → exactly 2 templates;
    # a whole-document fallback would have made 3-4 distinct templates
    assert (m.n_pages, m.n_templates, m.pages_per_template) == (4, 2, 2)
