"""Methods 4–5 of the reference finder registry (title_google /
first_N_characters_google) with fake transports: hit stamping, per-result
url-before-body scan order, result limit, exhausted fall-through, arXiv
degrade parity, and registry completeness."""

import pyarrow as pa
import pytest

from pdf2doi_ray.cascade import EXHAUSTED_METHOD
from pdf2doi_ray.config import DEFAULT_CONFIG
from pdf2doi_ray.stages.google import GoogleSearchFinder, ascii_scrub


def _batch(rows):
    cols = {k: [] for k in ("url", "title", "h1", "meta_keys", "meta_vals",
                            "text", "identifier", "identifier_type",
                            "method", "validation_info")}
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    return pa.table({
        "url": pa.array(cols["url"], type=pa.string()),
        "title": pa.array(cols["title"], type=pa.string()),
        "h1": pa.array(cols["h1"], type=pa.string()),
        "meta_keys": pa.array([x or [] for x in cols["meta_keys"]],
                              type=pa.list_(pa.string())),
        "meta_vals": pa.array([x or [] for x in cols["meta_vals"]],
                              type=pa.list_(pa.string())),
        "text": pa.array(cols["text"], type=pa.string()),
        "identifier": pa.array(cols["identifier"], type=pa.string()),
        "identifier_type": pa.array(cols["identifier_type"], type=pa.string()),
        "method": pa.array(cols["method"], type=pa.string()),
        "validation_info": pa.array(cols["validation_info"], type=pa.string()),
    })


def test_requires_transports():
    with pytest.raises(NotImplementedError):
        GoogleSearchFinder()


def test_title_google_hit_stamped():
    calls = []

    def search(q, stop):
        calls.append(q)
        return ["https://pub.example.org/article-one"]

    def fetch(url):
        return 200, "the paper at doi: 10.5555/from.body is here"

    finder = GoogleSearchFinder(search=search, fetch=fetch)
    out = finder(_batch([{
        "url": "https://x.org/p.html",
        "title": "A Long Enough Document Title Here",
        "text": "no identifiers at all in this text",
        "method": EXHAUSTED_METHOD,
    }]))
    assert out["identifier"][0].as_py() == "10.5555/from.body"
    assert out["method"][0].as_py() == "title_google"
    assert out["validation_info"][0].as_py() == "True"
    assert calls and calls[0] == "A Long Enough Document Title Here"


def test_result_url_scanned_before_body():
    def search(q, stop):
        return ["https://doi.org/10.4444/in.url"]

    def fetch(url):
        raise AssertionError("body must not be fetched when the url hits")

    finder = GoogleSearchFinder(search=search, fetch=fetch)
    out = finder(_batch([{
        "url": "https://x.org/p.html",
        "title": "A Long Enough Document Title Here",
        "text": "nothing",
        "method": EXHAUSTED_METHOD,
    }]))
    # AssertionError from fetch would be swallowed by the reference's bare
    # except — the url-first contract means the hit lands without fetching
    assert out["identifier"][0].as_py() == "10.4444/in.url"


def test_first_n_characters_google_fallback_and_scrub():
    queries = []

    def search(q, stop):
        queries.append(q)
        if q.startswith("snippet"):
            return ["https://r.example.org/x"]
        return []

    def fetch(url):
        return 200, "body doi: 10.6666/snip.hit end"

    finder = GoogleSearchFinder(search=search, fetch=fetch)
    out = finder(_batch([{
        "url": "https://x.org/p.html",
        "title": None, "h1": None,                     # no title candidates
        "text": "snippet\nwith\tnon-asciié padding",
        "method": EXHAUSTED_METHOD,
    }]))
    assert out["identifier"][0].as_py() == "10.6666/snip.hit"
    assert out["method"][0].as_py() == "first_N_characters_google"
    # the googled query is the ascii-scrubbed first-N text
    assert queries[-1] == ascii_scrub(
        "snippet\nwith\tnon-asciié padding", 1000)
    assert "\n" not in queries[-1] and "é" not in queries[-1]


def test_result_limit_respected():
    seen = []

    def search(q, stop):
        # misbehaving transport that ignores stop: the stage must cut off
        return iter([f"https://r{i}.org" for i in range(100)])

    def fetch(url):
        seen.append(url)
        return 200, "no identifiers here"

    finder = GoogleSearchFinder(search=search, fetch=fetch, numb_results=3)
    out = finder(_batch([{
        "url": "https://x.org/p.html",
        "title": "A Long Enough Document Title Here",
        "text": None,
        "method": EXHAUSTED_METHOD,
    }]))
    assert out["identifier"][0].as_py() is None
    assert out["method"][0].as_py() == EXHAUSTED_METHOD   # still exhausted
    assert len(seen) == 3


def test_degraded_rows_not_retried_and_arxiv_degrades():
    def search(q, stop):
        return ["https://r.example.org/listing"]

    def fetch(url):
        return 200, "preprint arXiv:2101.12345 appeared"

    finder = GoogleSearchFinder(search=search, fetch=fetch)
    out = finder(_batch([
        # degraded row (null method): google must NOT run
        {"url": "https://x.org/a.html", "text": "anything", "method": None},
        # exhausted row whose google hit is an arXiv ID → offline rewrite
        # degrades the whole row (reference finders.py:665-684 quirk)
        {"url": "https://x.org/b.html",
         "title": "A Long Enough Document Title Here",
         "text": None, "method": EXHAUSTED_METHOD},
    ]))
    assert out["identifier"][0].as_py() is None
    assert out["method"][0].as_py() is None
    assert out["identifier"][1].as_py() is None
    assert out["method"][1].as_py() is None               # degraded, not exhausted


def test_registry_lists_five_methods():
    from pdf2doi_ray.pipelines.identify import finder_registry

    reg = finder_registry()
    assert list(reg) == ["document_infos", "filename", "document_text",
                         "title_google", "first_N_characters_google"]


@pytest.mark.usefixtures("ray_session")
def test_websearch_pipeline_end_to_end():
    import ray.data

    from pdf2doi_ray.pipelines.identify import identify_pages_websearch

    def search(q, stop):
        return ["https://doi.org/10.7777/via.search"]

    def fetch(url):
        return 200, ""

    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://x.org/plain-page.html"]),
        "html": pa.array([b"<html><body><main>no identifiers, just a very "
                          b"long enough body text here</main>"
                          b"<h1>A Sufficiently Long Headline Title</h1>"
                          b"</body></html>"], type=pa.binary()),
    }))
    out = identify_pages_websearch(pages, search, fetch, DEFAULT_CONFIG,
                                   web_concurrency=1).to_pandas()
    assert len(out) == 1
    assert out["identifier"][0] == "10.7777/via.search"
    assert out["method"][0] == "title_google"


def test_font_title_used_as_google_query():
    queries = []

    def search(q, stop):
        queries.append(q)
        return ["https://doi.org/10.8888/font.hit"] \
            if q == "The Large Font Headline Title" else []

    def fetch(url):
        return 200, ""

    finder = GoogleSearchFinder(search=search, fetch=fetch)
    batch = _batch([{
        "url": "https://x.org/p.html",
        "title": None, "h1": None,
        "text": None,
        "method": EXHAUSTED_METHOD,
    }]).append_column("font_title",
                      pa.array(["The Large Font Headline Title"]))
    out = finder(batch)
    assert out["identifier"][0].as_py() == "10.8888/font.hit"
    assert out["method"][0].as_py() == "title_google"
    assert queries[0] == "The Large Font Headline Title"


@pytest.mark.usefixtures("ray_session")
def test_parser_emits_font_title_column():
    import ray.data

    from pdf2doi_ray.stages.parse import HtmlParse

    html = (b'<html><body><div style="font-size:24px">The Styled Headline '
            b"Title Words</div>"
            b'<p style="font-size:12px">a</p><p style="font-size:12px">b</p>'
            b'<p style="font-size:12px">c</p>'
            b"<main>body</main></body></html>")
    plain = b"<html><body><main>no styles at all</main></body></html>"
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://x.org/a", "https://x.org/b"]),
        "html": pa.array([html, plain], type=pa.binary()),
    }))
    parser = HtmlParse()
    out = pages.map_batches(lambda t: parser(t),
                            batch_format="pyarrow").to_pandas()
    assert out["font_title"][0] == "The Styled Headline Title Words"
    assert out["font_title"][1] is None


@pytest.mark.usefixtures("ray_session")
def test_parser_font_probe_case_insensitive_and_fault_isolated():
    import ray.data

    from pdf2doi_ray.stages.parse import HtmlParse

    upper = (b'<html><body><div style="FONT-SIZE:24px">The Upper Styled '
             b"Headline Title</div>"
             b'<p style="font-size:12px">a</p><p style="font-size:12px">b</p>'
             b'<p style="font-size:12px">c</p><main>m</main></body></html>')
    pages = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://x.org/u"]),
        "html": pa.array([upper], type=pa.binary()),
    }))
    parser = HtmlParse()
    out = pages.map_batches(lambda t: parser(t),
                            batch_format="pyarrow").to_pandas()
    # FONT-SIZE (uppercase) must pass the gate — the style regex is
    # IGNORECASE, so the probe must be too (2nd-review finding)
    assert out["font_title"][0] == "The Upper Styled Headline Title"
