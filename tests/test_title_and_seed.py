"""Font-size-histogram title analog (reference find_title_via_pymupdf) and
the manual -id seed (reference main.py:340-353 metadata write)."""

import pyarrow.parquet as pq
import pytest

from pdf2doi_ray.html_extract import candidate_titles, title_by_font_histogram


def test_font_histogram_picks_largest_above_paragraph():
    html = (
        '<div style="font-size:24px">The Histogram Headline Title</div>'
        '<p style="font-size:12px">body one</p>'
        '<p style="font-size:12px">body two</p>'
        '<p style="font-size:12px">body three</p>'
        '<div style="font-size:16px">a subheading</div>')
    assert title_by_font_histogram(html) == "The Histogram Headline Title"


def test_font_histogram_inherits_nested_sizes():
    html = (
        '<div style="font-size:30pt"><span>Nested</span> <b>Giant</b>'
        " Title Words</div>"
        '<div style="font-size:10pt">p1</div>'
        '<div style="font-size:10pt">p2</div>'
        '<div style="font-size:10pt">p3</div>'
        '<div style="font-size:10pt">p4</div>')
    assert title_by_font_histogram(html) == "Nested Giant Title Words"


def test_font_histogram_none_without_styles_or_larger_size():
    assert title_by_font_histogram("<p>plain text</p>") is None
    # everything at paragraph size → nothing larger → None
    html = ('<p style="font-size:12px">a</p>'
            '<p style="font-size:12px">b</p>')
    assert title_by_font_histogram(html) is None


def test_font_histogram_breaks_after_first_run():
    html = (
        '<div style="font-size:20px">First Big Headline Run</div>'
        '<p style="font-size:10px">para para para</p>'
        '<div style="font-size:20px">Second Big Later</div>'
        '<p style="font-size:10px">more</p>'
        '<p style="font-size:10px">and more</p>')
    assert title_by_font_histogram(html) == "First Big Headline Run"


def test_candidate_titles_font_source_position():
    got = candidate_titles(
        "https://x.org/p.html",
        "The Title Element Value Here!",
        "The Dom H1 Headline Value Yes",
        [], [],
        font_title="The Font Histogram Title Pick")
    # all > 12 chars; stable longest-first sort keeps source order on ties:
    # h1, font, title (equal lengths here → source order preserved)
    assert got == ["The Dom H1 Headline Value Yes",
                   "The Font Histogram Title Pick",
                   "The Title Element Value Here!"]
    # short font title is gated out
    assert "short" not in candidate_titles(
        "https://x.org/p.html", None, None, [], [], font_title="short")


def test_seed_identifier_cli(tmp_path):
    from pdf2doi_ray.run import main

    out = str(tmp_path / "run1")
    rc = main(["--set-id", "https://x.org/paper.html",
               "doi: 10.1234/seeded.one", "--output", out])
    assert rc == 0
    t = pq.read_table(f"{out}/part=__seed__")
    assert t.num_rows == 1
    assert t["url"][0].as_py() == "https://x.org/paper.html"
    # the seeded value went through the metadata-scan cascade: standardised
    # identifier, method stamped document_infos, offline-validated
    assert t["identifier"][0].as_py() == "10.1234/seeded.one"
    assert t["method"][0].as_py() == "document_infos"
    assert t["validation_info"][0].as_py() == "True"


def test_seed_reset_with_empty_identifier(tmp_path):
    from pdf2doi_ray.run import main

    out = str(tmp_path / "run2")
    assert main(["--set-id", "https://x.org/a.html", "", "--output", out]) == 0
    t = pq.read_table(f"{out}/part=__seed__")
    assert t["identifier"][0].as_py() is None      # reset idiom
    assert t["method"][0].as_py() == "document_infos"


@pytest.mark.usefixtures("ray_session")
def test_seeded_url_skips_reprocessing(tmp_path):
    from pdf2doi_ray.run import main
    from pdf2doi_ray.state.checkpoint import previous_result_urls

    out = str(tmp_path / "run3")
    main(["--set-id", "https://x.org/skip-me.html", "10.1234/xy",
          "--output", out])
    main(["--set-id", "https://x.org/keep-me.html", "", "--output", out])
    resolved = previous_result_urls(out)
    assert "https://x.org/skip-me.html" in resolved
    assert "https://x.org/keep-me.html" not in resolved   # null id → re-run
