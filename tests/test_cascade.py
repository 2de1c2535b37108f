"""Per-row cascade semantics: priority orders and verified offline quirks."""

from pdf2doi_ray.cascade import (
    DEGRADED,
    EXHAUSTED_METHOD,
    filename_variants,
    identify_row,
    search_filename,
    search_info,
    search_texts,
)
from pdf2doi_ray.config import DEFAULT_CONFIG, NO_ARXIV2DOI_CONFIG


def test_text_doi_marker_form():
    ident, kind, v = search_texts("intro doi: 10.1234/abc.5 outro")
    assert (ident, kind, v) == ("10.1234/abc.5", "DOI", True)


def test_text_doi_bare_and_standardised():
    ident, kind, _ = search_texts("see 10.1109/CVPR.2016.90. for details")
    assert ident == "10.1109/cvpr.2016.90"
    assert kind == "DOI"


def test_doi_beats_arxiv_in_same_text():
    ident, kind, _ = search_texts("arXiv:2103.15522 and 10.1234/xy.1 too")
    assert ident == "10.1234/xy.1"
    assert kind == "DOI"


def test_arxiv_marker_version_suffix_excluded():
    ident, kind, _ = search_texts("preprint arXiv:2103.15522v2 here")
    assert (ident, kind) == ("2103.15522", "arxiv ID")


def test_first_text_unit_wins():
    ident, _, _ = search_texts(["no ids here", "doi: 10.1111/first x",
                                "doi: 10.2222/second x"])
    assert ident == "10.1111/first"


def test_multi_doi_first_match_wins():
    ident, _, _ = search_texts("doi: 10.1111/a1 then doi: 10.2222/b2")
    assert ident == "10.1111/a1"


def test_letters_follow_grammar_v2():
    # v1 cannot terminate before '('; v2 ends the DOI at the digits.
    ident, _, _ = search_texts("as shown (10.1234/v.567abc( elsewhere")
    assert ident == "10.1234/v.567"


def test_filename_variants_longest_first():
    url = "https://x.org/p/10.1063%2F1.2409490.pdf"
    assert filename_variants(url)[0] == "10.1063/1.2409490.pdf"


def test_filename_keeps_pdf_suffix_offline():
    # Verified reference quirk: offline validation accepts the '.pdf' tail
    # because it fits the DOI suffix grammar, and the longest variant is
    # checked first (finders.py:747-753).
    ident, kind, _ = search_filename("https://x.org/p/10.1063%2F1.2409490.pdf")
    assert ident == "10.1063/1.2409490.pdf"
    assert kind == "DOI"


def test_info_priority_and_blocklist():
    keys = ["wps-journaldoi", "subject", "citation_doi"]
    vals = ["10.9999/journal.1", "nothing here", "10.1234/article.7"]
    ident, _, _ = search_info(keys, vals, DEFAULT_CONFIG)
    assert ident == "10.1234/article.7"  # blocklisted key skipped, priority key hit

    # blocklist is case-insensitive on the key
    ident2, _, _ = search_info(["WPS-JournalDOI"], ["10.9999/journal.1"],
                               DEFAULT_CONFIG)
    assert ident2 is None


def test_identify_row_method_priority():
    row = dict(url="https://x.org/10.3333%2Furl.1.pdf",
               text="body doi: 10.4444/text.1 end",
               meta_keys=["citation_doi"], meta_vals=["10.2222/meta.1"])
    got = identify_row(row["url"], row["text"], row["meta_keys"],
                       row["meta_vals"], DEFAULT_CONFIG)
    assert got.identifier == "10.2222/meta.1"
    assert got.method == "document_infos"

    got = identify_row(row["url"], row["text"], [], [], DEFAULT_CONFIG)
    assert got.identifier == "10.3333/url.1.pdf"
    assert got.method == "filename"

    got = identify_row("https://x.org/page.html", row["text"], [], [],
                       DEFAULT_CONFIG)
    assert got.identifier == "10.4444/text.1"
    assert got.method == "document_text"


def test_arxiv_offline_degrades_whole_row_by_default():
    # Reference default config: the offline arXiv→DOI rewrite crashes on its
    # boolean validation info and the whole row becomes all-null
    # (finders.py:665-684 + main.py:140-142).
    got = identify_row("https://x.org/p.html", "see arXiv:2103.15522", [], [],
                       DEFAULT_CONFIG)
    assert got == DEGRADED


def test_arxiv_survives_with_no_arxiv2doi():
    got = identify_row("https://x.org/p.html", "see arXiv:2103.15522", [], [],
                       NO_ARXIV2DOI_CONFIG)
    assert got.identifier == "2103.15522"
    assert got.id_type == "arxiv ID"
    assert got.method == "document_text"


def test_arxiv_rewrite_with_dict_verdict():
    # With an online-style dict verdict the rewrite synthesizes the arXiv DOI
    # (or swaps in the journal DOI when present).
    def fake_validate(ident, kind):
        if kind == "arxiv":
            return {"arxiv_doi": None}
        from pdf2doi_ray.idpatterns import standardise_doi
        return True if standardise_doi(ident) else False

    got = identify_row("https://x.org/p.html", "see arXiv:2103.15522", [], [],
                       DEFAULT_CONFIG, validate=fake_validate)
    assert got.identifier == "10.48550/arXiv.2103.15522"
    assert got.id_type == "arxiv DOI"
    assert got.method == "document_text + arxiv2doi"


def test_exhausted_row_carries_last_method_name():
    got = identify_row("https://x.org/clean.html", "nothing here", [], [],
                       DEFAULT_CONFIG)
    assert got.identifier is None
    assert got.id_type is None
    assert got.method == EXHAUSTED_METHOD
