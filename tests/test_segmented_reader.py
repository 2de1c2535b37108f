"""Segmented (per-text-unit) reader semantics — the PyPdf per-page analog."""

import pyarrow as pa
import pytest

from pdf2doi_ray.config import DEFAULT_CONFIG
from pdf2doi_ray.html_extract import parse_page
from pdf2doi_ray.stages.extract import make_extract_fn


def test_parser_emits_segments_in_document_order():
    p = parse_page(b"<body><main>one <b>two</b> three</main></body>")
    assert p.segments == ("one ", "two", " three")
    assert p.text == "one two three"
    # single text node → one segment, equal to text
    q = parse_page(b"<body><main>whole</main></body>")
    assert q.segments == ("whole",)


def _extract(batch, reader):
    cfg = DEFAULT_CONFIG.with_(reader=reader)
    return make_extract_fn(cfg)(batch)


def test_segmented_first_unit_wins_differs_from_whole():
    """Unit 1 holds only a bare (v1) DOI; unit 2 holds a marker (v0) DOI.
    The whole-document reader scans v0 over everything first → unit 2's
    DOI wins; the segmented reader exhausts unit 1 first → its v1 DOI wins
    (exactly the PyPdf-page vs pdfminer-whole divergence in the reference).
    """
    seg1 = "bare 10.1111/first.1 here"
    seg2 = "doi: 10.2222/second.2 there"
    batch = pa.table({
        "url": ["https://h.org/p.html"],
        "text": [seg1 + seg2],
        "meta_keys": pa.array([[]], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[]], type=pa.list_(pa.string())),
        "segments": pa.array([[seg1, seg2]], type=pa.list_(pa.string())),
    })
    whole = _extract(batch, "whole")
    seg = _extract(batch, "segmented")
    assert whole["identifier"][0].as_py() == "10.2222/second.2"
    assert seg["identifier"][0].as_py() == "10.1111/first.1"


def test_segmented_equals_whole_on_single_segment():
    text = "doi: 10.1234/abc.5 tail"
    batch = pa.table({
        "url": ["https://h.org/p.html"],
        "text": [text],
        "meta_keys": pa.array([[]], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[]], type=pa.list_(pa.string())),
        "segments": pa.array([[text]], type=pa.list_(pa.string())),
    })
    a = _extract(batch, "whole")
    b = _extract(batch, "segmented")
    assert a["identifier"][0].as_py() == b["identifier"][0].as_py() \
        == "10.1234/abc.5"


def test_segmented_prefilter_entity_span_boundary():
    """An unterminated entity at a text-node boundary decodes differently in
    the concatenated text — segmented mode must prefilter the segments, not
    the text column (round-4 review finding)."""
    from pdf2doi_ray.html_extract import parse_page

    p = parse_page("<body><main>see &<b></b>#1234.56789.pdf ok</main></body>")
    assert p.segments == ("see &", "#1234.56789.pdf ok")
    batch = pa.table({
        "url": ["https://h.org/p.html"], "text": [p.text],
        "meta_keys": pa.array([[]], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[]], type=pa.list_(pa.string())),
        "segments": pa.array([list(p.segments)], type=pa.list_(pa.string())),
    })
    out = _extract(batch, "segmented")
    # arXiv hit in segment 2 → default-config degrade: method must be null
    # (an exhausted stamp would mean the row never reached the cascade)
    assert out["method"][0].as_py() is None


def test_segmented_without_segments_column_is_loud():
    batch = pa.table({
        "url": ["https://h.org/p.html"], "text": ["doi: 10.1234/x.1 t"],
        "meta_keys": pa.array([[]], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[]], type=pa.list_(pa.string())),
    })
    with pytest.raises(ValueError, match="segments"):
        _extract(batch, "segmented")


def test_reader_config_validated():
    with pytest.raises(ValueError, match="reader"):
        DEFAULT_CONFIG.with_(reader="Segmented")
