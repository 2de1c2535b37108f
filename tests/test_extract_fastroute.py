"""Differential guarantee for the vectorized extract fast route: batch
results must be identical to the exact per-row cascade on every row."""

import random

import pyarrow as pa

from pdf2doi_ray.cascade import identify_row
from pdf2doi_ray.config import DEFAULT_CONFIG, NO_ARXIV2DOI_CONFIG
from pdf2doi_ray.stages.extract import make_extract_fn


def batch_for(texts):
    return pa.table({
        "url": [f"https://h{i}.org/p-{i}.html" for i in range(len(texts))],
        "text": texts,
        "meta_keys": pa.array([[] for _ in texts], type=pa.list_(pa.string())),
        "meta_vals": pa.array([[] for _ in texts], type=pa.list_(pa.string())),
    })


def reference_rows(batch, cfg):
    out = []
    for i in range(batch.num_rows):
        out.append(identify_row(
            batch["url"][i].as_py(), batch["text"][i].as_py(),
            batch["meta_keys"][i].as_py(), batch["meta_vals"][i].as_py(), cfg))
    return out


def assert_batch_matches(texts, cfg):
    batch = batch_for(texts)
    got = make_extract_fn(cfg)(batch)
    want = reference_rows(batch, cfg)
    for i, w in enumerate(want):
        g = (got["identifier"][i].as_py(), got["identifier_type"][i].as_py(),
             got["method"][i].as_py(), got["validation_info"][i].as_py())
        assert g == tuple(w), (texts[i], g, tuple(w))


CASES = [
    "doi: 10.1234/abc.5 tail",                       # v0 valid first hit
    "bare 10.1234/abc.5 tail",                       # v1
    "(10.1234/v.567abc( tail",                       # v2 after v1 fails
    "via https://doi.org/10.1234/u.1 x",             # v1-in-url
    "10.1234/only.9",                                # whole-string forms
    "arXiv:2103.15522v2 cited",                      # arxiv v0 (degrades)
    "2103.15522.pdf",                                # arxiv v1
    "2103.15522",                                    # arxiv v2
    "doi: 10.12345 invalid then doi: 10.1234/ok.1 x",  # first v0 hit invalid
    "10.12345 bare-invalid then 10.1234/ok.2 y",     # first v1 hit invalid
    "no identifiers at all",
    "10.1",                                          # prefilter-passing, no hit
    "unicode ws doi: 10.1234/u.3 after",  # non-ASCII → exact loop
    "doi: 10.1234/nb.4 thin-space",            # non-ASCII terminator
    "",                                              # empty text
    "strange doi: 10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2 x",
]


def test_fast_route_matches_exact_on_cases():
    assert_batch_matches(CASES, DEFAULT_CONFIG)
    assert_batch_matches(CASES, NO_ARXIV2DOI_CONFIG)
    assert_batch_matches(CASES, DEFAULT_CONFIG.with_(methods=("document_text",)))


def test_fast_route_fuzz():
    rng = random.Random(42)
    frags = ["doi: ", "doi", "10.1234/ab.1", "10.12345", "2103.15522",
             "arXiv:", ".pdf", " ", "\n", '"', "<", "word ", "10.", "v2",
             " ", "10.16/j.x.1", "]", ":", "(", "end"]
    texts = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 10)))
             for _ in range(2000)]
    assert_batch_matches(texts, DEFAULT_CONFIG)
    assert_batch_matches(texts, NO_ARXIV2DOI_CONFIG)
