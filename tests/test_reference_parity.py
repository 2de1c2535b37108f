"""Differential conformance: engine kernels vs the reference's pure functions.

Loads ``/root/reference/pdf2doi/patterns.py`` directly from file (it has no
third-party imports) and replays the reference's text-cascade semantics as a
tiny oracle, then fuzzes both sides with deterministic generated corpora.
This locks byte-parity of normalization and of the full in-text search order
without copying any reference code into the engine.
"""

import importlib.util
import random
import re

import pytest

from pdf2doi_ray.cascade import search_texts
from pdf2doi_ray.idpatterns import standardise_doi


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_patterns", "/root/reference/pdf2doi/patterns.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def oracle_search(text, ref):
    """Reference in-text search replayed from its published semantics
    (finders.py:294-357 with the offline validator)."""
    for rx in ref.doi_regexp:
        for hit in re.findall(rx, text, re.I):
            if ref.standardise_doi(hit):
                return ref.standardise_doi(hit), "DOI"
    for rx in ref.arxiv_regexp:
        for hit in re.findall(rx, text, re.I):
            if re.match(ref.arxiv2007_pattern, hit, re.I):
                return hit, "arxiv ID"
    return None, None


def corpus(n=4000, seed=42):
    rng = random.Random(seed)
    frags = [
        "plain words ", "DOI: ", "doi:", "doi ", "10.", "10.1234", "/abc.",
        "arXiv:", "arxiv : ", "1234.5678", "v2", ".pdf", "\n", '"', "<", " ",
        "10.1109/CVPR.2016.90.", "https://doi.org/", "10.16/j.x.1", "]",
        ":", "-", "(", ")", "10.58.12/n.14189", "2103.15522", "end",
    ]
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(frags)
                           for _ in range(rng.randint(1, 12))))
    return out


def test_standardise_parity_fuzz(ref):
    for s in corpus():
        assert standardise_doi(s) == ref.standardise_doi(s), repr(s)


def test_text_search_parity_fuzz(ref):
    for s in corpus(seed=7):
        got = search_texts(s)[:2]
        want = oracle_search(s, ref)
        assert got == want, repr(s)
