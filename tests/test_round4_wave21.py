"""Round-4 wave-21: doc-frequency spectrum, vocabulary growth curve."""

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_doc_frequency_spectrum_dedups_within_doc():
    from pdf2doi_ray.stages.corpus import doc_frequency_spectrum

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # "a" repeats inside doc 1 but must count once per doc
        "text": ["a a b", "a c", "c d d"],
    })
    # df: a→2 b→1 c→2 d→1 → spectrum {1: 2 terms, 2: 2 terms}
    for blocks in (1, 3):
        got = doc_frequency_spectrum(_rd(docs, blocks)).to_pandas() \
            .set_index("doc_freq")["n_terms"].to_dict()
        assert got == {1: 2, 2: 2}


@pytest.mark.usefixtures("ray_session")
def test_vocab_growth_curve_probe_semantics():
    from pdf2doi_ray.stages.corpus import vocab_growth_curve

    docs = pd.DataFrame({
        "doc_id": [10, 11, 12, 13, 20],
        "source": ["s1", "s1", "s1", "s1", "s2"],
        "text": ["a b", "b c", "d", "e f g", "x y"],
    })
    got = vocab_growth_curve(_rd(docs, 3), probes=(2, 8)).to_pandas()
    by = {(r.source, r.probe): r.vocab_size for r in got.itertuples()}
    # s1 first 2 docs: {a,b,c} = 3; all 4 docs: 7 distinct
    assert by[("s1", 2)] == 3
    assert by[("s1", 8)] == 7
    # s2 has 1 doc (< both probes): whole vocab at every probe
    assert by[("s2", 2)] == 2
    assert by[("s2", 8)] == 2
