"""Wave-35 operator tests: language ID, tokenizer fertility,
temperature mixing, bitext candidates, URL-tree rollup."""
import math

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_langid_trigram_confusion():
    import ray.data

    from pdf2doi_ray.stages.textstats import langid_trigram_confusion

    docs = pd.DataFrame({
        "doc_id": range(7),
        "text": ["the quick the lazy the end", "the other the same the",
                 "der die das der die der das",
                 "der das der die der",
                 "une deux une trois une deux",
                 # a 'de'-looking doc labeled en -> off-diagonal cell
                 "der die das der die das",
                 "ab"],                      # too short: no trigram
        "lang": ["en", "en", "de", "de", "fr", "en", "zz"],
    })
    got = langid_trigram_confusion(
        ray.data.from_pandas(docs).repartition(3), k_profile=10) \
        .to_pandas().set_index(["lang", "pred_lang"])["n_docs"].to_dict()
    assert got[("en", "en")] == 2
    assert got[("de", "de")] == 2
    assert got[("fr", "fr")] == 1
    assert got[("en", "de")] == 1            # the mislabeled doc
    # trigram-less doc: all-zero overlaps -> alphabetically first
    # profiled lang ('de'; 'zz' itself has no trigrams so no profile)
    assert got[("zz", "de")] == 1


@pytest.mark.usefixtures("ray_session")
def test_tokenizer_fertility_counts():
    import ray.data

    from pdf2doi_ray.stages.textstats import tokenizer_fertility

    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["don't stop 123 now!", "hello world"],
        "lang": ["en", "en"],
    })
    got = tokenizer_fertility(
        ray.data.from_pandas(docs).repartition(2)).to_pandas().iloc[0]
    # words: 4 + 2; subtokens: don|'|t|stop|123|now|! = 7, hello|world = 2
    assert got["n_docs"] == 2
    assert got["n_words"] == 6
    assert got["n_subtokens"] == 9
    assert got["fertility_permille"] == 1000 * 9 // 6
    chars = len("don't stop 123 now!") + len("hello world")
    assert got["chars_per_subtoken_permille"] == 1000 * chars // 9


@pytest.mark.usefixtures("ray_session")
def test_temperature_mixture_plan_isqrt_weights():
    import ray.data

    from pdf2doi_ray.stages.corpus import temperature_mixture_plan

    docs = pd.DataFrame({
        "doc_id": range(3),
        "text": ["w " * 10_000 + "end",      # 10001 tokens
                 "x " * 100 + "end",         # 101 tokens
                 "y z"],                     # 2 tokens
        "source": ["big", "mid", "tiny"],
    })
    got = temperature_mixture_plan(
        ray.data.from_pandas(docs).repartition(2)).to_pandas() \
        .set_index("source")
    toks = {"big": 10_001 * 2, "mid": 101 * 2, "tiny": 2}
    # engine tokens: single-space split -> "w "*10000+"end" has 10001
    toks = {s: int(got.loc[s, "n_tokens"]) for s in toks}
    w = {s: math.isqrt(t) for s, t in toks.items()}
    tw, tt = sum(w.values()), sum(toks.values())
    for srce in toks:
        assert got.loc[srce, "weight_permille"] == 1000 * w[srce] // tw
        assert got.loc[srce, "epochs_permille"] == \
            1000 * tt * w[srce] // (tw * toks[srce])
    # smoothing lifts the tiny source above its raw share
    assert (got.loc["tiny", "weight_permille"]
            > 1000 * toks["tiny"] // tt)


@pytest.mark.usefixtures("ray_session")
def test_bitext_candidates_band_join():
    import ray.data

    from pdf2doi_ray.stages.joins import bitext_candidates

    def doc(i, lang, n, source="h"):
        return {"doc_id": i, "text": "x" * n, "lang": lang,
                "source": source}

    docs = pd.DataFrame([
        doc(0, "en", 1000), doc(1, "de", 1100),     # diff 100: pair
        doc(2, "fr", 1200),                         # pairs with both
        doc(3, "en", 5000), doc(4, "de", 5200),     # diff exactly 200
        doc(5, "en", 9000), doc(6, "de", 9201),     # diff 201: dropped
        doc(7, "en", 1050),                         # same lang as 0: no pair
        doc(8, "de", 1000, source="other"),         # other key
    ])
    got = bitext_candidates(ray.data.from_pandas(docs).repartition(3),
                            key_col="source", tol=200).to_pandas()
    pairs = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) in pairs
    assert (3, 4) in pairs                      # boundary kept
    assert (5, 6) not in pairs                  # over tolerance
    assert (0, 7) not in pairs                  # same lang
    assert not any(a == 8 or b == 8 for a, b in pairs)  # other key
    assert (1, 7) in pairs and (2, 7) in pairs  # de/fr vs en at 1050
    assert len(pairs) == len(got)               # no duplicate rows
    row = got.set_index(["doc_a", "doc_b"]).loc[(3, 4)]
    assert row["len_diff"] == 200 and row["key"] == "h"


@pytest.mark.usefixtures("ray_session")
def test_url_tree_rollup_prefix_counts():
    import ray.data

    from pdf2doi_ray.stages.skew import url_tree_rollup

    urls = ["https://a.org/docs/x/p1",
            "https://a.org/docs/x/p2",
            "https://a.org/docs/y/p3?q=1",      # query stripped
            "https://a.org/p4",                 # depth-1 only
            "https://b.org/z/w/v/deep"]
    pages = pd.DataFrame({"url": urls})
    got = url_tree_rollup(ray.data.from_pandas(pages).repartition(2),
                          max_depth=3).to_pandas()
    d = {(r.host, r.depth, r.prefix): r.n_pages
         for r in got.itertuples(index=False)}
    assert d[("a.org", 1, "/docs")] == 3
    assert d[("a.org", 2, "/docs/x")] == 2
    assert d[("a.org", 2, "/docs/y")] == 1
    assert d[("a.org", 3, "/docs/x/p1")] == 1
    assert d[("a.org", 1, "/p4")] == 1
    assert d[("b.org", 3, "/z/w/v")] == 1
    assert ("b.org", 4, "/z/w/v/deep") not in d     # max_depth honored


@pytest.mark.usefixtures("ray_session")
def test_feather_roundtrip_identity(tmp_path):
    import ray.data

    from pdf2doi_ray.sources.formats import export_feather, read_feather_dir

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a,b", 'quote "x"', "plain"],
                       "n": [10, 20, 30]})
    out = str(tmp_path / "feather")
    export_feather(ray.data.from_pandas(df).repartition(2),
                   out).materialize()
    back = read_feather_dir(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


@pytest.mark.usefixtures("ray_session")
def test_compression_ratio_flags_golden():
    import zlib

    import ray.data

    from pdf2doi_ray.stages.textstats import compression_ratio_flags

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["spam spam spam " * 50,          # hyper-compressible
                 "The quick brown fox jumps over the lazy dog in the "
                 "morning while birds sing various complicated songs.",
                 ""]})
    got = compression_ratio_flags(
        ray.data.from_pandas(docs).repartition(2),
        max_ratio_permille=450).to_pandas().set_index("doc_id")
    for i, text in zip(docs["doc_id"], docs["text"]):
        b = text.encode()
        gz = len(zlib.compress(b, 6))
        row = got.loc[i]
        assert row["raw_bytes"] == len(b)
        assert row["deflate_bytes"] == gz
        exp = 1000 * gz // len(b) if len(b) else 1000
        assert row["ratio_permille"] == exp
        assert row["keep"] == int(exp >= 450)
    assert got.loc[0, "keep"] == 0          # templated spam dropped
    assert got.loc[1, "keep"] == 1          # natural prose kept
    assert got.loc[2, "keep"] == 1          # empty doc: ratio 1000
