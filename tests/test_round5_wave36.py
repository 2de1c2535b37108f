"""Wave-36 operator tests: incremental near-dup, bigram collision
homogeneity, suffix-prefix reassembly detection."""
import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_near_dup_delta_cross_side_only():
    import ray.data

    from pdf2doi_ray.stages.dedup import minhash_near_dups, near_dup_delta

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 10, 11, 12],
        "text": [base,                            # old
                 base + " exactly",               # old near-dup of 0
                 base + " indeed",                # new near-dup of 0/1
                 base + " indeed",                # new exact dup of 10
                 "completely different words everywhere nothing shared "
                 "with any other document at all here now"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    got = near_dup_delta(ds, split_doc_id=10, threshold_permille=700) \
        .to_pandas()
    pairs = {(o, n) for o, n in zip(got["doc_old"], got["doc_new"])}
    # cross-side pairs only: old {0,1} x new {10,11}
    assert (0, 10) in pairs and (1, 10) in pairs
    assert (0, 11) in pairs and (1, 11) in pairs
    assert all(o < 10 <= n for o, n in pairs)
    # parity: exactly the cross-side subset of the full self-join
    full = minhash_near_dups(ds, threshold_permille=700).to_pandas()
    want = {(a, b) for a, b in zip(full["doc_a"], full["doc_b"])
            if (a < 10) != (b < 10)}
    assert pairs == want


@pytest.mark.usefixtures("ray_session")
def test_bigram_collision_exact_ppm():
    import ray.data

    from pdf2doi_ray.stages.textstats import bigram_collision_homogeneity

    docs = pd.DataFrame({
        "text": ["aaaa", "ab", "xyxy"],
        "lang": ["a", "a", "b"],
    })
    got = bigram_collision_homogeneity(
        ray.data.from_pandas(docs).repartition(2)).to_pandas() \
        .set_index("lang")
    # lang a: bigrams aa,aa,aa,ab -> counts {aa:3, ab:1}, N=4
    a = got.loc["a"]
    assert (a["n_bigrams"], a["n_distinct_bigrams"]) == (4, 2)
    assert a["collision_ppm"] == 10**6 * (9 + 1) // 16
    # lang b: xy,yx,xy -> {xy:2, yx:1}, N=3
    b = got.loc["b"]
    assert (b["n_bigrams"], b["n_distinct_bigrams"]) == (3, 2)
    assert b["collision_ppm"] == 10**6 * (4 + 1) // 9


@pytest.mark.usefixtures("ray_session")
def test_suffix_prefix_overlap_detects_stitch_points():
    import ray.data

    from pdf2doi_ray.stages.joins import suffix_prefix_overlap

    words = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [" ".join(words[:18]),            # tail w10..w17
                 " ".join(words[10:30]),          # head w10..w17 -> pair
                 " ".join(words[5:25]),           # no boundary match
                 "short doc"],                    # < k tokens: ignored
    })
    got = suffix_prefix_overlap(
        ray.data.from_pandas(docs).repartition(2), k=8).to_pandas()
    pairs = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert (0, 1) in pairs
    assert all(a != b for a, b in pairs)
    row = got.set_index(["doc_a", "doc_b"]).loc[(0, 1)]
    assert row["boundary_gram"] == " ".join(words[10:18])
    # doc 2's tail (w17..w24) matches nobody's head
    assert not any(a == 2 for a, _ in pairs)


@pytest.mark.usefixtures("ray_session")
def test_t5_span_corruption_runs_and_sentinels():
    import ray.data

    from pdf2doi_ray.stages.corpus import t5_span_corruption

    # doc_id 0, mask_mod 4 -> positions 0,4,8,12 masked; craft a doc
    # where 4 and 5 are BOTH masked under mod 2 to test run merging
    docs = pd.DataFrame({
        "doc_id": [0, 3],
        "text": ["a b c d e f g h i j k l m n o p", "q r s"]})
    out = t5_span_corruption(ray.data.from_pandas(docs).repartition(2),
                             mask_mod=4).to_pandas() \
        .set_index("doc_id")
    r0 = out.loc[0]
    assert r0["input_text"] == \
        "<X_0> b c d <X_1> f g h <X_2> j k l <X_3> n o p"
    assert r0["target_text"] == "<X_0> a <X_1> e <X_2> i <X_3> m"
    assert r0["n_masked"] == 4
    r3 = out.loc[3]
    assert (r3["input_text"], r3["target_text"], r3["n_masked"]) == \
        ("q r s", "", 0)

    # contiguous run: mod 2 with doc_id 0 masks every even pos ->
    # runs are singletons; doc_id 2 (2*17=34 even) same parity; use a
    # doc where consecutive positions mask: mod 1 masks EVERYTHING ->
    # one run, one sentinel
    one = t5_span_corruption(
        ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [5], "text": ["x y z"]})), mask_mod=1) \
        .to_pandas().iloc[0]
    assert one["input_text"] == "<X_0>"
    assert one["target_text"] == "<X_0> x y z"
    assert one["n_masked"] == 3


@pytest.mark.usefixtures("ray_session")
def test_mlm_masking_golden():
    import ray.data

    from pdf2doi_ray.stages.corpus import mlm_masking_pairs

    # doc_id chosen so all three 80/10/10 branches fire: selection at
    # (pos*31 + d*17) % 7 == 0; branch by (pos + d) % 10
    # doc_id 1 with >= 28 tokens hits the random branch at pos 27
    # ((27*31 + 17) % 7 == 0 and (27 + 1) % 10 == 8)
    docs = pd.DataFrame({
        "doc_id": [0, 8, 1],
        "text": ["a b c d e f g h i j k l m n", "p q r s t u v w x y",
                 " ".join(f"tok{i}" for i in range(30))]})
    got = mlm_masking_pairs(ray.data.from_pandas(docs).repartition(2)) \
        .to_pandas().set_index("doc_id")

    def golden(d, text):
        tk = text.split()
        out, sel, msk, rnd = [], 0, 0, 0
        for p, tok in enumerate(tk):
            if (p * 31 + d * 17) % 7 == 0:
                sel += 1
                r = (p + d) % 10
                if r < 8:
                    out.append("[MASK]")
                    msk += 1
                elif r == 8:
                    out.append(tk[(p * 13 + 7) % len(tk)])
                    rnd += 1
                else:
                    out.append(tok)
            else:
                out.append(tok)
        return " ".join(out), sel, msk, rnd

    for d, text in zip(docs["doc_id"], docs["text"]):
        mt, sel, msk, rnd = golden(d, text)
        row = got.loc[d]
        assert row["masked_text"] == mt
        assert (row["n_selected"], row["n_masked"],
                row["n_random"]) == (sel, msk, rnd)
    # the fixture actually exercises the random-replacement branch
    assert got["n_random"].sum() > 0
