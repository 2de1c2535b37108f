"""Round-4 wave-17: near-dup evaluation harness, char-bigram
familiarity."""

import pandas as pd
import pytest


def _rd(df, blocks=3):
    import ray.data
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
def test_neardup_eval_counts_confusion():
    from pdf2doi_ray.stages.dedup import neardup_eval

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        # 0→1 identical (true dup, simhash must flag);
        # 2→3 unrelated (not a dup)
        "text": [base, base,
                 "one two three four five six seven eight nine ten",
                 "cats dogs birds fish mice newts frogs goats bats owls"]})
    got = neardup_eval(_rd(docs, 2))
    assert got["tp"].tolist() == [1]
    assert got["fn"].tolist() == [0]
    assert got["fp"].tolist() == [0]
    # adjacent probe pairs: (0,1), (1,2), (2,3) → tn = 2
    assert got["tn"].tolist() == [2]
    assert got["precision_permille"].tolist() == [1000]
    assert got["recall_permille"].tolist() == [1000]


@pytest.mark.usefixtures("ray_session")
def test_char_bigram_familiarity_rare_vs_common():
    from pdf2doi_ray.stages.textstats import char_bigram_familiarity

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["ababab", "ababab", "qz", ""]})
    for blocks in (1, 4):
        got = char_bigram_familiarity(_rd(docs, blocks)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # corpus counts: ab×6, ba×4, qz×1
        # docs 1,2: pairs ab,ba,ab,ba,ab → (6+4+6+4+6)//5 = 5
        assert got["familiarity"].tolist() == [5, 5, 1, 0]
        assert got["n_bigrams"].tolist() == [5, 5, 1, 0]
