"""Seeded differential fuzz for the round-5 rebuilt operators: each op
vs a brute-force golden on randomized small corpora (the
test_round3_fuzz.py pattern — deterministic seeds, no hypothesis DB)."""
import math

import numpy as np
import pandas as pd
import pytest


def _random_docs(rng, n_docs, vocab, n_tokens):
    return [" ".join(rng.choice(vocab,
                                size=rng.integers(3, n_tokens)).tolist())
            for _ in range(n_docs)]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_jaccard_pairs_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.dedup import jaccard_threshold_pairs

    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i}" for i in range(12)])  # tiny vocab → dups
    texts = _random_docs(rng, 30, vocab, 14)
    df = pd.DataFrame({"doc_id": range(30), "text": texts})
    tau = int(rng.choice([300, 500, 700]))
    got = jaccard_threshold_pairs(
        ray.data.from_pandas(df).repartition(3),
        tau_permille=tau, gram_len=3, hot_df=6).to_pandas()
    got_set = {(a, b, i, u) for a, b, i, u in zip(
        got["doc_a"], got["doc_b"], got["inter"], got["uni"])} \
        if len(got) else set()

    def sh(text):
        tk = text.split()
        return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
    sets = {i: sh(t) for i, t in enumerate(texts)}
    want = set()
    for a in range(30):
        for b in range(a + 1, 30):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * 1000 >= tau * uni:
                want.add((a, b, inter, uni))
    assert got_set == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 4])
def test_fuzz_containment_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.dedup import containment_pairs

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(10)])
    texts = _random_docs(rng, 25, vocab, 16)
    df = pd.DataFrame({"doc_id": range(25), "text": texts})
    tau = 600
    got = containment_pairs(ray.data.from_pandas(df).repartition(3),
                            tau_permille=tau, hot_df=6).to_pandas()
    got_set = {(a, b, c) for a, b, c in zip(
        got["doc_a"], got["doc_b"], got["containment_permille"])} \
        if len(got) else set()

    def sh(text):
        tk = [t for t in text.split() if t]
        return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
    sets = {i: sh(t) for i, t in enumerate(texts)}
    want = set()
    for a in range(25):
        for b in range(a + 1, 25):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            m = min(len(sets[a]), len(sets[b]))
            if 1000 * inter >= tau * m:
                want.add((a, b, 1000 * inter // m))
    assert got_set == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [5, 6, 7])
def test_fuzz_gini_vs_direct(seed):
    import ray.data

    from pdf2doi_ray.stages.aggs import gini_skew

    rng = np.random.default_rng(seed)
    # zipf-ish key draw, including a hot key
    keys = [f"k{int(min(rng.zipf(1.5), 50))}" for _ in range(4000)]
    df = pd.DataFrame({"key": keys})
    got = gini_skew(ray.data.from_pandas(df).repartition(7), "key").iloc[0]
    x = np.sort(pd.Series(keys).value_counts().to_numpy())
    m, tot = len(x), int(x.sum())
    i = np.arange(1, m + 1, dtype=np.int64)
    num = int(((2 * i - m - 1) * x).sum())
    assert (got["n_keys"], got["total"], got["gini_num"],
            got["gini_den"]) == (m, tot, num, m * tot)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [8, 9])
def test_fuzz_pareto_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.aggs import pareto_frontier

    rng = np.random.default_rng(seed)
    n = 600
    df = pd.DataFrame({
        "p": rng.integers(0, 40, size=n).astype(np.int64),
        "d": rng.integers(0, 40, size=n).astype(np.int64)})
    got = pareto_frontier(ray.data.from_pandas(df).repartition(5),
                          "p", "d", num_buckets=7).to_pandas()
    got_rows = sorted(zip(got["p"], got["d"]))

    rows = list(zip(df["p"], df["d"]))
    want = sorted(
        (p, d) for (p, d) in rows
        if not any((pj >= p and dj <= d and (pj > p or dj < d))
                   for (pj, dj) in rows))
    assert got_rows == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [10, 11])
def test_fuzz_kcore_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.graph import kcore_decomposition

    rng = np.random.default_rng(seed)
    n_nodes, n_edges, k = 60, 90, 2
    a = rng.integers(0, n_nodes, size=n_edges)
    b = rng.integers(0, n_nodes, size=n_edges)
    keep = a != b
    pairs = pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep]}) \
        .drop_duplicates()
    got = kcore_decomposition(
        ray.data.from_pandas(pairs).repartition(3), k=k)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    got_map = dict(zip(got["node"], got["core_degree"]))

    # brute-force peel
    adj = {}
    for x, y in zip(pairs["vec_a"], pairs["vec_b"]):
        adj.setdefault(int(x), set()).add(int(y))
        adj.setdefault(int(y), set()).add(int(x))
    alive = set(adj)
    while True:
        victims = {v for v in alive
                   if len(adj[v] & alive) < k}
        if not victims:
            break
        alive -= victims
    want = {v: len(adj[v] & alive) for v in alive}
    assert got_map == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [12, 13])
def test_fuzz_bitext_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.joins import bitext_candidates

    rng = np.random.default_rng(seed)
    n = 80
    df = pd.DataFrame({
        "doc_id": range(n),
        "text": ["x" * int(rng.integers(1, 1500)) for _ in range(n)],
        "lang": rng.choice(["en", "de", "fr"], size=n),
        "source": rng.choice(["h1", "h2"], size=n),
    })
    tol = 200
    got = bitext_candidates(ray.data.from_pandas(df).repartition(4),
                            tol=tol).to_pandas()
    got_set = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])} \
        if len(got) else set()
    want = set()
    rows = df.to_dict("records")
    for i in range(n):
        for j in range(i + 1, n):
            ri, rj = rows[i], rows[j]
            if (ri["source"] == rj["source"]
                    and ri["lang"] != rj["lang"]
                    and abs(len(ri["text"]) - len(rj["text"])) <= tol):
                want.add((i, j))
    assert got_set == want
    assert len(got) == len(got_set)      # no duplicate pair rows


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [14, 15])
def test_fuzz_suffix_prefix_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.joins import suffix_prefix_overlap

    rng = np.random.default_rng(seed)
    vocab = np.array([f"v{i}" for i in range(6)])   # tiny vocab → matches
    k = 4
    texts = _random_docs(rng, 40, vocab, 12)
    df = pd.DataFrame({"doc_id": range(40), "text": texts})
    got = suffix_prefix_overlap(
        ray.data.from_pandas(df).repartition(4), k=k).to_pandas()
    got_set = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])} \
        if len(got) else set()
    want = set()
    for a in range(40):
        ta = texts[a].split(" ")
        if len(ta) < k:
            continue
        for b in range(40):
            tb = texts[b].split(" ")
            if a == b or len(tb) < k:
                continue
            if ta[-k:] == tb[:k]:
                want.add((a, b))
    assert got_set == want


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [16])
def test_fuzz_langid_vs_brute_force(seed):
    import ray.data

    from pdf2doi_ray.stages.textstats import langid_trigram_confusion

    rng = np.random.default_rng(seed)
    alph = {"aa": "abcde", "bb": "fghij", "cc": "abfgk"}
    docs = []
    for i in range(60):
        lang = ["aa", "bb", "cc"][i % 3]
        chars = rng.choice(list(alph[lang] + " "), size=rng.integers(2, 40))
        docs.append({"doc_id": i, "text": "".join(chars), "lang": lang})
    df = pd.DataFrame(docs)
    k = 8
    got = langid_trigram_confusion(
        ray.data.from_pandas(df).repartition(3), k_profile=k) \
        .to_pandas()
    got_map = {(l, p): n for l, p, n in zip(
        got["lang"], got["pred_lang"], got["n_docs"])}

    # brute force: profiles = top-k trigrams per lang by (count desc, tg)
    from collections import Counter
    cnt = {}
    for r in docs:
        t = r["text"]
        for i in range(len(t) - 2):
            cnt.setdefault(r["lang"], Counter())[t[i:i + 3]] += 1
    profs = {lg: {g for g, _ in sorted(c.items(),
                                       key=lambda kv: (-kv[1], kv[0]))[:k]}
             for lg, c in cnt.items()}
    langs = sorted(profs)
    want = {}
    for r in docs:
        t = r["text"]
        tgs = {t[i:i + 3] for i in range(len(t) - 2)}
        best = max(langs, key=lambda lg: (len(tgs & profs[lg]),
                                          [-ord(c) for c in lg]))
        want[(r["lang"], best)] = want.get((r["lang"], best), 0) + 1
    assert got_map == want
