"""Round-3 differential fuzz for the rewritten/new distributed kernels:

* minhash_near_dups (vectorized attach/verify + Bloom id filter + sort-
  contract blocks) vs the independent golden implementation, over random
  corpora INCLUDING the degenerate shapes the vectorized kernel must get
  right (empty texts, sub-shingle texts, identical docs, singletons);
* the salted time-band range join vs brute force across random
  (n_salts, hot_rows_per_group) configs and event mixes;
* pointer-jumping connected components vs a driver-side union-find.
"""

import numpy as np
import pyarrow as pa
import pytest

import golden_impl as G


def _events_table(rows):
    eid, ts, uid, et = zip(*rows)
    return pa.table({
        "event_id": pa.array(eid, type=pa.int64()),
        "ts": pa.array(list(ts), type=pa.timestamp("us")),
        "user_id": pa.array(uid, type=pa.int64()),
        "event_type": pa.array(et, type=pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minhash_near_dups_fuzz_vs_golden(seed):
    import ray.data

    from pdf2doi_ray.stages.dedup import minhash_near_dups

    rng = np.random.RandomState(seed)
    vocab = [f"t{i}" for i in range(40)]   # tiny vocab → frequent collisions
    texts = {}
    i = 0
    # clusters of randomly perturbed copies
    for _ in range(8):
        base = [vocab[rng.randint(40)] for _ in range(rng.randint(1, 30))]
        for _ in range(rng.randint(1, 5)):
            doc = list(base)
            if doc and rng.rand() < 0.7:
                doc[rng.randint(len(doc))] = vocab[rng.randint(40)]
            texts[i] = " ".join(doc)
            i += 1
    # degenerate shapes: empty, single-token, two-token (sub-shingle),
    # exact duplicates
    for extra in ("", "solo", "two words", "two words", ""):
        texts[i] = extra
        i += 1
    t = pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                  "text": pa.array([texts[k] for k in sorted(texts)])})
    out = minhash_near_dups(
        ray.data.from_arrow(t).repartition(3)).to_pandas()
    engine = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int),
                     out["jaccard_permille"].astype(int)))
    assert engine == G.near_dup_pairs(texts), seed
    assert len(engine) == len(out)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,n_salts,hot_bound", [
    (3, 1, 65536), (4, 4, 4), (5, 8, 1), (6, 3, 16),
])
def test_time_band_join_fuzz_vs_brute(seed, n_salts, hot_bound):
    import ray.data

    from pdf2doi_ray.stages.rangejoin import time_band_join

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(300):
        # mixed density: a few hot user-hours, a long sparse tail
        uid = int(rng.choice([1, 1, 1, 2, 3, 5, 8, 13]))
        ts = int(rng.randint(0, 8_000_000_000))
        rows.append((i, ts, uid,
                     str(rng.choice(["error", "signup", "view"]))))
    expected = set()
    for ea, ta, ua, eta in rows:
        if eta != "error":
            continue
        for eb, tb, ub, etb in rows:
            if etb == "signup" and ub == ua and \
                    abs(ta - tb) <= 1800_000_000:
                expected.add((ea, eb))
    ds = ray.data.from_arrow(_events_table(rows)).repartition(4)
    got = time_band_join(ds, "error", "signup", band_s=1800,
                         n_salts=n_salts,
                         hot_rows_per_group=hot_bound).to_pandas()
    pairs = set(zip(got["a_event_id"].astype(int),
                    got["b_event_id"].astype(int)))
    assert pairs == expected, (seed, n_salts, hot_bound)
    assert len(pairs) == len(got)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.usefixtures("ray_session")
def test_connected_components_fuzz_vs_union_find():
    import ray.data

    from pdf2doi_ray.stages.graph import connected_components

    # Two independent random graphs on disjoint node-id ranges, solved in
    # ONE call: each propagation round costs ~7 fixed Ray stages regardless
    # of graph size, so batching the fuzz cases amortizes that fixed cost
    # instead of paying it once per seed.
    edges = []
    for seed, offset in ((7, 0), (8, 1000)):
        rng = np.random.RandomState(seed)
        es = [(int(rng.randint(0, 40)), int(rng.randint(0, 40)))
              for _ in range(45)]
        edges += [(a + offset, b + offset) for a, b in es if a != b]
    pairs = pa.table({
        "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
        "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
    })
    out = connected_components(
        ray.data.from_arrow(pairs).repartition(3)).to_pandas()
    got = dict(zip(out["node"].astype(int), out["component"].astype(int)))
    assert got == _union_find_components(edges)


@pytest.mark.usefixtures("ray_session")
def test_fuzz_dedup_lines_keep_first_vs_bruteforce():
    """Randomized differential fuzz of the distributed keep-first line
    dedup against a 12-line brute-force reference over adversarial tiny
    corpora (tiny alphabet → heavy cross-doc collisions, empty docs,
    within-doc repeats), across block layouts."""
    import random

    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.corpus import dedup_lines_keep_first

    rng = random.Random(77)
    words = ["a", "b", "c"]
    for trial in range(12):
        n_docs = rng.randrange(1, 9)
        texts = {i: " ".join(rng.choice(words)
                             for _ in range(rng.randrange(0, 9)))
                 for i in range(n_docs)}
        every = rng.choice([1, 2, 3])
        # brute force: global keep-first over (doc, pos) ordered lines
        seen, want = set(), {}
        for d in sorted(texts):
            toks = [x for x in texts[d].split(" ") if x]
            kept = []
            for p in range(0, len(toks), every):
                line = " ".join(toks[p:p + every])
                if line not in seen:
                    seen.add(line)
                    kept.append(line)
            if kept:
                want[d] = ("\n".join(kept), len(kept))
        t = pa.table({
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)],
                             type=pa.string()),
        })
        ds = ray.data.from_arrow(t).repartition(rng.choice([1, 2, 4]))
        out = dedup_lines_keep_first(ds, every=every).to_pandas()
        got = {int(r.doc_id): (r.text, int(r.n_lines_kept))
               for r in out.itertuples()}
        assert got == want, (trial, texts, every, got, want)
