"""Independent, deliberately-naive reference implementations of the
approximate / non-SQL-expressible operators (minhash near-dups, simhash,
winnowing).  Pure Python data structures and arithmetic — no shared code
with the engine beyond the published algorithm parameters (which ARE the
spec: hash family seed/modulus, band geometry, bucket cap, k/w).  Used by
``test_golden_digests.py`` as the oracle for the queries the driver can only
rows-check (VERDICT round 1, next-round item 3)."""

from __future__ import annotations

from hashlib import blake2b, md5

import numpy as np

# --- published algorithm parameters (the spec, not shared code) -----------
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
P32 = 4294967311
_rng = np.random.RandomState(42)
A = [int(x) for x in _rng.randint(1, 2**31 - 1, size=N_HASHES)]
B = [int(x) for x in _rng.randint(0, 2**31 - 1, size=N_HASHES)]
MAX_ALL_PAIRS_BUCKET = 64
WINNOW_K, WINNOW_W = 5, 8


def tok_hash(token: str) -> int:
    # round 4: md5 first-8-bytes big-endian (was blake2b) — the published
    # spec changed so a SQL oracle can recompute the shingle hash
    return int.from_bytes(md5(token.encode("utf-8")).digest()[:8],
                          "big") >> 1


def shingle_set(text: str, n: int = 3) -> set[int]:
    words = text.split()
    if not words:
        return set()
    if len(words) < n:
        return {tok_hash(" ".join(words))}
    return {tok_hash(" ".join(words[i:i + n]))
            for i in range(len(words) - n + 1)}


def minhash_sig(sh: set[int]) -> list[int]:
    if not sh:
        return [2**63 - 1] * N_HASHES
    folded = [x & 0xFFFFFFFF for x in sh]
    return [min((A[j] * x + B[j]) % P32 for x in folded)
            for j in range(N_HASHES)]


def band_digests(sig: list[int]) -> list[str]:
    out = []
    for b in range(N_BANDS):
        seg = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        # md5 of the ':'-joined decimal values, first 16 hex chars (round 4
        # spec — SQL-recomputable band digest)
        out.append(md5(":".join(str(s) for s in seg).encode())
                   .hexdigest()[:16])
    return out


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def near_dup_pairs(texts_by_id: dict[int, str], threshold_permille: int = 800,
                   n: int = 3) -> set[tuple[int, int, int]]:
    """(doc_a, doc_b, jaccard_permille) triples the engine must produce."""
    shs = {i: shingle_set(t, n) for i, t in texts_by_id.items()}
    buckets: dict[tuple[int, str], list[int]] = {}
    for i in sorted(texts_by_id):
        for b, d in enumerate(band_digests(minhash_sig(shs[i]))):
            buckets.setdefault((b, d), []).append(i)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if len(ids) < 2:
            continue
        if len(ids) <= MAX_ALL_PAIRS_BUCKET:
            cand.update((ids[i], ids[j])
                        for i in range(len(ids))
                        for j in range(i + 1, len(ids)))
        else:
            cand.update((ids[0], o) for o in ids[1:])
    out = set()
    for a, b in cand:
        inter = len(shs[a] & shs[b])
        union = len(shs[a]) + len(shs[b]) - inter
        # integer-floor permille (round 4 spec, matches the SQL oracle)
        jp = (1000 * inter) // union if union else 1000
        if jp >= threshold_permille:
            out.add((a, b, jp))
    return out


def simhash(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    acc = [0] * 64
    for tok in toks:
        d = md5(tok.encode("utf-8")).digest()[:8]
        bits = int.from_bytes(d, "big")
        for j in range(64):
            # bit order of np.unpackbits: MSB-first within each byte,
            # bytes in digest order == MSB-first over the big-endian int
            acc[j] += 1 if (bits >> (63 - j)) & 1 else -1
    val = 0
    for j in range(64):
        if acc[j] > 0:
            val |= 1 << j
    return val >> 1


def winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        if not n:
            return []
        return [int.from_bytes(blake2b(data, digest_size=8).digest(),
                               "big") >> 1]
    hashes = [sum(data[i + j] * 257 ** (k - 1 - j) for j in range(k))
              for i in range(n - k + 1)]
    if len(hashes) <= w:
        return [min(hashes)]
    mins = [min(hashes[i:i + w]) for i in range(len(hashes) - w + 1)]
    seen: set[int] = set()
    out: list[int] = []
    for m in mins:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out
