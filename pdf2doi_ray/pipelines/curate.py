"""Corpus curation: the canonical training-data front door as ONE streaming
composition — quality gate → exact dedup survivors.

This is the pipeline a 100 TB crawl actually runs before any model sees a
token: score each document (vectorized, per-batch, shuffle-free), keep only
quality rows, then collapse exact duplicates keeping the smallest doc id.
Everything reuses the repo's audited kernels:

* quality gate: :func:`..stages.textstats.quality_flags` (token count ≥ 20
  and ≥ 5% English stopwords — the same flags the ``quality_flags`` query
  oracles);
* content hash: md5 of the raw text (same as ``fingerprint`` /
  ``dedup_exact``);
* dedup: combiner-first min-per-hash (the :func:`..stages.dedup.
  first_per_key` shape) — the quality gate runs BEFORE the exchange, so
  the only shuffle carries ≤ one row per distinct hash per batch of the
  already-filtered stream.  ``n_tokens`` rides through the aggregate as a
  second ``Min``: equal texts have equal token counts, so the group Min IS
  the survivor's value — no join back.

Reference: pdf2doi has no corpus curation (one-file-at-a-time tool); this
is the corpus-scale composition the engine exists for.  The SQL oracle
recomposes the same predicate + groupby over the raw table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk
from ..stages.textstats import quality_flags


def curate_quality_dedup(docs):
    """documents(doc_id, text) → (text_hash, doc_id, n_tokens): exact-dedup
    survivors (min doc id) among quality documents.

    The dedup reduce is :func:`..stages.dedup.first_per_key_sorted`
    (per-batch combiner → sort → vectorized per-block min): at the bench's
    143k distinct hashes it times the same as ``groupby().aggregate(Min)``
    (A/B in BASELINE.md — both dominated by the gate + exchange), but its
    reducer cost is a numpy kernel instead of per-row Python, which is the
    difference that matters at 10^9+ distinct hashes per fleet reducer."""
    from ..stages.dedup import first_per_key_sorted

    def gate(t: pa.Table) -> pa.Table:
        q = quality_flags(t)
        keep = pc.equal(q["is_quality"], 1)
        kept = t.filter(keep)
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest()
                   for s in kept["text"].to_pylist()]
        return pa.table({
            "text_hash": pa.array(digests, type=pa.string()),
            "doc_id": kept["doc_id"],
            "n_tokens": q["n_tokens"].filter(keep),
        })

    gated = docs.map_batches(gate, batch_format="pyarrow")
    return first_per_key_sorted(gated, "text_hash",
                                ["doc_id", "n_tokens"])


def curate_gopher_linededup(docs, every: int = 16, stitch_shards=None):
    """Curation v2 — the full-strength front door as ONE streaming
    composition: the complete Gopher rule gate (word/char bands, symbol,
    bullet/ellipsis, alpha-rate, stopword floor), then corpus-wide
    keep-first line dedup over the survivors.

    The line dedup SUBSUMES exact document dedup by construction: a
    byte-identical copy loses every one of its lines to the first
    occurrence and drops out entirely (default drop-empty contract), so
    no separate hash pass is needed.  Shuffle budget: the gate is
    per-batch and free; the dedup costs one ``groupby(line)`` over
    combiner rows plus one sort of the winner lines.

    documents(doc_id, text) → (doc_id, text, n_lines_kept) survivors.
    """
    from ..stages.corpus import dedup_lines_keep_first
    from ..stages.textstats import gopher_quality

    def gate(t: pa.Table) -> pa.Table:
        q = gopher_quality(t)
        return t.select(["doc_id", "text"]).filter(q["keep"])

    gated = docs.map_batches(gate, batch_format="pyarrow")
    return dedup_lines_keep_first(gated, every=every,
                                  stitch_shards=stitch_shards)


def curate_training_slice(docs, min_flesch_milli: int = 10_000,
                          train_permille: int = 900):
    """Curation v3 — the leakage-safe training-slice cut as ONE streaming
    composition: the full Gopher rule gate, an integer Flesch readability
    floor, the md5(source) group-preserving TRAIN-split gate (so no
    test-source document can leak in), then exact keep-first text dedup
    over the survivors.

    Shuffle budget: all three gates are per-batch maps that shrink the
    stream BEFORE the only exchange (the dedup's combiner-fed
    sort/groupby over md5 hashes) — the gate-then-shuffle ordering the
    round-3 verdict called out as the right one in curate_v2.

    documents(doc_id, text, source) → (text_hash, doc_id) survivors
    (min doc id per identical text).
    """
    from ..stages.corpus import md5_u64
    from ..stages.dedup import first_per_key_sorted
    from ..stages.textstats import flesch_readability, gopher_quality

    def gate(t: pa.Table) -> pa.Table:
        keep = np.asarray(gopher_quality(t)["keep"], dtype=bool)
        fl = np.asarray(
            one_chunk(flesch_readability(t)["flesch_milli"]),
            dtype=np.int64)
        keep &= fl >= min_flesch_milli
        src = one_chunk(t["source"])
        bucket = (md5_u64(src) % np.uint64(1000)).astype(np.int64)
        keep &= bucket < train_permille
        kept = t.filter(pa.array(keep))
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest()
                   for s in kept["text"].to_pylist()]
        return pa.table({
            "text_hash": pa.array(digests, type=pa.string()),
            "doc_id": kept["doc_id"],
        })

    gated = docs.map_batches(gate, batch_format="pyarrow")
    return first_per_key_sorted(gated, "text_hash", ["doc_id"])
