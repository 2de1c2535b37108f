"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here may
call ``ray.init`` / ``ray.shutdown``.  Each ``queries()`` callable takes an
``sf_dir`` and returns a lazy ``ray.data.Dataset`` (or pandas/pyarrow for
small results); ``oracle_sql()`` gives the DuckDB-equivalent SQL over the
pre-registered testdata views.

The extraction queries run over the deterministic ``pages`` table synthesized
from ``documents`` (see :mod:`pdf2doi_ray.sources.pages`): because every
injected identifier is pure arithmetic on ``doc_id``, the SQL oracle
recomputes the expected output independently — the engine derives it through
the real parse + cascade machinery.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# Shared SQL fragments for the pages-derived oracles (R=1: page key == doc_id)
# ---------------------------------------------------------------------------

_D = """
  SELECT doc_id AS k,
         doc_id % 20 AS slot,
         CAST(1000 + (doc_id*7) % 9000 AS VARCHAR) AS reg,
         CAST(1000 + doc_id % 9000 AS VARCHAR) AS ym,
         CAST(10000 + (doc_id*13) % 90000 AS VARCHAR) AS n5,
         CAST(doc_id AS VARCHAR) AS ks,
         CAST(doc_id % 50 AS VARCHAR) AS site,
         text AS base_text,
         lang
  FROM documents
"""

_URL = ("'https://site' || site || '.example.org/docs/' || "
        "CASE WHEN slot IN (3,4,13) THEN '10.' || reg || '%2Fu' || ks || '.pdf' "
        "     WHEN slot = 5 THEN ym || '.' || n5 || '.pdf' "
        "     ELSE 'page-' || ks || '.html' END")

_DOI_SLOTS = "(0,1,2,3,4,6,7,8,9,10,12,13,14,15,16,17)"

_IDENTIFIER = f"""CASE
    WHEN slot IN (0,1) THEN '10.' || reg || '/meta.' || ks
    WHEN slot = 2  THEN '10.' || reg || '/tx.' || ks
    WHEN slot IN (3,4,13) THEN '10.' || reg || '/u' || ks || '.pdf'
    WHEN slot = 6  THEN '10.' || reg || '/tm.' || ks
    WHEN slot IN (7,8) THEN '10.' || reg || '/tb.' || ks
    WHEN slot = 9  THEN '10.' || reg || '/v.' || ks
    WHEN slot = 10 THEN '10.' || reg || '/uf.' || ks
    WHEN slot = 12 THEN '10.' || reg || '/mc.' || ks
    WHEN slot = 14 THEN '10.' || reg || '/dd.' || ks
    WHEN slot = 15 THEN '10.' || reg || '/m1.' || ks
    WHEN slot = 16 THEN '10.' || reg || '/ns.' || ks
    WHEN slot = 17 THEN '10.' || reg || '/td.' || ks
    ELSE NULL END"""

_METHOD = """CASE WHEN slot IN (0,1,12,16) THEN 'document_infos'
    WHEN slot IN (3,4,13) THEN 'filename'
    WHEN slot IN (2,6,7,8,9,10,14,15,17) THEN 'document_text'
    WHEN slot IN (18,19) THEN 'first_N_characters_google'
    ELSE NULL END"""

# variant with the reference's -no_arxiv2doi flag: arXiv hits survive
_IDENTIFIER_KA = _IDENTIFIER.replace(
    "ELSE NULL END",
    "WHEN slot IN (5,11) THEN ym || '.' || n5 ELSE NULL END")
_METHOD_KA = """CASE WHEN slot IN (0,1,12,16) THEN 'document_infos'
    WHEN slot IN (3,4,5,13) THEN 'filename'
    WHEN slot IN (2,6,7,8,9,10,11,14,15,17) THEN 'document_text'
    WHEN slot IN (18,19) THEN 'first_N_characters_google'
    ELSE NULL END"""

_TEXT_SUFFIX = """CASE
    WHEN slot = 2  THEN ' doi: 10.' || reg || '/tx.' || ks || ' end'
    WHEN slot = 6  THEN ' doi: 10.' || reg || '/tm.' || ks || ' end'
    WHEN slot IN (7,8) THEN ' see 10.' || reg || '/tb.' || ks || ' here'
    WHEN slot = 9  THEN ' as in (10.' || reg || '/v.' || ks || 'abc( noted'
    WHEN slot = 10 THEN ' via https://doi.org/10.' || reg || '/uf.' || ks || ' ok'
    WHEN slot = 11 THEN ' preprint arXiv:' || ym || '.' || n5 || 'v2 appeared'
    WHEN slot IN (12,13) THEN ' body doi: 10.' || reg || '/tc.' || ks || ' end'
    WHEN slot = 14 THEN ' both arXiv:' || ym || '.' || n5 || ' and doi: 10.' || reg || '/dd.' || ks || ' end'
    WHEN slot = 15 THEN ' doi: 10.' || reg || '/m1.' || ks || ' then doi: 10.' || reg || '/m2.' || ks || ' end'
    WHEN slot = 17 THEN ' Doi: 10.' || reg || '/TD.' || ks || '. fin'
    WHEN slot = 18 THEN ' ref doi: 10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2 none'
    ELSE '' END"""


def _identify_sql(id_expr: str, method_expr: str) -> str:
    return f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       {id_expr} AS identifier,
       CASE WHEN slot IN {_DOI_SLOTS} THEN 'DOI'
            WHEN slot IN (5,11) AND {id_expr} IS NOT NULL THEN 'arxiv ID'
            ELSE NULL END AS identifier_type,
       {method_expr} AS method,
       CASE WHEN {id_expr} IS NOT NULL THEN 'True' ELSE NULL END AS validation_info
FROM d
"""


# ---------------------------------------------------------------------------
# Ray-side query implementations
# ---------------------------------------------------------------------------

def _pages(sf_dir: str):
    from pdf2doi_ray.sources.pages import pages_dataset
    return pages_dataset(sf_dir)


def _q_extract(sf_dir: str):
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir), DEFAULT_CONFIG)


def _q_extract_segmented(sf_dir: str):
    """PyPdf-analog segmented reader: per-text-unit first-wins scanning.
    The fixture's main content is a single text node, so the result is
    byte-identical to the whole-document reader — same oracle."""
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir),
                          DEFAULT_CONFIG.with_(reader="segmented"))


def _q_extract_keep_arxiv(sf_dir: str):
    from pdf2doi_ray.config import NO_ARXIV2DOI_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir), NO_ARXIV2DOI_CONFIG)


def _q_clip(sf_dir: str):
    """Clipboard-parity sink (reference main.py:229-241): one row holding
    the newline-joined VALIDATED identifiers in url order."""
    import pandas as pd

    from pdf2doi_ray.pipelines.identify import clip_text
    return pd.DataFrame({"clip_text": [clip_text(_q_extract(sf_dir))]})


def _q_text_parity(sf_dir: str):
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.parse import HtmlParse

    parser = HtmlParse()                      # task mode: actor spawn is slow here
    parsed = _pages(sf_dir).map_batches(
        lambda t: parser(t), batch_format="pyarrow", batch_size=1024)

    def project(t):
        t = t.select(["url", "text"])
        import pyarrow as pa
        return t.append_column("n_chars", pc.utf8_length(t["text"]).cast(pa.int64()))

    return parsed.map_batches(project, batch_format="pyarrow")


def _q_titles(sf_dir: str):
    import pyarrow as pa

    from pdf2doi_ray.html_extract import candidate_titles
    from pdf2doi_ray.stages.parse import HtmlParse

    parser = HtmlParse()                      # task mode: actor spawn is slow here
    parsed = _pages(sf_dir).map_batches(
        lambda t: parser(t), batch_format="pyarrow", batch_size=1024)

    def choose(t):
        urls = t["url"].to_pylist()
        fts = t["font_title"].to_pylist() if "font_title" in t.column_names \
            else [None] * len(urls)
        cands = [candidate_titles(u, ti, h, mk or [], mv or [], font_title=ft)
                 for u, ti, h, mk, mv, ft in zip(
                     urls, t["title"].to_pylist(), t["h1"].to_pylist(),
                     t["meta_keys"].to_pylist(), t["meta_vals"].to_pylist(),
                     fts)]
        return pa.table({
            "url": t["url"],
            "best_title": pa.array([c[0] if c else None for c in cands]),
            "n_titles": pa.array([len(c) for c in cands], type=pa.int64()),
        })

    return parsed.map_batches(choose, batch_format="pyarrow")


def _q_method_stats(sf_dir: str):
    from pdf2doi_ray.pipelines.identify import identify_pages, method_stats
    return method_stats(identify_pages(_pages(sf_dir)))


def _q_rate_by_lang(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.pipelines.identify import identify_pages

    ids = identify_pages(_pages(sf_dir), keep_columns=("lang",))

    # partial aggregation inside map_batches (combiner), then a tiny groupby —
    # the shuffle moves one row per (lang, batch), not one per page.
    def partial(t):
        found = pc.is_valid(t["identifier"]).cast(pa.int64())
        tbl = pa.table({"lang": t["lang"], "found": found})
        g = tbl.group_by("lang").aggregate([("found", "sum"), ("found", "count")])
        return g.select(["lang", "found_sum", "found_count"]) \
            .rename_columns(["lang", "n_found", "n_pages"])

    from ray.data.aggregate import Sum

    partials = ids.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("n_found", alias_name="n_found"),
        Sum("n_pages", alias_name="n_pages"),
    )


# ---------------------------------------------------------------------------
# Training-data operators (documents / embeddings / events tables)
# ---------------------------------------------------------------------------

def _docs(sf_dir: str, columns=("doc_id", "text", "lang")):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


def _q_token_stats(sf_dir: str):
    from pdf2doi_ray.stages.textstats import token_stats
    return _docs(sf_dir).map_batches(token_stats, batch_format="pyarrow")


def _q_quality(sf_dir: str):
    from pdf2doi_ray.stages.textstats import quality_flags
    return _docs(sf_dir).map_batches(quality_flags, batch_format="pyarrow")


def _q_gopher_quality(sf_dir: str):
    """Full Gopher rule set (word-count / word-length bands, symbol,
    bullet/ellipsis line rates, alpha-word rate, stopword floor) as exact
    integer permilles — pure vectorized map, zero shuffles."""
    from pdf2doi_ray.stages.textstats import gopher_quality
    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        gopher_quality, batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    from pdf2doi_ray.stages.textstats import lang_id
    return _docs(sf_dir).map_batches(lang_id, batch_format="pyarrow")


def _q_fingerprint(sf_dir: str):
    from pdf2doi_ray.stages.textstats import fingerprint
    return _docs(sf_dir).map_batches(fingerprint, batch_format="pyarrow")


def _q_dedup_exact(sf_dir: str):
    from pdf2doi_ray.stages.dedup import dedup_exact
    return dedup_exact(_docs(sf_dir, ("doc_id", "text")))


def _q_minhash_near_dups(sf_dir: str):
    from pdf2doi_ray.stages.dedup import minhash_near_dups
    return minhash_near_dups(_docs(sf_dir, ("doc_id", "text")))


def _q_minhash_dedup_prune(sf_dir: str):
    """End-to-end TEXT fuzzy dedup (the RefinedWeb / Lee-et-al. shape):
    md5-minhash LSH verified pairs → connected components → keep the
    min-id representative per cluster, stream the id column through a
    broadcast anti-join.  Every stage is deterministic and
    SQL-recomputable, so the whole composition carries an exact DuckDB
    oracle (round 4)."""
    from pdf2doi_ray.stages.dedup import minhash_near_dups
    from pdf2doi_ray.stages.graph import prune_near_dups

    pairs = minhash_near_dups(_docs(sf_dir, ("doc_id", "text")))
    ids = _docs(sf_dir, ("doc_id",))
    return prune_near_dups(ids, pairs, id_col="doc_id",
                           col_a="doc_a", col_b="doc_b")


def _q_simhash(sf_dir: str):
    from pdf2doi_ray.stages.dedup import simhash_table
    return simhash_table(_docs(sf_dir, ("doc_id", "text")))


def _q_simhash_near_dups(sf_dir: str):
    """Banded SimHash near-dup pairs (hamming <= 3): recall 1.0 by
    pigeonhole over max_hamming+1 bands, one self-join on (band, value),
    XOR-popcount verify before the final pair-dedup groupby.  EXACT SQL
    oracle since round 4 (md5 simhash + DuckDB xor/bit_count); the
    brute-force golden test in tests/test_golden_digests.py stays as the
    independent-implementation lock."""
    from pdf2doi_ray.stages.dedup import simhash_near_dups
    return simhash_near_dups(_docs(sf_dir, ("doc_id", "text")))


def _q_wordset_jaccard(sf_dir: str):
    from pdf2doi_ray.stages.dedup import wordset_jaccard_adjacent
    return wordset_jaccard_adjacent(_docs(sf_dir, ("doc_id", "text")))


def _q_ngram_jaccard(sf_dir: str):
    from pdf2doi_ray.stages.dedup import ngram_jaccard_adjacent
    return ngram_jaccard_adjacent(_docs(sf_dir, ("doc_id", "text")))


def _q_edit_distance_adjacent(sf_dir: str):
    """Character-level Levenshtein between successive docs — the
    near-dup verifier; same shift-join plan as the jaccard scorers."""
    from pdf2doi_ray.stages.dedup import edit_distance_adjacent
    return edit_distance_adjacent(_docs(sf_dir, ("doc_id", "text")))


def _q_knn(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.similarity import knn_bruteforce, query_vector
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return knn_bruteforce(emb, query_vector(sf_dir), k=10)


def _q_knn_lsh(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.similarity import knn_lsh, query_vector
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return knn_lsh(emb, query_vector(sf_dir), k=10)


def _q_knn_ivf(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.similarity import knn_ivf, query_vector
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return knn_ivf(emb, query_vector(sf_dir), k=10)


def _q_winnow(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.textstats import winnow_table

    # exploded scalar rows (doc_id, seq, fingerprint): exactly the shape a
    # DuckDB window-function oracle recomputes (base-257 k-gram polynomial
    # + sliding-window min + first-occurrence dedup) — upgraded from a
    # rows-only digest check to a full hash-matching driver row
    def explode(t: pa.Table) -> pa.Table:
        fps = t["fingerprints"]
        if isinstance(fps, pa.ChunkedArray):
            fps = fps.combine_chunks()
        n = np.asarray(pc.list_value_length(fps).cast(pa.int64()))
        doc = np.repeat(np.asarray(t["doc_id"].combine_chunks()
                                   if isinstance(t["doc_id"], pa.ChunkedArray)
                                   else t["doc_id"]), n)
        seq = np.arange(int(n.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n) - n, n)
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "seq": pa.array(seq, type=pa.int64()),
            "fingerprint": pc.list_flatten(fps).cast(pa.int64()),
        })

    return winnow_table(_docs(sf_dir, ("doc_id", "text"))).map_batches(
        explode, batch_format="pyarrow")


def _q_embedding_near_dups(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_near_dups
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_near_dups(emb, threshold=0.40)


def _q_embedding_near_dups_lsh(sf_dir: str):
    """Approximate (LSH-bucketed) variant of embedding_near_dups — the scale
    path when the corpus matrix can't be broadcast.  No SQL oracle (bucket
    membership isn't SQL-expressible); precision/recall vs the exact pairs
    are asserted in tests/test_golden_digests.py (floor 0.9, measured 1.0)."""
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_near_dups_lsh
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return embedding_near_dups_lsh(emb, threshold=0.40)


def _q_embedding_dup_components(sf_dir: str):
    """Fuzzy-dedup clustering: connected components (distributed label
    propagation) over the exact embedding near-dup pairs; component id =
    min vec_id of the cluster (the canonical-survivor rule)."""
    from pdf2doi_ray.stages.graph import connected_components
    pairs = _q_embedding_near_dups(sf_dir)
    return connected_components(pairs, col_a="vec_a", col_b="vec_b")


def _q_embedding_dedup_prune(sf_dir: str):
    """End-to-end fuzzy dedup: near-dup pairs → connected components →
    keep the min-id representative per cluster, drop the rest.  The drop
    list (O(duplicates), not O(corpus)) broadcasts once; the id stream
    anti-joins against it without shuffling."""
    import ray.data

    from pdf2doi_ray.stages.graph import prune_near_dups
    ids = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id"])
    pairs = _q_embedding_near_dups(sf_dir)
    return prune_near_dups(ids, pairs)


def _q_embedding_dedup_prune_distributed(sf_dir: str):
    """Fuzzy-dedup pruning, scale path: drop ids anti-join through one
    hash-partitioned left-outer exchange instead of a broadcast — exact
    same survivors (shared oracle)."""
    import ray.data

    from pdf2doi_ray.stages.graph import prune_near_dups_distributed
    ids = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id"])
    pairs = _q_embedding_near_dups(sf_dir)
    return prune_near_dups_distributed(ids, pairs, num_partitions=4)


def _q_kmeans_clusters(sf_dir: str):
    """Fixed-iteration Lloyd's k-means over the embeddings table
    (pagerank-broadcast pattern: k x dim driver state re-broadcast per
    round, one few-KiB partial per batch, vectors never shuffle).  No SQL
    oracle (iterative float algorithm); locked by the separated-cluster
    recovery + inertia-monotonicity property tests in
    tests/test_training_ops.py."""
    import ray.data

    from pdf2doi_ray.stages.similarity import kmeans_fixed
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return kmeans_fixed(emb, k=8, iters=3)


def _q_pagerank(sf_dir: str):
    """Fixed-iteration (3 rounds) EXACT-integer PageRank over the symmetric
    embedding near-dup graph — the canonical iterative-graph benchmark.
    Default broadcast mode: one map stage per round over index-encoded
    edge blocks, zero shuffles.  Scaled-integer arithmetic (milli-mass,
    floor division on non-negative operands) makes the result
    bit-identical to the unrolled SQL oracle in either mode."""
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.graph import pagerank_fixed

    pairs = _q_embedding_near_dups(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks().cast(pa.int64())
        b = t["vec_b"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    nodes = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).map_batches(
        lambda t: pa.table({"node": t["vec_id"].cast(pa.int64())}),
        batch_format="pyarrow")
    return pagerank_fixed(edges, nodes, n_iters=3)


def _q_near_dup_triangles(sf_dir: str):
    """Exact triangle count of the embedding near-dup graph (looser 0.30
    threshold so triangles exist at test scale): two hash-partitioned
    joins — wedges on the middle vertex, closed by the (a, c) edge —
    then a streaming count."""
    import ray.data

    from pdf2doi_ray.stages.graph import triangle_count
    from pdf2doi_ray.stages.similarity import embedding_near_dups
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_near_dups(emb, threshold=0.30)
    return triangle_count(pairs)


def _q_top_docs_by_tokens(sf_dir: str):
    from pdf2doi_ray.stages.textstats import top_docs_by_tokens
    return top_docs_by_tokens(_docs(sf_dir, ("doc_id", "text")), k=20)


def _q_tumbling(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windows import tumbling_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    return tumbling_counts(ev)


def _q_sliding(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windows import sliding_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return sliding_counts(ev)


def _q_sessions(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windows import session_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])
    return session_counts(ev)


def _q_filename_only(sf_dir: str):
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir),
                          DEFAULT_CONFIG.with_(methods=("filename",)))


def _q_metadata_only(sf_dir: str):
    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    return identify_pages(_pages(sf_dir),
                          DEFAULT_CONFIG.with_(methods=("document_infos",)))


def _q_ascii_first_n(sf_dir: str):
    from pdf2doi_ray.stages.textstats import ascii_first_n
    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        ascii_first_n, batch_format="pyarrow")


def _q_pages_per_host(sf_dir: str):
    from pdf2doi_ray.stages.skew import pages_per_host
    return pages_per_host(_pages(sf_dir))


def _q_resume_semi_join(sf_dir: str):
    """Resume path: identify half the corpus, persist it, then run the full
    corpus through the broadcast anti-join resume — the combined result must
    be byte-identical to a from-scratch run (oracle: same SQL as
    extract_identifiers)."""
    import atexit
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import identify_pages
    from pdf2doi_ray.state.checkpoint import with_previous_results

    def even_half(t: pa.Table) -> pa.Table:
        # even page keys, recovered from the deterministic warc_ts offset
        secs = pc.divide(pc.cast(t["warc_ts"], pa.int64()), 1_000_000)
        return t.filter(pc.equal(pc.bit_wise_and(secs, 1), 0))

    prev_dir = tempfile.mkdtemp(prefix="pdf2doi_resume_prev_")
    atexit.register(shutil.rmtree, prev_dir, ignore_errors=True)
    half = _pages(sf_dir).map_batches(even_half, batch_format="pyarrow")
    identify_pages(half, DEFAULT_CONFIG).write_parquet(prev_dir)

    return with_previous_results(
        _pages(sf_dir), prev_dir,
        lambda remaining: identify_pages(remaining, DEFAULT_CONFIG))


def _q_identify_incremental(sf_dir: str):
    """Record-level incremental extraction transparency proof: a previous
    crawl is synthesized (every 7th page missing → added, every 5th page
    carrying different html → changed, ghost urls → removed), its
    identifiers persisted, then identify_incremental over the CURRENT
    crawl must be byte-identical to a from-scratch run (oracle: same SQL
    as extract_identifiers)."""
    import atexit
    import shutil
    import tempfile

    from pdf2doi_ray.config import DEFAULT_CONFIG
    from pdf2doi_ray.pipelines.identify import (identify_incremental,
                                                identify_pages)
    from pdf2doi_ray.sources.pages import previous_crawl_batch

    prev = _pages(sf_dir).map_batches(previous_crawl_batch,
                                      batch_format="pyarrow")
    prev_dir = tempfile.mkdtemp(prefix="pdf2doi_incr_results_")
    atexit.register(shutil.rmtree, prev_dir, ignore_errors=True)
    identify_pages(prev, DEFAULT_CONFIG).write_parquet(prev_dir)
    return identify_incremental(_pages(sf_dir), prev, prev_dir,
                                DEFAULT_CONFIG)


def _q_image_features(sf_dir: str):
    from pdf2doi_ray.stages.multimodal import image_features
    return image_features(sf_dir)


def _q_frame_sample(sf_dir: str):
    from pdf2doi_ray.stages.multimodal import frame_sample
    return frame_sample(sf_dir)


def _q_image_resize(sf_dir: str):
    from pdf2doi_ray.stages.multimodal import image_resize
    return image_resize(sf_dir)


def _q_audio_features(sf_dir: str):
    from pdf2doi_ray.stages.multimodal import audio_features
    return audio_features(sf_dir)


def _q_events_asof_join(sf_dir: str):
    """As-of join: every purchase matched to the user's latest click at or
    before it (DuckDB ASOF JOIN oracle)."""
    import ray.data

    from pdf2doi_ray.stages.asof import asof_join_latest
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return asof_join_latest(ev, left_type="purchase", right_type="click")


def _q_events_range_join(sf_dir: str):
    """Time-band range join: (error, signup) pairs of the same user within
    30 minutes of each other (bucket-replication interval join)."""
    import ray.data

    from pdf2doi_ray.stages.rangejoin import time_band_join
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return time_band_join(ev, type_a="error", type_b="signup", band_s=1800)


def _q_approx_ndv_hosts(sf_dir: str):
    """Approximate distinct host count via a mergeable HyperLogLog sketch
    (deterministic md5-derived hashing — the estimate is run-stable).  No
    SQL oracle on the ESTIMATE (float log in linear counting); the full
    register STATE is exactly SQL-oracled by ``hll_registers_hosts``, and
    exact-merge/accuracy properties are locked in tests/test_sketch.py.
    Fixture has 50 hosts → linear-counting range → estimate within ±5%
    (deterministically 50 on the md5 hash)."""
    import pandas as pd
    import pyarrow as pa

    from pdf2doi_ray.stages.sketch import approx_ndv
    from pdf2doi_ray.stages.skew import _hosts_vec

    def hosts(t: pa.Table) -> pa.Table:
        col = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) \
            else t["url"]
        return pa.table({"host": _hosts_vec(col)})

    ds = _pages(sf_dir).map_batches(hosts, batch_format="pyarrow")
    return pd.DataFrame({"ndv_estimate": pd.Series([approx_ndv(ds, "host")],
                                                   dtype="int64")})


def _q_hll_registers(sf_dir: str):
    """The HLL sketch's full register state over page hosts as
    (bucket, register) rows — EXACTLY SQL-recomputable (md5 hash, rank via
    bit-length, max-merge), so the driver value-hashes the sketch machinery
    itself rather than rows-only-checking an estimate (round 4)."""
    import pyarrow as pa

    from pdf2doi_ray.stages.sketch import hll_register_rows
    from pdf2doi_ray.stages.skew import _hosts_vec

    def hosts(t: pa.Table) -> pa.Table:
        col = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) \
            else t["url"]
        return pa.table({"host": _hosts_vec(col)})

    return hll_register_rows(
        _pages(sf_dir).map_batches(hosts, batch_format="pyarrow"), "host")


def _q_hash_sample(sf_dir: str):
    from pdf2doi_ray.stages.corpus import hash_sample
    return hash_sample(_docs(sf_dir, ("doc_id",)))


def _q_event_value_variance(sf_dir: str):
    """Exact per-type population variance of event values on the milli
    grid (combiner-first; the n·Σvm² product runs in Python ints at the
    one-row-per-key finalize — int64 would overflow it at corpus scale)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_var_stats
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return grouped_var_stats(ev, "event_type", "value")


def _q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: first-active-week cohorts ×
    week offsets → active-user counts.  Four combiner-bounded exchanges
    (distinct activity, per-user min, one hash join, final counts) — see
    ``stages/aggs.cohort_retention``."""
    import ray.data

    from pdf2doi_ray.stages.aggs import cohort_retention
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return cohort_retention(ev, num_partitions=4)


def _q_winsorize_event_values(sf_dir: str):
    """Winsorized event values: exact p5/p95 milli quantiles broadcast as
    two closure scalars, then one vectorized clamp pass — outlier clipping
    for long-tailed web metrics with no join and no second exchange."""
    import ray.data

    from pdf2doi_ray.stages.aggs import winsorize_values_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])
    return winsorize_values_milli(ev, "value", 50, 950,
                                  carry_cols=("user_id",))


def _q_mad_event_values(sf_dir: str):
    """Exact median absolute deviation of event values on the milli grid:
    two combiner-bounded histogram passes, broadcast-scalar median — the
    robust spread statistic for heavy-tailed web metrics."""
    import ray.data

    from pdf2doi_ray.stages.aggs import mad_values_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return mad_values_milli(ev, "value")


def _q_vocab_top_tokens(sf_dir: str):
    """Vocabulary construction: top-100 corpus tokens with contiguous ids
    by (count desc, token asc) — combiner-first counts, bounded-partial
    top-k, driver-side id assignment over the schema-sized result."""
    from pdf2doi_ray.stages.corpus import build_vocab
    return build_vocab(_docs(sf_dir, ("doc_id", "text")), vocab_size=100)


def _q_lang_balanced_sample(sf_dir: str):
    """Language-balanced corpus sample: per-lang keep rates (en 250‰,
    fr 500‰, rest full) applied as a pure deterministic hash filter —
    the training-mix downsampling step, zero shuffles."""
    from pdf2doi_ray.stages.corpus import balanced_sample
    return balanced_sample(_docs(sf_dir, ("doc_id", "lang")),
                           group_col="lang",
                           rates_permille={"en": 250, "fr": 500})


def _q_weighted_sample_k(sf_dir: str):
    """Deterministic weighted bottom-k sample: the 25 documents with the
    smallest knuth-hash-priority // n_chars — quality/length-weighted
    selection, bounded ≤k-per-batch partials, no shuffle.  Distinct from
    ``weighted_sample`` (Bernoulli keep): this one is exactly-k."""
    from pdf2doi_ray.stages.corpus import weighted_sample_k
    return weighted_sample_k(_docs(sf_dir, ("doc_id", "n_chars")),
                             weight_col="n_chars", k=25)


def _q_lexical_diversity(sf_dir: str):
    """Type-token ratio per document (distinct-token permille): the
    lexical-diversity quality signal, pure map-side, zero shuffles."""
    from pdf2doi_ray.stages.corpus import lexical_diversity
    return lexical_diversity(_docs(sf_dir, ("doc_id", "text")))


def _q_anchor_text_index(sf_dir: str):
    """Anchor-text index over link-injected docs (multi-word anchors
    synthesized from doc_id): per-target-host top-8 anchor terms,
    combiner-first counts → one groupby Sum → bucketed top-k merge."""
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import anchor_text_index

    def inject(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        d = ids.astype(str)
        links = np.char.add(np.char.add(np.char.add(np.char.add(
            ' <a href="https://s', (ids % 5).astype(str)),
            ".example.org/p/"), d), '">guide topic')
        links = np.char.add(np.char.add(np.char.add(
            links, (ids % 13).astype(str)), " part"),
            (ids % 3).astype(str))
        links = np.char.add(links, "</a>")
        hub = np.where(
            ids % 4 == 0,
            np.char.add(np.char.add(np.char.add(
                ' <a href="https://hub.example.org/',
                (ids % 7).astype(str)), '">hub home page'),
                np.char.add((ids % 2).astype(str), "</a>")),
            "")
        txt = np.char.add(np.char.add(np.asarray(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]).astype(str), links), hub)
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(txt.tolist(), type=pa.string())})

    docs = _docs(sf_dir, ("doc_id", "text")).map_batches(
        inject, batch_format="pyarrow")
    return anchor_text_index(docs, k=8)


def _q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-style 3-table join: BUILDING-segment customers, orders
    before / line items shipped after 1998-06-15, top-10 orders by exact
    milli-integer revenue.  Broadcast semi-join + one shuffle join +
    groupby Sum + bounded global top-k."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import shipping_priority
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    cutoff = datetime.datetime(1998, 6, 15)
    return shipping_priority(cust, orders, li, segment="BUILDING",
                             cutoff_us=cutoff, k=10)


def _q_local_supplier_revenue(sf_dir: str):
    """TPC-H-Q5-style 6-table star join: per-nation 1996 revenue of ASIA
    customers counting only same-nation suppliers.  Region/nation/
    customer/supplier dimension chains collapse via broadcast hash joins;
    the single shuffle is the lineitem-orders fact join."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import local_supplier_revenue
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet")
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    return local_supplier_revenue(
        region, nation, cust, supp, orders, li, region_name="ASIA",
        start_us=datetime.datetime(1996, 1, 1),
        end_us=datetime.datetime(1997, 1, 1))


def _q_revenue_by_part_type(sf_dir: str):
    """TPC-H-Q14-flavored part-type revenue mix over one ship-date
    month: broadcast part dimension into date-filtered lineitem batches,
    per-batch ≤|types|-row combiner, one tiny groupby."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import revenue_by_part_type
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    return revenue_by_part_type(
        part, li,
        start_us=datetime.datetime(1996, 3, 1),
        end_us=datetime.datetime(1996, 4, 1))


def _q_order_priority_semi(sf_dir: str):
    """TPC-H-Q4-style EXISTS semi-join: orders of one quarter with at
    least one returned line item, counted per priority.  Fact-fact
    left_semi join on per-batch-unique probe keys."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import order_priority_semi
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"])
    return order_priority_semi(
        orders, li, start_us=datetime.datetime(1996, 7, 1),
        end_us=datetime.datetime(1996, 10, 1), num_partitions=4)


def _q_impact_index(sf_dir: str):
    """Impact-ordered postings: top-3 documents per term by tf (ties:
    doc_id ascending) — per-batch (term, doc, tf) combiner into the
    bounded-partial grouped_top_k engine; the posting truncation a
    WAND/impact-ordered retrieval index ships."""
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import _tokens_nonempty
    from pdf2doi_ray.stages.windowfns import grouped_top_k

    def term_counts(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        g = pa.table({
            "term": flat,
            "doc_id": pa.array(ids[row_idx], type=pa.int64()),
        }).group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"term": g["term"], "doc_id": g["doc_id"],
                         "tf": g["count_all"].cast(pa.int64())})

    rows = _docs(sf_dir, ("doc_id", "text")) \
        .map_batches(term_counts, batch_format="pyarrow")
    return grouped_top_k(rows, "term", "tf", "doc_id", k=3)


def _q_continuation_counts(sf_dir: str):
    """Kneser-Ney continuation counts: top-20 tokens by number of
    DISTINCT immediate predecessors — distinct-pair combiner, one
    dedup groupby, one count groupby, bounded-partial top-k."""
    from pdf2doi_ray.stages.corpus import continuation_counts
    return continuation_counts(_docs(sf_dir, ("doc_id", "text")), k=20)


def _q_session_conversion(sf_dir: str):
    """Within-session funnel: sessions whose first 'view' is strictly
    followed by a 'purchase' in the SAME session — sorted-block kernel
    with scatter min/max per session, sharded edge-user stitch."""
    import ray.data

    from pdf2doi_ray.stages.windows import session_conversion
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    return session_conversion(ev, gap_s=1800, first_type="view",
                              then_type="purchase")


def _q_activation_latency(sf_dir: str):
    """Exact p50/p90 of first-view -> first-purchase latency (whole
    seconds) across converting users: per-user double-Min combiner, one
    groupby, latency histogram walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import activation_latency_quantiles
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    return activation_latency_quantiles(ev, "view", "purchase")


def _q_value_share(sf_dir: str):
    """RATIO_TO_REPORT parity: each event's exact permille share of its
    type's total (milli-scaled) — one tiny groupby + broadcast join,
    rows never shuffle."""
    import ray.data

    from pdf2doi_ray.stages.windowfns import ratio_to_report
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])
    return ratio_to_report(ev, "event_type", "value", "event_id")


def _q_bursty_hours(sf_dir: str):
    """Integer-exact burst detection: hourly windows > 2 sigma above
    their event type's own mean window count (cross-multiplied z-test,
    no sqrt/float); per-key moments broadcast back, counts shuffled
    once."""
    import ray.data

    from pdf2doi_ray.stages.windows import bursty_hours
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    return bursty_hours(ev, "event_type", window_s=3600, k_sigma=2)


def _q_rebalance_matrix(sf_dir: str):
    """Bucket-rebalance movement matrix for the documents layout going
    32 -> 48 buckets: same mix64 as write_bucketed, composite bincount
    combiner, one tiny groupby."""
    from pdf2doi_ray.stages.joins import rebalance_matrix
    return rebalance_matrix(_docs(sf_dir, ("doc_id",)), "doc_id",
                            old_buckets=32, new_buckets=48)


def _q_user_value_trends(sf_dir: str):
    """Per-user OLS trend of milli-scaled event values over rebased
    seconds — exact integer slope numerator/denominator, one combiner
    exchange."""
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_trend_components
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    return grouped_trend_components(ev, "user_id", "ts", "value")


def _q_profile_events(sf_dir: str):
    """Column-level data profile of the events table (ints + strings —
    text-stable renderings): scalar combiners + the two-exchange exact
    distinct shape per column."""
    import ray.data

    from pdf2doi_ray.stages.aggs import profile_columns
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"])
    return profile_columns(ev, ["event_id", "user_id", "event_type"])


def _q_image_dedup(sf_dir: str):
    """Cross-image exact dedup by 4x4-thumbnail signature (decode+resize
    +hash actor pool, combiner-first groupby(sig)); the synthetic
    uniform-fill payloads make the signature a pure function of
    doc_id % 251, which the SQL oracle mirrors."""
    from pdf2doi_ray.stages.multimodal import image_signature_dedup
    return image_signature_dedup(sf_dir)


def _q_lang_vocab_overlap(sf_dir: str):
    """Cross-lingual vocabulary overlap: exact Jaccard permille between
    every language pair via the bitmask-histogram trick (no token-level
    self-join; pair arithmetic over <=2^|langs| scalar rows)."""
    from pdf2doi_ray.stages.corpus import lang_vocab_overlap
    return lang_vocab_overlap(_docs(sf_dir, ("text", "lang")))


def _q_host_url_lcp(sf_dir: str):
    """Per-host longest common url prefix via the lexicographic-extremes
    identity: one groupby(host) Min/Max over combiner rows, then a
    vectorized position sweep over host-count rows."""
    from pdf2doi_ray.stages.skew import host_url_lcp
    return host_url_lcp(_linked_pages(sf_dir))


def _q_spellfix_vocab(sf_dir: str):
    """Approximate-string-matching join: the corpus vocabulary is
    corrupted deterministically (md5-parity picks substitute-last-char-
    with-q vs append-x), then corrected back against the true vocabulary
    with the SymSpell ED1 actor stage (deletion-neighborhood index built
    once per actor).  Correction = lexicographically smallest ED1 dict
    word; in-vocab tokens pass through."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import _tokens_nonempty
    from pdf2doi_ray.stages.textnorm import ed1_correct
    from ray.data.aggregate import Sum

    def vocab_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_nonempty(t)
        g = pa.table({"token": flat}).group_by("token") \
            .aggregate([([], "count_all")])
        return pa.table({"token": g["token"],
                         "n": g["count_all"].cast(pa.int64())})

    vocab = (_docs(sf_dir, ("doc_id", "text"))
             .map_batches(vocab_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .materialize())
    # dictionary to the driver: vocab-bounded by contract (oov_rate /
    # DSIR broadcast contract)
    dict_words = [r["token"] for r in vocab.take_all()]

    def corrupt(t: pa.Table) -> pa.Table:
        toks = (t["token"].combine_chunks()
                if isinstance(t["token"], pa.ChunkedArray)
                else t["token"]).to_pylist()
        out = []
        for tok in toks:     # distinct-vocab loop (md5_u64 precedent)
            if ord(hashlib.md5(tok.encode()).hexdigest()[0]) % 2 == 0:
                out.append(tok[:-1] + "q")
            else:
                out.append(tok + "x")
        g = pa.table({"token": pa.array(out, type=pa.string()),
                      "n": t["n"]}).group_by("token") \
            .aggregate([("n", "sum")])
        return pa.table({"token": g["token"],
                         "n": g["n_sum"].cast(pa.int64())})

    corrupted = (vocab.map_batches(corrupt, batch_format="pyarrow")
                 .groupby("token").aggregate(Sum("n", alias_name="n")))
    return ed1_correct(corrupted, dict_words, concurrency=(1, 2))


def _q_median_chars_by_lang(sf_dir: str):
    """Per-language exact lower-median of doc char counts over the
    unbounded float64 domain — grouped radix-select: one composite
    group×digit scatter-add per batch per round, |groups|-sized driver
    state."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.aggs import exact_kth_by_group
    from ray.data.aggregate import Count

    def prep(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"])
        return pa.table({"lang": t["lang"],
                         "value": pc.cast(n_chars, pa.float64())})

    ds = _docs(sf_dir, ("text", "lang")) \
        .map_batches(prep, batch_format="pyarrow").materialize()
    counts = ds.groupby("lang").count().to_pandas()
    ranks = {str(r["lang"]): (int(r["count()"]) + 1) // 2
             for _, r in counts.iterrows()}
    return exact_kth_by_group(ds, "lang", "value", ranks)


def _q_weighted_median_chars(sf_dir: str):
    """Token-weighted median of document char counts: the value where
    cumulative token weight crosses half the corpus — weighted
    radix-select, 4 streaming histogram rounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_weighted_kth
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"], " ")
        n_tok = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
        n_chars = np.asarray(pc.utf8_length(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"])
            .cast(pa.int64()))
        keep = n_tok > 0
        return pa.table({
            "value": pa.array(n_chars[keep].astype(np.float64)),
            "weight": pa.array(n_tok[keep])})

    ds = _docs(sf_dir, ("doc_id", "text")) \
        .map_batches(prep, batch_format="pyarrow").materialize()
    total = int(ds.aggregate(Sum("weight"))["sum(weight)"])
    return exact_weighted_kth(ds, "value", "weight", (total + 1) // 2)


def _q_bfs_host_distance(sf_dir: str):
    """Single-source BFS over the host link graph from the hub host:
    broadcast-frontier rounds, edges never shuffle."""
    import pyarrow as pa

    from pdf2doi_ray.stages.graph import bfs_depths

    edges = _q_host_link_graph(sf_dir)

    def rename(t):
        return pa.table({"src": t["src_host"], "dst": t["dst_host"]})

    return bfs_depths(edges.map_batches(rename, batch_format="pyarrow"),
                      source="s0.example.org", max_depth=4)


def _q_exact_median_value(sf_dir: str):
    """Exact lower-median of events.value via distributed radix-select:
    4 streaming histogram rounds (65536-long partials), no sort, no
    shuffle of values, unbounded float64 domain."""
    import ray.data

    from pdf2doi_ray.stages.aggs import exact_kth_value
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    n = ev.count()
    return exact_kth_value(ev, "value", (n + 1) // 2)


def _q_bucket_sync_diff(sf_dir: str):
    """Merkle-style layout anti-entropy: two bucketed layouts (current
    documents vs a deterministically perturbed replica — doc_id%97 rows
    missing, doc_id%89 texts stale) compared by order-independent
    per-bucket checksums; only n_buckets scalar rows move."""
    import shutil

    from pdf2doi_ray.stages.joins import bucket_sync_diff, write_bucketed

    n_buckets = 32
    base = "/tmp/pdf2doi_sync_diff"
    da, db = f"{base}/a", f"{base}/b"
    shutil.rmtree(base, ignore_errors=True)

    def perturb(t):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"], dtype=np.int64)
        t = t.filter(pa.array(ids % 97 != 0))
        ids = ids[ids % 97 != 0]
        stale = pa.array(ids % 89 == 0)
        txt = pc.if_else(
            stale,
            pc.binary_join_element_wise(t["text"].combine_chunks()
                                        if isinstance(t["text"],
                                                      pa.ChunkedArray)
                                        else t["text"],
                                        pa.scalar(" old"), ""),
            t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    cur = _docs(sf_dir, ("doc_id", "text"))
    write_bucketed(cur, "doc_id", da, n_buckets=n_buckets)
    write_bucketed(cur.map_batches(perturb, batch_format="pyarrow"),
                   "doc_id", db, n_buckets=n_buckets)
    return bucket_sync_diff(da, db, "doc_id", n_buckets,
                            cols=["doc_id", "text"])


def _q_dup_cluster_sizes(sf_dir: str):
    """Dedup-audit report: size histogram of the embedding near-dup
    clusters — two combiner-first exchanges over the component labels."""
    from pdf2doi_ray.stages.graph import component_size_histogram
    return component_size_histogram(_q_embedding_dup_components(sf_dir))


def _q_fd_audit_source_lang(sf_dir: str):
    """Functional-dependency audit source→lang over documents:
    distinct-pair count combiner, composite-key groupby, per-determinant
    distinct/row counts + violation flag."""
    from pdf2doi_ray.stages.aggs import fd_violation_audit
    return fd_violation_audit(_docs(sf_dir, ("source", "lang")),
                              "source", "lang")


def _q_late_events(sf_dir: str):
    """Watermark / allowed-lateness accounting per (event_type, tumbling
    window): event time = ts minus a deterministic (event_id % 13) hour
    jitter so the fixture's in-order stream gains genuine lateness; one
    sort + two-pass block prefix-max, combiner-first accounting."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.windows import late_event_accounting

    def prep(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["event_id"].combine_chunks()
                         if isinstance(t["event_id"], pa.ChunkedArray)
                         else t["event_id"], dtype=np.int64)
        us = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()), dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid),
            "event_type": t["event_type"],
            "us": pa.array(us - (eid % 13) * 3_600_000_000)})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts"]) \
        .map_batches(prep, batch_format="pyarrow")
    return late_event_accounting(ev, window_s=3600, lateness_s=600)


def _q_brand_bracket_revenue(sf_dir: str):
    """TPC-H-Q19-style disjunctive (brand, quantity-bracket) revenue:
    pruned dimension broadcast, vectorized OR-of-ANDs, scalar partials,
    zero shuffles."""
    import ray.data

    from pdf2doi_ray.stages.joins import brand_bracket_revenue
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_brand"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    return brand_bracket_revenue(part, li)


def _q_host_crawl_overlap(sf_dir: str):
    """Per-host url-set Jaccard between two crawl snapshots (prev crawl
    derived deterministically: doc_id%7==0 urls absent, ghost urls at
    doc_id+1000000 for doc_id%11==0).  Distinct-pair combiner, one
    groupby(host,url) Max-merge, exact integer permille."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.skew import host_crawl_overlap

    def mk_url(ids: np.ndarray) -> pa.Array:
        # vectorized url synthesis: two int->string casts + one
        # element-wise join (no per-row Python)
        site = pc.cast(pa.array(ids % 50), pa.string())
        tail = pc.cast(pa.array(ids), pa.string())
        return pc.binary_join_element_wise(
            pc.binary_join_element_wise(pa.scalar("https://site"), site,
                                        ""),
            pc.binary_join_element_wise(pa.scalar(".example.org/d/"),
                                        tail, ""), "")

    def cur_urls(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"], dtype=np.int64)
        return pa.table({"url": mk_url(ids)})

    def prev_urls(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"], dtype=np.int64)
        kept = ids[ids % 7 != 0]
        ghosts = ids[ids % 11 == 0] + 1_000_000
        return pa.table({"url": mk_url(np.concatenate([kept, ghosts]))})

    docs = _docs(sf_dir, ("doc_id",))
    return host_crawl_overlap(
        docs.map_batches(cur_urls, batch_format="pyarrow"),
        docs.map_batches(prev_urls, batch_format="pyarrow"))


def _q_collocation_lift(sf_dir: str):
    """Top-20 collocations by exact integer lift (PMI argument sans log):
    vocab-broadcast double join per grouped-bigram block, bounded-partial
    top-k, min_count=5 noise gate."""
    from pdf2doi_ray.stages.corpus import collocation_lift
    return collocation_lift(_docs(sf_dir, ("doc_id", "text")),
                            k=20, min_count=5)


def _q_crawl_budget(sf_dir: str):
    """Largest-remainder recrawl-budget apportionment across hosts —
    exact integer Hamilton method: salted host counts, O(1) scalar
    reductions, bounded-partial top-R remainder selection, broadcast
    bonus membership."""
    from pdf2doi_ray.stages.skew import crawl_budget_apportion
    return crawl_budget_apportion(_pages(sf_dir), total_budget=1000)


def _q_byte_pair_counts(sf_dir: str):
    """First BPE merge candidates: top-20 within-token adjacent byte
    pairs, one np.bincount per batch over the zero-copy text buffer —
    exchange bounded by 65536 rows per block regardless of corpus size."""
    from pdf2doi_ray.stages.corpus import byte_pair_counts
    return byte_pair_counts(_docs(sf_dir, ("doc_id", "text")), k=20)


def _q_cdc_chunk_stats(sf_dir: str):
    """Content-defined-chunking storage-dedup audit: rolling-hash chunk
    boundaries (base-257 5-grams, cut where hash % 16 == 0), zero-copy
    chunk array straight from Arrow buffers, one groupby(chunk) Sum."""
    from pdf2doi_ray.stages.dedup import cdc_chunk_stats
    return cdc_chunk_stats(_docs(sf_dir, ("doc_id", "text")),
                           k=5, mod=16)


def _q_proximity_hash_join(sf_dir: str):
    """Proximity retrieval: docs where 'hash' and 'join' co-occur within
    3 token positions, with the exact minimum distance.  One streaming
    pass — searchsorted nearest-neighbor over composite row*stride+pos
    keys, scatter-min per row, zero shuffles."""
    from pdf2doi_ray.stages.retrieval import proximity_cooccurrence
    return proximity_cooccurrence(_docs(sf_dir, ("doc_id", "text")),
                                  "hash", "join", window=3)


def _q_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-style sole-blame join: suppliers who are the only
    flagged supplier in multi-supplier F-status orders.  Distinct-triple
    combiner → orderkey-sharded vectorized reduce → one fact-fact
    left_semi exchange → dimension broadcast for s_name."""
    import ray.data

    from pdf2doi_ray.stages.joins import waiting_suppliers
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"])
    supplier = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    return waiting_suppliers(orders, supplier, li, num_partitions=4,
                             num_shards=8)


def _q_order_count_distribution(sf_dir: str):
    """TPC-H-Q13-style distribution of orders-per-customer (zero bucket
    recovered from two scalar aggregates, no left-outer shuffle)."""
    import ray.data

    from pdf2doi_ray.stages.joins import order_count_distribution
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return order_count_distribution(cust, orders)


def _q_large_volume_orders(sf_dir: str):
    """TPC-H-Q18-style GROUP BY + HAVING + join-back: orders whose total
    quantity exceeds 300, with buyer names, top 100 by price."""
    import ray.data

    from pdf2doi_ray.stages.joins import large_volume_orders
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"])
    return large_volume_orders(cust, orders, li, qty_threshold=300)


def _q_returnflag_priority_counts(sf_dir: str):
    """TPC-H-Q12-style conditional aggregation: per return flag, line
    items of 1997 shipments split by order priority class."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import returnflag_priority_counts
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    return returnflag_priority_counts(
        orders, li, start_us=datetime.datetime(1997, 1, 1),
        end_us=datetime.datetime(1998, 1, 1), num_partitions=4)


def _q_idle_rich_customers(sf_dir: str):
    """TPC-H-Q22-style global-scalar gate + left_anti join: per nation,
    above-average-balance customers with no order since 1999 (exact
    integer-cents rational comparison, no float division)."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import idle_rich_customers
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    return idle_rich_customers(
        cust, orders, since_us=datetime.datetime(1999, 1, 1),
        num_partitions=4)


def _q_host_quota_sample(sf_dir: str):
    """Per-source diversity cap: the 5 smallest-Knuth-hash docs per
    source (deterministic, parallelism-independent; ≤k·|groups| exchange
    rows via the grouped_top_k combiner)."""
    from pdf2doi_ray.stages.corpus import quota_sample_per_group
    return quota_sample_per_group(_docs(sf_dir, ("doc_id", "source")),
                                  group_col="source", k=5)


def _q_small_quantity_revenue(sf_dir: str):
    """TPC-H-Q17-style correlated-average threshold (qty < 0.2·part avg,
    exact cross-multiplied rational), one brand."""
    import ray.data

    from pdf2doi_ray.stages.joins import small_quantity_revenue
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    return small_quantity_revenue(part, li, brand="Brand#1")


def _q_top_supplier_revenue(sf_dir: str):
    """TPC-H-Q15-style argmax with ties: best-revenue supplier(s) of one
    quarter, names via survivor broadcast."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import top_supplier_revenue
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    return top_supplier_revenue(
        supp, li, start_us=datetime.datetime(1996, 1, 1),
        end_us=datetime.datetime(1996, 4, 1))


def _q_json_field_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer "k" field out of the
    JSON props column with one vectorized RE2 kernel, aggregate per
    event type (combiner-first, integer-exact)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import json_field_stats
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"])
    return json_field_stats(ev, field="k", group_col="event_type")


def _q_returned_item_customers(sf_dir: str):
    """TPC-H-Q10-style returned-item customer ranking: one shuffle join,
    bounded top-k, survivor-broadcast name lookup."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import returned_item_customers
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
    return returned_item_customers(
        cust, nation, orders, li,
        start_us=datetime.datetime(1996, 10, 1),
        end_us=datetime.datetime(1997, 1, 1), k=20, num_partitions=4)


def _q_nation_pair_volume(sf_dir: str):
    """TPC-H-Q7-style bilateral volume between two nations by ship year
    (both dimension chains collapse before the one fact exchange)."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import nation_pair_volume
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])
    return nation_pair_volume(
        cust, supp, nation, orders, li,
        nation_a="NATION_8", nation_b="NATION_15",
        start_us=datetime.datetime(1996, 1, 1),
        end_us=datetime.datetime(1998, 1, 1), num_partitions=4)


def _q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary: ≤6-group full-scan aggregate with
    exact milli-int sums and floor-integer averages; the only exchange
    carries ≤6 combiner rows per batch."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.aggs import pricing_summary
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    return pricing_summary(li, cutoff_us=datetime.datetime(1998, 9, 2))


def _q_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-style filtered scalar aggregate (one int64 partial per
    batch, zero exchanges)."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.aggs import forecast_revenue
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    return forecast_revenue(li, start_us=datetime.datetime(1997, 1, 1),
                            end_us=datetime.datetime(1998, 1, 1))


def _q_doc_dup_gram_fraction(sf_dir: str):
    """Per-doc duplicated-5-gram permille (Lee-et-al. dedup curation
    signal) — integer-exact floor division after one groupby Sum."""
    from pdf2doi_ray.stages.corpus import doc_dup_gram_fraction
    return doc_dup_gram_fraction(_docs(sf_dir, ("doc_id", "text")),
                                 num_partitions=4)


def _q_seeded_shuffle(sf_dir: str):
    """Deterministic seeded global corpus permutation (the pre-packing
    shuffle): position = dense rank in md5('s42:' || doc_id) order.
    Narrow 16 B/row sort + block-carry rank bases — payloads never move."""
    from pdf2doi_ray.stages.export import seeded_shuffle
    return seeded_shuffle(_docs(sf_dir, ("doc_id",)), seed="s42")


def _q_melt_doc_stats(sf_dir: str):
    """Wide→long melt (UNPIVOT): each document emits one (doc_id, stat,
    value) row per numeric stat — stored n_chars plus derived
    n_text_chars (utf8 length) — as a pure vectorized map, zero
    shuffles."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.aggs import melt_columns

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": t["n_chars"],
            "n_text_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
        })

    ds = _docs(sf_dir, ("doc_id", "text", "n_chars")) \
        .map_batches(prep, batch_format="pyarrow")
    return melt_columns(ds, "doc_id", ["n_chars", "n_text_chars"])


def _q_chars_tokens_moments(sf_dir: str):
    """Exact integer covariance/correlation numerators of (n_chars,
    n_tokens) across documents: one combiner row per batch, a scalar
    driver aggregate, zero shuffles — division/√ left to the consumer so
    the op stays bit-exact."""
    import pyarrow as pa

    from pdf2doi_ray.stages.aggs import paired_moments
    from pdf2doi_ray.stages.textstats import token_stats

    ds = _docs(sf_dir, ("doc_id", "text")) \
        .map_batches(token_stats, batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["n_chars", "n_tokens"]),
                     batch_format="pyarrow")
    return paired_moments(ds, "n_chars", "n_tokens")


def _fmt_scratch(sf_dir: str, fmt: str) -> str:
    import os
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/graft_fmt/{fmt}_{base}"


def _q_jsonl_roundtrip(sf_dir: str):
    """documents → line-delimited-JSON shards under /tmp → read back.
    The identity oracle (same columns straight off the view) proves the
    interchange sink/source pair loses no row, value, or type — the
    ingest-format story for WET/WAT-style crawl exports (round 4)."""
    import shutil

    from pdf2doi_ray.sources.formats import export_jsonl, read_jsonl

    out = _fmt_scratch(sf_dir, "jsonl")
    shutil.rmtree(out, ignore_errors=True)
    export_jsonl(_docs(sf_dir, ("doc_id", "text", "lang", "n_chars")), out)
    return read_jsonl(out).select_columns(
        ["doc_id", "text", "lang", "n_chars"])


def _q_csv_roundtrip(sf_dir: str):
    """documents → CSV shards under /tmp → read back (same identity-oracle
    contract as ``jsonl_roundtrip``; Arrow quoting must survive embedded
    separators)."""
    import shutil

    from pdf2doi_ray.sources.formats import export_csv, read_csv_dir

    out = _fmt_scratch(sf_dir, "csv")
    shutil.rmtree(out, ignore_errors=True)
    export_csv(_docs(sf_dir, ("doc_id", "text", "lang", "n_chars")), out)
    return read_csv_dir(out).select_columns(
        ["doc_id", "text", "lang", "n_chars"])


def _q_orc_roundtrip(sf_dir: str):
    """documents → ORC shards under /tmp (one file per block, streaming
    sink) → read back (file-parallel).  Same identity-oracle contract as
    ``jsonl_roundtrip`` — the Hive/Trino-world interchange format."""
    import shutil

    from pdf2doi_ray.sources.formats import export_orc, read_orc_dir

    out = _fmt_scratch(sf_dir, "orc")
    shutil.rmtree(out, ignore_errors=True)
    export_orc(_docs(sf_dir, ("doc_id", "text", "lang", "n_chars")),
               out).materialize()
    return read_orc_dir(out).select_columns(
        ["doc_id", "text", "lang", "n_chars"])


def _q_train_test_split(sf_dir: str):
    from pdf2doi_ray.stages.corpus import train_test_split_stats
    return train_test_split_stats(_docs(sf_dir, ("doc_id", "lang")))


def _q_dedup_keep_best(sf_dir: str):
    from pdf2doi_ray.stages.corpus import dedup_keep_best
    return dedup_keep_best(_docs(sf_dir, ("doc_id", "text", "n_chars")))


def _q_top_bigrams(sf_dir: str):
    from pdf2doi_ray.stages.corpus import top_bigrams
    return top_bigrams(_docs(sf_dir, ("doc_id", "text")))


def _q_tfidf_top_terms(sf_dir: str):
    from pdf2doi_ray.stages.corpus import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir, ("doc_id", "text")))


def _q_token_quantiles(sf_dir: str):
    from pdf2doi_ray.stages.textstats import token_count_quantiles
    return token_count_quantiles(_docs(sf_dir, ("doc_id", "text")))


def _q_orders_customer_join(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.joins import broadcast_hash_join
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])
    return broadcast_hash_join(
        orders, cust, on=["o_custkey"], right_on=["c_custkey"],
        project=["o_orderkey", "o_custkey", "c_name", "c_mktsegment"])


def _q_lineitem_orders_join(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.joins import shuffle_hash_join
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    return shuffle_hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        num_partitions=8,
        project=["l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus"])


def _q_top_docs_per_lang(sf_dir: str):
    from pdf2doi_ray.stages.windowfns import grouped_top_k
    return grouped_top_k(_docs(sf_dir, ("doc_id", "lang", "n_chars")),
                         "lang", "n_chars", "doc_id", k=3)


def _q_rolling_user_sum(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import rolling_user_sum
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return rolling_user_sum(ev, w=3)


def _q_running_user_sum(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import running_user_sum
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return running_user_sum(ev)


def _q_distinct_users_per_type(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.sketch import exact_ndv_by_group
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return exact_ndv_by_group(ev, "event_type", "user_id")


def _q_token_quantiles_by_lang(sf_dir: str):
    from pdf2doi_ray.stages.textstats import token_count_quantiles_by_group
    return token_count_quantiles_by_group(
        _docs(sf_dir, ("doc_id", "text", "lang")), group_col="lang")


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _q_normalize_text(sf_dir: str):
    from pdf2doi_ray.stages.textnorm import normalize_text
    return normalize_text(_docs(sf_dir, ("doc_id", "text")))


def _pii_docs(sf_dir: str):
    """(doc_id, text) with deterministic PII appended from doc_id (one
    email, one phone, one IPv4 per document) — the synthetic corpus text
    contains none, so the redaction query would otherwise be a no-op; the
    SQL oracle builds the identical string with || / lpad and then mirrors
    the redaction regex chain step for step."""
    import numpy as np
    import pyarrow as pa

    def inject(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        d = ids.astype(str)
        pii = np.char.add(np.char.add(np.char.add(np.char.add(
            np.char.add(np.char.add(" contact user", d), "@mail"),
            (ids % 7).astype(str)), ".example.com or +1-555-"),
            np.char.add(np.char.zfill((ids % 10000).astype(str), 4),
                        "-99 from ")),
            np.char.add((ids % 256).astype(str), ".10.0.1"))
        txt = np.char.add(np.asarray(t["text"].combine_chunks()
                                     if isinstance(t["text"],
                                                   pa.ChunkedArray)
                                     else t["text"]).astype(str), pii)
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(txt.tolist(), type=pa.string())})

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        inject, batch_format="pyarrow")


_BANNER = ("breaking news subscribe now cookie policy accept all "
           "terms of service follow us on social media")  # exactly 16 tokens


def _banner_docs(sf_dir: str):
    """(doc_id, text) with a shared 16-token boilerplate banner prepended
    to every third document — the synthetic corpus has essentially no
    cross-document duplicate lines, so the keep-first line dedup would
    otherwise be a no-op; 16 tokens = exactly one chunk, so the rest of
    each doc chunks identically to the uninjected text.  The SQL oracle
    builds the identical CASE expression."""
    import numpy as np
    import pyarrow as pa

    def inject(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        txt = np.asarray(t["text"].combine_chunks()
                         if isinstance(t["text"], pa.ChunkedArray)
                         else t["text"]).astype(object)
        hit = ids % 3 == 0
        txt[hit] = [_BANNER + " " + s for s in txt[hit]]
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(txt.tolist(), type=pa.string())})

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        inject, batch_format="pyarrow")


def _q_line_dedup_keep_first(sf_dir: str):
    """RefinedWeb-style corpus-wide exact line dedup (keep first
    occurrence): explode 16-token lines → combiner → one groupby Min →
    ordered string-agg rebuild; documents never shuffle; fully-deduped
    docs are dropped (the curation contract)."""
    from pdf2doi_ray.stages.corpus import dedup_lines_keep_first
    return dedup_lines_keep_first(_banner_docs(sf_dir))


def _q_pii_redaction(sf_dir: str):
    """PII scrubbing: redact emails/phones/IPv4s to placeholder tokens and
    count each kind — pure vectorized RE2 map, zero shuffles."""
    from pdf2doi_ray.stages.textnorm import redact_pii
    return redact_pii(_pii_docs(sf_dir))


def _messy_urls(sf_dir: str):
    """(doc_id, url) with deterministically MESSY urls from doc_id (mixed
    case, default and non-default ports, fragments, bare trailing slash) —
    the same expression is built in the SQL oracles, which then mirror the
    canonicalization regex chain step for step."""
    import numpy as np
    import pyarrow as pa

    def mess(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        site = np.char.add("Site", (ids % 50).astype(str))
        d = ids.astype(str)
        variants = np.stack([
            np.char.add(np.char.add(np.char.add(
                "HTTP://", site), ".Example.ORG:80/p/"),
                np.char.add(d, "#frag")),
            np.char.add(np.char.add("https://", site), ".example.org:443/"),
            np.char.add(np.char.add(np.char.add(
                "http://", site), ".example.org/A/B?q="),
                np.char.add(d, "#x")),
            np.char.add(np.char.add(np.char.add(
                "https://", site), ".example.org:8443/path/"), d),
        ])
        urls = variants[ids % 4, np.arange(len(ids))]
        return pa.table({"doc_id": t["doc_id"],
                         "url": pa.array(urls.tolist(), type=pa.string())})

    return _docs(sf_dir, ("doc_id",)).map_batches(mess,
                                                  batch_format="pyarrow")


def _q_canonical_urls(sf_dir: str):
    from pdf2doi_ray.stages.textnorm import canonicalize_urls
    return canonicalize_urls(_messy_urls(sf_dir).drop_columns(["doc_id"]))


def _q_dedup_canonical_urls(sf_dir: str):
    # the %4==1 variant canonicalizes to a per-site root url (no doc id in
    # the path), so whole-site duplicate groups genuinely collapse here
    from pdf2doi_ray.stages.dedup import first_per_key
    from pdf2doi_ray.stages.textnorm import canonicalize_urls

    canon = canonicalize_urls(_messy_urls(sf_dir), keep=("doc_id",))
    return first_per_key(canon.drop_columns(["url"]),
                         key_col="canonical_url", id_col="doc_id")


def _q_inverted_index_stats(sf_dir: str):
    from pdf2doi_ray.stages.corpus import inverted_index_stats
    return inverted_index_stats(_docs(sf_dir, ("doc_id", "text")))


def _q_long_docs_above_p90(sf_dir: str):
    from pdf2doi_ray.stages.textstats import filter_above_quantile
    return filter_above_quantile(_docs(sf_dir, ("doc_id", "text")),
                                 q_permille=900)


def _q_events_sorted_head(sf_dir: str):
    # Ray Data's distributed sample-based range sort (§2.6 surface): fully
    # ordered output + limit; (ts, event_id) is a unique key so the head is
    # deterministic
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return ev.sort(["ts", "event_id"]).limit(1000)


def _q_rate_by_host(sf_dir: str):
    # end-to-end crawl-health metric: the full identify cascade, then
    # per-host found/total via the same combiner-first shape as
    # extraction_rate_by_lang — the shuffle carries one row per
    # (host, batch), never pages
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.pipelines.identify import identify_pages
    from pdf2doi_ray.stages.skew import _hosts_vec

    ids = identify_pages(_pages(sf_dir))   # url is already in the output

    def partial(t):
        urls = (t["url"].combine_chunks()
                if isinstance(t["url"], pa.ChunkedArray) else t["url"])
        found = pc.is_valid(t["identifier"]).cast(pa.int64())
        tbl = pa.table({"host": _hosts_vec(urls), "found": found})
        g = tbl.group_by("host").aggregate([("found", "sum"),
                                            ("found", "count")])
        return g.select(["host", "found_sum", "found_count"]) \
            .rename_columns(["host", "n_found", "n_pages"])

    from ray.data.aggregate import Sum

    return (ids.map_batches(partial, batch_format="pyarrow")
            .groupby("host").aggregate(Sum("n_found", alias_name="n_found"),
                                       Sum("n_pages", alias_name="n_pages")))


def _q_user_event_paths(sf_dir: str):
    """Ordered per-user event-type path (SQL string_agg ... ORDER BY ts) —
    sorted-block segment join in Arrow C++ + per-user sharded stitch."""
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_string_agg
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return grouped_string_agg(ev)


def _q_user_mode_event_type(sf_dir: str):
    """Statistical mode per user: most frequent event_type, ties to the
    lexicographically smallest — combiner counts + grouped top-1."""
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_mode
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


def _q_event_transitions(sf_dir: str):
    """Per-user Markov transition matrix of event types (adjacent-pair
    counts ordered by ts) — sorted-block pairs + 2-rows-per-block
    boundary stitch."""
    import ray.data

    from pdf2doi_ray.stages.aggs import event_transitions
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return event_transitions(ev)


def _q_event_type_cooccurrence(sf_dir: str):
    """Market-basket pair support: distinct users with BOTH event types,
    per unordered type pair — distinct combiner + one sort + vectorized
    pair kernel."""
    import ray.data

    from pdf2doi_ray.stages.aggs import event_type_cooccurrence
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return event_type_cooccurrence(ev)


def _q_interval_coverage(sf_dir: str):
    """Per-user union length of [ts, ts + value-derived duration)
    intervals (overlaps counted once) — segmented-cummax sweep over
    sorted blocks, raw edge segments to the sharded stitch."""
    import ray.data

    from pdf2doi_ray.stages.windows import interval_coverage
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return interval_coverage(ev)


def _q_group_split_stats(sf_dir: str):
    """Leakage-safe split: every doc of a source lands in ONE split
    (md5(source) permille bucket) — per-(lang, split) counts."""
    from pdf2doi_ray.stages.corpus import group_split_stats
    return group_split_stats(_docs(sf_dir, ("lang", "source")))


def _q_ngram_diversity(sf_dir: str):
    """Distinct-n corpus diversity per lang: distinct vs total 3-gram
    shingles (distinctness over SQL-recomputable md5-64 hashes)."""
    from pdf2doi_ray.stages.corpus import ngram_diversity
    return ngram_diversity(_docs(sf_dir, ("lang", "text")))


def _q_zorder_layout(sf_dir: str):
    """Morton-curve layout key over (user_id, milli value) + range sort
    — the multi-dimension block-clustering primitive."""
    import ray.data

    from pdf2doi_ray.stages.export import zorder_layout
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    return zorder_layout(ev)


def _q_lang_confusion(sf_dir: str):
    """Stored-label vs predicted-language confusion matrix — lang_id per
    batch + combiner counts, one tiny exchange."""
    from pdf2doi_ray.stages.textstats import lang_confusion
    return lang_confusion(_docs(sf_dir))


def _q_inverted_index(sf_dir: str):
    """Bounded inverted index (exact df + 8 smallest doc ids per token)
    — one bucketed exchange, vectorized per-bucket merge."""
    from pdf2doi_ray.stages.corpus import inverted_index
    return inverted_index(_docs(sf_dir, ("doc_id", "text")))


def _q_flesch_readability(sf_dir: str):
    """Integer-exact Flesch Reading Ease per doc (RE2 vowel-run /
    sentence-run counts) — pure vectorized map."""
    from pdf2doi_ray.stages.textstats import flesch_readability
    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        flesch_readability, batch_format="pyarrow")


def _q_iqr_outlier_filter(sf_dir: str):
    """Tukey-fence outlier removal per event type (exact integer q1/q3 +
    broadcast fences, no join exchange)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import iqr_outlier_filter
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"])
    return iqr_outlier_filter(ev)


def _q_cooccurrence_lift(sf_dir: str):
    """Association lift per co-occurring event-type pair (distinct-user
    probabilities, exact integer permille)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import cooccurrence_lift
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return cooccurrence_lift(ev)


def _q_fuzzy_token_pairs(sf_dir: str):
    """Source-name pairs at Levenshtein distance exactly 1 (typo-squat
    detection) via deletion-neighborhood blocking + exact verify (no
    all-pairs scan)."""
    from pdf2doi_ray.stages.corpus import fuzzy_token_pairs
    return fuzzy_token_pairs(_docs(sf_dir, ("source",)),
                             token_col="source")


def _q_curate_v3(sf_dir: str):
    """Curation v3: Gopher gate + Flesch floor + leakage-safe
    train-split gate, then exact keep-first text dedup — gates before
    the one exchange."""
    from pdf2doi_ray.pipelines.curate import curate_training_slice
    return curate_training_slice(
        _docs(sf_dir, ("doc_id", "text", "source")))


def _q_hll_registers_by_lang(sf_dir: str):
    """Per-language HLL register state for distinct sources (mergeable
    grouped NDV sketch; register state exactly SQL-recomputable)."""
    from pdf2doi_ray.stages.sketch import hll_register_rows_by_group
    return hll_register_rows_by_group(
        _docs(sf_dir, ("lang", "source")), "lang", "source")


def _q_banned_phrase_filter(sf_dir: str):
    """C4-style banned-content gate: one RE2 alternation, pure streaming
    filter."""
    from pdf2doi_ray.stages.textstats import banned_phrase_filter
    return banned_phrase_filter(
        _docs(sf_dir, ("doc_id", "text", "n_chars")))


def _q_union_by_name(sf_dir: str):
    """Schema-evolution UNION ALL BY NAME: two snapshot slices with
    different column sets null-pad into one canonical schema (pure
    streaming, zero-movement union)."""
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.setops import union_by_name

    even = _docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow")
    odd = _docs(sf_dir, ("doc_id", "lang", "source")).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow")
    return union_by_name(even, odd)


def _q_host_crawl_gaps(sf_dir: str):
    """Per-host fetch-gap politeness audit (min/max seconds between
    consecutive fetches) — sorted-block gaps + 2-row boundary stitch."""
    from pdf2doi_ray.stages.skew import host_crawl_gaps
    return host_crawl_gaps(_pages(sf_dir))


def _q_hits_scores(sf_dir: str):
    """Fixed-iteration (2 rounds) EXACT-integer HITS hubs/authorities over
    the weighted host link graph — max-normalized integer sweeps, so the
    scores are bit-identical to the unrolled SQL oracle."""
    from pdf2doi_ray.stages.graph import hits_fixed

    edges = _q_host_link_graph(sf_dir)

    def rename(t):
        import pyarrow as pa
        return pa.table({"src": t["src_host"], "dst": t["dst_host"],
                         "n_links": t["n_links"]})

    return hits_fixed(edges.map_batches(rename, batch_format="pyarrow"),
                      n_iters=2)


def _q_bm25_top_docs(sf_dir: str):
    from pdf2doi_ray.stages.retrieval import bm25_top_docs
    return bm25_top_docs(_docs(sf_dir, ("doc_id", "text")),
                         ("hash", "join", "vector", "slow"), k=20)


def _q_rrf_fusion(sf_dir: str):
    from pdf2doi_ray.stages.retrieval import rrf_fuse_top_docs
    return rrf_fuse_top_docs(_docs(sf_dir, ("doc_id", "text", "n_chars")),
                             k=20, depth=50)


def _q_dedup_url_daily(sf_dir: str):
    """Recrawl collapse: one page per (url, UTC day), earliest fetch
    wins — exercised over a two-visit stream (the crawl + a +86000 s
    revisit, which straddles the day boundary only for late-day k)."""
    import pyarrow.compute as pc

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.stages.corpus import dedup_url_daily

    pages = _pages(sf_dir)

    def shift(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        from pdf2doi_ray.arrowutil import one_chunk
        return pa.table({
            "url": t["url"],
            "warc_ts": pc.add(
                one_chunk(t["warc_ts"]).cast(pa.timestamp("us")),
                pa.scalar(86_000_000_000, pa.duration("us"))),
        })

    revisit = pages.map_batches(shift, batch_format="pyarrow")
    first = pages.map_batches(
        lambda t: t.select(["url", "warc_ts"]), batch_format="pyarrow")
    return dedup_url_daily(first.union(revisit))


def _q_rank_user_value(sf_dir: str):
    """RANK() per user over the mod-100 milli value (tie-rich ordering);
    same sorted-block + sharded-stitch engine as the rolling sums."""
    import ray.data

    from pdf2doi_ray.stages.windowfns import rank_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return rank_user_value(ev)


def _q_dense_rank_user_value(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import dense_rank_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return dense_rank_user_value(ev)


def _q_row_number_user(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import row_number_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return row_number_user(ev)


def _q_lag_user_value(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import lag_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return lag_user_value(ev)


def _q_ntile_user(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import ntile_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return ntile_user(ev, n=4)


def _q_first_value_user(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import first_value_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return first_value_user(ev)


def _q_last_value_user(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import last_value_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return last_value_user(ev)


def _q_percent_rank_user_value(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import percent_rank_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return percent_rank_user_value(ev)


def _q_cume_dist_user_value(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import cume_dist_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return cume_dist_user_value(ev)


def _q_value_quantiles_by_type(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.aggs import value_quantiles_milli_by_group
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return value_quantiles_milli_by_group(ev, "event_type", "value")


def _q_approx_value_quantiles(sf_dir: str):
    """KLL/MRL mergeable quantile sketch over events.value: one few-KiB
    partial per batch, driver merges blobs — the scale path for unbounded
    domains where the exact milli histogram would grow with cardinality.
    No SQL oracle (approximate by design); locked by the rank-error
    property tests in tests/test_sketch.py against the exact machinery."""
    import ray.data

    from pdf2doi_ray.stages.sketch import approx_quantiles_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return approx_quantiles_milli(ev, "value")


def _q_approx_value_quantiles_by_type(sf_dir: str):
    """Per-group KLL quantiles over events (group = event_type): one blob
    per (group, batch), one groupby over blob rows, per-group merge in
    the reducer — the scale escape when a group's value domain is
    unbounded.  No SQL oracle (approximate by design); locked by the
    per-group rank-error property test in tests/test_sketch.py."""
    import ray.data

    from pdf2doi_ray.stages.sketch import approx_quantiles_milli_by_group
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return approx_quantiles_milli_by_group(ev, "event_type", "value")


def _q_event_type_freqs_cm(sf_dir: str):
    """Count-Min point-frequency estimates over events.event_type: one
    (4x1024) int64 table per batch, lossless element-wise driver merge,
    probe answers without any shuffle.  The md5 bucket map makes the
    sketch SQL-recomputable, so the oracle rebuilds every (row, bucket)
    register sum and takes the same min — the driver check is exact,
    over-estimates included; the e/width*N error-bound property is
    locked separately in tests/test_sketch.py."""
    import ray.data

    from pdf2doi_ray.stages.sketch import count_min_frequencies
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type"])
    return count_min_frequencies(
        ev, "event_type",
        probes=("click", "view", "purchase", "signup", "error",
                "never-seen-type"))


def _q_funnel_conversion(sf_dir: str):
    """click→purchase funnel: earliest purchase at/after each user's
    first click.  Two combiner-first Min passes with a broadcast of the
    per-user entry table between them."""
    import ray.data

    from pdf2doi_ray.stages.aggs import funnel_conversion
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    return funnel_conversion(ev, "click", "purchase")


def _q_event_value_histogram(sf_dir: str):
    """Fixed 20-bin histogram of events.value over [0, 100) with explicit
    under/overflow bins — exact integer binning (piecewise, no negative
    division), combiner partials of n_bins+2 rows per batch."""
    import ray.data

    from pdf2doi_ray.stages.aggs import value_histogram_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return value_histogram_milli(ev, "value", lo_milli=0, hi_milli=100_000,
                                 n_bins=20)


def _q_events_cube(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.aggs import cube_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    import pyarrow as pa

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        par = pc.if_else(
            pc.equal(pc.bit_wise_and(t["user_id"], 1), 1), "odd", "even")
        return pa.table({"event_type": t["event_type"], "parity": par})

    return cube_counts(ev.map_batches(prep, batch_format="pyarrow"),
                       "event_type", "parity")


def _q_lead_user_value(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.windowfns import lead_user_value
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return lead_user_value(ev)


def _q_docs_rollup(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.aggs import rollup_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    import pyarrow as pa

    def prep(t: pa.Table) -> pa.Table:
        # second rollup level: user-id parity bucket (string, like the SQL)
        import pyarrow.compute as pc
        par = pc.if_else(
            pc.equal(pc.bit_wise_and(t["user_id"], 1), 1), "odd", "even")
        return pa.table({"event_type": t["event_type"], "parity": par})

    return rollup_counts(ev.map_batches(prep, batch_format="pyarrow"),
                         "event_type", "parity")


def _q_stratified_sample_by_lang(sf_dir: str):
    # exactly-k-per-group deterministic sample: grouped top-k over the
    # NEGATED Knuth-hash priority (grouped_top_k orders DESC; negating
    # turns it into smallest-priority-first), ties by doc_id
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import knuth_hash32
    from pdf2doi_ray.stages.windowfns import grouped_top_k

    def prio(t: pa.Table) -> pa.Table:
        h = knuth_hash32(t["doc_id"])
        return pa.table({
            "lang": t["lang"],
            "doc_id": t["doc_id"],
            "neg_priority": pa.array(-h.astype(np.int64), type=pa.int64()),
        })

    ds = _docs(sf_dir, ("doc_id", "lang")).map_batches(
        prio, batch_format="pyarrow")
    return grouped_top_k(ds, "lang", "neg_priority", "doc_id", k=20)


def _q_heavy_hitter_tokens(sf_dir: str):
    # the fixture vocabulary (31 terms) is far below m=256, so the
    # Misra-Gries summary is provably EXACT here (err_bound 0) and the SQL
    # oracle is a plain top-20 count; the compression regime (m < distinct)
    # is locked by the invariant property tests instead
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import _tokens_nonempty
    from pdf2doi_ray.stages.sketch import heavy_hitters

    def flat(t: pa.Table) -> pa.Table:
        toks, _ = _tokens_nonempty(t)
        return pa.table({"token": toks})

    ds = _docs(sf_dir, ("doc_id", "text")).map_batches(
        flat, batch_format="pyarrow")
    return heavy_hitters(ds, "token", m=256, k=20)


def _q_heavy_hitter_tokens_tree(sf_dir: str):
    """Tree-merged Misra-Gries: summary rows hash-partition by key, each
    shard compresses, the driver sees <= shards*m rows — the fleet-scale
    escape for the flat variant's B*m driver rows.  Same m >= vocabulary
    regime as the flat query, so the same exact SQL oracle applies."""
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import _tokens_nonempty
    from pdf2doi_ray.stages.sketch import heavy_hitters_tree

    def flat(t: pa.Table) -> pa.Table:
        toks, _ = _tokens_nonempty(t)
        return pa.table({"token": toks})

    ds = _docs(sf_dir, ("doc_id", "text")).map_batches(
        flat, batch_format="pyarrow")
    return heavy_hitters_tree(ds, "token", m=256, k=20, num_shards=4)


def _q_embedding_centroids(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_centroids
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["label", "embedding"])
    return embedding_centroids(emb)


def _q_event_value_quantiles(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.aggs import value_quantiles_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return value_quantiles_milli(ev, "value")


def _q_weighted_sample(sf_dir: str):
    from pdf2doi_ray.stages.corpus import weighted_sample
    return weighted_sample(_docs(sf_dir, ("doc_id", "text")))


def _q_uniform_sample(sf_dir: str):
    from pdf2doi_ray.stages.corpus import uniform_sample_k
    return uniform_sample_k(_docs(sf_dir, ("doc_id",)), k=25)


def _q_sample_intersect(sf_dir: str):
    """Distinct doc_ids kept by BOTH deterministic samplers (uniform hash
    sample ∩ quality-weighted sample) — SQL INTERSECT as a combiner-first
    single-shuffle membership aggregate."""
    from pdf2doi_ray.stages.corpus import hash_sample, weighted_sample
    from pdf2doi_ray.stages.setops import distinct_intersect
    a = hash_sample(_docs(sf_dir, ("doc_id",)))
    b = weighted_sample(_docs(sf_dir, ("doc_id", "text")))
    return distinct_intersect(a, b, "doc_id")


def _q_sample_except(sf_dir: str):
    """Distinct doc_ids kept by the uniform hash sample but NOT the
    quality-weighted sample — SQL EXCEPT, same membership engine."""
    from pdf2doi_ray.stages.corpus import hash_sample, weighted_sample
    from pdf2doi_ray.stages.setops import distinct_except
    a = hash_sample(_docs(sf_dir, ("doc_id",)))
    b = weighted_sample(_docs(sf_dir, ("doc_id", "text")))
    return distinct_except(a, b, "doc_id")


def _q_repetition_filter(sf_dir: str):
    """Gopher-style repetition quality filter: per-doc top-bigram fraction
    (permille) + keep flag.  Pure map-side — zero shuffles."""
    from pdf2doi_ray.stages.corpus import top_bigram_repetition
    return top_bigram_repetition(_docs(sf_dir, ("doc_id", "text")))


def _q_contamination(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any 8-token
    shingle with the deterministic benchmark slice (doc_id % 97 == 0);
    benchmark grams broadcast once, corpus streams — zero shuffles."""
    from pdf2doi_ray.stages.corpus import contamination_flags
    return contamination_flags(_docs(sf_dir, ("doc_id", "text")))


def _q_extract_links(sf_dir: str):
    """Outlink extraction over docs with deterministic anchors appended
    from doc_id (one per doc, a second hub link for every fourth) — the
    synthetic corpus text has none; vectorized split + RE2 explode, no
    shuffle.  SQL mirrors the injection and scans the same grammar with
    regexp_extract_all."""
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import extract_links

    def inject(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        d = ids.astype(str)
        links = np.char.add(np.char.add(np.char.add(np.char.add(
            ' <a href="https://s', (ids % 5).astype(str)),
            ".example.org/p/"), d), '">doc')
        links = np.char.add(np.char.add(links, d), "</a>")
        hub = np.where(
            ids % 4 == 0,
            np.char.add(np.char.add(' <a href="https://hub.example.org/',
                                    (ids % 7).astype(str)), '">hub</a>'),
            "")
        txt = np.char.add(np.char.add(np.asarray(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]).astype(str), links), hub)
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(txt.tolist(), type=pa.string())})

    docs = _docs(sf_dir, ("doc_id", "text")).map_batches(
        inject, batch_format="pyarrow")
    return extract_links(docs)


def _linked_pages(sf_dir: str):
    """Shared link-injected page corpus for the crawl-graph queries
    (host_link_graph, hits_scores, bfs_host_distance, co_citation):
    src url and grammar links synthesized deterministically from
    doc_id — identical derivation in the SQL oracles."""
    import numpy as np
    import pyarrow as pa

    def inject(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        d = ids.astype(str)
        url = np.char.add(np.char.add(np.char.add(
            "https://s", (ids % 5).astype(str)), ".example.org/d/"), d)
        links = np.char.add(np.char.add(np.char.add(np.char.add(
            ' <a href="https://s', (ids % 3).astype(str)),
            ".example.org/p/"), d), '">doc</a>')
        hub = np.where(
            ids % 4 == 0,
            np.char.add(np.char.add(' <a href="https://hub.example.org/',
                                    (ids % 7).astype(str)), '">hub</a>'),
            "")
        txt = np.char.add(np.char.add(np.asarray(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]).astype(str), links), hub)
        return pa.table({
            "doc_id": t["doc_id"],
            "url": pa.array(url.tolist(), type=pa.string()),
            "text": pa.array(txt.tolist(), type=pa.string()),
        })

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        inject, batch_format="pyarrow")


def _q_host_link_graph(sf_dir: str):
    """Host-level link graph over the link-injected docs (src url also
    synthesized from doc_id): combiner-first (src, dst) edge counts, one
    groupby Sum."""
    from pdf2doi_ray.stages.corpus import host_link_graph
    return host_link_graph(_linked_pages(sf_dir))


def _q_co_citation(sf_dir: str):
    """Co-citation projection: top host pairs linked from the same page
    — per-page distinct dst hosts, vectorized i<j pair fan-out, one
    groupby(pair) Sum, bounded-partial top-k."""
    from pdf2doi_ray.stages.corpus import co_citation_counts
    return co_citation_counts(_linked_pages(sf_dir), k=20)


def _q_curate_v2(sf_dir: str):
    """Curation v2 flagship composition: full Gopher gate → corpus-wide
    keep-first line dedup (subsumes exact doc dedup) in one streaming
    pipeline over banner-injected docs; one line groupby + one sort."""
    from pdf2doi_ray.pipelines.curate import curate_gopher_linededup
    return curate_gopher_linededup(_banner_docs(sf_dir))


def _q_pack_sequences(sf_dir: str):
    """Training-sequence packing: 32-token sequences spanning doc
    boundaries in doc_id order — count-row sort + per-block carry bases
    (one driver row per BLOCK), one text join, one ordered rebuild."""
    from pdf2doi_ray.stages.corpus import pack_sequences
    return pack_sequences(_docs(sf_dir, ("doc_id", "text")), seq_len=32)


def _q_dsir_scores(sf_dir: str):
    """DSIR-style importance score vs the doc_id%9==0 target slice:
    combiner token counts → one groupby → vocab-diff broadcast →
    streaming per-doc score; documents never shuffle."""
    from pdf2doi_ray.stages.corpus import dsir_scores
    return dsir_scores(_docs(sf_dir, ("doc_id", "text")))


def _q_crawl_diff(sf_dir: str):
    """Crawl snapshot diff: the previous snapshot is derived
    deterministically from documents (doc_id%7==0 rows absent → added,
    doc_id%5==0 rows carry older text → changed, ghost rows at
    doc_id+1000000 for doc_id%11==0 → removed); per-batch md5 reduction
    on both sides, ONE full-outer hash join, vectorized classification.
    The SQL oracle builds the identical previous snapshot."""
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import crawl_diff

    def mk_prev(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        txt = np.asarray(t["text"].combine_chunks()
                         if isinstance(t["text"], pa.ChunkedArray)
                         else t["text"]).astype(object)
        keep = ids % 7 != 0
        kept_txt = txt[keep].copy()
        old = ids[keep] % 5 == 0
        kept_txt[old] = [s + " old" for s in kept_txt[old]]
        ghost = ids % 11 == 0
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids[keep],
                                               ids[ghost] + 1_000_000])),
            "text": pa.array(list(kept_txt) + list(txt[ghost]),
                             type=pa.string()),
        })

    curr = _docs(sf_dir, ("doc_id", "text"))
    prev = _docs(sf_dir, ("doc_id", "text")).map_batches(
        mk_prev, batch_format="pyarrow")
    return crawl_diff(curr, prev)


def _q_host_quality_filter(sf_dir: str):
    """Domain-level curation: drop every doc whose source group's mean
    n_chars (exact integer milli) is below 300000 — per-group combiner →
    one small groupby → good-set broadcast → streaming gate; docs never
    shuffle."""
    from pdf2doi_ray.stages.corpus import filter_by_group_quality
    return filter_by_group_quality(
        _docs(sf_dir, ("doc_id", "source", "n_chars")))


def _q_contamination_distributed(sf_dir: str):
    """Corpus-scale decontamination (no benchmark broadcast): combiner
    (gram, doc, n) pairs → one hash-partitioned join on gram → per-doc
    Sum — exact same output as `contamination`, for benchmark sides too
    large for the object store."""
    from pdf2doi_ray.stages.corpus import contamination_flags_distributed
    return contamination_flags_distributed(_docs(sf_dir, ("doc_id", "text")))


def _q_passage_windows(sf_dir: str):
    """Retrieval passage windowing: one row per 32-token window every 16
    tokens (overlapping) — pure vectorized flat-map, no shuffle."""
    from pdf2doi_ray.stages.corpus import explode_token_windows
    return explode_token_windows(_docs(sf_dir, ("doc_id", "text")),
                                 size=32, stride=16)


def _q_oov_rate(sf_dir: str):
    """Per-doc out-of-vocabulary permille vs the corpus top-50 token
    vocabulary — the cheap LM-perplexity stand-in for quality filtering.
    Vocab pass is combiner-first + bounded-partial top-k; the 50-string
    vocab broadcasts once and docs stream."""
    from pdf2doi_ray.stages.corpus import oov_rate
    return oov_rate(_docs(sf_dir, ("doc_id", "text")), vocab_size=50)


def _q_remove_boilerplate_lines(sf_dir: str):
    """CCNet-style common-line removal: chunk each doc into deterministic
    16-token lines, count distinct-doc occurrences per line (combiner →
    one small groupby), broadcast the common set once, and stream docs
    through a vectorized membership scrub.  Documents never shuffle."""
    from pdf2doi_ray.stages.corpus import (chunk_tokens_to_lines,
                                           remove_common_lines)
    lined = chunk_tokens_to_lines(_docs(sf_dir, ("doc_id", "text")),
                                  every=16)
    return remove_common_lines(lined, min_docs=2)


def _q_boilerplate_distributed(sf_dir: str):
    """CCNet common-line removal, scale path: no common-set broadcast —
    left-outer hash join of line occurrences against the common table,
    ordered string-agg rebuild; exact same output as the broadcast
    variant (shared oracle)."""
    from pdf2doi_ray.stages.corpus import (chunk_tokens_to_lines,
                                           remove_common_lines_distributed)
    lined = chunk_tokens_to_lines(_docs(sf_dir, ("doc_id", "text")),
                                  every=16)
    return remove_common_lines_distributed(lined, min_docs=2)


def _q_curate_corpus(sf_dir: str):
    from pdf2doi_ray.pipelines.curate import curate_quality_dedup
    return curate_quality_dedup(_docs(sf_dir, ("doc_id", "text")))


def _q_events_type_summary(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.aggs import grouped_summary
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return grouped_summary(ev, "event_type", "value")


def _q_new_docs_anti_join(sf_dir: str):
    # cross-crawl dedup shape: drop every doc already present in the
    # "previous crawl" (simulated by the deterministic hash sample) via a
    # broadcast LEFT ANTI join — the big side never shuffles
    from pdf2doi_ray.stages.corpus import hash_sample
    from pdf2doi_ray.stages.joins import broadcast_hash_join

    docs = _docs(sf_dir, ("doc_id", "lang"))
    prev = hash_sample(_docs(sf_dir, ("doc_id",)))
    return broadcast_hash_join(docs, prev, on="doc_id",
                               join_type="left anti",
                               project=["doc_id", "lang"])


def _q_events_pivot(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.pivot import pivot_counts
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)


def _q_customer_orders_left_join(sf_dir: str):
    import ray.data

    from pdf2doi_ray.stages.joins import shuffle_hash_join
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    return shuffle_hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey",
        join_type="left_outer", num_partitions=8,
        project=["c_custkey", "c_name", "o_orderkey", "o_orderstatus"])


def _q_dup_ngram_spans(sf_dir: str):
    """Exact duplicated-span detection (word 5-grams, Lee et al. 2021
    style): first corpus-wide occurrence of each gram keeps, repeats
    flag for removal."""
    from pdf2doi_ray.stages.corpus import dup_ngram_spans
    return dup_ngram_spans(_docs(sf_dir, ("doc_id", "text")),
                           num_partitions=4)


def _q_merge_dup_spans(sf_dir: str):
    """Duplicated-span audit view: non-first word-5-gram occurrences
    coalesced into maximal disjoint token intervals per doc
    (gaps-and-islands over sorted blocks with a doc-sharded stitch)."""
    from pdf2doi_ray.stages.corpus import merge_dup_spans
    return merge_dup_spans(_docs(sf_dir, ("doc_id", "text")),
                           num_partitions=4)


def _q_remove_dup_spans(sf_dir: str):
    """Full Lee-et-al. rewrite: repeated word-5-gram spans removed, first
    occurrence kept."""
    from pdf2doi_ray.stages.corpus import remove_dup_spans
    return remove_dup_spans(_docs(sf_dir, ("doc_id", "text")),
                            num_partitions=4)


_BLOCKED_SITES = ("7", "19", "23", "41")     # deterministic curated list


def _q_host_blocklist(sf_dir: str):
    from pdf2doi_ray.stages.skew import filter_blocked_hosts
    blocked = [f"site{s}.example.org" for s in _BLOCKED_SITES]
    return filter_blocked_hosts(_pages(sf_dir), blocked,
                                keep_cols=("url", "lang"))


def _q_shard_assignment(sf_dir: str):
    from pdf2doi_ray.stages.export import shard_assignment
    return shard_assignment(_docs(sf_dir, ("doc_id",)), n_shards=16)


def _q_quality_model(sf_dir: str):
    """Hashed-bag-of-tokens integer linear quality classifier (the model-
    inference plumbing stage; weights load once per worker)."""
    from pdf2doi_ray.stages.inference import score_quality_model
    return score_quality_model(_docs(sf_dir, ("doc_id", "text")))


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster -> within-cluster cosine pairs -> prune): no SQL
    oracle (k-means); locked by the planted-cluster golden test in
    tests/test_round4_ops.py."""
    import ray.data

    from pdf2doi_ray.stages.similarity import semantic_dedup
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return semantic_dedup(emb, k=8, iters=5, threshold=0.95)


def _q_resolve_redirects(sf_dir: str):
    """Redirect-chain resolution by path doubling over a deterministic
    functional graph on doc ids: doc d>0 redirects to
    ``max(d - 1 - md5_64(d)%7, 0)`` unless ``md5_64(d)%5 == 0`` (a
    terminal page); expected chain ~5 hops, longest a few dozen — the
    log2-round doubling loop resolves all of them in ~6 self-joins."""
    import numpy as np
    import pyarrow as pa

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.stages.corpus import md5_u64
    from pdf2doi_ray.stages.graph import resolve_redirects

    def edges(t: pa.Table) -> pa.Table:
        d = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        h = md5_u64(np.array([str(x) for x in d], dtype=object))
        keep = (d > 0) & (h % np.uint64(5) != 0)
        d, h = d[keep], h[keep]
        dst = np.maximum(d - 1 - (h % np.uint64(7)).astype(np.int64), 0)
        return pa.table({"src": pa.array(d), "dst": pa.array(dst)})

    e = _docs(sf_dir, ("doc_id",)).map_batches(edges, batch_format="pyarrow")
    return resolve_redirects(e)


def _q_rolling_time_sum(sf_dir: str):
    """RANGE-frame window: per-user sum over the trailing hour of events
    (order-key-value frame, peers included) — the time-windowed twin of
    the ROWS-frame rolling sums."""
    import ray.data

    from pdf2doi_ray.stages.windowfns import rolling_time_user_sum
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return rolling_time_user_sum(ev, window_s=3600)


def _q_token_budget_head(sf_dir: str):
    """Cut the corpus to a 100k-token training budget in the seeded md5
    order — cumulative-window prefix over the deterministic shuffle."""
    from pdf2doi_ray.stages.corpus import token_budget_head
    return token_budget_head(_docs(sf_dir, ("doc_id", "text")),
                             budget_tokens=100_000)


def _q_bucketed_join(sf_dir: str):
    """Co-bucketed storage join: both fact tables written hash-bucketed
    by orderkey once (streaming hive writes), then joined bucket-by-bucket
    with zero exchange — the write-once/join-many storage layout."""
    import os
    import shutil

    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_join, write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/pdf2doi_bucketed_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"])
    write_bucketed(orders, "o_orderkey", f"{root}/orders", n_buckets=16)
    write_bucketed(li, "l_orderkey", f"{root}/lineitem", n_buckets=16)
    return bucketed_join(
        f"{root}/lineitem", f"{root}/orders",
        on="l_orderkey", right_on="o_orderkey", n_buckets=16,
        project=["l_orderkey", "l_linenumber", "l_quantity", "o_custkey"])


def _q_robots_disallow(sf_dir: str):
    """Every third site disallows the '/docs/10.' path prefix (the
    encoded-DOI pdf family): grouped-prefix vectorized filter."""
    from pdf2doi_ray.stages.skew import filter_robots_disallow
    rules = {f"site{s}.example.org": ("/docs/10.",) for s in range(0, 50, 3)}
    return filter_robots_disallow(_pages(sf_dir), rules,
                                  keep_cols=("url", "lang"))


def _q_equi_depth_hist(sf_dir: str):
    """Equal-frequency 4-bucket histogram over the events value column
    (exact ceil-rank edges; ties never straddle buckets)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import equi_depth_histogram_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return equi_depth_histogram_milli(ev, "value", k=4)


def _q_group_token_budget(sf_dir: str):
    """Training-mixture enforcement: per-language token budgets (en 5000 /
    de 2000 binding, es 10000 non-binding, zh 1 near-empty, fr unlisted
    and dropped) over the per-group seeded md5 order."""
    from pdf2doi_ray.stages.corpus import group_token_budget
    budgets = {"en": 5000, "de": 2000, "es": 10000, "zh": 1}
    return group_token_budget(_docs(sf_dir, ("doc_id", "text", "lang")),
                              budgets, group_col="lang")


def _q_salted_join(sf_dir: str):
    """Skew-salted fact join: orderkeys with >=5 line items are treated
    as hot (salted 4 ways, right rows replicated); result bit-identical
    to the plain join."""
    import ray.data

    from pdf2doi_ray.stages.joins import salted_join
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_totalprice"])
    return salted_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        hot_threshold=5, n_salts=4, num_partitions=8,
        project=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "o_totalprice"])


def _q_percentile_transform(sf_dir: str):
    """Exact permille rank transform of event values (ties share ranks)
    via the broadcast-histogram two-phase plan."""
    import ray.data

    from pdf2doi_ray.stages.aggs import percentile_transform_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])
    return percentile_transform_milli(ev, "value")


def _q_compact_roundtrip(sf_dir: str):
    """Small-file compaction identity: documents scattered into 64 tiny
    files, compacted to ~2, read back — contents must survive exactly."""
    import os
    import shutil

    import ray.data

    from pdf2doi_ray.sources.formats import compact_parquet_dir

    tag = os.path.basename(sf_dir.rstrip("/"))
    frag = f"/tmp/pdf2doi_compact_{tag}/frag"
    out = f"/tmp/pdf2doi_compact_{tag}/out"
    shutil.rmtree(f"/tmp/pdf2doi_compact_{tag}", ignore_errors=True)
    ray.data.read_parquet(f"{sf_dir}/documents.parquet")         .repartition(64).write_parquet(frag)
    total = sum(os.path.getsize(os.path.join(frag, f))
                for f in os.listdir(frag) if f.endswith(".parquet"))
    compact_parquet_dir(frag, out, target_bytes=max(1, total // 2 + 1))
    n_files = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_files <= 4, f"compaction left {n_files} files"
    return ray.data.read_parquet(out)


def _q_cdc_apply(sf_dir: str):
    """Upsert/delete log → final state: events as a CDC log keyed by
    event_id%500 (multiple versions per key), value<20 marks deletes."""
    import ray.data

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.stages.aggs import cdc_apply

    def as_log(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        eid = one_chunk(t["event_id"])
        return pa.table({
            "k": pc.subtract(eid, pc.multiply(
                pc.divide(eid, pa.scalar(500, pa.int64())),
                pa.scalar(500, pa.int64()))),
            "seq": eid,
            "op": pc.if_else(pc.less(one_chunk(t["value"]),
                                     pa.scalar(20.0)), "D", "U"),
            "payload": one_chunk(t["event_type"]),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "value", "event_type"])
    return cdc_apply(ev.map_batches(as_log, batch_format="pyarrow"))


def _q_tumbling_distinct(sf_dir: str):
    """Exact unique users per hour window (distinct-pair combiner plan)."""
    import ray.data

    from pdf2doi_ray.stages.windows import tumbling_distinct_users
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])
    return tumbling_distinct_users(ev)


def _q_warc_roundtrip(sf_dir: str):
    """WARC sink+source roundtrip: pages → .warc files → parsed back.
    Payload byte-equality is asserted IN the query via an
    order-independent digest sum over md5(url || html) on both sides (SQL
    cannot rebuild html bytes); the driver hash-checks (url, secs)."""
    import hashlib
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.sources.warc import export_warc, read_warc

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/pdf2doi_warc_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    pages = _pages(sf_dir)
    n_written = export_warc(pages, out).sum("n_records")
    parsed = read_warc(out)

    def digest(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        html = one_chunk(t["html"]).cast(pa.binary()).to_pylist()
        s = sum(int.from_bytes(
            hashlib.md5(u.encode("utf-8") + p).digest()[:8], "big")
            for u, p in zip(urls, html))
        return pa.table({"d": pa.array([s % (1 << 62)], type=pa.int64()),
                         "n": pa.array([t.num_rows], type=pa.int64())})

    def total(ds):
        agg = ds.map_batches(digest, batch_format="pyarrow")
        return agg.sum("d"), agg.sum("n")

    d_src, n_src = total(pages)
    d_rt, n_rt = total(parsed)
    assert (d_src, n_src) == (d_rt, n_rt) and n_src == n_written, \
        (d_src, n_src, d_rt, n_rt, n_written)

    def to_rows(t: pa.Table) -> pa.Table:
        secs = pc.divide(pc.cast(pc.cast(t["warc_ts"], pa.timestamp("us")),
                                 pa.int64()), 1_000_000)
        return pa.table({"url": t["url"], "secs": secs.cast(pa.int64())})

    return parsed.map_batches(to_rows, batch_format="pyarrow")


def _q_moved_pages(sf_dir: str):
    """Cross-crawl move detection: new crawl renames every 9th url
    (?moved) and deletes every 13th page outright; only the renamed-and-
    surviving contents must pair up."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.stages.corpus import detect_moved_pages

    pages = _pages(sf_dir)

    def k_arr(t):
        import numpy as np
        us = np.asarray(pc.cast(pc.cast(one_chunk(t["warc_ts"]),
                                        pa.timestamp("us")), pa.int64()))
        return us // 1_000_000 - 1_735_689_600

    def old_side(t: pa.Table) -> pa.Table:
        return t.select(["url", "text"])

    def new_side(t: pa.Table) -> pa.Table:
        import numpy as np
        k = k_arr(t)
        keep = k % 13 != 0
        s = t.filter(pa.array(keep))
        ks = k[keep]
        url = np.asarray(one_chunk(s["url"]).to_pandas(), dtype=object)
        url = np.where(ks % 9 == 0, url + "?moved", url)
        return pa.table({"url": pa.array(url, type=pa.string()),
                         "text": s["text"]})

    old = pages.map_batches(old_side, batch_format="pyarrow")
    new = pages.map_batches(new_side, batch_format="pyarrow")
    return detect_moved_pages(old, new).map_batches(
        lambda t: t.select(["old_url", "new_url"]),
        batch_format="pyarrow")


def _q_zscore_outliers(sf_dir: str):
    """Exact integer 3-sigma gate over event values (isqrt threshold; no
    float in the keep decision)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import zscore_outliers_milli
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])
    return zscore_outliers_milli(ev, "value", k_sigma=2)


def _q_market_share(sf_dir: str):
    """TPC-H-Q8-style market share: NATION_2's share of PROMO revenue
    to ASIA customers per order year, as exact integer num/den."""
    import datetime

    import ray.data

    from pdf2doi_ray.stages.joins import market_share_q8
    rd = lambda t, cols=None: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/{t}.parquet", columns=cols)
    return market_share_q8(
        rd("region"), rd("nation"),
        rd("customer", ["c_custkey", "c_nationkey"]),
        rd("supplier", ["s_suppkey", "s_nationkey"]),
        rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rd("lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]),
        rd("part", ["p_partkey", "p_type"]),
        region_name="ASIA", part_type="PROMO",
        target_nation="NATION_2",
        start_us=datetime.datetime(1995, 1, 1),
        end_us=datetime.datetime(1997, 1, 1))


def _q_jaccard_pairs(sf_dir: str):
    """Exact all-pairs 3-gram Jaccard ≥ 0.5 self-join over documents —
    prefix-filtered (no LSH, no recall loss), exact integer
    (inter, uni) per pair."""
    from pdf2doi_ray.stages.dedup import jaccard_threshold_pairs
    return jaccard_threshold_pairs(_docs(sf_dir, ("doc_id", "text")),
                                   tau_permille=500)


def _q_bucketed_upsert(sf_dir: str):
    """Daily-delta maintenance of a bucketed orders layout: keys ≡3
    (mod 10) get a price bump, a few brand-new keys append; only the
    dirty buckets are rewritten, the rest copy through.  Result = the
    merged table read back (latest-per-key semantics)."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_upsert, write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/"))
    base_dir = f"/tmp/pdf2doi_upsert_base_{tag}"
    out_dir = f"/tmp/pdf2doi_upsert_out_{tag}"
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    write_bucketed(orders, "o_orderkey", base_dir, n_buckets=16)

    def mk_changes(t: pa.Table) -> pa.Table:
        upd = t.filter(pc.equal(pc.subtract(
            t["o_orderkey"], pc.multiply(pc.divide(t["o_orderkey"], 10),
                                         10)), 3))
        upd = upd.set_column(
            upd.schema.get_field_index("o_totalprice"), "o_totalprice",
            pc.add(upd["o_totalprice"], 11111.0))
        new = t.filter(pc.equal(pc.subtract(
            t["o_orderkey"], pc.multiply(pc.divide(t["o_orderkey"], 500),
                                         500)), 0))
        new = pa.table({
            "o_orderkey": pc.add(new["o_orderkey"], 1_000_000),
            "o_custkey": pa.array(np.zeros(new.num_rows, dtype=np.int64)),
            "o_totalprice": pa.array(np.ones(new.num_rows,
                                             dtype=np.float64))})
        return pa.concat_tables([upd, new])

    changes = orders.map_batches(mk_changes, batch_format="pyarrow")
    bucketed_upsert(base_dir, changes, "o_orderkey", 16,
                    out_dir).materialize()
    return ray.data.read_parquet(out_dir).select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice"])


def _q_source_skew_gini(sf_dir: str):
    """Exact integer Gini of the documents-per-source distribution —
    the partition-evenness go/no-go audit for the source key."""
    from pdf2doi_ray.stages.aggs import gini_skew
    return gini_skew(_docs(sf_dir, ("doc_id", "source")), "source")


def _q_pareto_orders(sf_dir: str):
    """Pareto frontier of orders: highest price achieved earliest —
    rows where no other order has price ≥ AND date ≤ (one strict)."""
    import ray.data
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.aggs import pareto_frontier
    from pdf2doi_ray.stages.windowfns import _milli
    from pdf2doi_ray.arrowutil import one_chunk

    def prep(t):
        import pyarrow as pa
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_milli": pa.array(_milli(one_chunk(t["o_totalprice"])),
                                    type=pa.int64()),
            "date_us": pc.cast(pc.cast(t["o_orderdate"],
                                       pa.timestamp("us")), pa.int64()),
        })

    import pyarrow as pa
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return pareto_frontier(orders.map_batches(prep,
                                              batch_format="pyarrow"),
                           "price_milli", "date_us")


def _q_histogram_drift(sf_dir: str):
    """Exact TVD-numerator drift between the even- and odd-event_id
    halves of the events value column over 16 shared equi-width buckets."""
    import ray.data
    import pyarrow.compute as pc

    from pdf2doi_ray.stages.aggs import histogram_drift_milli

    def side(parity):
        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "value"])
        return ev.map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(pc.bit_wise_and(t["event_id"], 1), p)).select(
                ["value"]),
            batch_format="pyarrow")

    return histogram_drift_milli(side(0), side(1), "value", n_buckets=16)


def _q_bucketed_lookup(sf_dir: str):
    """Point lookup of 8 orderkeys against a hash-bucketed hive layout:
    only the buckets the keys land in are read (fragment pruning), not
    the whole table."""
    import os
    import shutil

    import ray.data

    from pdf2doi_ray.stages.joins import bucketed_lookup, write_bucketed

    keys = [3, 17, 42, 99, 256, 511, 777, 1024]
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/pdf2doi_lookup_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    write_bucketed(orders, "o_orderkey", root, n_buckets=16)
    return bucketed_lookup(root, "o_orderkey", keys, n_buckets=16,
                           project=["o_orderkey", "o_custkey",
                                    "o_totalprice"])


def _q_profit_by_nation_year(sf_dir: str):
    """TPC-H-Q9-style profit by supplier nation × ship year over 'widget'
    parts — exact integer milli-profit (revenue kernel minus
    retail_milli×qty cost term), dims broadcast, one combiner groupby."""
    import ray.data

    from pdf2doi_ray.stages.joins import profit_by_nation_year
    rd = lambda t, cols=None: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/{t}.parquet", columns=cols)
    return profit_by_nation_year(
        rd("nation", ["n_nationkey", "n_name"]),
        rd("supplier", ["s_suppkey", "s_nationkey"]),
        rd("lineitem", ["l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"]),
        rd("part", ["p_partkey", "p_name", "p_retailprice"]),
        name_substr="widget")


def _q_cheapest_supplier_per_part(sf_dir: str):
    """TPC-H-Q2-style min-cost supplier per small part — grouped
    lexicographic argmin via one int64 composite Min, ties to the
    smallest suppkey."""
    import ray.data

    from pdf2doi_ray.stages.joins import cheapest_supplier_per_part
    rd = lambda t, cols=None: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/{t}.parquet", columns=cols)
    return cheapest_supplier_per_part(
        rd("lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]),
        rd("part", ["p_partkey", "p_size"]), max_size=10)


def _q_supplier_counts_by_part_class(sf_dir: str):
    """TPC-H-Q16-style COUNT(DISTINCT supplier) per (brand, type, size)
    part class — per-batch pair dedup, one pair groupby, broadcast
    attrs, tiny class groupby."""
    import ray.data

    from pdf2doi_ray.stages.joins import supplier_counts_by_part_class
    rd = lambda t, cols=None: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/{t}.parquet", columns=cols)
    return supplier_counts_by_part_class(
        rd("lineitem", ["l_partkey", "l_suppkey"]),
        rd("part", ["p_partkey", "p_brand", "p_type", "p_size"]),
        exclude_brand="Brand#1")


def _q_longest_streak_per_user(sf_dir: str):
    """Per-user longest same-type run in (ts, event_id) order — the
    sorted-block gaps-and-islands engine with a per-user sharded stitch
    for block-edge users."""
    import ray.data

    from pdf2doi_ray.stages.windows import longest_streak_per_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return longest_streak_per_user(ev)


def _q_peak_hour_by_type(sf_dir: str):
    """Busiest hour-of-day per event type (ties → earlier hour) —
    grouped argmax via one int64 composite Max, combiner-first."""
    import ray.data

    from pdf2doi_ray.stages.windows import peak_hour_by_type
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return peak_hour_by_type(ev)


def _q_hapax_ratio_by_lang(sf_dir: str):
    """Per-language hapax-legomena stats — (lang, token) combiner
    groupby, then a |langs|-row partial reduce; no token reaches the
    driver."""
    from pdf2doi_ray.stages.corpus import hapax_stats_by_lang
    return hapax_stats_by_lang(_docs(sf_dir, ("doc_id", "text", "lang")))


def _edges_sd(sf_dir: str):
    """host_link_graph edges renamed to the generic (src, dst, n_links)
    graph-op input schema."""
    edges = _q_host_link_graph(sf_dir)

    def rename(t):
        import pyarrow as pa
        return pa.table({"src": t["src_host"], "dst": t["dst_host"],
                         "n_links": t["n_links"]})

    return edges.map_batches(rename, batch_format="pyarrow")


def _q_reciprocal_host_pairs(sf_dir: str):
    """Mutual-link host pairs over the synthetic crawl graph — canonical
    pair groupby Sum, both-directions filter."""
    from pdf2doi_ray.stages.graph import reciprocal_pairs
    return reciprocal_pairs(_edges_sd(sf_dir))


def _q_host_out_degree_histogram(sf_dir: str):
    """Fan-out distribution of the host link graph — degree per src,
    then a tiny degree histogram groupby."""
    from pdf2doi_ray.stages.graph import out_degree_histogram
    return out_degree_histogram(_edges_sd(sf_dir))


def _q_scd2_user_state(sf_dir: str):
    """Type-2 SCD build from the event stream: per-user state rows with
    validity intervals, consecutive same-type events collapsed —
    sorted-block kernel + per-user sharded stitch."""
    import ray.data

    from pdf2doi_ray.stages.windows import scd2_user_state
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    return scd2_user_state(ev)


def _q_bibliographic_coupling(sf_dir: str):
    """Source-host pairs by shared distinct destinations with exact
    Jaccard integers (n_common, union_size) — dst-sharded vectorized
    pair fan-out, degrees broadcast."""
    from pdf2doi_ray.stages.graph import bibliographic_coupling
    return bibliographic_coupling(_edges_sd(sf_dir))


def _q_user_gap_histogram(sf_dir: str):
    """Log2-bucketed inter-event gap histogram (integer bucketing on
    both engines) — sorted-block per-user gaps, ≤63-row partials, one
    tiny groupby Sum."""
    import ray.data

    from pdf2doi_ray.stages.windows import user_gap_histogram
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    return user_gap_histogram(ev)


def _q_impute_value_by_type_median(sf_dir: str):
    """Median imputation: values NULLed on a deterministic rule
    (event_id % 7 == 0) refill with their event type's exact lower
    median via grouped radix-select; exact milli output."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.aggs import impute_with_group_medians

    def inject(t: pa.Table) -> pa.Table:
        import numpy as np
        eid = np.asarray(t["event_id"].combine_chunks()
                         if isinstance(t["event_id"], pa.ChunkedArray)
                         else t["event_id"]).astype(np.int64)
        isnull = pa.array(eid % 7 == 0)
        return pa.table({
            "event_id": t["event_id"], "event_type": t["event_type"],
            "value": pc.if_else(isnull, pa.scalar(None, pa.float64()),
                                t["value"])})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"]) \
        .map_batches(inject, batch_format="pyarrow")
    return impute_with_group_medians(ev, "event_type", "value",
                                     "event_id")


def _q_host_clustering_coefficients(sf_dir: str):
    """Per-host local clustering coefficient as exact (n_triangles,
    n_wedges) integers — degree-ordered wedge fan-out, one shuffle hash
    join to close triangles, degrees broadcast."""
    from pdf2doi_ray.stages.graph import clustering_coefficients
    return clustering_coefficients(_edges_sd(sf_dir))


def _q_extraction_rate_by_chars_decile(sf_dir: str):
    """End-to-end calibration composition: the staged identify cascade
    keeps the parsed text, global deciles of extracted-text length come
    from the exact histogram walk, and the rate per decile is one tiny
    groupby — does extraction degrade on long pages?"""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf2doi_ray.pipelines.identify import identify_pages_staged
    from pdf2doi_ray.stages.aggs import rate_by_value_decile

    ids = identify_pages_staged(_pages(sf_dir), keep_columns=("text",))

    def reduce(t):
        return pa.table({
            "value": pc.utf8_length(t["text"]).cast(pa.int64()),
            "found": pc.is_valid(t["identifier"]).cast(pa.int64())})

    return rate_by_value_decile(
        ids.map_batches(reduce, batch_format="pyarrow"))


def _q_excess_share_suppliers(sf_dir: str):
    """TPC-H-Q20-flavored dominant-supplier audit over 'red' parts —
    cross-multiplied 2·qty > total rule, pair combiner + totals over
    pair sums, broadcast join back."""
    import ray.data

    from pdf2doi_ray.stages.aggs import excess_share_suppliers
    rd = lambda t, cols=None: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/{t}.parquet", columns=cols)
    return excess_share_suppliers(
        rd("lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        rd("part", ["p_partkey", "p_name"]), name_substr="red")


def _q_minmax_normalize_by_type(sf_dir: str):
    """Grouped min-max normalization of event values to an exact
    permille grid — two-aggregate broadcast, one vectorized pass."""
    import ray.data

    from pdf2doi_ray.stages.aggs import minmax_normalize_by_group
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"])
    return minmax_normalize_by_group(ev, "event_type", "value",
                                     "event_id")


def _q_dense_hourly_counts(sf_dir: str):
    """Zero-filled (type × hour) counts between the stream's first and
    last hour — distributed range generation + broadcast left join."""
    import ray.data

    from pdf2doi_ray.stages.windows import dense_hourly_counts
    return dense_hourly_counts(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_topk_types_per_day(sf_dir: str):
    """Per-day top-3 event types (count desc, type asc) — combiner
    counts into the bounded-partial grouped top-k."""
    import ray.data

    from pdf2doi_ray.stages.windows import topk_types_per_window
    return topk_types_per_window(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]), k=3)


def _q_day_over_day_change(sf_dir: str):
    """Per-type day-over-day count deltas with NULL first-day prev —
    small counts self-joined shifted, broadcast."""
    import ray.data

    from pdf2doi_ray.stages.windows import day_over_day_change
    return day_over_day_change(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_user_ltv_buckets(sf_dir: str):
    """Log2-bucketed user lifetime milli-value histogram."""
    import ray.data

    from pdf2doi_ray.stages.aggs import user_ltv_buckets
    return user_ltv_buckets(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]))


def _q_url_pattern_counts(sf_dir: str):
    """Crawler-trap detector: digit runs collapse to N, pages count per
    (host, pattern) — one RE2 replace + combiner groupby."""
    from pdf2doi_ray.stages.corpus import url_pattern_counts
    return url_pattern_counts(_pages(sf_dir))


def _q_token_budget_allocation(sf_dir: str):
    """Largest-remainder apportionment of a 1M-token budget across
    languages, proportional to exact token counts."""
    from pdf2doi_ray.stages.corpus import token_budget_allocation
    return token_budget_allocation(
        _docs(sf_dir, ("text", "lang")), budget=1_000_000,
        group_col="lang")


def _q_user_growth_curve(sf_dir: str):
    """Daily new-user counts and the cumulative activation curve —
    first-seen day per user via groupby Min, tiny day-series cumsum."""
    import ray.data

    from pdf2doi_ray.stages.aggs import user_growth_curve
    return user_growth_curve(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]))


def _q_session_length_histogram(sf_dir: str):
    """Events-per-session distribution over gap sessions — sorted-block
    per-session lengths histogrammed in-block, per-user stitch, one
    tiny groupby Sum."""
    import ray.data

    from pdf2doi_ray.stages.windows import session_length_histogram
    return session_length_histogram(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]))


def _q_verbose_docs_vs_lang_median(sf_dir: str):
    """Docs > 2× their language's exact token-count median —
    radix-select medians + cross-multiplied integer gate."""
    from pdf2doi_ray.stages.corpus import verbose_docs_vs_lang_median
    return verbose_docs_vs_lang_median(
        _docs(sf_dir, ("doc_id", "text", "lang")))


def _q_global_value_rank(sf_dir: str):
    """Distributed zipWithIndex: global ROW_NUMBER by (value_milli,
    event_id) via sorted blocks + driver block-offset prefix."""
    import ray.data

    from pdf2doi_ray.stages.aggs import global_value_rank
    return global_value_rank(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]))


def _q_ks_value_click_vs_purchase(sf_dir: str):
    """Exact integer two-sample KS distance between click and purchase
    value distributions — histogram groupby + driver walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import ks_statistic_value
    return ks_statistic_value(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]))


def _q_funnel_steps(sf_dir: str):
    """3-step strictly-ordered funnel (view → click → purchase):
    iterated min-frontier with shuffle hash joins on user_id."""
    import ray.data

    from pdf2doi_ray.stages.windows import funnel_steps
    return funnel_steps(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type"]))


def _q_benford_digit_counts(sf_dir: str):
    """Benford first-digit screen over milli values — integer leading
    digit via powers-of-ten searchsorted, ≤9-row groupby."""
    import ray.data

    from pdf2doi_ray.stages.aggs import benford_first_digit_counts
    return benford_first_digit_counts(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]))


def _q_k_anonymity_audit(sf_dir: str):
    """(lang, source) equivalence classes smaller than k=10 — the
    pre-release privacy screen."""
    from pdf2doi_ray.stages.aggs import k_anonymity_audit
    return k_anonymity_audit(_docs(sf_dir, ("lang", "source")), k=10)


def _q_value_moving_range(sf_dir: str):
    """XmR moving-range accumulator per event type — sorted-block
    adjacent |diff| sums with per-type stitch, exact int64 milli."""
    import ray.data

    from pdf2doi_ray.stages.windows import value_moving_range_by_type
    return value_moving_range_by_type(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]))


def _q_event_type_user_overlap(sf_dir: str):
    """Audience overlap matrix: |users(A)∩users(B)| and min sizes per
    type pair — distinct-pair bitmask OR, ≤32-row histogram, no
    pairwise self-join."""
    import ray.data

    from pdf2doi_ray.stages.aggs import event_type_user_overlap
    return event_type_user_overlap(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]))


def _q_max_burst_per_user(sf_dir: str):
    """Peak events in any trailing 6-hour window per user — RANGE-frame
    count on the shared window engine, per-user Max."""
    import ray.data

    from pdf2doi_ray.stages.windowfns import max_burst_per_user
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    return max_burst_per_user(ev, window_s=21600)


def _q_embedding_gram_matrix(sf_dir: str):
    """Exact integer Gram matrix of milli-quantized embeddings — one
    int64 matmul per batch, d(d+1)/2-row partials, tiny groupby Sum."""
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_gram_matrix
    return embedding_gram_matrix(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]))


def _q_weighted_sssp_host(sf_dir: str):
    """Weighted shortest paths from s0.example.org over the host link
    graph — distributed Bellman-Ford, distance map broadcast per round,
    edges never shuffle."""
    from pdf2doi_ray.stages.graph import weighted_sssp
    return weighted_sssp(_edges_sd(sf_dir), source="s0.example.org")


def _q_degree_assortativity(sf_dir: str):
    """Exact integer degree-assortativity cross-sums (m·2, Σx, Σx²,
    Σxy symmetrized) over the undirected host graph."""
    from pdf2doi_ray.stages.graph import degree_assortativity_sums
    return degree_assortativity_sums(_edges_sd(sf_dir))


def _q_stratified_kfold(sf_dir: str):
    """Stratified 5-fold split: per-language md5-hash rank mod k on the
    shared window engine — reproducible from doc_id alone."""
    from pdf2doi_ray.stages.export import stratified_kfold
    return stratified_kfold(_docs(sf_dir, ("doc_id", "lang")), k=5)


def _q_heavy_tokens_exact(sf_dir: str):
    """EXACT counts of every token above 5 permille corpus share — the
    two-pass MG-candidates-then-verify scale pattern; threshold applies
    to true counts."""
    import pyarrow as pa

    from pdf2doi_ray.stages.corpus import _tokens_nonempty
    from pdf2doi_ray.stages.sketch import heavy_hitters_exact_2pass

    def flat(t: pa.Table) -> pa.Table:
        toks, _ = _tokens_nonempty(t)
        return pa.table({"token": toks})

    ds = _docs(sf_dir, ("doc_id", "text")).map_batches(
        flat, batch_format="pyarrow")
    return heavy_hitters_exact_2pass(ds, "token", threshold_permille=5)


def _q_validation_report(sf_dir: str):
    """Ingest data-quality gate: per-rule violation counts (null key,
    value range, ts window, enum membership), zero-filled."""
    import ray.data

    from pdf2doi_ray.stages.aggs import validation_report
    return validation_report(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"]),
        value_hi=300.0)


def _q_dangling_link_rate(sf_dir: str):
    """Per-source dangling-outlink integers (links to never-crawled
    hosts vs total) — frontier-coverage crawl health."""
    from pdf2doi_ray.stages.graph import dangling_link_rate
    return dangling_link_rate(_edges_sd(sf_dir))


def _q_max_concurrent_events(sf_dir: str):
    """Peak interval concurrency (capacity planning): boundary sweep on
    the zipWithIndex block-offset pattern, ends-before-starts at ties."""
    import ray.data

    from pdf2doi_ray.stages.windows import max_concurrent_events
    return max_concurrent_events(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "value"]))


def _q_host_rate_outliers(sf_dir: str):
    """Hosts whose extraction-FAILURE rate deviates from the corpus by
    a cross-multiplied binomial z-test (|z| > 2, no float): the full
    identify cascade feeds per-host (found, total) combiner sums; the
    ≤|hosts|-row decision runs in exact Python bigints (the squared
    term overflows int64 at fleet scale — the SQL mirror uses HUGEINT).
    Returns (host, n_failed, n_pages) for flagged hosts."""
    import pandas as pd

    rates = _q_rate_by_host(sf_dir).to_pandas()
    n = rates["n_pages"].astype("int64")
    f = (rates["n_pages"] - rates["n_found"]).astype("int64")
    N = int(n.sum())
    F = int(f.sum())
    keep = [
        (int(fi) * N - int(ni) * F) ** 2 * N
        > 4 * int(ni) * F * (N - F)
        for fi, ni in zip(f, n)]
    out = pd.DataFrame({"host": rates["host"], "n_failed": f,
                        "n_pages": n})[pd.Series(keep).values]
    return out.sort_values("host").reset_index(drop=True)


def _q_gopher_impact_by_lang(sf_dir: str):
    """Curation observability: per language, how many docs the full
    Gopher gate keeps vs drops — the gate flags and the lang column
    come from the SAME batch (one pass, no join), then a |langs|-row
    combiner groupby."""
    import pyarrow as pa

    from pdf2doi_ray.stages.textstats import gopher_quality

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        g = gopher_quality(t)
        keep = np.asarray(g["keep"].combine_chunks()
                          if isinstance(g["keep"], pa.ChunkedArray)
                          else g["keep"]).astype(np.int64)
        tbl = pa.table({"lang": t["lang"],
                        "p": pa.array(keep),
                        "f": pa.array(1 - keep)})
        gg = tbl.group_by("lang").aggregate([("p", "sum"), ("f", "sum")])
        return gg.select(["lang", "p_sum", "f_sum"]) \
            .rename_columns(["lang", "p", "f"])

    from ray.data.aggregate import Sum

    return (_docs(sf_dir, ("doc_id", "text", "lang"))
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("p", alias_name="n_pass"),
                       Sum("f", alias_name="n_fail")))


def _q_partitioned_prune_roundtrip(sf_dir: str):
    """Hive-partitioned write (one dir per lang) + pruned single-
    partition read-back with column projection."""
    import shutil
    import tempfile

    from pdf2doi_ray.stages.export import partitioned_write_prune_read
    root = tempfile.mkdtemp(prefix="part_prune_", dir="/tmp")
    try:
        return partitioned_write_prune_read(
            _docs(sf_dir, ("doc_id", "text", "lang")), root,
            lang="de").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_hashed_features(sf_dir: str):
    """Hashing-trick sparse features: md5(token) % 1024 counts per doc
    — vocabulary-free vectorizer, one combiner groupby."""
    from pdf2doi_ray.stages.export import hashed_features
    return hashed_features(_docs(sf_dir, ("doc_id", "text")))


def _q_target_encode_loo(sf_dir: str):
    """Leave-one-out target encoding as exact integer (num, den) —
    category aggregates broadcast into one vectorized pass."""
    import ray.data

    from pdf2doi_ray.stages.aggs import target_encode_loo
    return target_encode_loo(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"]))


def _q_rfm_scores(sf_dir: str):
    """RFM segmentation with exact rank-rule quintiles — per-customer
    combiner groupby + three tiny histogram walks."""
    import ray.data

    from pdf2doi_ray.stages.aggs import rfm_scores
    return rfm_scores(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"]))


def _q_churned_users(sf_dir: str):
    """Churn flags: last-seen day per user vs the stream end minus 7
    days."""
    import ray.data

    from pdf2doi_ray.stages.aggs import churned_users
    return churned_users(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_value_ohlc_hourly(sf_dir: str):
    """OHLC candles per (event_type, hour): packed-int argmin/argmax
    open/close, one combiner groupby, no window sort."""
    import ray.data

    from pdf2doi_ray.stages.aggs import value_ohlc_hourly
    return value_ohlc_hourly(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"]))


def _q_orders_vs_ship_days(sf_dir: str):
    """Full-outer day reconciliation of two independent count streams
    via the tagged-union encoding — one groupby, zero joins."""
    import ray.data

    from pdf2doi_ray.stages.aggs import orders_vs_ship_days
    return orders_vs_ship_days(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate"]),
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_shipdate"]))


def _q_kcore_users_props(sf_dir: str):
    """Truncated k-core peel (k=9, ≤12 rounds) of the bipartite
    user–prop graph from events: broadcast survivor set, edges never
    shuffle, early exit at fixpoint."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.arrowutil import one_chunk
    from pdf2doi_ray.stages.graph import kcore_nodes

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.binary_join_element_wise(
            "u", pc.cast(one_chunk(t["user_id"]), pa.string()), "")
        kv = pc.struct_field(
            pc.extract_regex(one_chunk(t["props"]), '"k": (?P<k>\\d+)'),
            "k")
        return pa.table({"a": u, "b": pc.binary_join_element_wise(
            "k", kv, "")})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "props"])
    return kcore_nodes(ev.map_batches(pairs, batch_format="pyarrow"),
                       k=9, max_rounds=12)


def _q_ship_latency_histogram(sf_dir: str):
    """Order-to-ship latency histogram: projected hash join, per-batch
    distinct-latency partials, one tiny groupby Sum."""
    import ray.data

    from pdf2doi_ray.stages.joins import ship_latency_histogram
    return ship_latency_histogram(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"]),
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"]))


def _q_time_weighted_value(sf_dir: str):
    """Per-user step-function integral of value over time: sorted-block
    adjacent gaps, edge-user stitch, one user-keyed merge."""
    import ray.data

    from pdf2doi_ray.stages.windows import time_weighted_value_sum
    return time_weighted_value_sum(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"]))


def _q_type_weekday_contingency(sf_dir: str):
    """event_type × weekday contingency cells with margins and grand
    total in exact integers (chi-square prep)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import type_weekday_contingency
    return type_weekday_contingency(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_zonemap_prune_scan(sf_dir: str):
    """Zone-map data skipping: vm-sorted parquet, files pruned by their
    footer column statistics, residual filter inside kept files."""
    import shutil
    import tempfile

    import ray.data

    from pdf2doi_ray.stages.export import zonemap_prune_scan
    root = tempfile.mkdtemp(prefix="zonemap_", dir="/tmp")
    try:
        return zonemap_prune_scan(
            ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                  columns=["event_id", "value"]),
            root, lo_milli=100_000, hi_milli=150_000).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_video_scene_cuts(sf_dir: str):
    """Scene-cut detection plumbing: per-doc fake frame lumas, cut when
    the adjacent-frame delta exceeds the threshold."""
    from pdf2doi_ray.stages.multimodal import video_scene_cuts
    return video_scene_cuts(sf_dir)


def _q_vocab_coverage_curve(sf_dir: str):
    """Coverage of the token stream by the top-2^i vocabulary types:
    distributed zipWithIndex over the rank-sorted vocab, log-sized
    per-block partials, one tiny groupby."""
    from pdf2doi_ray.stages.corpus import vocab_coverage_curve
    return vocab_coverage_curve(_docs(sf_dir, ("doc_id", "text")))


def _q_clamped_running_balance(sf_dir: str):
    """Per-user zero-clamped running balance via the prefix-minus-
    running-min closed form — no sequential recursion on the wire."""
    import ray.data

    from pdf2doi_ray.stages.windows import clamped_running_balance
    return clamped_running_balance(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"]))


def _q_first_touch_attribution(sf_dir: str):
    """First-touch attribution: per-user range join executed as two
    searchsorted probes per conversion (no pairwise expansion)."""
    import ray.data

    from pdf2doi_ray.stages.windows import first_touch_attribution
    return first_touch_attribution(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"]))


def _q_cusum_changepoint(sf_dir: str):
    """CUSUM drift detector per type over dense hourly counts — exact
    cross-multiplied integers, calendar-bounded driver walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import cusum_changepoint_by_type
    return cusum_changepoint_by_type(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_kmv_vocab_sample(sf_dir: str):
    """Bottom-64 md5 distinct-token sample (KMV sketch): per-batch
    distinct top-k partials, one tiny sort-limit merge."""
    from pdf2doi_ray.stages.corpus import kmv_vocab_sample
    return kmv_vocab_sample(_docs(sf_dir, ("doc_id", "text")))


def _q_template_clusters(sf_dir: str):
    """Boilerplate-template detection: structure hash (alnum runs →
    '#') counted combiner-first, clusters with ≥2 pages."""
    from pdf2doi_ray.stages.corpus import template_clusters
    return template_clusters(_docs(sf_dir, ("doc_id", "text")))


def _q_embedding_int8_quantize(sf_dir: str):
    """Per-vector int8 quantization in exact integer arithmetic —
    pure map over the list column, long-format output."""
    import ray.data

    from pdf2doi_ray.stages.similarity import embedding_int8_quantize
    return embedding_int8_quantize(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"]))


def _q_day_bitmap_index(sf_dir: str):
    """Per-type day-presence bitmap packed 32 days/word — distinct
    bits shuffle (calendar-sized), OR finishes as a Sum of powers."""
    import ray.data

    from pdf2doi_ray.stages.aggs import day_bitmap_index
    return day_bitmap_index(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_supplier_fill_rate(sf_dir: str):
    """Per-supplier on-time-ship scorecard as exact integer
    (n_on_time, n_items) pairs — projected join + combiner."""
    import ray.data

    from pdf2doi_ray.stages.joins import supplier_fill_rate
    return supplier_fill_rate(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"]),
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_suppkey",
                                       "l_shipdate"]))


def _q_part_copurchase_pairs(sf_dir: str):
    """Market-basket part pairs per order (basket-quadratic only),
    sorted-block + orderkey-sharded stitch, thresholded at 2."""
    import ray.data

    from pdf2doi_ray.stages.joins import part_copurchase_pairs
    return part_copurchase_pairs(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"]))


def _q_kmv_repeat_customers(sf_dir: str):
    """KMV bottom-128 overlap sketch of the 1995 vs 1996 customer
    cohorts with exact membership flags."""
    import ray.data

    from pdf2doi_ray.stages.aggs import kmv_repeat_customers
    return kmv_repeat_customers(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"]))


def _q_two_hop_neighborhood(sf_dir: str):
    """Friends-of-friends audience per host: one edge-edge hash join,
    distinct-pair partials, two tiny groupbys."""
    import pyarrow as pa

    from pdf2doi_ray.stages.graph import two_hop_neighborhood

    edges = _q_host_link_graph(sf_dir)

    def rename(t):
        return pa.table({"src": t["src_host"], "dst": t["dst_host"]})

    return two_hop_neighborhood(
        edges.map_batches(rename, batch_format="pyarrow"))


def _q_daily_periodicity(sf_dir: str):
    """Lag-24h autocorrelation components per type over dense hourly
    counts — exact integer dot products, calendar-bounded walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import daily_periodicity_by_type
    return daily_periodicity_by_type(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_max_drawdown(sf_dir: str):
    """Per-user max peak-to-trough drawdown of the signed balance —
    closed-form runmax−prefix, sorted blocks + stitch."""
    import ray.data

    from pdf2doi_ray.stages.windows import max_drawdown_by_user
    return max_drawdown_by_user(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"]))


def _q_sliding_distinct_users(sf_dir: str):
    """Rolling 24h distinct-user curve via the sweep-line interval
    trick — interval endpoints shuffle, never user sets."""
    import ray.data

    from pdf2doi_ray.stages.windows import sliding_distinct_users
    return sliding_distinct_users(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_internal_link_ratio(sf_dir: str):
    """Site-insularity split of outlinks per source host, riding the
    combiner edge counts."""
    from pdf2doi_ray.stages.corpus import internal_link_ratio
    return internal_link_ratio(_linked_pages(sf_dir))


def _q_source_minhash_signatures(sf_dir: str):
    """Exactly-oracled MinHash signatures per source over distinct
    token sets — one groupby Min over per-batch candidate minima."""
    from pdf2doi_ray.stages.corpus import source_minhash_signatures
    return source_minhash_signatures(
        _docs(sf_dir, ("doc_id", "text", "source")))


def _q_consistent_hash_moves(sf_dir: str):
    """Ring-sharding audit under N→N+1 workers: ring in the closure,
    vectorized argmin assignment, distinct sources only."""
    from pdf2doi_ray.stages.export import consistent_hash_moves
    return consistent_hash_moves(_docs(sf_dir, ("doc_id", "source")))


def _q_source_similarity_pairs(sf_dir: str):
    """Pairwise source Jaccard estimates from the exactly-oracled
    MinHash signatures — pairing folds over the sketch table."""
    from pdf2doi_ray.stages.corpus import source_similarity_pairs
    return source_similarity_pairs(
        _docs(sf_dir, ("doc_id", "text", "source")))


def _q_label_scatter(sf_dir: str):
    """Per-(label, dim) exact scatter moments (n, Σv, Σv²) of milli
    embeddings — Fisher-scatter prep, one combiner groupby."""
    import ray.data

    from pdf2doi_ray.stages.similarity import label_scatter_components
    return label_scatter_components(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["label", "embedding"]))


def _q_contrastive_negatives(sf_dir: str):
    """Deterministic md5-stream negative sampling, self skipped by
    arithmetic — pure map after one count."""
    import ray.data

    from pdf2doi_ray.stages.similarity import contrastive_negatives
    return contrastive_negatives(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]))


def _q_scc_of_s0(sf_dir: str):
    """Strongly connected component of s0 via forward ∩ backward BFS
    (two broadcast-frontier sweeps over the same edge blocks)."""
    import pyarrow as pa

    from pdf2doi_ray.stages.graph import scc_members

    edges = _q_host_link_graph(sf_dir)

    def rename(t):
        return pa.table({"src": t["src_host"], "dst": t["dst_host"]})

    return scc_members(edges.map_batches(rename, batch_format="pyarrow"),
                       source="s0.example.org")


def _q_theil_sen_trend(sf_dir: str):
    """Theil–Sen robust daily trend per type — exact median-pair
    fraction, calendar-quadratic driver walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import theil_sen_trend_by_type
    return theil_sen_trend_by_type(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]))


def _q_reorder_interval_median(sf_dir: str):
    """Per-customer lower-median reorder gap on the factored
    per-group sorted-block engine."""
    import ray.data

    from pdf2doi_ray.stages.aggs import reorder_interval_median
    return reorder_interval_median(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"]))


def _q_duplicate_order_flags(sf_dir: str):
    """Double-submission audit: >1 order by one customer on one day
    — adjacency check after one sort, no self-join."""
    import ray.data

    from pdf2doi_ray.stages.aggs import duplicate_order_flags
    return duplicate_order_flags(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"]))


def _q_active_day_streaks(sf_dir: str):
    """Gaps-and-islands: longest consecutive-active-day run per user
    on the per-group engine over distinct (user, day) pairs."""
    import ray.data

    from pdf2doi_ray.stages.aggs import active_day_streaks
    return active_day_streaks(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_revenue_hhi(sf_dir: str):
    """Supplier-revenue Herfindahl concentration per nation, exact
    permille via bigint fold over the supplier-bounded aggregate."""
    import ray.data

    from pdf2doi_ray.stages.joins import revenue_hhi_by_nation
    return revenue_hhi_by_nation(
        ray.data.read_parquet(f"{sf_dir}/nation.parquet"),
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet"),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"]))


def _q_char_class_profile(sf_dir: str):
    """Per-doc character-class census (digit/upper/lower/space/other)
    — one lookup-table pass over the raw UTF-8 buffer, zero-copy."""
    import ray.data

    from pdf2doi_ray.stages.textstats import char_class_profile
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]) \
        .map_batches(char_class_profile, batch_format="pyarrow")


def _q_char_simpson(sf_dir: str):
    """Per-doc byte-collision (Simpson) index via one batched bincount
    — the cheap repetitive-text gate before dedup."""
    import ray.data

    from pdf2doi_ray.stages.textstats import char_simpson
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]) \
        .map_batches(char_simpson, batch_format="pyarrow")


def _q_word_len_histogram(sf_dir: str):
    """Corpus word-length histogram, combiner-first (per-batch bincount
    partials, one tiny groupby merge)."""
    import ray.data

    from pdf2doi_ray.stages.textstats import word_len_histogram
    return word_len_histogram(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))


def _q_user_gap_moments(sf_dir: str):
    """Per-user inter-event-gap moments (bot/burstiness signature) on
    the per-group sorted-block engine — exact minute-grid integers."""
    import ray.data

    from pdf2doi_ray.stages.aggs import user_gap_moments
    return user_gap_moments(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_dau_wau(sf_dir: str):
    """DAU / trailing-7-day WAU / stickiness permille per day — fan-out
    dedup instead of per-day distinct rescans; two exchanges."""
    import ray.data

    from pdf2doi_ray.stages.aggs import dau_wau_stickiness
    return dau_wau_stickiness(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_bloom_semi_revenue(sf_dir: str):
    """Bloom-prefiltered semi-join pushdown: lineitem revenue stats for
    high-value orders; FP-exact via the recovery hash join."""
    import ray.data

    from pdf2doi_ray.stages.joins import bloom_semi_revenue
    return bloom_semi_revenue(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_totalprice"]),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_quantity",
                     "l_extendedprice", "l_discount"]),
        price_threshold=200_000.0, num_partitions=8)


def _q_supplier_lead_quantiles(sf_dir: str):
    """Per-supplier exact p50/p90 order→ship latency via one big×big
    hash join + the grouped histogram-quantile engine."""
    import ray.data

    from pdf2doi_ray.stages.joins import supplier_lead_quantiles
    return supplier_lead_quantiles(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"]),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"]),
        num_partitions=8)


def _q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape per month: promo revenue share in exact
    permille over the pruned lineitem⋈part join."""
    import ray.data

    from pdf2doi_ray.stages.joins import promo_revenue_share
    return promo_revenue_share(
        ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_type"]),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"]),
        num_partitions=8)


def _q_source_mix_plan(sf_dir: str):
    """Capped-proportional LLM data-mixing allocator per source —
    one combiner groupby + a |sources|-row normalisation fold."""
    import ray.data

    from pdf2doi_ray.stages.corpus import source_mix_plan
    return source_mix_plan(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]),
        cap_tokens=3_000)


def _q_dup_rate_by_source(sf_dir: str):
    """Within-source duplicate (boilerplate) rate via one
    (source, md5) exchange of combiner rows."""
    import ray.data

    from pdf2doi_ray.stages.corpus import dup_rate_by_source
    return dup_rate_by_source(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def _q_prefix_dup_flags(sf_dir: str):
    """Truncation-duplicate flags via ONE lexicographic sort +
    vectorized successor byte-compare (sorted-adjacency engine)."""
    import ray.data

    from pdf2doi_ray.stages.dedup import prefix_dup_flags
    return prefix_dup_flags(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_out_of_order_rate(sf_dir: str):
    """Per-user late-arrival (out-of-order timestamp) audit on the
    per-group sorted-block engine, arrival order = event_id."""
    import ray.data

    from pdf2doi_ray.stages.aggs import out_of_order_rate
    return out_of_order_rate(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts"]))


def _q_interleave_order(sf_dir: str):
    """Deterministic stride-interleaved training order over the capped
    source mix: two zipWithIndex passes + a broadcast weight table."""
    import ray.data

    from pdf2doi_ray.stages.corpus import interleave_order
    return interleave_order(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"]), cap_tokens=3_000)


def _q_join_cardinality(sf_dir: str):
    """Exact join-size profile from per-key counts only — the join
    output never materializes."""
    import ray.data

    from pdf2doi_ray.stages.joins import join_cardinality
    return join_cardinality(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey"]),
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey"]),
        "l_orderkey", "o_orderkey")


def _q_open_order_backlog(sf_dir: str):
    """Daily open-order backlog via delta-encoded interval stabbing +
    one dense prefix sum over the bounded day domain."""
    import ray.data

    from pdf2doi_ray.stages.joins import open_order_backlog
    return open_order_backlog(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"]),
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate"]))


def _q_padding_waste(sf_dir: str):
    """Length-bucketed batching waste per bucket — one combiner
    groupby over the bounded bucket domain."""
    import ray.data

    from pdf2doi_ray.stages.corpus import padding_waste_report
    return padding_waste_report(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]), bucket=64)


def _q_event_type_trigrams(sf_dir: str):
    """Per-user event-type trigram mining on the per-group engine +
    one count merge."""
    import ray.data

    from pdf2doi_ray.stages.aggs import event_type_trigrams
    return event_type_trigrams(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"]))


def _q_gate_grid(sf_dir: str):
    """Six curation-gate configs evaluated in ONE scan (base stats
    computed once per batch, |grid| partial rows to a tiny groupby)."""
    import ray.data

    from pdf2doi_ray.stages.corpus import gate_grid_report
    return gate_grid_report(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))


def _q_shard_skew(sf_dir: str):
    """One-row balance audit of the hash-shard layout (shares
    shard_assignment's hash)."""
    import ray.data

    from pdf2doi_ray.stages.export import shard_skew_report
    return shard_skew_report(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]), n_shards=16)


def _q_crawl_frontier(sf_dir: str):
    """Politeness-priority frontier head: k urls preferring
    least-crawled hosts; bounded top-k partials per block."""
    from pdf2doi_ray.stages.corpus import crawl_frontier_topk
    return crawl_frontier_topk(_pages(sf_dir), k=100)


def _q_adjacent_vec_hist(sf_dir: str):
    """Quantized L2² histogram between key-consecutive vectors — one
    vec_id sort + in-block diffs + role-tagged boundary stitch."""
    import ray.data

    from pdf2doi_ray.stages.similarity import \
        adjacent_vec_distance_histogram
    return adjacent_vec_distance_histogram(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]))


def _q_label_norm_stats(sf_dir: str):
    """Per-label quantized-norm² scorecard, one combiner groupby."""
    import ray.data

    from pdf2doi_ray.stages.similarity import label_norm_stats
    return label_norm_stats(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]))


def _q_median_user_value(sf_dir: str):
    """Nested percentile (the typical user's typical value): per-user
    mean combiner + exact histogram-walk quantiles."""
    import ray.data

    from pdf2doi_ray.stages.aggs import median_user_value
    return median_user_value(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]))


def _q_encoding_advisor(sf_dir: str):
    """Write-time dictionary-encoding planner: exact per-column NDV in
    one melt pass."""
    import ray.data

    from pdf2doi_ray.stages.aggs import encoding_advisor
    return encoding_advisor(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]))


def _q_weekly_retention(sf_dir: str):
    """Week-over-week retention via sorted per-user week adjacency —
    no self-join."""
    import ray.data

    from pdf2doi_ray.stages.aggs import weekly_retention
    return weekly_retention(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))


def _q_revenue_yoy(sf_dir: str):
    """Per-nation YoY revenue growth: Q9 broadcast shape + per-nation
    sorted adjacency over the tiny aggregate (no window shuffle)."""
    import ray.data

    from pdf2doi_ray.stages.joins import revenue_yoy_growth
    return revenue_yoy_growth(
        ray.data.read_parquet(f"{sf_dir}/nation.parquet"),
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"]),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"]))


def _q_dim_stats(sf_dir: str):
    """Dimension-wise quantized moment scorecard (dead-dim detector)
    — vectors never shuffle."""
    import ray.data

    from pdf2doi_ray.stages.similarity import dim_stats
    return dim_stats(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]))


def _q_source_lang_concentration(sf_dir: str):
    """Per-source language-mix Simpson concentration over the
    (source, lang) cell table."""
    import ray.data

    from pdf2doi_ray.stages.corpus import source_lang_concentration
    return source_lang_concentration(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]))


def _q_conversion_latency(sf_dir: str):
    """Click→purchase latency histogram: window-engine sort +
    reset-free vectorized last-click scan."""
    import ray.data

    from pdf2doi_ray.stages.aggs import conversion_latency_histogram
    return conversion_latency_histogram(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"]))


def _q_lorenz_deciles(sf_dir: str):
    """Customer-revenue Lorenz points via per-customer totals + one
    histogram walk."""
    import ray.data

    from pdf2doi_ray.stages.aggs import lorenz_revenue_deciles
    return lorenz_revenue_deciles(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"]))


def _q_rowgroup_advisor(sf_dir: str):
    """Parquet row-group sizing from exact corpus byte stats."""
    import ray.data

    from pdf2doi_ray.stages.aggs import rowgroup_advisor
    return rowgroup_advisor(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))


def _q_neardup_eval(sf_dir: str):
    """Precision/recall of banded simhash vs exact trigram-Jaccard
    truth on the adjacent-pair probe set."""
    import ray.data

    from pdf2doi_ray.stages.dedup import neardup_eval
    return neardup_eval(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_char_bigram_familiarity(sf_dir: str):
    """Fluency proxy: per-doc mean corpus char-bigram frequency —
    census groupby + 512 KB broadcast table + vectorized gather."""
    import ray.data

    from pdf2doi_ray.stages.textstats import char_bigram_familiarity
    return char_bigram_familiarity(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_basket_size_histogram(sf_dir: str):
    """Line items per order distribution, two combiner exchanges."""
    import ray.data

    from pdf2doi_ray.stages.aggs import basket_size_histogram
    return basket_size_histogram(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]))


def _q_lang_run_stats(sf_dir: str):
    """Per-lang run-length audit over doc order via the island =
    global-rank − per-lang-rank identity (two zipWithIndexes)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import lang_run_stats
    return lang_run_stats(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]))


def _q_event_debounce(sf_dir: str):
    """Per-(user,event_type) streaming throttle: keep an event iff it is
    first for its key or >60 s after the key's previous event — the
    sorted-block per-group engine with a one-predecessor keep mask."""
    import ray.data

    from pdf2doi_ray.stages.windows import event_debounce
    return event_debounce(ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"]))


def _q_batch_padding_plan(sf_dir: str):
    """Pad-to-longest collator audit over longest-first fixed-size batches:
    one 2-int64 sort + block-offset zipWithIndex + per-batch partials."""
    import ray.data

    from pdf2doi_ray.stages.corpus import batch_padding_plan
    return batch_padding_plan(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        batch_docs=64)


def _q_personalized_pagerank(sf_dir: str):
    """Seeded (label-0) personalized PageRank over the symmetric embedding
    near-dup graph, 3 rounds of exact scaled-integer mass passing —
    bit-identical to the unrolled SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.graph import personalized_pagerank

    pairs = _q_embedding_near_dups(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks().cast(pa.int64())
        b = t["vec_b"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    nodes = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label"]).map_batches(
        lambda t: pa.table({
            "node": t["vec_id"].cast(pa.int64()),
            "seed": pc.cast(pc.equal(t["label"], 0), pa.int64())}),
        batch_format="pyarrow")
    return personalized_pagerank(edges, nodes, n_iters=3)


def _q_tag_census(sf_dir: str):
    """DOM markup census per page (meta-tag count, text-to-markup ratio):
    one vectorized map over the html binary, no shuffle; the oracle
    rebuilds the html string in SQL and counts independently."""
    from pdf2doi_ray.stages.skew import tag_census
    return tag_census(_pages(sf_dir))


def _q_crawl_recency(sf_dir: str):
    """Per-host crawl-freshness buckets against the frontier max warc_ts:
    scalar max pass + per-batch bucket combiner + tiny groupby(host)."""
    from pdf2doi_ray.stages.skew import crawl_recency_report
    return crawl_recency_report(_pages(sf_dir))


def _q_recency_weighted_value(sf_dir: str):
    """Per-user half-life-decayed engagement score with exact power-of-two
    integer decay (value_milli >> age_days)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import recency_weighted_value
    return recency_weighted_value(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]))


def _q_doc_freq_spectrum(sf_dir: str):
    """Good–Turing frequency-of-frequencies over the corpus vocabulary:
    two combiner-first exchanges (term rows once, df rows once)."""
    import ray.data

    from pdf2doi_ray.stages.corpus import doc_frequency_spectrum
    return doc_frequency_spectrum(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth per source at doc-rank probes — term
    first-occurrence groupby + grouped-top-k cutoffs, no text-wide sort."""
    import ray.data

    from pdf2doi_ray.stages.corpus import vocab_growth_curve
    return vocab_growth_curve(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"]))


def _q_method_agreement(sf_dir: str):
    """Finder-method agreement matrix: one fused parse + three
    single-method extract kernels in-worker, 3-row groupby merge."""
    from pdf2doi_ray.pipelines.identify import method_agreement
    return method_agreement(_pages(sf_dir))


def _q_skipgram(sf_dir: str):
    """Top-20 window-3 ordered skip-gram co-occurrences (word2vec-style
    window counts), bounded-partial top-k — no global sort."""
    import ray.data

    from pdf2doi_ray.stages.corpus import skipgram_cooccurrence
    return skipgram_cooccurrence(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_edge_support(sf_dir: str):
    """Per-edge triangle support over the 0.30-threshold embedding
    near-dup graph (k-truss building block): two hash-partitioned joins
    with the middle vertex riding through, explode + one groupby."""
    import ray.data

    from pdf2doi_ray.stages.graph import edge_triangle_support
    from pdf2doi_ray.stages.similarity import embedding_near_dups
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return edge_triangle_support(embedding_near_dups(emb, threshold=0.30))


def _q_doc_novelty(sf_dir: str):
    """Per-doc new-vocabulary share (first-occurrence terms / distinct
    terms): two tagged partial streams over one groupby(doc_id)."""
    import ray.data

    from pdf2doi_ray.stages.corpus import doc_novelty
    return doc_novelty(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_delta_oov(sf_dir: str):
    """Incremental-ingest OOV audit (even doc_ids = old corpus, odd =
    delta): old-vocab groupby + large×large term hash join, no broadcast."""
    import ray.data

    from pdf2doi_ray.stages.corpus import delta_oov_rate
    return delta_oov_rate(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _q_aspect_buckets(sf_dir: str):
    """SDXL-style aspect-ratio bucketing plan: actor-pool decode →
    nearest-bucket assignment → combiner groupby."""
    from pdf2doi_ray.stages.multimodal import aspect_bucket_plan
    return aspect_bucket_plan(sf_dir)


def _q_manifest_reconcile(sf_dir: str):
    """Training-manifest reconciliation: FULL OUTER hash join of the
    long-docs text manifest vs the non-label-2 embedding manifest,
    emitting only one-sided ids."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.joins import manifest_reconcile

    left = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table({"id": t["doc_id"].cast(pa.int64())}).filter(
            pc.greater_equal(t["n_chars"], 100)),
        batch_format="pyarrow")
    right = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label"]).map_batches(
        lambda t: pa.table({"id": t["vec_id"].cast(pa.int64())}).filter(
            pc.not_equal(t["label"], 2)),
        batch_format="pyarrow")
    return manifest_reconcile(left, right, on="id",
                              left_flag="has_text",
                              right_flag="has_embedding")


def _q_lineage_stamps(sf_dir: str):
    """Per-partition lineage + metrics stamps (north-rule checkpoint
    contract): shard row/found counts + order-independent md5 min/max."""
    from pdf2doi_ray.pipelines.identify import lineage_stamps
    return lineage_stamps(_pages(sf_dir))


def _q_title_h1(sf_dir: str):
    """Title-vs-h1 token agreement per page: exploded (row, term) pairs +
    one in-batch C++ hash join — no per-row Python, no shuffle."""
    from pdf2doi_ray.stages.skew import title_h1_consistency
    return title_h1_consistency(_pages(sf_dir))


def _q_decile_transition(sf_dir: str):
    """Week-1 → week-2 spend-decile migration matrix with exact rank
    deciles (block-offset zipWithIndex over the user stream)."""
    import ray.data

    from pdf2doi_ray.stages.aggs import value_decile_transition
    return value_decile_transition(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]))


def _q_byte_inventory(sf_dir: str):
    """Per-lang byte inventory for tokenizer design: one bincount over
    code*256+byte per batch, ≤ langs*256 combiner rows per block."""
    import ray.data

    from pdf2doi_ray.stages.textstats import byte_inventory_by_lang
    return byte_inventory_by_lang(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]))


def _q_top_docs_ties(sf_dir: str):
    """RANK()-semantics top-5 token counts per lang (ties keep all):
    combiner keeps ≤ k distinct values per group per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.textstats import _tokens
    from pdf2doi_ray.stages.windowfns import grouped_top_k_ties

    def prep(t: pa.Table) -> pa.Table:
        toks = _tokens(t["text"].combine_chunks()
                       if isinstance(t["text"], pa.ChunkedArray)
                       else t["text"])
        return pa.table({
            "lang": t["lang"],
            "n_tokens": pc.list_value_length(toks).cast(pa.int64())})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]) \
        .map_batches(prep, batch_format="pyarrow")
    return grouped_top_k_ties(docs, "lang", "n_tokens", k=5)


def _q_token_weighted_quantiles(sf_dir: str):
    """Token-weighted doc-length quantiles (the packing planner's cut):
    one length→token-sum groupby + a bounded histogram walk."""
    import ray.data

    from pdf2doi_ray.stages.textstats import token_weighted_char_quantiles
    return token_weighted_char_quantiles(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))


def _q_strip_tags(sf_dir: str):
    """Strip-all-tags baseline extractor vs DOM-aware main content: one
    RE2 kernel over html, per-page chrome share."""
    from pdf2doi_ray.stages.skew import strip_tags_baseline
    return strip_tags_baseline(_pages(sf_dir))


def _q_dup_canonical(sf_dir: str):
    """Keep-best canonical map for embedding near-dup clusters (quality =
    label, ties to smaller id): components + quality join + top-1."""
    import pyarrow as pa
    import ray.data

    from pdf2doi_ray.stages.graph import dup_canonical_map

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    from pdf2doi_ray.stages.similarity import embedding_near_dups
    pairs = embedding_near_dups(emb, threshold=0.40)
    quality = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label"]).map_batches(
        lambda t: pa.table({"node": t["vec_id"].cast(pa.int64()),
                            "q": t["label"].cast(pa.int64())}),
        batch_format="pyarrow")
    return dup_canonical_map(pairs, quality)


def _q_datacard(sf_dir: str):
    """Corpus data card (long-format metric/value rows): one additive
    pass + two distinct-count combiner exchanges."""
    import ray.data

    from pdf2doi_ray.stages.corpus import corpus_datacard
    return corpus_datacard(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"]))


def _q_components_incremental(sf_dir: str):
    """Incremental CC maintenance: yesterday = components of the
    even-even 0.40 edges, today's delta = the remaining edges; the
    star-augmented recompute must equal the full-graph components
    (the oracle is the full-graph reach CTE)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.graph import (components_incremental,
                                          connected_components)
    from pdf2doi_ray.stages.similarity import embedding_near_dups

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_near_dups(emb, threshold=0.40).materialize()

    def both_even(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks().cast(pa.int64())
        b = t["vec_b"].combine_chunks().cast(pa.int64())
        even = pc.and_(pc.equal(pc.bit_wise_and(a, 1), 0),
                       pc.equal(pc.bit_wise_and(b, 1), 0))
        return pa.table({"vec_a": a, "vec_b": b,
                         "_keep": even})

    tagged = pairs.map_batches(both_even, batch_format="pyarrow") \
        .materialize()
    old_pairs = tagged.map_batches(
        lambda t: t.filter(t["_keep"]).drop_columns(["_keep"]),
        batch_format="pyarrow")
    delta = tagged.map_batches(
        lambda t: t.filter(pc.invert(t["_keep"])).drop_columns(["_keep"]),
        batch_format="pyarrow")
    old = connected_components(old_pairs, col_a="vec_a", col_b="vec_b")
    return components_incremental(old, delta,
                                  col_a="vec_a", col_b="vec_b")


def _q_template_diversity(sf_dir: str):
    """Per-host title-template diversity (digit runs collapsed): the
    fixture serves ONE template per host by construction — the oracle
    pins that; the pytest exercises mixed-template hosts."""
    from pdf2doi_ray.stages.skew import title_template_diversity
    return title_template_diversity(_pages(sf_dir))


def _q_cluster_churn(sf_dir: str):
    """Cluster-churn audit: yesterday = even-even 0.40 components, today
    = full-graph components; split/merge/appear/drop tallies."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf2doi_ray.stages.graph import (cluster_churn_report,
                                          connected_components)
    from pdf2doi_ray.stages.similarity import embedding_near_dups

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    pairs = embedding_near_dups(emb, threshold=0.40).materialize()

    def even_only(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks().cast(pa.int64())
        b = t["vec_b"].combine_chunks().cast(pa.int64())
        even = pc.and_(pc.equal(pc.bit_wise_and(a, 1), 0),
                       pc.equal(pc.bit_wise_and(b, 1), 0))
        return pa.table({"vec_a": a, "vec_b": b}).filter(even)

    old = connected_components(
        pairs.map_batches(even_only, batch_format="pyarrow"),
        col_a="vec_a", col_b="vec_b")
    new = connected_components(pairs, col_a="vec_a", col_b="vec_b")
    return cluster_churn_report(old, new)


def _q_pps_sample(sf_dir: str):
    """Deterministic token-mass-proportional systematic sample: weighted
    block-offset cumsum, integer boundary-crossing test, zero RNG."""
    import ray.data

    from pdf2doi_ray.stages.corpus import pps_systematic_sample
    return pps_systematic_sample(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        n_target=100)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return _q_extract("/root/testdata/sf0.001")



def _q_langid_trigram(sf_dir: str):
    """Corpus-trained char-trigram language ID (Cavnar-Trenkle style):
    top-20 trigram profile per lang (one groupby + bucketed top-k),
    profiles broadcast, per-doc distinct-trigram overlap argmax with
    alphabetical tie-break, confusion-matrix combiner groupby."""
    from pdf2doi_ray.stages.textstats import langid_trigram_confusion
    return langid_trigram_confusion(_docs(sf_dir))


def _q_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility census per lang: whitespace words vs RE2
    word/number/punct subtokens (both engines run the SAME RE2 pattern),
    exact integer permille ratios; pure combiner + |langs|-row groupby."""
    from pdf2doi_ray.stages.textstats import tokenizer_fertility
    return tokenizer_fertility(_docs(sf_dir, ("doc_id", "text", "lang")))



def _q_temperature_mixture(sf_dir: str):
    """Temperature-smoothed (tau=1/2) data-mixing plan: per-source token
    inventory -> isqrt-weighted sampling permilles + expected-epoch
    duplication factors, exact big-int arithmetic; one combiner groupby."""
    from pdf2doi_ray.stages.corpus import temperature_mixture_plan
    return temperature_mixture_plan(
        _docs(sf_dir, ("doc_id", "text", "source")))


def _q_bitext_candidates(sf_dir: str):
    """Bitext-mining prefilter: same-source cross-lingual doc pairs
    within 200 chars of each other via ONE band hash join (bucket b-1/b/
    b+1 replication, 16-byte rows; texts never travel)."""
    from pdf2doi_ray.stages.joins import bitext_candidates
    return bitext_candidates(
        _docs(sf_dir, ("doc_id", "text", "lang", "source")),
        key_col="source", tol=200)


def _q_url_tree_rollup(sf_dir: str):
    """Crawl-frontier subtree census: page counts per (host, path
    prefix) at depths 1-3 over deterministically synthesized urls —
    vectorized prefix explosion (list_slice + binary_join) + combiner
    groupby."""
    import ray.data

    from pdf2doi_ray.stages.skew import url_tree_rollup

    def gen(t):
        import pyarrow as pa
        urls = [f"https://s{i % 5}.example.org/a{i % 7}"
                + (f"/b{i % 3}" if i % 3 else "") + f"/p{i}"
                for i in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(urls, type=pa.string())})

    pages = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])         .map_batches(gen, batch_format="pyarrow")
    return url_tree_rollup(pages, max_depth=3)



def _q_near_dup_delta(sf_dir: str):
    """Incremental bipartite near-dup: new docs (upper half of doc_id)
    near-duplicating the standing corpus (lower half) — banded LSH over
    the union, cross-side candidate filter BEFORE the shared exact
    verification engine."""
    import ray.data

    from pdf2doi_ray.stages.dedup import near_dup_delta

    docs = _docs(sf_dir, ("doc_id", "text"))
    split = (int(docs.max("doc_id")) + 1) // 2
    return near_dup_delta(docs, split)



def _q_bigram_collision(sf_dir: str):
    """Renyi-2 char-bigram collision probability per lang, exact ppm
    (squares after global aggregation, big-int fold over the
    alphabet-bounded count table)."""
    from pdf2doi_ray.stages.textstats import bigram_collision_homogeneity
    return bigram_collision_homogeneity(_docs(sf_dir, ("text", "lang")))


def _q_suffix_prefix_overlap(sf_dir: str):
    """Document-reassembly stitch points over a deterministic
    continuation-record stream (each >=24-token doc splits into two
    crawl records sharing an 8-token boundary): tail-k == head-k via
    ONE string hash join, no verify step needed."""
    import ray.data

    from pdf2doi_ray.stages.joins import suffix_prefix_overlap

    def gen(t):
        import pyarrow as pa
        ids, texts = [], []
        for i, tx in zip(t["doc_id"].to_pylist(),
                         t["text"].to_pylist()):
            tk = tx.split(" ")
            n = len(tk)
            if n >= 24:
                h = n // 2
                ids.append(2 * i)
                texts.append(" ".join(tk[:h + 8]))
                ids.append(2 * i + 1)
                texts.append(" ".join(tk[h:]))
            else:
                ids.append(2 * i)
                texts.append(tx)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    stream = _docs(sf_dir, ("doc_id", "text"))         .map_batches(gen, batch_format="pyarrow")
    return suffix_prefix_overlap(stream, k=8)



def _q_containment_pairs(sf_dir: str):
    """Asymmetric quote/inclusion detection: pairs whose shingle overlap
    covers >= 50% of the smaller doc's set — df-demoted prefix probes
    against a full element index (one hash join), then the shared
    Bloom-gated exact-verification engine scoring inter/min."""
    from pdf2doi_ray.stages.dedup import containment_pairs
    return containment_pairs(_docs(sf_dir, ("doc_id", "text")),
                             tau_permille=500)



def _q_kcore(sf_dir: str):
    """2-core of the embedding near-dup graph by broadcast peeling:
    removed-set broadcast per round, edges never shuffle, one degree
    groupby per round; oracle = 12 unrolled peel rounds in SQL."""
    import ray.data

    from pdf2doi_ray.stages.graph import kcore_decomposition
    from pdf2doi_ray.stages.similarity import embedding_near_dups

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return kcore_decomposition(embedding_near_dups(emb, threshold=0.30),
                               k=2)



def _q_curate_v4(sf_dir: str):
    """Round-5 curation composition: trigram-langid agreement gate ->
    exact containment dedup (drop higher id of each >=90% pair) ->
    temperature-smoothed mixture plan over survivors."""
    from pdf2doi_ray.stages.corpus import curate_v4
    return curate_v4(_docs(sf_dir, ("doc_id", "text", "lang", "source")))



def _q_feather_roundtrip(sf_dir: str):
    """documents → Arrow-IPC (Feather v2, zstd) shards under /tmp → read
    back.  Same identity-oracle contract as ``jsonl_roundtrip`` — the
    zero-parse interchange for Arrow-native consumers."""
    import shutil

    from pdf2doi_ray.sources.formats import export_feather, read_feather_dir

    out = _fmt_scratch(sf_dir, "feather")
    shutil.rmtree(out, ignore_errors=True)
    export_feather(_docs(sf_dir, ("doc_id", "text", "lang", "n_chars")),
                   out).materialize()
    return read_feather_dir(out).select_columns(
        ["doc_id", "text", "lang", "n_chars"])



def _q_compression_ratio(sf_dir: str):
    """gzip/deflate quality filter (C4/MassiveText staple): per-doc
    deflate ratio + keep flag; pure per-batch zlib kernel, no shuffle.
    Not SQL-expressible (no deflate in DuckDB) -> rows-only driver
    check; pytest golden recomputes with the same zlib."""
    from pdf2doi_ray.stages.textstats import compression_ratio_flags
    return compression_ratio_flags(_docs(sf_dir, ("doc_id", "text")))



def _q_t5_span_corruption(sf_dir: str):
    """T5 denoising-objective data prep: deterministic ~12.5% token
    spans collapse to <X_k> sentinels in the input and re-emit in the
    target — pure per-batch vectorized map, zero shuffles."""
    from pdf2doi_ray.stages.corpus import t5_span_corruption
    return t5_span_corruption(_docs(sf_dir, ("doc_id", "text")))



def _q_mlm_masking(sf_dir: str):
    """BERT-style MLM data prep with the deterministic 80/10/10 rule
    (in-document arithmetic replacement, no vocab broadcast) — pure
    per-batch vectorized map, zero shuffles."""
    from pdf2doi_ray.stages.corpus import mlm_masking_pairs
    return mlm_masking_pairs(_docs(sf_dir, ("doc_id", "text")))


def queries() -> dict[str, Callable[[str], Any]]:
    q = {
        # --- driver CORRECTNESS window: flagship sentinels, then
        # the r3-driver-unchecked operators (VERDICT r3 #2: never-
        # checked first), then this round's new waves, then the
        # operators with prior driver rows ---
        # sentinels
        "extract_identifiers": _q_extract,
        "extract_text_parity": _q_text_parity,
        "dedup_exact": _q_dedup_exact,
        "simhash": _q_simhash,
        "winnow_fingerprints": _q_winnow,
        # r3-unchecked rotation (67)
        "tfidf_top_terms": _q_tfidf_top_terms,
        "orders_customer_join": _q_orders_customer_join,
        "lineitem_orders_join": _q_lineitem_orders_join,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "rolling_user_sum": _q_rolling_user_sum,
        "running_user_sum": _q_running_user_sum,
        "distinct_users_per_type": _q_distinct_users_per_type,
        "token_quantiles_by_lang": _q_token_quantiles_by_lang,
        "events_pivot": _q_events_pivot,
        "event_value_histogram": _q_event_value_histogram,
        "funnel_conversion": _q_funnel_conversion,
        "approx_value_quantiles": _q_approx_value_quantiles,
        "approx_value_quantiles_by_type": _q_approx_value_quantiles_by_type,
        "event_type_freqs_cm": _q_event_type_freqs_cm,
        "kmeans_clusters": _q_kmeans_clusters,
        "customer_orders_left_join": _q_customer_orders_left_join,
        "normalize_text": _q_normalize_text,
        "pii_redaction": _q_pii_redaction,
        "line_dedup_keep_first": _q_line_dedup_keep_first,
        "canonical_urls": _q_canonical_urls,
        "dedup_canonical_urls": _q_dedup_canonical_urls,
        "new_docs_anti_join": _q_new_docs_anti_join,
        "inverted_index_stats": _q_inverted_index_stats,
        "long_docs_above_p90": _q_long_docs_above_p90,
        "events_sorted_head": _q_events_sorted_head,
        "events_type_summary": _q_events_type_summary,
        "curate_corpus": _q_curate_corpus,
        "event_value_quantiles": _q_event_value_quantiles,
        "uniform_sample": _q_uniform_sample,
        "weighted_sample": _q_weighted_sample,
        "repetition_filter": _q_repetition_filter,
        "contamination": _q_contamination,
        "contamination_distributed": _q_contamination_distributed,
        "host_quality_filter": _q_host_quality_filter,
        "gopher_quality": _q_gopher_quality,
        "crawl_diff": _q_crawl_diff,
        "curate_v2": _q_curate_v2,
        "dsir_scores": _q_dsir_scores,
        "pack_sequences": _q_pack_sequences,
        "extract_links": _q_extract_links,
        "host_link_graph": _q_host_link_graph,
        "remove_boilerplate_lines": _q_remove_boilerplate_lines,
        "remove_boilerplate_distributed": _q_boilerplate_distributed,
        "oov_rate": _q_oov_rate,
        "passage_windows": _q_passage_windows,
        "sample_intersect": _q_sample_intersect,
        "sample_except": _q_sample_except,
        "extraction_rate_by_host": _q_rate_by_host,
        "embedding_centroids": _q_embedding_centroids,
        "heavy_hitter_tokens": _q_heavy_hitter_tokens,
        "heavy_hitter_tokens_tree": _q_heavy_hitter_tokens_tree,
        "stratified_sample_by_lang": _q_stratified_sample_by_lang,
        "events_rollup": _q_docs_rollup,
        "lag_user_value": _q_lag_user_value,
        "ntile_user": _q_ntile_user,
        "percent_rank_user_value": _q_percent_rank_user_value,
        "cume_dist_user_value": _q_cume_dist_user_value,
        "first_value_user": _q_first_value_user,
        "last_value_user": _q_last_value_user,
        "lead_user_value": _q_lead_user_value,
        "rank_user_value": _q_rank_user_value,
        "dense_rank_user_value": _q_dense_rank_user_value,
        "row_number_user": _q_row_number_user,
        "user_mode_event_type": _q_user_mode_event_type,
        "user_event_paths": _q_user_event_paths,
        "events_cube": _q_events_cube,
        "value_quantiles_by_type": _q_value_quantiles_by_type,
        # round-4 third-session waves 19-27
        "event_debounce": _q_event_debounce,
        "batch_padding_plan": _q_batch_padding_plan,
        "personalized_pagerank": _q_personalized_pagerank,
        "tag_census": _q_tag_census,
        "crawl_recency_report": _q_crawl_recency,
        "recency_weighted_value": _q_recency_weighted_value,
        "doc_frequency_spectrum": _q_doc_freq_spectrum,
        "vocab_growth_curve": _q_vocab_growth,
        "method_agreement": _q_method_agreement,
        "skipgram_cooccurrence": _q_skipgram,
        "edge_triangle_support": _q_edge_support,
        "doc_novelty": _q_doc_novelty,
        "delta_oov_rate": _q_delta_oov,
        "aspect_bucket_plan": _q_aspect_buckets,
        "manifest_reconcile": _q_manifest_reconcile,
        "lineage_stamps": _q_lineage_stamps,
        "title_h1_consistency": _q_title_h1,
        "value_decile_transition": _q_decile_transition,
        "byte_inventory_by_lang": _q_byte_inventory,
        # round-4 third-session wave 28
        "top_docs_per_lang_ties": _q_top_docs_ties,
        "token_weighted_char_quantiles": _q_token_weighted_quantiles,
        # round-4 third-session wave 29
        "strip_tags_baseline": _q_strip_tags,
        # round-4 third-session wave 30
        "dup_canonical_map": _q_dup_canonical,
        # round-4 third-session wave 31
        "corpus_datacard": _q_datacard,
        # round-4 third-session wave 32
        "components_incremental": _q_components_incremental,
        "title_template_diversity": _q_template_diversity,
        # round-4 third-session wave 33
        "cluster_churn_report": _q_cluster_churn,
        # round-4 third-session wave 34
        "pps_systematic_sample": _q_pps_sample,
        # round-4 earlier waves and prior-round operators
        "char_class_profile": _q_char_class_profile,
        "char_simpson": _q_char_simpson,
        "word_len_histogram": _q_word_len_histogram,
        "user_gap_moments": _q_user_gap_moments,
        "dau_wau_stickiness": _q_dau_wau,
        "bloom_semi_revenue": _q_bloom_semi_revenue,
        "supplier_lead_quantiles": _q_supplier_lead_quantiles,
        "promo_revenue_share": _q_promo_revenue_share,
        "source_mix_plan": _q_source_mix_plan,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "prefix_dup_flags": _q_prefix_dup_flags,
        "out_of_order_rate": _q_out_of_order_rate,
        "interleave_order": _q_interleave_order,
        "join_cardinality": _q_join_cardinality,
        "open_order_backlog": _q_open_order_backlog,
        "padding_waste": _q_padding_waste,
        "event_type_trigrams": _q_event_type_trigrams,
        "gate_grid_report": _q_gate_grid,
        "shard_skew_report": _q_shard_skew,
        "crawl_frontier_topk": _q_crawl_frontier,
        "adjacent_vec_distance_histogram": _q_adjacent_vec_hist,
        "label_norm_stats": _q_label_norm_stats,
        "median_user_value": _q_median_user_value,
        "encoding_advisor": _q_encoding_advisor,
        "weekly_retention": _q_weekly_retention,
        "revenue_yoy_growth": _q_revenue_yoy,
        "dim_stats": _q_dim_stats,
        "source_lang_concentration": _q_source_lang_concentration,
        "conversion_latency_histogram": _q_conversion_latency,
        "lorenz_revenue_deciles": _q_lorenz_deciles,
        "rowgroup_advisor": _q_rowgroup_advisor,
        "neardup_eval": _q_neardup_eval,
        "char_bigram_familiarity": _q_char_bigram_familiarity,
        "basket_size_histogram": _q_basket_size_histogram,
        "lang_run_stats": _q_lang_run_stats,
        "clip_identifiers": _q_clip,
        "resolve_redirects": _q_resolve_redirects,
        "rolling_time_sum": _q_rolling_time_sum,
        "token_budget_head": _q_token_budget_head,
        "bucketed_join": _q_bucketed_join,
        "robots_disallow_filter": _q_robots_disallow,
        "equi_depth_histogram": _q_equi_depth_hist,
        "group_token_budget": _q_group_token_budget,
        "salted_join": _q_salted_join,
        "percentile_transform": _q_percentile_transform,
        "compact_roundtrip": _q_compact_roundtrip,
        "cdc_apply": _q_cdc_apply,
        "tumbling_distinct_users": _q_tumbling_distinct,
        "warc_roundtrip": _q_warc_roundtrip,
        "moved_pages": _q_moved_pages,
        "zscore_outliers": _q_zscore_outliers,
        "bucketed_lookup": _q_bucketed_lookup,
        "orc_roundtrip": _q_orc_roundtrip,
        "histogram_drift": _q_histogram_drift,
        "pareto_orders": _q_pareto_orders,
        "source_skew_gini": _q_source_skew_gini,
        "bucketed_upsert": _q_bucketed_upsert,
        "jaccard_pairs_exact": _q_jaccard_pairs,
        "market_share": _q_market_share,
        "profit_by_nation_year": _q_profit_by_nation_year,
        "cheapest_supplier_per_part": _q_cheapest_supplier_per_part,
        "supplier_counts_by_part_class": _q_supplier_counts_by_part_class,
        "longest_streak_per_user": _q_longest_streak_per_user,
        "peak_hour_by_type": _q_peak_hour_by_type,
        "hapax_ratio_by_lang": _q_hapax_ratio_by_lang,
        "reciprocal_host_pairs": _q_reciprocal_host_pairs,
        "host_out_degree_histogram": _q_host_out_degree_histogram,
        "scd2_user_state": _q_scd2_user_state,
        "bibliographic_coupling": _q_bibliographic_coupling,
        "user_gap_histogram": _q_user_gap_histogram,
        "impute_value_by_type_median": _q_impute_value_by_type_median,
        "host_clustering_coefficients": _q_host_clustering_coefficients,
        "extraction_rate_by_chars_decile": _q_extraction_rate_by_chars_decile,
        "excess_share_suppliers": _q_excess_share_suppliers,
        "minmax_normalize_by_type": _q_minmax_normalize_by_type,
        "dense_hourly_counts": _q_dense_hourly_counts,
        "topk_types_per_day": _q_topk_types_per_day,
        "day_over_day_change": _q_day_over_day_change,
        "user_ltv_buckets": _q_user_ltv_buckets,
        "url_pattern_counts": _q_url_pattern_counts,
        "token_budget_allocation": _q_token_budget_allocation,
        "user_growth_curve": _q_user_growth_curve,
        "session_length_histogram": _q_session_length_histogram,
        "verbose_docs_vs_lang_median": _q_verbose_docs_vs_lang_median,
        "global_value_rank": _q_global_value_rank,
        "ks_value_click_vs_purchase": _q_ks_value_click_vs_purchase,
        "funnel_steps": _q_funnel_steps,
        "benford_digit_counts": _q_benford_digit_counts,
        "k_anonymity_audit": _q_k_anonymity_audit,
        "value_moving_range": _q_value_moving_range,
        "event_type_user_overlap": _q_event_type_user_overlap,
        "max_burst_per_user": _q_max_burst_per_user,
        "embedding_gram_matrix": _q_embedding_gram_matrix,
        "weighted_sssp_host": _q_weighted_sssp_host,
        "degree_assortativity": _q_degree_assortativity,
        "stratified_kfold": _q_stratified_kfold,
        "heavy_tokens_exact": _q_heavy_tokens_exact,
        "validation_report": _q_validation_report,
        "dangling_link_rate": _q_dangling_link_rate,
        "max_concurrent_events": _q_max_concurrent_events,
        "host_rate_outliers": _q_host_rate_outliers,
        "gopher_impact_by_lang": _q_gopher_impact_by_lang,
        "partitioned_prune_roundtrip": _q_partitioned_prune_roundtrip,
        "hashed_features": _q_hashed_features,
        "target_encode_loo": _q_target_encode_loo,
        "rfm_scores": _q_rfm_scores,
        "churned_users": _q_churned_users,
        "value_ohlc_hourly": _q_value_ohlc_hourly,
        "orders_vs_ship_days": _q_orders_vs_ship_days,
        "kcore_users_props": _q_kcore_users_props,
        "ship_latency_histogram": _q_ship_latency_histogram,
        "time_weighted_value": _q_time_weighted_value,
        "type_weekday_contingency": _q_type_weekday_contingency,
        "zonemap_prune_scan": _q_zonemap_prune_scan,
        "video_scene_cuts": _q_video_scene_cuts,
        "vocab_coverage_curve": _q_vocab_coverage_curve,
        "clamped_running_balance": _q_clamped_running_balance,
        "first_touch_attribution": _q_first_touch_attribution,
        "cusum_changepoint": _q_cusum_changepoint,
        "kmv_vocab_sample": _q_kmv_vocab_sample,
        "template_clusters": _q_template_clusters,
        "embedding_int8_quantize": _q_embedding_int8_quantize,
        "day_bitmap_index": _q_day_bitmap_index,
        "supplier_fill_rate": _q_supplier_fill_rate,
        "part_copurchase_pairs": _q_part_copurchase_pairs,
        "kmv_repeat_customers": _q_kmv_repeat_customers,
        "two_hop_neighborhood": _q_two_hop_neighborhood,
        "daily_periodicity": _q_daily_periodicity,
        "max_drawdown": _q_max_drawdown,
        "sliding_distinct_users": _q_sliding_distinct_users,
        "internal_link_ratio": _q_internal_link_ratio,
        "source_minhash_signatures": _q_source_minhash_signatures,
        "consistent_hash_moves": _q_consistent_hash_moves,
        "source_similarity_pairs": _q_source_similarity_pairs,
        "label_scatter": _q_label_scatter,
        "contrastive_negatives": _q_contrastive_negatives,
        "scc_of_s0": _q_scc_of_s0,
        "theil_sen_trend": _q_theil_sen_trend,
        "reorder_interval_median": _q_reorder_interval_median,
        "duplicate_order_flags": _q_duplicate_order_flags,
        "active_day_streaks": _q_active_day_streaks,
        "revenue_hhi": _q_revenue_hhi,
        "dup_ngram_spans": _q_dup_ngram_spans,
        "remove_dup_spans": _q_remove_dup_spans,
        "host_blocklist_filter": _q_host_blocklist,
        "shard_assignment": _q_shard_assignment,
        "quality_model_scores": _q_quality_model,
        "semantic_dedup": _q_semantic_dedup,
        "extract_identifiers_segmented": _q_extract_segmented,
        "extract_identifiers_keep_arxiv": _q_extract_keep_arxiv,
        "title_candidates": _q_titles,
        "method_stats": _q_method_stats,
        "extraction_rate_by_lang": _q_rate_by_lang,
        "token_stats": _q_token_stats,
        "quality_flags": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash_near_dups": _q_simhash_near_dups,
        "wordset_jaccard": _q_wordset_jaccard,
        "ngram_jaccard": _q_ngram_jaccard,
        "knn_bruteforce": _q_knn,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        "embedding_dup_components": _q_embedding_dup_components,
        "embedding_dedup_prune": _q_embedding_dedup_prune,
        "embedding_dedup_prune_distributed": _q_embedding_dedup_prune_distributed,
        "pagerank": _q_pagerank,
        "near_dup_triangles": _q_near_dup_triangles,
        "top_docs_by_tokens": _q_top_docs_by_tokens,
        "events_tumbling": _q_tumbling,
        "events_sliding": _q_sliding,
        "events_sessions": _q_sessions,
        "resume_semi_join": _q_resume_semi_join,
        "identify_incremental": _q_identify_incremental,
        "extract_filename_only": _q_filename_only,
        "extract_metadata_only": _q_metadata_only,
        "ascii_first_n": _q_ascii_first_n,
        "pages_per_host": _q_pages_per_host,
        "image_features": _q_image_features,
        "frame_sample": _q_frame_sample,
        "image_resize": _q_image_resize,
        "audio_features": _q_audio_features,
        "token_count_quantiles": _q_token_quantiles,
        "approx_ndv_hosts": _q_approx_ndv_hosts,
        "events_asof_join": _q_events_asof_join,
        "events_range_join": _q_events_range_join,
        "hash_sample": _q_hash_sample,
        "train_test_split": _q_train_test_split,
        "dedup_keep_best": _q_dedup_keep_best,
        "top_bigrams": _q_top_bigrams,
        "minhash_dedup_prune": _q_minhash_dedup_prune,
        "hll_registers_hosts": _q_hll_registers,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "event_value_variance": _q_event_value_variance,
        "chars_tokens_moments": _q_chars_tokens_moments,
        "winsorize_event_values": _q_winsorize_event_values,
        "cohort_retention": _q_cohort_retention,
        "mad_event_values": _q_mad_event_values,
        "vocab_top_tokens": _q_vocab_top_tokens,
        "lang_balanced_sample": _q_lang_balanced_sample,
        "melt_doc_stats": _q_melt_doc_stats,
        "weighted_sample_k": _q_weighted_sample_k,
        "lexical_diversity": _q_lexical_diversity,
        "anchor_text_index": _q_anchor_text_index,
        "shipping_priority": _q_shipping_priority,
        "edit_distance_adjacent": _q_edit_distance_adjacent,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "seeded_shuffle": _q_seeded_shuffle,
        "revenue_by_part_type": _q_revenue_by_part_type,
        "merge_dup_spans": _q_merge_dup_spans,
        "order_priority_semi": _q_order_priority_semi,
        "order_count_distribution": _q_order_count_distribution,
        "large_volume_orders": _q_large_volume_orders,
        "returnflag_priority_counts": _q_returnflag_priority_counts,
        "idle_rich_customers": _q_idle_rich_customers,
        "pricing_summary": _q_pricing_summary,
        "forecast_revenue": _q_forecast_revenue,
        "returned_item_customers": _q_returned_item_customers,
        "nation_pair_volume": _q_nation_pair_volume,
        "json_field_stats": _q_json_field_stats,
        "doc_dup_gram_fraction": _q_doc_dup_gram_fraction,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "host_quota_sample": _q_host_quota_sample,
        "event_transitions": _q_event_transitions,
        "event_type_cooccurrence": _q_event_type_cooccurrence,
        "interval_coverage": _q_interval_coverage,
        "group_split_stats": _q_group_split_stats,
        "ngram_diversity": _q_ngram_diversity,
        "zorder_layout": _q_zorder_layout,
        "lang_confusion": _q_lang_confusion,
        "inverted_index": _q_inverted_index,
        "flesch_readability": _q_flesch_readability,
        "iqr_outlier_filter": _q_iqr_outlier_filter,
        "cooccurrence_lift": _q_cooccurrence_lift,
        "fuzzy_token_pairs": _q_fuzzy_token_pairs,
        "curate_v3": _q_curate_v3,
        "hll_registers_by_lang": _q_hll_registers_by_lang,
        "banned_phrase_filter": _q_banned_phrase_filter,
        "union_by_name": _q_union_by_name,
        "host_crawl_gaps": _q_host_crawl_gaps,
        "dedup_url_daily": _q_dedup_url_daily,
        "bm25_top_docs": _q_bm25_top_docs,
        "rrf_fusion": _q_rrf_fusion,
        "hits_scores": _q_hits_scores,
        "waiting_suppliers": _q_waiting_suppliers,
        "proximity_hash_join": _q_proximity_hash_join,
        "cdc_chunk_stats": _q_cdc_chunk_stats,
        "byte_pair_counts": _q_byte_pair_counts,
        "crawl_budget": _q_crawl_budget,
        "collocation_lift": _q_collocation_lift,
        "host_crawl_overlap": _q_host_crawl_overlap,
        "brand_bracket_revenue": _q_brand_bracket_revenue,
        "late_events": _q_late_events,
        "fd_audit_source_lang": _q_fd_audit_source_lang,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "bucket_sync_diff": _q_bucket_sync_diff,
        "exact_median_value": _q_exact_median_value,
        "bfs_host_distance": _q_bfs_host_distance,
        "weighted_median_chars": _q_weighted_median_chars,
        "continuation_counts": _q_continuation_counts,
        "impact_index": _q_impact_index,
        "co_citation": _q_co_citation,
        "median_chars_by_lang": _q_median_chars_by_lang,
        "spellfix_vocab": _q_spellfix_vocab,
        "host_url_lcp": _q_host_url_lcp,
        "lang_vocab_overlap": _q_lang_vocab_overlap,
        "image_dedup": _q_image_dedup,
        "profile_events": _q_profile_events,
        "user_value_trends": _q_user_value_trends,
        "rebalance_matrix": _q_rebalance_matrix,
        "bursty_hours": _q_bursty_hours,
        "value_share": _q_value_share,
        "activation_latency": _q_activation_latency,
        "session_conversion": _q_session_conversion,
        # --- round-5 wave 35 ---
        "langid_trigram": _q_langid_trigram,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "temperature_mixture_plan": _q_temperature_mixture,
        "bitext_candidates": _q_bitext_candidates,
        "url_tree_rollup": _q_url_tree_rollup,
        "near_dup_delta": _q_near_dup_delta,
        "bigram_collision": _q_bigram_collision,
        "suffix_prefix_overlap": _q_suffix_prefix_overlap,
        "containment_pairs": _q_containment_pairs,
        "kcore_embedding_graph": _q_kcore,
        "curate_v4": _q_curate_v4,
        "feather_roundtrip": _q_feather_roundtrip,
        "compression_ratio_flags": _q_compression_ratio,
        "t5_span_corruption": _q_t5_span_corruption,
        "mlm_masking_pairs": _q_mlm_masking,
    }
    # --- Round-5 driver CORRECTNESS window (VERDICT r4 #1): 5 flagship
    # sentinels, then 45 queries with NO driver row in the r1-r4 union —
    # the r4 exact-oracle upgrades (clip/minhash/simhash/hll), this
    # round's fixed operators, the wave-19-34 additions, and a top-up
    # from the never-checked continuation pool.  Everything else keeps
    # its prior order after the window.
    _R5_WINDOW = [
        # sentinels (3 — the VERDICT-r4 minimum, freeing 2 slots for
        # never-checked queries; simhash/winnow keep coverage via their
        # r4 driver rows and the pytest suite)
        "extract_identifiers", "extract_text_parity", "dedup_exact",
        # r4 oracle upgrades never driver-validated
        "clip_identifiers", "minhash_near_dups", "simhash_near_dups",
        "minhash_dedup_prune", "hll_registers_hosts",
        # operators fixed/rebuilt this round
        "title_template_diversity", "byte_inventory_by_lang",
        "recency_weighted_value", "jaccard_pairs_exact",
        "source_skew_gini", "pareto_orders", "prefix_dup_flags",
        "cdc_chunk_stats",
        # wave-19-34, never driver-checked
        "event_debounce", "batch_padding_plan", "personalized_pagerank",
        "tag_census", "crawl_recency_report", "doc_frequency_spectrum",
        "vocab_growth_curve", "method_agreement", "skipgram_cooccurrence",
        "edge_triangle_support", "doc_novelty", "delta_oov_rate",
        "aspect_bucket_plan", "manifest_reconcile", "lineage_stamps",
        "title_h1_consistency", "value_decile_transition",
        "top_docs_per_lang_ties", "token_weighted_char_quantiles",
        "strip_tags_baseline", "dup_canonical_map", "corpus_datacard",
        "components_incremental", "cluster_churn_report",
        "pps_systematic_sample",
        # round-5 new operators (this round's freshest code gets the
        # external driver validation; the continuation pool is covered
        # by FULLGATE_r05.json)
        "langid_trigram", "tokenizer_fertility",
        "temperature_mixture_plan", "bitext_candidates",
        "url_tree_rollup", "near_dup_delta", "containment_pairs",
        "kcore_embedding_graph", "curate_v4",
    ]
    assert len(_R5_WINDOW) == 50, len(_R5_WINDOW)
    out = {k: q[k] for k in _R5_WINDOW}
    out.update({k: v for k, v in q.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    sql = {
        "extract_identifiers": _identify_sql(_IDENTIFIER, _METHOD),
        # resume must be result-transparent: combined output == from-scratch
        "resume_semi_join": _identify_sql(_IDENTIFIER, _METHOD),
        # incremental run must be byte-transparent to a from-scratch run
        "identify_incremental": _identify_sql(_IDENTIFIER, _METHOD),
        # fixture main content is one text unit → segmented ≡ whole reader
        "extract_identifiers_segmented": _identify_sql(_IDENTIFIER, _METHOD),
        "extract_identifiers_keep_arxiv": _identify_sql(_IDENTIFIER_KA, _METHOD_KA),
        "extract_text_parity": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       base_text || {_TEXT_SUFFIX} AS text,
       length(base_text || {_TEXT_SUFFIX}) AS n_chars
FROM d
""",
        "title_candidates": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       'Document ' || ks || ' from site' || site || '.example.org' AS best_title,
       CAST(2 AS BIGINT) AS n_titles
FROM d
""",
        "method_stats": f"""
WITH d AS ({_D})
SELECT {_METHOD} AS method, COUNT(*) AS n_rows
FROM d GROUP BY 1
""",
        "extraction_rate_by_lang": f"""
WITH d AS ({_D})
SELECT lang,
       CAST(SUM(CASE WHEN {_IDENTIFIER} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       COUNT(*) AS n_pages
FROM d GROUP BY lang
""",
        "extraction_rate_by_host": f"""
WITH d AS ({_D})
SELECT 'site' || site || '.example.org' AS host,
       CAST(SUM(CASE WHEN {_IDENTIFIER} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       COUNT(*) AS n_pages
FROM d GROUP BY 1
""",
        "extract_filename_only": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       CASE WHEN slot IN (3,4,13) THEN '10.' || reg || '/u' || ks || '.pdf'
            ELSE NULL END AS identifier,
       CASE WHEN slot IN (3,4,13) THEN 'DOI' ELSE NULL END AS identifier_type,
       CASE WHEN slot = 5 THEN NULL ELSE 'filename' END AS method,
       CASE WHEN slot IN (3,4,13) THEN 'True' ELSE NULL END AS validation_info
FROM d
""",
        "extract_metadata_only": f"""
WITH d AS ({_D})
SELECT {_URL} AS url,
       CASE WHEN slot IN (0,1) THEN '10.' || reg || '/meta.' || ks
            WHEN slot = 12 THEN '10.' || reg || '/mc.' || ks
            WHEN slot = 16 THEN '10.' || reg || '/ns.' || ks
            ELSE NULL END AS identifier,
       CASE WHEN slot IN (0,1,12,16) THEN 'DOI' ELSE NULL END AS identifier_type,
       'document_infos' AS method,
       CASE WHEN slot IN (0,1,12,16) THEN 'True' ELSE NULL END AS validation_info
FROM d
""",
        "ascii_first_n": """
SELECT doc_id,
       left(replace(replace(replace(
           regexp_replace(text, '[^\\x00-\\x7f]', ' ', 'g'),
           chr(10), ' '), chr(13), ' '), chr(9), ' '), 1000) AS snippet
FROM documents
""",
        "pages_per_host": """
SELECT 'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' AS host,
       count(*) AS n_pages
FROM documents GROUP BY 1
""",
        "token_stats": """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           AS n_bpe_tokens
FROM documents
""",
        "quality_flags": """
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','and','of','to','is','it'))) AS n_stopwords,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
  FROM documents)
SELECT doc_id, n_chars, n_tokens, n_stopwords, n_punct,
       CAST(CASE WHEN n_tokens >= 20 AND n_stopwords*1000 >= 50*n_tokens
            THEN 1 ELSE 0 END AS BIGINT) AS is_quality
FROM t
""",
        "lang_id": """
WITH c AS (
  SELECT doc_id, lang,
    len(list_filter(string_split(text,' '),
        x -> x IN ('der','die','das','und','nicht','ist'))) AS c_de,
    len(list_filter(string_split(text,' '),
        x -> x IN ('the','and','of','to','is','it'))) AS c_en,
    len(list_filter(string_split(text,' '),
        x -> x IN ('el','la','los','que','y','es'))) AS c_es,
    len(list_filter(string_split(text,' '),
        x -> x IN ('le','la','les','et','est','que'))) AS c_fr,
    len(list_filter(string_split(text,' '),
        x -> x IN ('的','是','了','在','我','不'))) AS c_zh
  FROM documents)
SELECT doc_id, lang,
  CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
       WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
       WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
       WHEN c_fr >= c_zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  greatest(c_de, c_en, c_es, c_fr, c_zh) AS vote_count
FROM c
""",
        "fingerprint": """
SELECT doc_id, md5(text) AS text_hash FROM documents
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
FROM documents GROUP BY md5(text)
""",
        "knn_bruteforce": """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
s AS (SELECT vec_id,
             list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)) AS sim
      FROM embeddings)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       vec_id
FROM s ORDER BY sim DESC, vec_id LIMIT 10
""",
        # contiguous 3-token shingles over the same single-space split as
        # wordset_jaccard (empties kept); <3 tokens -> empty set, u=0 -> 1000
        "ngram_jaccard": """
WITH w AS (SELECT doc_id,
                  list_distinct(list_transform(
                      range(1, len(string_split(text, ' ')) - 1),
                      i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i+1] || ' ' ||
                           string_split(text, ' ')[i+2])) AS sh
           FROM documents),
p AS (SELECT a.doc_id,
             len(list_intersect(a.sh, b.sh)) AS i,
             len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
      FROM w a JOIN w b ON b.doc_id = a.doc_id + 1)
SELECT doc_id,
       CAST(CASE WHEN u = 0 THEN 1000
            ELSE floor(1000.0 * i / u) END AS BIGINT) AS jaccard_next_permille
FROM p
""",
        "wordset_jaccard": """
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) ws
           FROM documents),
p AS (SELECT a.doc_id,
             len(list_intersect(a.ws, b.ws)) AS i,
             len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)) AS u
      FROM w a JOIN w b ON b.doc_id = a.doc_id + 1)
SELECT doc_id,
       CAST(CASE WHEN u = 0 THEN 1000
            ELSE floor(1000.0 * i / u) END AS BIGINT) AS jaccard_next_permille
FROM p
""",
        "embedding_near_dups": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.40
""",
        "embedding_dup_components": """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
reach(node, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b)
SELECT node, min(r) AS component FROM reach GROUP BY node
""",
        "embedding_dedup_prune": """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
reach(node, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT v.vec_id FROM embeddings v
LEFT JOIN comp c ON c.node = v.vec_id
WHERE c.node IS NULL OR c.component = v.vec_id
""",
        "pagerank": """
WITH p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS src, vb AS dst FROM p
      UNION ALL SELECT vb AS src, va AS dst FROM p),
n AS (SELECT vec_id AS node FROM embeddings),
d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
s1 AS (SELECT e.dst AS node,
              CAST(sum((r0.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r0 ON r0.node = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.node, CAST(150000 + COALESCE(s1.s, 0) AS BIGINT) AS r
       FROM n LEFT JOIN s1 ON s1.node = n.node),
s2 AS (SELECT e.dst AS node,
              CAST(sum((r1.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r1 ON r1.node = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.node, CAST(150000 + COALESCE(s2.s, 0) AS BIGINT) AS r
       FROM n LEFT JOIN s2 ON s2.node = n.node),
s3 AS (SELECT e.dst AS node,
              CAST(sum((r2.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r2 ON r2.node = e.src
       GROUP BY e.dst),
r3 AS (SELECT n.node, CAST(150000 + COALESCE(s3.s, 0) AS BIGINT) AS r
       FROM n LEFT JOIN s3 ON s3.node = n.node)
SELECT node, r AS rank_micro FROM r3
""",
        "near_dup_triangles": """
WITH p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.30)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM p e1 JOIN p e2 ON e1.vb = e2.va
JOIN p e3 ON e3.va = e1.va AND e3.vb = e2.vb
""",
        "top_docs_by_tokens": """
SELECT CAST(row_number() OVER (ORDER BY len(string_split(text, ' ')) DESC,
                               doc_id) AS BIGINT) AS rank,
       doc_id,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
ORDER BY n_tokens DESC, doc_id
LIMIT 20
""",
        "events_range_join": """
SELECT a.event_id AS a_event_id, b.event_id AS b_event_id
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800 * 1000000
""",
        "events_asof_join": """
SELECT a.event_id, a.user_id,
       CAST(epoch_us(b.ts) AS BIGINT) AS matched_ts_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
""",
        "events_tumbling": """
SELECT event_type,
       CAST(floor(epoch(ts)/3600) AS BIGINT) AS window,
       count(value) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 1, 2
""",
        "events_sliding": """
WITH e AS (SELECT event_type, CAST(floor(epoch(ts)/900) AS BIGINT) AS base
           FROM events)
SELECT event_type, CAST(base - off AS BIGINT) AS window_slot,
       count(*) AS n_events
FROM e, unnest(range(0, 4)) AS t(off)
GROUP BY 1, 2
""",
        "events_sessions": """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, count(*) AS n_events,
       CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions
FROM g GROUP BY user_id
""",
        "image_features": """
SELECT doc_id, 8 + doc_id % 32 AS width, 8 + doc_id % 16 AS height,
       doc_id % 251 AS mean_pixel
FROM documents
""",
        "frame_sample": """
SELECT doc_id, f AS frame_idx
FROM documents, unnest(range(0, 8 + doc_id % 8, 4)) AS t(f)
""",
        # uniform-fill payload resized nearest-neighbor stays uniform, so
        # the metadata oracle is pure arithmetic (the resize KERNEL is
        # exercised on non-uniform arrays in tests/test_multimodal_ext.py)
        "image_resize": """
SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       doc_id % 251 AS mean_pixel
FROM documents
""",
        "audio_features": """
WITH s AS (SELECT doc_id, 1000 + doc_id % 500 AS n FROM documents),
v AS (SELECT doc_id, n, ((doc_id*31 + i*7) % 997) - 498 AS x
      FROM s, unnest(range(0, n)) AS t(i))
SELECT doc_id, count(*) AS n_samples,
       max(abs(x)) AS peak,
       CAST(sum(x*x) // count(*) AS BIGINT) AS energy_mean
FROM v GROUP BY doc_id, n
""",
        "token_count_quantiles": """
WITH c AS (SELECT len(string_split(text, ' ')) AS v FROM documents),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS total FROM c),
q AS (SELECT CAST(unnest([250, 500, 750, 900]) AS BIGINT) AS q_permille)
SELECT q.q_permille,
       (SELECT min(v) FROM r, n
        WHERE rn >= ceil(q.q_permille * n.total / 1000.0)) AS value
FROM q
""",
        # deterministic Knuth-hash bucket, identical arithmetic to
        # corpus.hash_bucket (HUGEINT keeps the product exact, matching
        # numpy uint64 — both below 2^64 after the mod-2^32 pre-fold)
        "hash_sample": """
SELECT doc_id,
       CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 % 1000 AS BIGINT) AS bucket
FROM documents
WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      % 4294967296 % 1000 < 125
""",
        "train_test_split": """
SELECT lang,
       CASE WHEN (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                 % 4294967296 % 1000 < 900
            THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
""",
        "dedup_keep_best": """
SELECT text_hash, doc_id, n_chars FROM (
  SELECT md5(text) AS text_hash, doc_id, n_chars,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn = 1
""",
        "top_bigrams": """
WITH l AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1]))
           AS bigram
       FROM l WHERE len(toks) >= 2)
SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, bigram) AS BIGINT)
           AS rank,
       bigram, count(*) AS n_occurrences
FROM bg GROUP BY bigram ORDER BY n_occurrences DESC, bigram LIMIT 20
""",
        # integer tf*1e6//df score — same floor division both engines, so
        # the ranking (and hash) is exact; ties break by term ascending
        # reference main.py:229-241: identifier || '\n' per VALIDATED row
        # (validated == identifier found in this offline fixture), joined
        # in deterministic url order
        "clip_identifiers": f"""
WITH d AS ({_D}),
r AS (SELECT {_URL} AS url, {_IDENTIFIER} AS identifier FROM d)
SELECT COALESCE(string_agg(identifier || chr(10), '' ORDER BY url), '')
       AS clip_text
FROM r WHERE identifier IS NOT NULL
""",
        # md5-token simhash: bit j of each token hash is
        # (hv >> (63-j)) & 1 with hv = first 8 md5 digest bytes big-endian,
        # exactly np.unpackbits order (stages/dedup.py simhash64)
        "simhash": """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
h AS (SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (hv >> (63 - b)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b
),
v AS (SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN 1::UBIGINT << b
                      ELSE 0::UBIGINT END) AS raw
      FROM bits GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(v.raw >> 1, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
""",
        # winnowing (Schleimer et al.): base-257 byte 5-gram polynomial,
        # window-8 sliding min, first-occurrence dedup — ascii(substr())
        # equals the byte value because the documents texts are pure ASCII
        # (asserted by tests/test_oracle_parity.py)
        "winnow_fingerprints": """
WITH pos AS (
  SELECT doc_id, text, CAST(t.i AS BIGINT) AS i
  FROM documents, unnest(range(0, len(text) - 4)) AS t(i)
),
h AS (
  SELECT doc_id, i,
         ascii(substr(text, CAST(i+1 AS INT), 1)) * 4362470401
       + ascii(substr(text, CAST(i+2 AS INT), 1)) * 16974593
       + ascii(substr(text, CAST(i+3 AS INT), 1)) * 66049
       + ascii(substr(text, CAST(i+4 AS INT), 1)) * 257
       + ascii(substr(text, CAST(i+5 AS INT), 1)) AS hv,
         COUNT(*) OVER (PARTITION BY doc_id) AS m
  FROM pos
),
wins AS (
  SELECT doc_id, i,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mv
  FROM h WHERE m > 8
),
firsts AS (
  SELECT doc_id, mv, MIN(i) AS fi FROM wins WHERE i >= 7 GROUP BY doc_id, mv
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY fi) - 1
            AS BIGINT) AS seq,
       mv AS fingerprint
FROM firsts
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS seq, MIN(hv) AS fingerprint
FROM h WHERE m <= 8 GROUP BY doc_id
""",
        # word 5-grams, md5 63-bit hash, first occurrence by (doc, pos)
        # encoding wins — DuckDB list slice is 1-based inclusive
        "dup_ngram_spans": """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(tk[CAST(t.i+1 AS INT):CAST(t.i+5 AS INT)],
                         ' ') AS gram
  FROM toks, unnest(range(0, len(tk) - 4)) AS t(i)
),
h AS (
  SELECT doc_id, pos,
         CAST((('0x' || substr(md5(gram), 1, 16))::UBIGINT >> 1)
              AS BIGINT) AS gram_hash,
         doc_id * 1048576 + pos AS enc
  FROM g
)
SELECT doc_id, pos, gram_hash,
       enc = MIN(enc) OVER (PARTITION BY gram_hash) AS keep
FROM h
""",
        # the rewrite over the span flags: token j is removed iff some
        # non-first gram occurrence [i, i+5) covers it
        "remove_dup_spans": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(tk[CAST(t.i+1 AS INT):CAST(t.i+5 AS INT)],
                         ' ') AS gram
  FROM toks, unnest(range(0, len(tk) - 4)) AS t(i)
),
h AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(gram), 1, 16))::UBIGINT AS gh,
         doc_id * 1048576 + pos AS enc
  FROM g
),
flags AS (
  SELECT doc_id, pos,
         (enc = MIN(enc) OVER (PARTITION BY gh)) AS keep FROM h
),
tokrows AS (
  SELECT doc_id, CAST(t.j AS BIGINT) AS j, tk[CAST(t.j+1 AS INT)] AS tok
  FROM toks, unnest(range(0, len(tk))) AS t(j)
),
marked AS (
  SELECT tr.doc_id, tr.j, tr.tok,
         COALESCE(BOOL_OR(NOT f.keep), FALSE) AS dup
  FROM tokrows tr LEFT JOIN flags f
    ON f.doc_id = tr.doc_id AND f.pos BETWEEN tr.j - 4 AND tr.j
  GROUP BY tr.doc_id, tr.j, tr.tok
)
SELECT doc_id,
       COALESCE(string_agg(tok, ' ' ORDER BY j) FILTER (WHERE NOT dup),
                '') AS text_deduped,
       CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT) AS n_removed
FROM marked GROUP BY doc_id
""",
        "host_blocklist_filter": f"""
WITH d AS ({_D})
SELECT {_URL} AS url, lang,
       'site' || site || '.example.org' AS host
FROM d WHERE site NOT IN ('7', '19', '23', '41')
""",
        # integer linear model over hashed token buckets — bit-exact
        "quality_model_scores": """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 16))::UBIGINT % 64
              AS BIGINT) AS bucket
  FROM toks
),
s AS (SELECT doc_id, SUM((bucket * 37 + 11) % 64 - 32) AS score
      FROM b GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
       COALESCE(s.score, 0) > 0 AS keep
FROM documents d LEFT JOIN s USING (doc_id)
""",
        "shard_assignment": """
WITH h AS (
  SELECT doc_id,
         CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
               ::UBIGINT >> 1) AS BIGINT) AS shard_hash
  FROM documents
)
SELECT doc_id, shard_hash % 16 AS shard, shard_hash FROM h
""",
        "tfidf_top_terms": """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id, tf.term,
             CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score_scaled,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY (tf.tf * 1000000) // df.df DESC,
                                         tf.term) AS rn
      FROM tf JOIN df USING (term))
SELECT doc_id, term, score_scaled FROM s WHERE rn <= 3
""",
        "orders_customer_join": """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
        "lineitem_orders_join": """
SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
""",
        "top_docs_per_lang": """
WITH r AS (SELECT lang, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
SELECT lang, CAST(rank AS BIGINT) AS rank, n_chars, doc_id
FROM r WHERE rank <= 3
""",
        # integer milli-scaled value (one IEEE multiply + floor on both
        # sides) so the window sum is exact and order-independent
        "rolling_user_sum": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       CAST(SUM(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum
FROM e
""",
        "running_user_sum": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       CAST(SUM(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS roll_sum
FROM e
""",
        "distinct_users_per_type": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS ndv
FROM events GROUP BY 1
""",
        # same rank rule as token_count_quantiles, partitioned by lang
        "token_quantiles_by_lang": """
WITH c AS (SELECT lang, len(string_split(text, ' ')) AS v FROM documents),
r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY lang) AS total
      FROM c),
q AS (SELECT CAST(unnest([250, 500, 750, 900]) AS BIGINT) AS q_permille)
SELECT r.lang, q.q_permille, min(r.v) AS value
FROM r CROSS JOIN q
WHERE r.rn >= ceil(q.q_permille * r.total / 1000.0)
GROUP BY r.lang, q.q_permille
""",
        "funnel_conversion": """
WITH f AS (SELECT user_id, min(ts) AS first_ts
           FROM events WHERE event_type = 'click' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS conv_ts
      FROM events e JOIN f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f.first_ts
      GROUP BY e.user_id)
SELECT f.user_id,
       CAST(epoch_us(f.first_ts) AS BIGINT) AS first_ts_us,
       CAST(epoch_us(c.conv_ts) AS BIGINT) AS conv_ts_us,
       c.user_id IS NOT NULL AS converted
FROM f LEFT JOIN c ON c.user_id = f.user_id
""",
        "event_value_histogram": """
WITH e AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
b AS (SELECT CASE WHEN vm < 0 THEN -1
                  WHEN vm >= 100000 THEN 20
                  ELSE vm * 20 // 100000 END AS bin FROM e),
bins AS (SELECT CAST(g AS BIGINT) - 1 AS bin
         FROM UNNEST(range(22)) AS t(g)),
cnt AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bin)
SELECT bins.bin,
       CAST(CASE WHEN bins.bin < 0 THEN -9223372036854775808
                 ELSE bins.bin * 100000 // 20 END AS BIGINT)
           AS bin_lo_milli,
       CAST(CASE WHEN bins.bin >= 20 THEN 9223372036854775807
                 ELSE (bins.bin + 1) * 100000 // 20 END AS BIGINT)
           AS bin_hi_milli,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM bins LEFT JOIN cnt USING (bin)
""",
        "events_pivot": """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id
""",
        "customer_orders_left_join": """
SELECT c_custkey, c_name, o_orderkey, o_orderstatus
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
        # both sides run Unicode NFC + RE2 — byte-identical by construction
        "normalize_text": """
WITH n AS (SELECT doc_id,
       regexp_replace(regexp_replace(lower(nfc_normalize(text)),
                                     '\\s+', ' ', 'g'),
                      '^ | $', '', 'g') AS norm_text
FROM documents)
SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
FROM n
""",
        # src-url + link injection mirrors _q_host_link_graph.inject; host
        # extraction mirrors skew._hosts_vec's two regex kernels
        "host_link_graph": """
WITH src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
e AS (SELECT regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS src_host,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host
      FROM l)
SELECT src_host, dst_host, count(*) AS n_links
FROM e GROUP BY src_host, dst_host
""",
        # link injection mirrors _q_extract_links.inject; the grammar is
        # the provably split-equivalent one in corpus.LINK_OPEN/LINK_BODY
        "extract_links": """
WITH src AS (SELECT doc_id,
       text || ' <a href="https://s' || CAST(doc_id % 5 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc'
            || CAST(doc_id AS VARCHAR) || '</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT doc_id,
             regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1) AS hs,
             regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 2) AS an
      FROM src)
SELECT doc_id, CAST(g AS BIGINT) AS link_pos,
       hs[g + 1] AS href, an[g + 1] AS anchor
FROM l, UNNEST(range(len(hs))) AS t(g)
""",
        # banner injection + the gopher_quality rule CTEs + the keep-first
        # line-dedup CTEs, chained: the gate filters src before chunking
        "curate_v2": """
WITH src AS (SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN 'breaking news subscribe now cookie policy accept all terms of service follow us on social media' || ' ' || text
            ELSE text END AS text
       FROM documents),
t AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws,
             string_split(text, chr(10)) AS ls
      FROM src),
m AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                  AS BIGINT) AS sum_len,
             CAST(len(list_filter(ws,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(ws, x -> x IN ('the','be','to','of','and',
                  'that','have','with'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(replace(text, '#', ''))
                  AS BIGINT) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_ell,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '^[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '\\.\\.\\.$')))
                  AS BIGINT) AS n_ell_line
      FROM t),
keepers AS (
  SELECT doc_id FROM m
  WHERE n_words BETWEEN 50 AND 100000
    AND (CASE WHEN n_words > 0
              THEN sum_len * 1000 // n_words ELSE 0 END)
        BETWEEN 3000 AND 10000
    AND (CASE WHEN n_words > 0
              THEN (n_hash + n_ell) * 1000 // n_words ELSE 0 END) <= 100
    AND (CASE WHEN n_lines > 0
              THEN n_bullet * 1000 // n_lines ELSE 0 END) <= 100
    AND (CASE WHEN n_lines > 0
              THEN n_ell_line * 1000 // n_lines ELSE 0 END) <= 300
    AND (CASE WHEN n_words > 0
              THEN n_alpha * 1000 // n_words ELSE 0 END) >= 800
    AND n_stop >= 2),
ktoks AS (SELECT s.doc_id,
                 list_filter(string_split(s.text, ' '), x -> x <> '') AS ts
          FROM src s JOIN keepers k ON k.doc_id = s.doc_id),
chunks AS (SELECT doc_id, g AS pos,
                  array_to_string(ts[(g*16+1):(g*16+16)], ' ') AS line
           FROM ktoks,
                UNNEST(range(CAST(ceil(len(ts) / 16.0) AS BIGINT))) AS t(g)),
firsts AS (SELECT doc_id, pos, line,
                  row_number() OVER (PARTITION BY line
                                     ORDER BY doc_id, pos) AS rn
           FROM chunks)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY pos) AS text,
       CAST(count(*) AS BIGINT) AS n_lines_kept
FROM firsts WHERE rn = 1 GROUP BY doc_id
""",
        # global token positions via a cumulative window over doc_id order
        "pack_sequences": """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
starts AS (SELECT doc_id, ts,
                  COALESCE(SUM(len(ts)) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS start
           FROM toks),
tok AS (SELECT start + g AS pos, ts[g + 1] AS token
        FROM starts, UNNEST(range(len(ts))) AS t(g))
SELECT CAST(pos // 32 AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(token, ' ' ORDER BY pos) AS text
FROM tok GROUP BY 1
""",
        # vocab = top-100 target tokens (n_tgt desc, token asc tie-break);
        # permilles are floor divisions over non-negative sums; the per-doc
        # sum never divides, so negative scores are exact on both sides
        "dsir_scores": """
WITH tok AS (SELECT doc_id, t.x AS token
             FROM documents,
                  UNNEST(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS t(x)),
cnt AS (SELECT token,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE doc_id % 9 = 0) AS BIGINT)
                   AS n_tgt
        FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS ta,
               CAST(sum(n_tgt) AS BIGINT) AS tt FROM cnt),
voc AS (SELECT token,
               (n_tgt * 1000 // GREATEST(tt, 1))
               - (n_all * 1000 // GREATEST(ta, 1)) AS diff
        FROM cnt, tot
        QUALIFY row_number() OVER (ORDER BY n_tgt DESC, token) <= 100),
per AS (SELECT tok.doc_id, CAST(SUM(COALESCE(voc.diff, 0)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS nt
        FROM tok LEFT JOIN voc ON voc.token = tok.token
        GROUP BY tok.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.nt, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.s, 0) AS BIGINT) AS dsir_score
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
""",
        # the previous-snapshot construction mirrors _q_crawl_diff.mk_prev
        "crawl_diff": """
WITH prev AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' old' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
),
c AS (SELECT doc_id, md5(text) AS h FROM documents),
p AS (SELECT doc_id, md5(text) AS h FROM prev)
SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
       CASE WHEN p.doc_id IS NULL THEN 'added'
            WHEN c.doc_id IS NULL THEN 'removed'
            WHEN c.h = p.h THEN 'unchanged'
            ELSE 'changed' END AS status
FROM c FULL OUTER JOIN p ON c.doc_id = p.doc_id
""",
        # every rate is an exact integer permille with floor division over
        # non-negative ints on both sides; '...' counts are non-overlapping
        # left-to-right in replace() and count_substring alike
        "gopher_quality": """
WITH t AS (SELECT doc_id, text,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws,
                  string_split(text, chr(10)) AS ls
           FROM documents),
m AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                  AS BIGINT) AS sum_len,
             CAST(len(list_filter(ws,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(ws, x -> x IN ('the','be','to','of','and',
                  'that','have','with'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(replace(text, '#', ''))
                  AS BIGINT) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_ell,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '^[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '\\.\\.\\.$')))
                  AS BIGINT) AS n_ell_line
      FROM t),
p AS (SELECT doc_id, n_words,
             CASE WHEN n_words > 0
                  THEN sum_len * 1000 // n_words ELSE 0 END
                  AS mean_word_len_milli,
             CASE WHEN n_words > 0
                  THEN (n_hash + n_ell) * 1000 // n_words ELSE 0 END
                  AS symbol_permille,
             CASE WHEN n_words > 0
                  THEN n_alpha * 1000 // n_words ELSE 0 END
                  AS alpha_word_permille,
             CASE WHEN n_lines > 0
                  THEN n_bullet * 1000 // n_lines ELSE 0 END
                  AS bullet_line_permille,
             CASE WHEN n_lines > 0
                  THEN n_ell_line * 1000 // n_lines ELSE 0 END
                  AS ellipsis_line_permille,
             n_stop AS n_stop_hits
      FROM m)
SELECT doc_id, n_words,
       CAST(mean_word_len_milli AS BIGINT) AS mean_word_len_milli,
       CAST(symbol_permille AS BIGINT) AS symbol_permille,
       CAST(alpha_word_permille AS BIGINT) AS alpha_word_permille,
       CAST(bullet_line_permille AS BIGINT) AS bullet_line_permille,
       CAST(ellipsis_line_permille AS BIGINT) AS ellipsis_line_permille,
       n_stop_hits,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len_milli BETWEEN 3000 AND 10000
        AND symbol_permille <= 100
        AND bullet_line_permille <= 100
        AND ellipsis_line_permille <= 300
        AND alpha_word_permille >= 800
        AND n_stop_hits >= 2) AS keep
FROM p
""",
        # integer-milli mean with floor division on both sides (sums are
        # non-negative, so DuckDB // == pyarrow truncating divide)
        "host_quality_filter": """
WITH s AS (SELECT source,
                  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT)
                  AS avg_milli
           FROM documents GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN s ON s.source = d.source
WHERE s.avg_milli >= 300000
""",
        # banner injection, 16-token chunking, and keep-first rule all
        # mirror the Ray side (_banner_docs / corpus.dedup_lines_keep_first)
        "line_dedup_keep_first": """
WITH src AS (SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN 'breaking news subscribe now cookie policy accept all terms of service follow us on social media' || ' ' || text
            ELSE text END AS text
       FROM documents),
toks AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS ts
         FROM src),
chunks AS (SELECT doc_id, g AS pos,
                  array_to_string(ts[(g*16+1):(g*16+16)], ' ') AS line
           FROM toks,
                UNNEST(range(CAST(ceil(len(ts) / 16.0) AS BIGINT))) AS t(g)),
firsts AS (SELECT doc_id, pos, line,
                  row_number() OVER (PARTITION BY line
                                     ORDER BY doc_id, pos) AS rn
           FROM chunks)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY pos) AS text,
       CAST(count(*) AS BIGINT) AS n_lines_kept
FROM firsts WHERE rn = 1 GROUP BY doc_id
""",
        # PII injection expression and redaction regex chain both mirror
        # the Ray side (_pii_docs / stages/textnorm.redact_pii); DuckDB and
        # pyarrow both run RE2, so replacement is byte-identical
        "pii_redaction": """
WITH p AS (SELECT doc_id,
       text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
            || CAST(doc_id % 7 AS VARCHAR) || '.example.com or +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-99 from '
            || CAST(doc_id % 256 AS VARCHAR) || '.10.0.1' AS t
       FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
           '<EMAIL>', 'g'),
           '\\+\\d[\\d-]{7,14}\\d', '<PHONE>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
           '<IP>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
           AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\+\\d[\\d-]{7,14}\\d'))
           AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t,
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
           AS BIGINT) AS n_ips
FROM p
""",
        # input construction and regex chain both mirror the Ray side
        "canonical_urls": """
WITH u AS (
  SELECT CASE doc_id % 4
    WHEN 0 THEN 'HTTP://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.Example.ORG:80/p/' || CAST(doc_id AS VARCHAR) || '#frag'
    WHEN 1 THEN 'https://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org:443/'
    WHEN 2 THEN 'http://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org/A/B?q=' || CAST(doc_id AS VARCHAR) || '#x'
    ELSE 'https://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org:8443/path/' || CAST(doc_id AS VARCHAR)
  END AS url
  FROM documents),
s AS (SELECT url, regexp_replace(url, '(?s)#.*$', '') AS nofrag FROM u),
p AS (SELECT url,
             regexp_replace(regexp_replace(
                 lower(regexp_replace(nofrag,
                     '(?s)^([^/]*://[^/]*).*$', '\\1')),
                 '^(http://[^/:]*):80$', '\\1'),
                 '^(https://[^/:]*):443$', '\\1') AS prefix,
             CASE WHEN regexp_matches(nofrag, '^[^/]*://')
                  THEN regexp_replace(nofrag, '^[^/]*://[^/]*', '')
                  ELSE '' END AS suffix
      FROM s)
SELECT url,
       regexp_replace(prefix || suffix, '(?s)^([^/]*://[^/]*)/$', '\\1')
           AS canonical_url
FROM p
""",
        # same url construction + canonicalization chain, then keyed dedup
        "dedup_canonical_urls": """
WITH u AS (
  SELECT doc_id, CASE doc_id % 4
    WHEN 0 THEN 'HTTP://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.Example.ORG:80/p/' || CAST(doc_id AS VARCHAR) || '#frag'
    WHEN 1 THEN 'https://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org:443/'
    WHEN 2 THEN 'http://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org/A/B?q=' || CAST(doc_id AS VARCHAR) || '#x'
    ELSE 'https://Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org:8443/path/' || CAST(doc_id AS VARCHAR)
  END AS url
  FROM documents),
s AS (SELECT doc_id, regexp_replace(url, '(?s)#.*$', '') AS nofrag FROM u),
p AS (SELECT doc_id,
             regexp_replace(regexp_replace(
                 lower(regexp_replace(nofrag,
                     '(?s)^([^/]*://[^/]*).*$', '\\1')),
                 '^(http://[^/:]*):80$', '\\1'),
                 '^(https://[^/:]*):443$', '\\1') AS prefix,
             CASE WHEN regexp_matches(nofrag, '^[^/]*://')
                  THEN regexp_replace(nofrag, '^[^/]*://[^/]*', '')
                  ELSE '' END AS suffix
      FROM s),
c AS (SELECT doc_id,
             regexp_replace(prefix || suffix, '(?s)^([^/]*://[^/]*)/$',
                            '\\1') AS canonical_url
      FROM p)
SELECT canonical_url, min(doc_id) AS doc_id
FROM c GROUP BY canonical_url
""",
        # complement of the hash_sample bucket predicate (same HUGEINT
        # arithmetic) — rows NOT in the simulated previous crawl
        "new_docs_anti_join": """
SELECT doc_id, lang FROM documents
WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      % 4294967296 % 1000 >= 125
""",
        # nonempty-token convention (matches tfidf/top_bigrams oracles)
        "inverted_index_stats": """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM tf GROUP BY term
""",
        # same count + quantile definitions as token_count_quantiles
        "long_docs_above_p90": """
WITH c AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
r AS (SELECT n_tokens AS v, row_number() OVER (ORDER BY n_tokens) AS rn
      FROM c),
n AS (SELECT count(*) AS total FROM c),
t AS (SELECT min(v) AS thr FROM r, n
      WHERE rn >= ceil(900 * n.total / 1000.0))
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM c, t WHERE n_tokens > t.thr
""",
        "events_sorted_head": """
SELECT event_id, ts, user_id, event_type
FROM events ORDER BY ts, event_id LIMIT 1000
""",
        # quality predicate verbatim from the quality_flags oracle, then
        # exact-dedup survivors among the kept rows (n_tokens via Min over
        # the dup group — equal texts ⇒ equal counts)
        "curate_corpus": """
WITH t AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','and','of','to','is','it'))) AS n_stopwords
  FROM documents),
q AS (SELECT * FROM t
      WHERE n_tokens >= 20 AND n_stopwords*1000 >= 50*n_tokens)
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id,
       CAST(min(n_tokens) AS BIGINT) AS n_tokens
FROM q GROUP BY md5(text)
""",
        # grouped exact quantiles over the milli grid; same rank
        # definition as the global quantile oracles
        "value_quantiles_by_type": """
WITH c AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
r AS (SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      FROM c),
n AS (SELECT event_type, count(*) AS total FROM c GROUP BY event_type),
q AS (SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille)
SELECT n.event_type, q.q_permille,
       (SELECT min(v) FROM r
        WHERE r.event_type = n.event_type
          AND rn >= ceil(q.q_permille * n.total / 1000.0)) AS value
FROM n, q
""",
        # CUBE adds the (., parity) cross-slice to the ROLLUP levels
        "events_cube": """
WITH e AS (SELECT event_type,
                  CASE WHEN user_id % 2 = 1 THEN 'odd' ELSE 'even' END
                      AS parity
           FROM events)
SELECT event_type, parity, count(*) AS n
FROM e GROUP BY CUBE(event_type, parity)
""",
        # LEAD over the milli-scaled value; NULL for each user's last event
        "lead_user_value": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       LEAD(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS lead_vm
FROM e
""",
        # LAG over the milli-scaled value; NULL for each user's first event
        "lag_user_value": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       LAG(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_vm
FROM e
""",
        "percent_rank_user_value": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) % 100 AS k
           FROM events)
SELECT event_id, user_id,
       CAST(((RANK() OVER (PARTITION BY user_id ORDER BY k)) - 1) * 1000
            // GREATEST(COUNT(*) OVER (PARTITION BY user_id) - 1, 1)
            AS BIGINT) AS pr_permille
FROM e
""",
        "cume_dist_user_value": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) % 100 AS k
           FROM events)
SELECT event_id, user_id,
       CAST(1000 * COUNT(*) OVER (PARTITION BY user_id ORDER BY k
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            // COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
           AS cume_permille
FROM e
""",
        "ntile_user": """
WITH e AS (SELECT event_id, user_id, ts FROM events)
SELECT event_id, user_id,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS tile
FROM e
""",
        "first_value_user": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       FIRST_VALUE(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS first_vm
FROM e
""",
        "last_value_user": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       LAST_VALUE(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_vm
FROM e
""",
        "user_event_paths": """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
""",
        "user_mode_event_type": """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id, event_type),
r AS (SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT user_id, event_type, n AS n_events FROM r WHERE rk = 1
""",
        "rank_user_value": """
WITH e AS (SELECT event_id, user_id,
                  CAST(floor(value * 1000) AS BIGINT) % 100 AS k
           FROM events)
SELECT event_id, user_id,
       CAST(RANK() OVER (PARTITION BY user_id ORDER BY k) AS BIGINT) AS rnk
FROM e
""",
        "dense_rank_user_value": """
WITH e AS (SELECT event_id, user_id,
                  CAST(floor(value * 1000) AS BIGINT) % 100 AS k
           FROM events)
SELECT event_id, user_id,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY k) AS BIGINT)
           AS drnk
FROM e
""",
        "row_number_user": """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS rn
FROM events
""",
        # one-pass multi-level aggregate; NULLs mark subtotal / grand-total
        # rows exactly like SQL ROLLUP
        "events_rollup": """
WITH e AS (SELECT event_type,
                  CASE WHEN user_id % 2 = 1 THEN 'odd' ELSE 'even' END
                      AS parity
           FROM events)
SELECT event_type, parity, count(*) AS n
FROM e GROUP BY ROLLUP(event_type, parity)
""",
        # same Knuth-hash arithmetic as hash_sample/uniform_sample, negated
        # because the engine's grouped top-k orders DESC
        "stratified_sample_by_lang": """
WITH h AS (SELECT lang, doc_id,
       -CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
             % 4294967296 AS BIGINT) AS neg_priority
FROM documents),
r AS (SELECT lang, doc_id, neg_priority,
             row_number() OVER (PARTITION BY lang
                 ORDER BY neg_priority DESC, doc_id) AS rank
      FROM h)
SELECT lang, CAST(rank AS BIGINT) AS rank, neg_priority, doc_id
FROM r WHERE rank <= 20
""",
        # exact in this regime (m=256 ≥ 31-term vocabulary ⇒ Misra-Gries
        # never compresses ⇒ err_bound 0); ties break (count desc, token asc)
        "heavy_hitter_tokens": """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS est_count FROM tok GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY est_count DESC, token) AS BIGINT)
           AS rank,
       token AS value, est_count, CAST(0 AS BIGINT) AS err_bound
FROM c ORDER BY est_count DESC, token LIMIT 20
""",
        # micro-scaled integer vector mean; sign-correct floor division
        # spelled out (numpy // floors, DuckDB // truncates)
        "embedding_centroids": """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vm
  FROM embeddings, range(1, 65) t(i)),
g AS (SELECT label, dim, CAST(sum(vm) AS BIGINT) AS s, count(*) AS n
      FROM u GROUP BY label, dim)
SELECT label, dim,
       CAST(CASE WHEN s >= 0 THEN s // n
                 ELSE -(((-s) + n - 1) // n) END AS BIGINT) AS centroid_micro,
       n
FROM g
""",
        # milli-quantized exact histogram quantiles: same quantile
        # definition as token_count_quantiles over floor(value*1000)
        "event_value_quantiles": """
WITH c AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS total FROM c),
q AS (SELECT CAST(unnest([250, 500, 750, 900]) AS BIGINT) AS q_permille)
SELECT q.q_permille,
       (SELECT min(v) FROM r, n
        WHERE rn >= ceil(q.q_permille * n.total / 1000.0)) AS value
FROM q
""",
        # deterministic Bernoulli keep with p = min(n_tokens, 200)/200,
        # drawn from the same Knuth-hash arithmetic — no RNG on either side
        "weighted_sample": """
WITH c AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
h AS (SELECT doc_id, n_tokens,
             CAST(least(n_tokens, 200) AS BIGINT) AS weight,
             CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                  % 4294967296 AS BIGINT) AS hv
      FROM c)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, weight
FROM h WHERE hv % 200 < weight
""",
        # exactly-k smallest Knuth-hash priorities (same HUGEINT
        # arithmetic as hash_sample), ties by doc_id
        "uniform_sample": """
WITH h AS (SELECT doc_id,
       CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 AS BIGINT) AS priority
FROM documents)
SELECT CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT)
           AS rank,
       doc_id, priority
FROM h ORDER BY priority, doc_id LIMIT 25
""",
        "sample_intersect": """
WITH a AS (SELECT doc_id FROM documents
           WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                 % 4294967296 % 1000 < 125),
b AS (SELECT doc_id FROM documents
      WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 % 200
            < least(len(string_split(text, ' ')), 200))
SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b
""",
        "sample_except": """
WITH a AS (SELECT doc_id FROM documents
           WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                 % 4294967296 % 1000 < 125),
b AS (SELECT doc_id FROM documents
      WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 % 200
            < least(len(string_split(text, ' ')), 200))
SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b
""",
        "repetition_filter": """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
      FROM t, UNNEST(range(1, len(toks))) AS r(i)),
c AS (SELECT doc_id, bigram, count(*) AS cnt FROM g GROUP BY doc_id, bigram),
m AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_cnt,
             CAST(sum(cnt) AS BIGINT) AS n_bi
      FROM c GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(m.n_bi, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(m.top_cnt, 0) AS BIGINT) AS top_bigram_count,
       CAST(COALESCE((1000 * m.top_cnt) // m.n_bi, 0) AS BIGINT)
           AS top_bigram_permille,
       COALESCE((1000 * m.top_cnt) // m.n_bi, 0) < 180 AS keep
FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
""",
        "contamination": """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
g AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
      FROM t, UNNEST(range(1, len(toks) - 6)) AS r(i)),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
h AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n
      FROM g JOIN b USING (gram)
      WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
WHERE d.doc_id % 97 <> 0
""",
        "passage_windows": """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents)
SELECT doc_id, CAST(g AS BIGINT) AS window_idx,
       CAST(g * 16 AS BIGINT) AS window_start,
       array_to_string(ts[(g*16+1):(g*16+32)], ' ') AS passage
FROM toks,
     UNNEST(range(CASE WHEN len(ts) = 0 THEN 0
                       ELSE (GREATEST(len(ts) - 32, 0) + 15) // 16 + 1
                  END)) AS t(g)
""",
        "oov_rate": """
WITH toks AS (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS token
              FROM documents),
v AS (SELECT token FROM (
        SELECT token, count(*) AS n FROM toks GROUP BY token
        ORDER BY n DESC, token ASC LIMIT 50)),
per AS (SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (
                    WHERE t.token NOT IN (SELECT token FROM v))
                    AS BIGINT) AS oov
        FROM toks t GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(1000 * per.oov // per.n_tokens, 0) AS BIGINT)
           AS oov_permille
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
""",
        "remove_boilerplate_lines": """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
chunks AS (SELECT doc_id, g AS chunk_idx,
                  array_to_string(ts[(g*16+1):(g*16+16)], ' ') AS line
           FROM toks,
                UNNEST(range(CAST(ceil(len(ts) / 16.0) AS BIGINT))) AS t(g)),
common AS (SELECT line FROM chunks
           GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT c.doc_id, c.chunk_idx, c.line,
                c.line IN (SELECT line FROM common) AS is_common
         FROM chunks c)
SELECT t.doc_id,
       COALESCE(string_agg(k.line, chr(10) ORDER BY k.chunk_idx)
                FILTER (WHERE NOT k.is_common), '') AS text,
       CAST(count(*) FILTER (WHERE k.is_common) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
GROUP BY t.doc_id
""",
        # milli-scaled integer statistics (repo floor(value*1000)
        # convention); integer // mean — sums are non-negative here so
        # DuckDB truncation == numpy floor
        "events_type_summary": """
WITH e AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_type, count(*) AS n,
       CAST(sum(vm) AS BIGINT) AS sum_milli,
       min(vm) AS min_milli, max(vm) AS max_milli,
       CAST(sum(vm) // count(*) AS BIGINT) AS avg_milli
FROM e GROUP BY event_type
""",
        # knn_lsh / knn_ivf / kmeans / KLL / CM / SemDeDup: approximate or
        # non-SQL-expressible → rows-only driver check (documented).
    }
    # the distributed decontamination variant computes the SAME result as
    # the broadcast one by a different physical plan — one shared oracle
    sql["contamination_distributed"] = sql["contamination"]
    # same rule, no-broadcast physical plan — one shared oracle
    sql["remove_boilerplate_distributed"] = sql["remove_boilerplate_lines"]
    sql["embedding_dedup_prune_distributed"] = sql["embedding_dedup_prune"]
    # same m >= vocabulary exact regime, tree-merged physical plan
    sql["heavy_hitter_tokens_tree"] = sql["heavy_hitter_tokens"]
    # round 4: the md5 minhash family is SQL-recomputable END-TO-END —
    # 63-bit md5 shingle hash, 64 affine signatures over the 32-bit fold,
    # md5 band digests, star-capped candidate pairs, and the exact
    # floor-permille Jaccard verify all mirror in DuckDB.  The (a, b)
    # coefficients below are the engine's published family constants
    # (RandomState(42); tests/golden_impl.py carries the same spec).
    from pdf2doi_ray.stages.dedup import _A, _B, MAX_ALL_PAIRS_BUCKET
    perm_rows = ",".join(f"({k},{int(a)},{int(b)})"
                         for k, (a, b) in enumerate(zip(_A, _B)))
    sql["minhash_near_dups"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
sh0 AS (
  SELECT doc_id,
         array_to_string(tk[CAST(t.i+1 AS INT):CAST(t.i+3 AS INT)],
                         ' ') AS g
  FROM toks, unnest(range(0, len(tk) - 2)) AS t(i)
  UNION ALL
  SELECT doc_id, array_to_string(tk, ' ') AS g
  FROM toks WHERE len(tk) BETWEEN 1 AND 2
),
sh AS (
  SELECT DISTINCT doc_id,
         CAST((('0x' || substr(md5(g), 1, 16))::UBIGINT >> 1)
              AS BIGINT) AS h
  FROM sh0
),
perm AS (SELECT * FROM (VALUES {perm_rows}) AS p(k, a, b)),
sig AS (
  SELECT d.doc_id, p.k,
         CAST(COALESCE(MIN((CAST(p.a AS UBIGINT)
                            * CAST(s.h & 4294967295 AS UBIGINT)
                            + CAST(p.b AS UBIGINT))
                           % CAST(4294967311 AS UBIGINT)),
                       9223372036854775807) AS BIGINT) AS s
  FROM documents d CROSS JOIN perm p LEFT JOIN sh s ON s.doc_id = d.doc_id
  GROUP BY d.doc_id, p.k
),
band AS (
  SELECT doc_id, CAST(k // 4 AS BIGINT) AS band,
         substr(md5(string_agg(s::VARCHAR, ':' ORDER BY k)), 1, 16)
           AS digest
  FROM sig GROUP BY doc_id, k // 4
),
bsize AS (
  SELECT band, digest, COUNT(*) AS n, MIN(doc_id) AS mn
  FROM band GROUP BY band, digest
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT b1.doc_id AS doc_a, b2.doc_id AS doc_b
    FROM band b1
    JOIN band b2 ON b1.band = b2.band AND b1.digest = b2.digest
               AND b1.doc_id < b2.doc_id
    JOIN bsize z ON z.band = b1.band AND z.digest = b1.digest
    WHERE z.n <= {MAX_ALL_PAIRS_BUCKET}
    UNION ALL
    SELECT z.mn AS doc_a, b.doc_id AS doc_b
    FROM band b JOIN bsize z ON z.band = b.band AND z.digest = b.digest
    WHERE z.n > {MAX_ALL_PAIRS_BUCKET} AND b.doc_id > z.mn
  )
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
ix AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
  GROUP BY c.doc_a, c.doc_b
),
scored AS (
  SELECT c.doc_a, c.doc_b, COALESCE(i.i, 0) AS i,
         COALESCE(ca.n, 0) + COALESCE(cb.n, 0) - COALESCE(i.i, 0) AS u
  FROM cand c
  LEFT JOIN ix i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
  LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(CASE WHEN u > 0 THEN (1000 * i) // u ELSE 1000 END
            AS BIGINT) AS jaccard_permille
FROM scored
WHERE (CASE WHEN u > 0 THEN (1000 * i) // u ELSE 1000 END) >= 800
"""
    # end-to-end composition over the SAME SQL pair set: components by
    # recursive reachability, keep the min-id representative per cluster
    sql["minhash_dedup_prune"] = f"""
WITH RECURSIVE pairs AS ({sql["minhash_near_dups"]}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id FROM documents d
LEFT JOIN comp c ON c.node = d.doc_id
WHERE c.node IS NULL OR c.component = d.doc_id
"""
    # HLL register state: bucket = top 12 bits of the md5-64 hash, rank =
    # 1 + leading zeros of the remaining 52 bits (tail padded with ones so
    # rank caps at 53); (hv % 2^52) * 4096 + 4095 == (hv << 12) | 0xFFF
    # without the shift-overflow, and bit-length via bin() stays integer
    sql["hll_registers_hosts"] = f"""
WITH d AS ({_D}),
hosts AS (SELECT DISTINCT 'site' || site || '.example.org' AS host FROM d),
h AS (SELECT ('0x' || substr(md5(host), 1, 16))::UBIGINT AS hv FROM hosts),
r AS (SELECT CAST(hv >> 52 AS BIGINT) AS bucket,
             (hv % 4503599627370496) * 4096 + 4095 AS rest FROM h)
SELECT bucket,
       CAST(MAX(65 - length(ltrim(bin(rest), '0'))) AS BIGINT) AS register
FROM r GROUP BY bucket
"""
    # interchange-format round trips: the oracle is the IDENTITY — the
    # engine result must equal the source rows exactly, proving the
    # JSONL/CSV sink+source pair is lossless
    sql["jsonl_roundtrip"] = \
        "SELECT doc_id, text, lang, n_chars FROM documents"
    sql["csv_roundtrip"] = \
        "SELECT doc_id, text, lang, n_chars FROM documents"
    sql["orc_roundtrip"] = \
        "SELECT doc_id, text, lang, n_chars FROM documents"
    # exact integer moment statistics: the variance division runs through
    # HUGEINT (the n·Σvm² product outgrows BIGINT exactly where the engine
    # switches to Python ints); covariance emits NUMERATORS only, so no
    # division/rounding exists to mismatch
    sql["event_value_variance"] = """
WITH e AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vm) AS BIGINT) AS sum_milli,
             CAST(SUM(vm * vm) AS BIGINT) AS sumsq_millisq
      FROM e GROUP BY event_type)
SELECT event_type, n, sum_milli, sumsq_millisq,
       CAST((n::HUGEINT * sumsq_millisq::HUGEINT
             - sum_milli::HUGEINT * sum_milli::HUGEINT)
            // (n::HUGEINT * n::HUGEINT) AS BIGINT) AS var_microsq
FROM g
"""
    sql["chars_tokens_moments"] = """
WITH t AS (SELECT length(text) AS x,
                  len(string_split(text, ' ')) AS y FROM documents),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             CAST(SUM(x * x) AS BIGINT) AS sum_xx,
             CAST(SUM(y * y) AS BIGINT) AS sum_yy
      FROM t)
SELECT n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
       CAST(n::HUGEINT * sum_xy::HUGEINT
            - sum_x::HUGEINT * sum_y::HUGEINT AS BIGINT) AS cov_num,
       CAST(n::HUGEINT * sum_xx::HUGEINT
            - sum_x::HUGEINT * sum_x::HUGEINT AS BIGINT) AS varx_num,
       CAST(n::HUGEINT * sum_yy::HUGEINT
            - sum_y::HUGEINT * sum_y::HUGEINT AS BIGINT) AS vary_num
FROM m
"""
    # simhash near-dups: fully SQL-expressible now the simhash itself is
    # (md5 token hashes) — band slices by shift/mask (same width split as
    # stages/dedup.simhash_near_dups), candidates by a banded self-join,
    # verify by DuckDB-native xor + bit_count, pair-dedup by DISTINCT
    n_bands, total_bits, max_ham = 4, 63, 3        # max_hamming=3 default
    base_w = total_bits // n_bands
    widths = [base_w + (1 if i < total_bits % n_bands else 0)
              for i in range(n_bands)]
    shifts = [sum(widths[:i]) for i in range(n_bands)]
    band_case = " ".join(
        f"WHEN {i} THEN (simhash >> {shifts[i]}) & {(1 << widths[i]) - 1}"
        for i in range(n_bands))
    sql["simhash_near_dups"] = f"""
WITH s AS ({sql["simhash"]}),
b AS (
  SELECT doc_id, simhash, g.band,
         CASE g.band {band_case} END AS bv
  FROM s, (SELECT unnest(range({n_bands})) AS band) g
),
cand AS (
  SELECT DISTINCT b1.doc_id AS pair_a, b2.doc_id AS pair_b,
         b1.simhash AS sa, b2.simhash AS sb
  FROM b b1 JOIN b b2 ON b1.band = b2.band AND b1.bv = b2.bv
            AND b1.doc_id < b2.doc_id
)
SELECT pair_a, pair_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_ham}
"""
    # winsorize: the same 1-based ceil-rank quantile rule as
    # event_value_quantiles, applied twice, then a scalar clamp
    sql["winsorize_event_values"] = """
WITH c AS (SELECT user_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
r AS (SELECT vm, row_number() OVER (ORDER BY vm) AS rn FROM c),
n AS (SELECT count(*) AS total FROM c),
lo AS (SELECT min(vm) AS v FROM r, n
       WHERE rn >= ceil(50 * n.total / 1000.0)),
hi AS (SELECT min(vm) AS v FROM r, n
       WHERE rn >= ceil(950 * n.total / 1000.0))
SELECT c.user_id, c.vm AS value_milli,
       least(greatest(c.vm, lo.v), hi.v) AS value_winsorized_milli
FROM c, lo, hi
"""
    # cohort retention: epoch-µs week buckets (non-negative → truncation
    # == floor), distinct activity, min week per user, join, count
    sql["cohort_retention"] = """
WITH a AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
           FROM events),
f AS (SELECT user_id, MIN(week) AS cohort FROM a GROUP BY user_id)
SELECT f.cohort AS cohort_week,
       a.week - f.cohort AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""
    # MAD: the same ceil-rank median rule applied twice — once on vm,
    # once on |vm − median|
    sql["mad_event_values"] = """
WITH c AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
n AS (SELECT count(*) AS total FROM c),
r AS (SELECT vm, row_number() OVER (ORDER BY vm) AS rn FROM c),
med AS (SELECT min(vm) AS v FROM r, n
        WHERE rn >= ceil(500 * n.total / 1000.0)),
d AS (SELECT abs(c.vm - med.v) AS dv FROM c, med),
rd AS (SELECT dv, row_number() OVER (ORDER BY dv) AS rn FROM d),
mad AS (SELECT min(dv) AS v FROM rd, n
        WHERE rn >= ceil(500 * n.total / 1000.0))
SELECT med.v AS median_milli, mad.v AS mad_milli FROM med, mad
"""
    # vocabulary: whitespace tokens, (count desc, token asc) rank − 1
    sql["vocab_top_tokens"] = """
WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS token
             FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY token)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) - 1
            AS BIGINT) AS token_id,
       token, n_occurrences
FROM cnt ORDER BY token_id LIMIT 100
"""
    # balanced sample: the shared Knuth-bucket arithmetic with a
    # per-group threshold
    sql["lang_balanced_sample"] = """
SELECT doc_id, lang AS "group",
       CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 % 1000 AS BIGINT) AS bucket
FROM documents
WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      % 4294967296 % 1000
      < CASE lang WHEN 'en' THEN 250 WHEN 'fr' THEN 500 ELSE 1000 END
"""
    # Count-Min, recomputed register-for-register: row j buckets a value
    # at md5('cm'||j||':'||v) first-8-bytes-BE % 1024; a register's sum is
    # the exact total count of every value hashing there, and the point
    # estimate is the min over the 4 rows — including the sketch's
    # over-estimates, which the oracle reproduces bit-for-bit
    sql["event_type_freqs_cm"] = """
WITH cnt AS (SELECT event_type AS v, count(*) AS c
             FROM events GROUP BY event_type),
j AS (SELECT CAST(g AS INT) AS j FROM UNNEST(range(4)) t(g)),
reg AS (SELECT j.j,
               ('0x' || substr(md5('cm' || j.j || ':' || cnt.v), 1, 16))
                   ::UBIGINT % 1024 AS b,
               SUM(cnt.c) AS s
        FROM cnt, j GROUP BY j.j, b),
probes AS (SELECT * FROM (VALUES ('click'), ('view'), ('purchase'),
                                 ('signup'), ('error'),
                                 ('never-seen-type')) p(v)),
pb AS (SELECT p.v, j.j,
              ('0x' || substr(md5('cm' || j.j || ':' || p.v), 1, 16))
                  ::UBIGINT % 1024 AS b
       FROM probes p, j)
SELECT pb.v AS value, CAST(MIN(COALESCE(reg.s, 0)) AS BIGINT) AS est_count
FROM pb LEFT JOIN reg ON pb.j = reg.j AND pb.b = reg.b
GROUP BY pb.v
"""
    # wide→long melt; DuckDB length() counts code points = Arrow
    # utf8_length
    sql["melt_doc_stats"] = """
SELECT doc_id, 'n_chars' AS stat, n_chars AS value FROM documents
UNION ALL
SELECT doc_id, 'n_text_chars' AS stat,
       CAST(length(text) AS BIGINT) AS value FROM documents
"""
    # weighted bottom-k sample: the shared Knuth fold scaled by weight;
    # HUGEINT keeps h*1000 exact, // truncates = floors (non-negative)
    sql["weighted_sample_k"] = """
WITH h AS (SELECT doc_id, n_chars AS weight,
       CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
            % 4294967296 * 1000 // n_chars AS BIGINT) AS priority
FROM documents WHERE n_chars > 0)
SELECT CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT)
           AS rank,
       doc_id, weight, priority
FROM h ORDER BY priority, doc_id LIMIT 25
"""
    # per-doc type-token ratio; // on BIGINT floors like numpy's //
    sql["lexical_diversity"] = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tk
             FROM documents),
c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT tk) AS BIGINT) AS n_types
      FROM tok WHERE tk <> '' GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(c.n_tokens, 0) AS n_tokens,
       coalesce(c.n_types, 0) AS n_types,
       CASE WHEN coalesce(c.n_tokens, 0) > 0
            THEN 1000 * c.n_types // c.n_tokens ELSE 0 END AS ttr_permille
FROM documents d LEFT JOIN c USING (doc_id)
"""
    # link injection mirrors _q_anchor_text_index.inject; grammar +
    # host extraction are the proven extract_links/host_link_graph CTEs
    sql["anchor_text_index"] = """
WITH src AS (SELECT doc_id,
       text || ' <a href="https://s' || CAST(doc_id % 5 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR)
            || '">guide topic' || CAST(doc_id % 13 AS VARCHAR)
            || ' part' || CAST(doc_id % 3 AS VARCHAR) || '</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR)
                         || '">hub home page'
                         || CAST(doc_id % 2 AS VARCHAR) || '</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1) AS hs,
             regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 2) AS an
      FROM src),
p AS (SELECT hs[g + 1] AS href, an[g + 1] AS anchor
      FROM l, UNNEST(range(len(hs))) AS t(g)),
e AS (SELECT regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host,
             UNNEST(string_split(anchor, ' ')) AS term
      FROM p),
c AS (SELECT dst_host, term, CAST(count(*) AS BIGINT) AS n_mentions
      FROM e WHERE term <> '' GROUP BY dst_host, term),
r AS (SELECT dst_host, term, n_mentions,
             row_number() OVER (PARTITION BY dst_host
                 ORDER BY n_mentions DESC, term) AS rk
      FROM c)
SELECT dst_host, CAST(rk AS BIGINT) AS rank, n_mentions, term
FROM r WHERE rk <= 8
"""
    # Q3-style: revenue as floor(price*(1-disc)*1000) — the same two IEEE
    # double multiplies + floor the numpy kernel runs, so the int64 sum is
    # bit-exact on both sides
    sql["shipping_priority"] = """
WITH li AS (SELECT l_orderkey,
       CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000.0)
            AS BIGINT) AS rev
      FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-15'),
o AS (SELECT o_orderkey,
             CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                 AS o_date_days,
             o_orderpriority
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-06-15'
        AND o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')),
g AS (SELECT o_orderkey, o_date_days, o_orderpriority,
             CAST(sum(rev) AS BIGINT) AS revenue_milli
      FROM li JOIN o ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_date_days, o_orderpriority)
SELECT CAST(row_number() OVER (ORDER BY revenue_milli DESC, o_orderkey)
            AS BIGINT) AS rank,
       o_orderkey, revenue_milli, o_date_days, o_orderpriority
FROM g ORDER BY revenue_milli DESC, o_orderkey LIMIT 10
"""
    # unit-cost edit distance; DuckDB's levenshtein is the same DP the
    # numpy kernel runs (dedup._levenshtein)
    sql["edit_distance_adjacent"] = """
SELECT a.doc_id,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_next
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""
    # same floor(price·(1−disc)·1000) int64 revenue kernel as
    # shipping_priority — bit-identical IEEE ops in numpy and DuckDB
    sql["local_supplier_revenue"] = """
WITH li AS (SELECT l_orderkey, l_suppkey,
       CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000.0)
            AS BIGINT) AS rev
      FROM lineitem)
SELECT n_name, CAST(sum(rev) AS BIGINT) AS revenue_milli
FROM li
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_milli DESC, n_name
"""
    # 63-bit md5 key convention shared with shard_assignment / the
    # minhash family; doc_id tie-break makes the permutation total
    sql["seeded_shuffle"] = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY
            ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 16))
                ::UBIGINT >> 1,
            doc_id) - 1 AS BIGINT) AS position
FROM documents
"""
    sql["revenue_by_part_type"] = """
SELECT p_type,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000.0)
                     AS BIGINT)) AS BIGINT) AS revenue_milli,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
GROUP BY p_type
ORDER BY revenue_milli DESC, p_type
"""
    # gaps-and-islands over the dup_ngram_spans flags: spans merge iff
    # they overlap or touch (gap <= 5 tokens)
    sql["merge_dup_spans"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(tk[CAST(t.i+1 AS INT):CAST(t.i+5 AS INT)],
                         ' ') AS gram
  FROM toks, unnest(range(0, len(tk) - 4)) AS t(i)
),
h AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(gram), 1, 16))::UBIGINT AS gh,
         doc_id * 1048576 + pos AS enc
  FROM g
),
dupe AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, enc = MIN(enc) OVER (PARTITION BY gh) AS keep
    FROM h) WHERE NOT keep
),
flag AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) <= 5
              THEN 0 ELSE 1 END AS brk
  FROM dupe
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flag
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 5 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""
    # same IEEE association order as the numpy kernel:
    # price·(1−disc), then ·(1+tax); averages are integer floor divisions
    sql["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 1000.0) AS BIGINT))
            AS BIGINT) AS sum_base_milli,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                           * 1000.0) AS BIGINT)) AS BIGINT)
           AS sum_disc_milli,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                           * (1.0 + l_tax) * 1000.0) AS BIGINT))
            AS BIGINT) AS sum_charge_milli,
       CAST(sum(CAST(l_quantity AS BIGINT)) * 1000 // count(*)
            AS BIGINT) AS avg_qty_permille,
       CAST(sum(CAST(floor(l_extendedprice * 1000.0) AS BIGINT))
            // count(*) AS BIGINT) AS avg_base_milli,
       CAST(sum(CAST(floor(l_discount * 1000.0) AS BIGINT)) // count(*)
            AS BIGINT) AS avg_disc_permille,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
    sql["forecast_revenue"] = """
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * l_discount
                                    * 1000.0) AS BIGINT)), 0) AS BIGINT)
           AS revenue_milli,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""
    # same Knuth-hash arithmetic as the hash_sample oracle (full 32-bit
    # priority, no permille fold)
    sql["host_quota_sample"] = """
WITH h AS (
  SELECT source, doc_id,
         CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
              % 4294967296 AS BIGINT) AS priority
  FROM documents)
SELECT source,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY priority, doc_id) AS BIGINT)
           AS rank,
       doc_id, priority
FROM h
QUALIFY rank <= 5
ORDER BY source, rank
"""
    # exact rational threshold: qty < sum/(5·cnt) ⟺ qty·5·cnt < sum
    sql["small_quantity_revenue"] = """
WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_brand = 'Brand#1')),
st AS (SELECT l_partkey AS k, CAST(sum(l_quantity) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS c
       FROM bl GROUP BY l_partkey)
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * 1000.0)
                              AS BIGINT)), 0) AS BIGINT)
           AS total_price_milli,
       CAST(count(*) AS BIGINT) AS n_items
FROM bl JOIN st ON l_partkey = k
WHERE CAST(l_quantity AS BIGINT) * 5 * c < s
"""
    sql["top_supplier_revenue"] = """
WITH rev AS (SELECT l_suppkey,
                    CAST(sum(CAST(floor(l_extendedprice
                                        * (1.0 - l_discount) * 1000.0)
                                  AS BIGINT)) AS BIGINT) AS revenue_milli
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate <  TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name, revenue_milli
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE revenue_milli = (SELECT max(revenue_milli) FROM rev)
ORDER BY s_suppkey
"""
    # same RE2-compatible pattern as the engine kernel; '' → NULL → missing
    sql["json_field_stats"] = r"""
WITH x AS (
  SELECT event_type,
         TRY_CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1),
                         '') AS BIGINT) AS v
  FROM events)
SELECT event_type,
       CAST(count(v) AS BIGINT) AS n_present,
       CAST(count(*) - count(v) AS BIGINT) AS n_missing,
       CAST(coalesce(sum(v), 0) AS BIGINT) AS sum_field,
       CAST(min(v) AS BIGINT) AS min_field,
       CAST(max(v) AS BIGINT) AS max_field
FROM x GROUP BY event_type ORDER BY event_type
"""
    sql["returned_item_customers"] = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                             * 1000.0) AS BIGINT)) AS BIGINT)
             AS revenue_milli
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name,
       CAST(floor(c_acctbal * 100.0) AS BIGINT) AS acctbal_c,
       revenue_milli
FROM rev JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_milli DESC, c_custkey LIMIT 20
"""
    sql["nation_pair_volume"] = """
SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                           * 1000.0) AS BIGINT)) AS BIGINT)
           AS revenue_milli
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n_s ON n_s.n_nationkey = s_nationkey
JOIN nation n_c ON n_c.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND n_s.n_name IN ('NATION_8', 'NATION_15')
  AND n_c.n_name IN ('NATION_8', 'NATION_15')
  AND n_s.n_name <> n_c.n_name
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""
    sql["order_priority_semi"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    sql["order_count_distribution"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey,
             CAST(count(o.o_custkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""
    sql["large_volume_orders"] = """
WITH big AS (SELECT l_orderkey,
                    CAST(sum(l_quantity) AS BIGINT) AS total_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity) > 300)
SELECT c_name, c_custkey, o_orderkey,
       CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
           AS o_date_days,
       CAST(floor(o_totalprice * 1000.0) AS BIGINT) AS totalprice_milli,
       total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice_milli DESC, o_orderkey LIMIT 100
"""
    sql["returnflag_priority_counts"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""
    # exact integer-cents rational comparison: bal·n_pos > sum_pos avoids
    # float division on both sides of the hash
    sql["idle_rich_customers"] = """
WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                  CAST(floor(c_acctbal * 100.0) AS BIGINT) AS b
           FROM customer),
st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(b) AS BIGINT) AS s
       FROM c WHERE b > 0)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(b) AS BIGINT) AS total_acctbal_c
FROM c, st
WHERE c.b * st.n > st.s
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""
    # same md5-first-8-bytes gram hash family as dup_ngram_spans; permille
    # is integer floor division so the hash is exact
    sql["doc_dup_gram_fraction"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(tk[CAST(t.i+1 AS INT):CAST(t.i+5 AS INT)],
                         ' ') AS gram
  FROM toks, unnest(range(0, len(tk) - 4)) AS t(i)
),
h AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(gram), 1, 16))::UBIGINT AS gh,
         doc_id * 1048576 + pos AS enc
  FROM g
),
f AS (
  SELECT doc_id, enc = MIN(enc) OVER (PARTITION BY gh) AS keep
  FROM h
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) * 1000 // count(*)
            AS BIGINT) AS dup_permille
FROM f GROUP BY doc_id ORDER BY doc_id
"""
    sql["event_transitions"] = """
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY from_type, nxt
"""
    sql["event_type_cooccurrence"] = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY type_a, type_b
"""
    sql["interval_coverage"] = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts)
           + CAST(floor(value * 1000) AS BIGINT) * 100000 AS e
  FROM events WHERE CAST(floor(value * 1000) AS BIGINT) > 0),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pm
  FROM iv)
SELECT user_id,
       CAST(sum(greatest(e - greatest(s, coalesce(pm, s)), 0))
            AS BIGINT) AS covered_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM w GROUP BY user_id
"""
    sql["group_split_stats"] = """
SELECT lang,
       CASE WHEN ('0x' || substr(md5(source), 1, 16))::UBIGINT
                 % 1000 < 900
            THEN 'train' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang, split
"""
    sql["ngram_diversity"] = """
WITH l AS (SELECT lang,
                  list_filter(string_split(text, ' '), x -> x <> '')
                      AS toks
           FROM documents),
g AS (SELECT lang,
             unnest(list_transform(
                 range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 AS gram
      FROM l WHERE len(toks) >= 3)
SELECT lang, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT ('0x' || substr(md5(gram), 1, 16))::UBIGINT)
            AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT ('0x' || substr(md5(gram), 1, 16))::UBIGINT)
            * 1000 // count(*) AS BIGINT) AS distinct_permille
FROM g GROUP BY lang
"""
    # Morton interleave written out bit-by-bit (x on odd bits, y on even)
    _zbits = " + ".join(
        f"(((x >> {k}) & 1) << {2 * k + 1}) + (((y >> {k}) & 1) << {2 * k})"
        for k in range(16))
    sql["zorder_layout"] = f"""
WITH e AS (SELECT event_id, user_id % 65536 AS x,
                  CAST(floor(value * 1000) AS BIGINT) % 65536 AS y
           FROM events)
SELECT event_id, x AS x16, y AS y16,
       CAST({_zbits} AS BIGINT) AS zkey
FROM e
"""
    sql["lang_confusion"] = f"""
WITH p AS ({sql["lang_id"]})
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, pred_lang
"""
    sql["inverted_index"] = """
WITH tk AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS token
  FROM documents),
d AS (SELECT DISTINCT token, doc_id FROM tk),
r AS (SELECT token, doc_id,
             row_number() OVER (PARTITION BY token ORDER BY doc_id)
                 AS rn,
             count(*) OVER (PARTITION BY token) AS df
      FROM d)
SELECT token, CAST(max(df) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY token
"""
    sql["flesch_readability"] = """
WITH c AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split(text, ' '),
                                  x -> x <> '')), 1) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
  FROM documents)
SELECT doc_id, CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(syl AS BIGINT) AS n_syllables,
       CAST(206835 - (1015 * (w * 1000 // s)) // 1000
                   - (84600 * (syl * 1000 // w)) // 1000
            AS BIGINT) AS flesch_milli
FROM c
"""
    # same 1-based ceil-rank quantile rule as winsorize_event_values,
    # per event_type, then integer Tukey fences
    sql["iqr_outlier_filter"] = """
WITH c AS (SELECT event_id, event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
r AS (SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm)
                 AS rn,
             count(*) OVER (PARTITION BY event_type) AS total FROM c),
q1 AS (SELECT event_type, min(vm) AS v FROM r
       WHERE rn >= ceil(250 * total / 1000.0) GROUP BY event_type),
q3 AS (SELECT event_type, min(vm) AS v FROM r
       WHERE rn >= ceil(750 * total / 1000.0) GROUP BY event_type),
b AS (SELECT q1.event_type,
             q1.v - (1500 * (q3.v - q1.v)) // 1000 AS lo,
             q3.v + (1500 * (q3.v - q1.v)) // 1000 AS hi
      FROM q1 JOIN q3 USING (event_type))
SELECT c.event_id, c.event_type, c.vm AS value_milli
FROM c JOIN b USING (event_type)
WHERE c.vm BETWEEN b.lo AND b.hi
"""
    sql["cooccurrence_lift"] = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
nt AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n
       FROM d GROUP BY event_type),
tot AS (SELECT CAST(count(DISTINCT user_id) AS HUGEINT) AS n FROM d),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS HUGEINT) AS n_ab
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY type_a, type_b)
SELECT p.type_a, p.type_b,
       CAST(p.n_ab AS BIGINT) AS n_users_both,
       CAST((p.n_ab * tot.n * 1000) // (na.n * nb.n) AS BIGINT)
           AS lift_permille
FROM p, tot
JOIN nt na ON na.event_type = p.type_a
JOIN nt nb ON nb.event_type = p.type_b
"""
    sql["fuzzy_token_pairs"] = """
WITH tk AS (SELECT DISTINCT source AS tok FROM documents)
SELECT a.tok AS token_a, b.tok AS token_b
FROM tk a JOIN tk b
  ON a.tok < b.tok AND levenshtein(a.tok, b.tok) = 1
"""
    # curate v3: the curate_v2 Gopher keepers fragment on plain
    # documents + the Flesch floor + the md5(source) train gate, then
    # keep-first text dedup
    sql["curate_v3"] = """
WITH t AS (SELECT doc_id, source, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws,
             string_split(text, chr(10)) AS ls
      FROM documents),
m AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                  AS BIGINT) AS sum_len,
             CAST(len(list_filter(ws,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(ws, x -> x IN ('the','be','to','of','and',
                  'that','have','with'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(replace(text, '#', ''))
                  AS BIGINT) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_ell,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '^[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(ls,
                  x -> regexp_matches(x, '\\.\\.\\.$')))
                  AS BIGINT) AS n_ell_line
      FROM t),
fl AS (SELECT doc_id,
              greatest(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 1) AS w,
              greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
              len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
       FROM documents),
keep AS (
  SELECT t.doc_id, t.text FROM t
  JOIN m USING (doc_id) JOIN fl USING (doc_id)
  WHERE m.n_words BETWEEN 50 AND 100000
    AND (CASE WHEN m.n_words > 0
              THEN m.sum_len * 1000 // m.n_words ELSE 0 END)
        BETWEEN 3000 AND 10000
    AND (CASE WHEN m.n_words > 0
              THEN (m.n_hash + m.n_ell) * 1000 // m.n_words ELSE 0 END)
        <= 100
    AND (CASE WHEN m.n_lines > 0
              THEN m.n_bullet * 1000 // m.n_lines ELSE 0 END) <= 100
    AND (CASE WHEN m.n_lines > 0
              THEN m.n_ell_line * 1000 // m.n_lines ELSE 0 END) <= 300
    AND (CASE WHEN m.n_words > 0
              THEN m.n_alpha * 1000 // m.n_words ELSE 0 END) >= 800
    AND m.n_stop >= 2
    AND 206835 - (1015 * (fl.w * 1000 // fl.s)) // 1000
              - (84600 * (fl.syl * 1000 // fl.w)) // 1000 >= 10000
    AND ('0x' || substr(md5(t.source), 1, 16))::UBIGINT % 1000 < 900)
SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS doc_id
FROM keep GROUP BY md5(text)
"""
    sql["hll_registers_by_lang"] = """
WITH d AS (SELECT DISTINCT lang, source FROM documents),
h AS (SELECT lang,
             ('0x' || substr(md5(source), 1, 16))::UBIGINT AS hv FROM d),
r AS (SELECT lang, CAST(hv >> 52 AS BIGINT) AS bucket,
             (hv % 4503599627370496) * 4096 + 4095 AS rest FROM h)
SELECT lang, bucket,
       CAST(MAX(65 - length(ltrim(bin(rest), '0'))) AS BIGINT) AS register
FROM r GROUP BY lang, bucket
"""
    sql["banned_phrase_filter"] = """
SELECT doc_id, n_chars FROM documents
WHERE NOT (text LIKE '%batch batch batch%'
        OR text LIKE '%slow slow%'
        OR text LIKE '%dup dup%')
"""
    sql["union_by_name"] = """
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
UNION ALL BY NAME
SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1
"""
    # pages recompute: host = site-of-doc, fetch second = k (EPOCH + k s)
    sql["host_crawl_gaps"] = f"""
WITH d AS ({_D}),
p AS (SELECT 'site' || site || '.example.org' AS host, k FROM d),
g AS (SELECT host,
             k - lag(k) OVER (PARTITION BY host ORDER BY k) AS gap
      FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(min(gap) AS BIGINT) AS min_gap_s,
       CAST(max(gap) AS BIGINT) AS max_gap_s
FROM g GROUP BY host
"""
    sql["dedup_url_daily"] = f"""
WITH d AS ({_D}),
v AS (SELECT {_URL} AS url, 1735689600 + k AS s FROM d
      UNION ALL
      SELECT {_URL} AS url, 1735689600 + k + 86000 AS s FROM d)
SELECT url, CAST(s // 86400 AS BIGINT) AS day,
       CAST(min(s) AS BIGINT) AS first_ts_s,
       CAST(count(*) AS BIGINT) AS n_visits
FROM v GROUP BY url, s // 86400
"""
    sql["resolve_redirects"] = """
WITH RECURSIVE
h AS (SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 16))::UBIGINT AS hv
      FROM documents),
e AS (SELECT doc_id AS src,
             greatest(doc_id - 1 - CAST(hv % 7 AS BIGINT), 0) AS dst
      FROM h WHERE doc_id > 0 AND hv % 5 <> 0),
walk AS (
    SELECT src, dst AS cur, 1 AS n FROM e
    UNION ALL
    SELECT w.src, e.dst, w.n + 1 FROM walk w JOIN e ON w.cur = e.src)
SELECT src, CAST(cur AS BIGINT) AS final, CAST(n AS BIGINT) AS n_hops
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.cur)
"""
    sql["rolling_time_sum"] = """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       CAST(SUM(vm) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING AND CURRENT ROW)
            AS BIGINT) AS range_sum
FROM e
"""
    sql["token_budget_head"] = """
WITH c AS (SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
       ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 16))::UBIGINT
           >> 1 AS skey
  FROM documents),
w AS (SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY skey, doc_id) AS cum FROM c)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tok
FROM w WHERE cum <= 100000
"""
    sql["bucketed_join"] = """
SELECT l_orderkey, l_linenumber, l_quantity, o_custkey
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""
    sql["robots_disallow_filter"] = f"""
WITH d AS ({_D}),
p AS (SELECT {_URL} AS url, lang,
             'site' || site || '.example.org' AS host,
             CAST(site AS INTEGER) AS site_no FROM d)
SELECT url, lang, host FROM p
WHERE NOT (site_no % 3 = 0
           AND regexp_replace(url, '^https?://[^/]+', '') LIKE '/docs/10.%')
"""
    sql["equi_depth_histogram"] = """
WITH c AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT count(*) AS total FROM c),
i AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS i),
e AS (SELECT i.i, (SELECT min(v) FROM r, n
                   WHERE rn >= ceil(i.i * n.total / 4.0)) AS edge FROM i),
b AS (SELECT c.v,
             1 + (SELECT count(*) FROM e WHERE e.edge < c.v) AS bucket
      FROM c)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(v) AS BIGINT) AS v_min, CAST(max(v) AS BIGINT) AS v_max
FROM b GROUP BY bucket
"""
    sql["group_token_budget"] = """
WITH c AS (SELECT doc_id, lang AS grp,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
       ('0x' || substr(md5('budget:' || doc_id::VARCHAR), 1, 16))::UBIGINT
           >> 1 AS skey
  FROM documents),
w AS (SELECT doc_id, grp, n_tok,
             SUM(n_tok) OVER (PARTITION BY grp
                              ORDER BY skey, doc_id) AS cum FROM c)
SELECT doc_id, grp, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum AS BIGINT) AS cum_tok
FROM w
WHERE (grp = 'en' AND cum <= 5000) OR (grp = 'de' AND cum <= 2000)
   OR (grp = 'es' AND cum <= 10000) OR (grp = 'zh' AND cum <= 1)
"""
    sql["salted_join"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""
    sql["percentile_transform"] = """
WITH c AS (SELECT event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
n AS (SELECT count(*) AS total FROM c)
SELECT event_id, vm AS value_milli,
       CAST((1000 * count(*) OVER (ORDER BY vm)) // n.total AS BIGINT)
           AS permille
FROM c, n
"""
    sql["compact_roundtrip"] = "SELECT * FROM documents"
    sql["cdc_apply"] = """
WITH l AS (SELECT event_id % 500 AS k, event_id AS seq,
                  CASE WHEN value < 20 THEN 'D' ELSE 'U' END AS op,
                  event_type AS payload FROM events),
r AS (SELECT k, seq, op, payload,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM l)
SELECT k, seq, payload FROM r WHERE rn = 1 AND op <> 'D'
"""
    sql["tumbling_distinct_users"] = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""
    sql["warc_roundtrip"] = f"""
WITH d AS ({_D})
SELECT {_URL} AS url, CAST(1735689600 + k AS BIGINT) AS secs FROM d
"""
    sql["moved_pages"] = f"""
WITH d AS ({_D})
SELECT {_URL} AS old_url, {_URL} || '?moved' AS new_url
FROM d WHERE k % 9 = 0 AND k % 13 <> 0
"""
    sql["zscore_outliers"] = """
WITH c AS (SELECT event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
m AS (SELECT count(*) AS n, sum(vm) AS s,
             sum(CAST(vm AS HUGEINT) * vm) AS q FROM c)
SELECT event_id, vm AS value_milli FROM c, m
WHERE CAST(n * vm - s AS HUGEINT) * (n * vm - s)
      > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
"""
    sql["bucketed_lookup"] = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderkey IN (3, 17, 42, 99, 256, 511, 777, 1024)
"""
    sql["market_share"] = """
WITH f AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000)
              AS BIGINT) AS rev,
         sn.n_name = 'NATION_2' AS is_t
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE o.o_orderdate >= DATE '1995-01-01'
    AND o.o_orderdate < DATE '1997-01-01')
SELECT o_year, CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS BIGINT)
           AS mkt_num,
       CAST(sum(rev) AS BIGINT) AS mkt_den
FROM f GROUP BY o_year
"""
    sql["jaccard_pairs_exact"] = """
WITH l AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '')
                      AS toks FROM documents),
g AS (SELECT DISTINCT doc_id,
             ('0x' || substr(md5(gram), 1, 16))::UBIGINT AS hv
      FROM (SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                            toks[i+2])) AS gram
            FROM l WHERE len(toks) >= 3)),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM g a JOIN g b ON a.hv = b.hv AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b, CAST(i AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i AS BIGINT) AS uni
FROM inter
JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
WHERE i * 1000 >= 500 * (sa.n + sb.n - i)
"""
    sql["bucketed_upsert"] = """
WITH changes AS (
  SELECT o_orderkey, o_custkey, o_totalprice + 11111.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 1000000, CAST(0 AS BIGINT), 1.0
  FROM orders WHERE o_orderkey % 500 = 0)
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice FROM changes
"""
    sql["source_skew_gini"] = """
WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
s AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS i,
             count(*) OVER () AS m, sum(cnt) OVER () AS tot FROM c)
SELECT CAST(max(m) AS BIGINT) AS n_keys,
       CAST(max(tot) AS BIGINT) AS total,
       CAST(sum((2 * i - m - 1) * cnt) AS BIGINT) AS gini_num,
       CAST(max(m) * max(tot) AS BIGINT) AS gini_den
FROM s
"""
    sql["pareto_orders"] = """
WITH o AS (SELECT o_orderkey,
                  CAST(floor(o_totalprice * 1000) AS BIGINT) AS price_milli,
                  epoch_us(o_orderdate) AS date_us FROM orders)
SELECT o_orderkey, price_milli, date_us FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.price_milli >= a.price_milli AND b.date_us <= a.date_us
    AND (b.price_milli > a.price_milli OR b.date_us < a.date_us))
"""
    sql["histogram_drift"] = """
WITH v AS (SELECT event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
e AS (SELECT min(vm) AS lo, max(vm) - min(vm) + 1 AS span FROM v),
t AS (SELECT event_id % 2 AS side,
             (vm - lo) * 16 // span AS bucket FROM v, e),
a AS (SELECT bucket, count(*) AS c FROM t WHERE side = 0 GROUP BY bucket),
b AS (SELECT bucket, count(*) AS c FROM t WHERE side = 1 GROUP BY bucket),
n AS (SELECT (SELECT sum(c) FROM a) AS na, (SELECT sum(c) FROM b) AS nb)
SELECT COALESCE(a.bucket, b.bucket) AS bucket,
       COALESCE(a.c, 0) AS cnt_a, COALESCE(b.c, 0) AS cnt_b,
       CAST(abs(COALESCE(a.c, 0) * nb - COALESCE(b.c, 0) * na)
            AS BIGINT) AS drift_num
FROM a FULL OUTER JOIN b ON a.bucket = b.bucket, n
"""
    # integer-exact BM25 (k1=1.2, b=0.75 folded into 22/10 and 3/4;
    # AVD = integer average doc length so no factor grows with corpus
    # size) — mirrors stages/retrieval.bm25_top_docs verbatim
    sql["bm25_top_docs"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
nd AS (SELECT count(*) AS nd FROM documents),
avd AS (SELECT GREATEST((SELECT count(*) FROM tok) // (SELECT nd FROM nd),
                        1) AS avd),
q(term) AS (VALUES ('hash'), ('join'), ('vector'), ('slow')),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
c AS (SELECT tf.doc_id,
             (nd.nd * 1000 // df.df) *
             (22 * tf.tf * avd.avd * 1000 //
              (10 * tf.tf * avd.avd + 3 * avd.avd + 9 * dl.dl)) // 1000
             AS contrib
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), nd, avd),
s AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_scaled
      FROM c GROUP BY 1 HAVING sum(contrib) > 0),
r AS (SELECT doc_id, score_scaled,
             row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rank
      FROM s)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, score_scaled
FROM r WHERE rank <= 20
"""
    # reciprocal-rank fusion of the (n_tokens desc) and (n_chars desc)
    # top-50 lists; integer reciprocal ranks (1e6 // (60 + rank))
    sql["rrf_fusion"] = """
WITH tok AS (SELECT doc_id,
                    len(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS n_tokens
             FROM documents),
a AS (SELECT doc_id, row_number() OVER
        (ORDER BY n_tokens DESC, doc_id) AS r FROM tok QUALIFY r <= 50),
b AS (SELECT doc_id, row_number() OVER
        (ORDER BY n_chars DESC, doc_id) AS r FROM documents
      QUALIFY r <= 50),
u AS (SELECT doc_id, 1000000 // (60 + r) AS rr FROM a
      UNION ALL SELECT doc_id, 1000000 // (60 + r) FROM b),
s AS (SELECT doc_id, CAST(sum(rr) AS BIGINT) AS rrf_scaled
      FROM u GROUP BY 1),
r AS (SELECT doc_id, rrf_scaled, row_number() OVER
        (ORDER BY rrf_scaled DESC, doc_id) AS rank FROM s)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, rrf_scaled
FROM r WHERE rank <= 20
"""
    # 2 unrolled HITS iterations over the host link graph (the
    # host_link_graph oracle is the edge CTE); every sweep is a weighted
    # sum max-normalized in integers — mirrors stages/graph.hits_fixed
    sql["hits_scores"] = """
WITH src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
e AS (SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
      FROM (SELECT regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS src_host,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host
            FROM l)
      GROUP BY 1, 2),
n AS (SELECT DISTINCT node FROM
        (SELECT src_host AS node FROM e
         UNION ALL SELECT dst_host FROM e)),
h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM n),
ar1 AS (SELECT e.dst_host AS node,
               CAST(sum(e.n_links * h0.s) AS BIGINT) AS v
        FROM e JOIN h0 ON h0.node = e.src_host GROUP BY 1),
a1 AS (SELECT n.node,
              CAST(COALESCE(ar1.v, 0) * 1000000 //
                   (SELECT max(v) FROM ar1) AS BIGINT) AS s
       FROM n LEFT JOIN ar1 USING (node)),
hr1 AS (SELECT e.src_host AS node,
               CAST(sum(e.n_links * a1.s) AS BIGINT) AS v
        FROM e JOIN a1 ON a1.node = e.dst_host GROUP BY 1),
h1 AS (SELECT n.node,
              CAST(COALESCE(hr1.v, 0) * 1000000 //
                   (SELECT max(v) FROM hr1) AS BIGINT) AS s
       FROM n LEFT JOIN hr1 USING (node)),
ar2 AS (SELECT e.dst_host AS node,
               CAST(sum(e.n_links * h1.s) AS BIGINT) AS v
        FROM e JOIN h1 ON h1.node = e.src_host GROUP BY 1),
a2 AS (SELECT n.node,
              CAST(COALESCE(ar2.v, 0) * 1000000 //
                   (SELECT max(v) FROM ar2) AS BIGINT) AS s
       FROM n LEFT JOIN ar2 USING (node)),
hr2 AS (SELECT e.src_host AS node,
               CAST(sum(e.n_links * a2.s) AS BIGINT) AS v
        FROM e JOIN a2 ON a2.node = e.dst_host GROUP BY 1),
h2 AS (SELECT n.node,
              CAST(COALESCE(hr2.v, 0) * 1000000 //
                   (SELECT max(v) FROM hr2) AS BIGINT) AS s
       FROM n LEFT JOIN hr2 USING (node))
SELECT h2.node, h2.s AS hub_scaled, a2.s AS auth_scaled
FROM h2 JOIN a2 ON a2.node = h2.node
"""
    # Q21-style sole-blame: sum(suppkey*late) IS the blamed supplier
    # exactly when n_late = 1 — mirrors stages/joins.waiting_suppliers
    sql["waiting_suppliers"] = """
WITH ls AS (SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS late
            FROM lineitem GROUP BY 1, 2),
per_o AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
                 sum(l_suppkey * late) AS late_supp
          FROM ls GROUP BY 1),
w AS (SELECT p.late_supp AS s_suppkey, count(*) AS numwait
      FROM per_o p JOIN orders o ON o.o_orderkey = p.l_orderkey
      WHERE o.o_orderstatus = 'F' AND p.n_supp >= 2 AND p.n_late = 1
      GROUP BY 1)
SELECT s.s_name, CAST(w.numwait AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey
ORDER BY numwait DESC, s.s_name
"""
    # positions are 1-based among NONEMPTY tokens — mirrors
    # stages/retrieval.proximity_cooccurrence
    sql["proximity_hash_join"] = """
WITH toks AS (SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     unnest(generate_series(1,
                         len(string_split(text, ' ')))) AS ord
              FROM documents),
nz AS (SELECT doc_id, tok,
              row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS p
       FROM toks WHERE tok <> ''),
d AS (SELECT a.doc_id, min(abs(a.p - b.p)) AS md
      FROM (SELECT doc_id, p FROM nz WHERE tok = 'hash') a
      JOIN (SELECT doc_id, p FROM nz WHERE tok = 'join') b
        USING (doc_id)
      GROUP BY 1)
SELECT doc_id, CAST(md AS BIGINT) AS min_dist FROM d WHERE md <= 3
"""
    # base-257 5-gram rolling hash, cut AFTER the gram where hash%16==0;
    # document edges are always boundaries — mirrors
    # stages/dedup.cdc_chunk_stats (texts are pure ASCII, pinned by
    # tests/test_oracle_parity.py, so substr == byte slice)
    sql["cdc_chunk_stats"] = """
WITH pos AS (SELECT doc_id, CAST(t.i AS BIGINT) i, text
             FROM documents, unnest(range(0, len(text) - 4)) t(i)),
h AS (SELECT doc_id, i,
         ascii(substr(text, CAST(i+1 AS INT), 1)) * 4362470401
       + ascii(substr(text, CAST(i+2 AS INT), 1)) * 16974593
       + ascii(substr(text, CAST(i+3 AS INT), 1)) * 66049
       + ascii(substr(text, CAST(i+4 AS INT), 1)) * 257
       + ascii(substr(text, CAST(i+5 AS INT), 1)) AS hv
      FROM pos),
cuts AS (SELECT doc_id, i + 5 AS cut FROM h WHERE hv % 16 = 0),
bl AS (SELECT doc_id, list_sort(list(cut)) AS cs FROM cuts GROUP BY 1),
ad AS (SELECT d.doc_id, d.text,
              list_distinct(list_prepend(CAST(0 AS BIGINT),
                  list_append(COALESCE(b.cs, []), len(d.text)))) AS raw
       FROM documents d LEFT JOIN bl b USING (doc_id)),
bnd AS (SELECT doc_id, text, list_sort(raw) AS b FROM ad),
ch AS (SELECT unnest(list_transform(range(2, len(b) + 1),
           j -> substr(text, CAST(b[j-1] + 1 AS INT),
                       CAST(b[j] - b[j-1] AS INT)))) AS c
       FROM bnd)
SELECT CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT c) AS BIGINT) AS n_unique_chunks,
       CAST(sum(len(c)) AS BIGINT) AS total_bytes,
       CAST((SELECT sum(len(c))
             FROM (SELECT DISTINCT c FROM ch)) AS BIGINT) AS unique_bytes,
       CAST((SELECT sum(len(c)) FROM (SELECT DISTINCT c FROM ch))
            * 1000 // sum(len(c)) AS BIGINT) AS dedup_ratio_permille
FROM ch
"""
    # within-token adjacent byte pairs (neither char a space), ties by
    # pair ascending (binary collation == byte order on ASCII) — mirrors
    # stages/corpus.byte_pair_counts
    sql["byte_pair_counts"] = """
WITH pos AS (SELECT text, CAST(t.i AS BIGINT) i
             FROM documents, unnest(range(0, len(text) - 1)) t(i)),
p AS (SELECT substr(text, CAST(i + 1 AS INT), 2) AS pair
      FROM pos
      WHERE substr(text, CAST(i + 1 AS INT), 1) <> ' '
        AND substr(text, CAST(i + 2 AS INT), 1) <> ' '),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM p GROUP BY 1)
SELECT CAST(row_number() OVER
            (ORDER BY n_occurrences DESC, pair) AS BIGINT) AS rank,
       pair, n_occurrences
FROM c ORDER BY rank LIMIT 20
"""
    # exact-integer Hamilton apportionment of budget 1000 over the pages
    # host distribution — mirrors stages/skew.crawl_budget_apportion
    sql["crawl_budget"] = """
WITH c AS (SELECT 'site' || CAST(doc_id % 50 AS VARCHAR)
                  || '.example.org' AS host,
                  CAST(count(*) AS BIGINT) AS n_pages
           FROM documents GROUP BY 1),
t AS (SELECT sum(n_pages) AS n_total FROM c),
f AS (SELECT host, n_pages,
             1000 * n_pages // n_total AS fl,
             (1000 * n_pages) % n_total AS rem
      FROM c, t),
rk AS (SELECT host, n_pages, fl,
              row_number() OVER (ORDER BY rem DESC, host) AS rnk
       FROM f)
SELECT host, n_pages,
       CAST(fl + CASE WHEN rnk <= (SELECT 1000 - sum(fl) FROM f)
                 THEN 1 ELSE 0 END AS BIGINT) AS budget
FROM rk
"""
    # exact integer lift n_ab * N * 1000 // (n_a * n_b), min_count 5,
    # ties by bigram ascending — mirrors stages/corpus.collocation_lift
    sql["collocation_lift"] = """
WITH l AS (SELECT list_filter(string_split(text, ' '),
                              x -> x <> '') AS toks
           FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM l),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1]))
           AS bigram
       FROM l WHERE len(toks) >= 2),
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_ab
       FROM bg GROUP BY 1),
j AS (SELECT b.bigram, b.n_ab,
             CAST(b.n_ab * (SELECT n FROM nt) * 1000
                  // (u1.n * u2.n) AS BIGINT) AS lift_scaled
      FROM bc b
      JOIN uc u1 ON u1.tok = string_split(b.bigram, ' ')[1]
      JOIN uc u2 ON u2.tok = string_split(b.bigram, ' ')[2]
      WHERE b.n_ab >= 5)
SELECT CAST(row_number() OVER
            (ORDER BY lift_scaled DESC, bigram) AS BIGINT) AS rank,
       bigram, n_ab, lift_scaled
FROM j ORDER BY rank LIMIT 20
"""
    # same deterministic prev-crawl derivation as crawl_diff; host =
    # site{doc_id%50} — mirrors stages/skew.host_crawl_overlap
    sql["host_crawl_overlap"] = """
WITH cur AS (SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                    || '.example.org/d/' || CAST(doc_id AS VARCHAR)
                    AS url
             FROM documents),
prev AS (SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org/d/' || CAST(doc_id AS VARCHAR) AS url
         FROM documents WHERE doc_id % 7 <> 0
         UNION ALL
         SELECT 'https://site' || CAST((doc_id + 1000000) % 50 AS VARCHAR)
                || '.example.org/d/' || CAST(doc_id + 1000000 AS VARCHAR)
         FROM documents WHERE doc_id % 11 = 0),
u AS (SELECT url,
             max(a) AS a, max(b) AS b
      FROM (SELECT url, 1 AS a, 0 AS b FROM cur
            UNION ALL SELECT url, 0, 1 FROM prev)
      GROUP BY 1),
h AS (SELECT regexp_replace(regexp_replace(url,
             '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS host, a, b
      FROM u)
SELECT host,
       CAST(sum(a * b) AS BIGINT) AS n_both,
       CAST(count(*) AS BIGINT) AS n_union,
       CAST(sum(a * b) * 1000 // count(*) AS BIGINT) AS jaccard_permille
FROM h GROUP BY 1
"""
    # per-row floor(price * (1-disc) * 1000) — identical IEEE-754 chain
    # both engines; mirrors stages/joins.brand_bracket_revenue
    sql["brand_bracket_revenue"] = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                     AS BIGINT)) AS BIGINT) AS revenue_milli,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
"""
    # watermark = running max of event time over arrival (event_id) order
    # minus allowed lateness; first arrival never late — mirrors
    # stages/windows.late_event_accounting with the same hour jitter
    sql["late_events"] = """
WITH e AS (SELECT event_type, event_id,
                  CAST(epoch_us(ts) AS BIGINT)
                  - (event_id % 13) * 3600000000 AS us
           FROM events),
r AS (SELECT event_type, us,
             max(us) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM e),
f AS (SELECT event_type, us // 3600000000 AS w,
             CASE WHEN pm IS NOT NULL AND pm - 600000000
                       >= (us // 3600000000 + 1) * 3600000000
                  THEN 1 ELSE 0 END AS late
      FROM r)
SELECT event_type, CAST(w AS BIGINT) AS "window",
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late
FROM f GROUP BY 1, 2
"""
    # pairs of dst hosts sharing a citing page (distinct per page),
    # canonical order, count desc / hosts asc — mirrors
    # stages/corpus.co_citation_counts over the linked-pages derivation
    sql["co_citation"] = """
WITH src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
h AS (SELECT DISTINCT url,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS host
      FROM l),
p AS (SELECT a.host AS host_a, b.host AS host_b
      FROM h a JOIN h b ON a.url = b.url AND a.host < b.host),
c AS (SELECT host_a, host_b, CAST(count(*) AS BIGINT) AS n_pages
      FROM p GROUP BY 1, 2)
SELECT CAST(row_number() OVER
            (ORDER BY n_pages DESC, host_a, host_b) AS BIGINT) AS rank,
       host_a, host_b, n_pages
FROM c ORDER BY rank LIMIT 20
"""
    # top-3 docs per term by tf, ties doc ascending — mirrors
    # grouped_top_k over the tfidf term-count combiner
    sql["impact_index"] = """
WITH l AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                      x -> x <> '') AS toks
           FROM documents),
tc AS (SELECT doc_id, unnest(toks) AS term FROM l),
tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM tc GROUP BY 1, 2),
r AS (SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term
                 ORDER BY tf DESC, doc_id) AS rank
      FROM tf)
SELECT term, CAST(rank AS BIGINT) AS rank, tf, doc_id
FROM r WHERE rank <= 3
"""
    # distinct immediate predecessors per token, ties token ascending —
    # mirrors stages/corpus.continuation_counts
    sql["continuation_counts"] = """
WITH l AS (SELECT list_filter(string_split(text, ' '),
                              x -> x <> '') AS toks
           FROM documents),
bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(toks)),
                              i -> toks[i])) AS prev_t,
              unnest(list_transform(range(1, len(toks)),
                              i -> toks[i+1])) AS tok
       FROM l WHERE len(toks) >= 2),
c AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_contexts
      FROM (SELECT DISTINCT prev_t, tok FROM bg) GROUP BY 1)
SELECT CAST(row_number() OVER
            (ORDER BY n_contexts DESC, token) AS BIGINT) AS rank,
       token, n_contexts
FROM c ORDER BY rank LIMIT 20
"""
    # gap-cumsum sessions; conversion = strict time comparison within a
    # session — mirrors stages/windows.session_conversion
    sql["session_conversion"] = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
                  event_type
           FROM events),
s AS (SELECT user_id, us, event_type,
             CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
sid AS (SELECT user_id, us, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS UNBOUNDED PRECEDING) AS sess
        FROM s),
per AS (SELECT user_id, sess,
               min(CASE WHEN event_type = 'view' THEN us END) AS f,
               max(CASE WHEN event_type = 'purchase' THEN us END) AS t
        FROM sid GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN f IS NOT NULL AND t > f THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted
FROM per GROUP BY 1
"""
    # smallest latency with cumulative count >= ceil(q*n/1000) — mirrors
    # stages/aggs.activation_latency_quantiles
    sql["activation_latency"] = """
WITH m AS (SELECT user_id,
                  min(CASE WHEN event_type = 'view'
                           THEN epoch_us(ts) END) AS mf,
                  min(CASE WHEN event_type = 'purchase'
                           THEN epoch_us(ts) END) AS mt
           FROM events GROUP BY 1),
l AS (SELECT (mt - mf) // 1000000 AS latency_s
      FROM m WHERE mf IS NOT NULL AND mt IS NOT NULL AND mt > mf),
r AS (SELECT latency_s,
             row_number() OVER (ORDER BY latency_s) AS rn FROM l),
n AS (SELECT count(*) AS total FROM l),
q AS (SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille)
SELECT q.q_permille,
       CAST((SELECT min(latency_s) FROM r, n
             WHERE rn >= ceil(q.q_permille * n.total / 1000.0))
            AS BIGINT) AS latency_s
FROM q
"""
    # exact permille of milli-scaled group totals — mirrors
    # stages/windowfns.ratio_to_report
    sql["value_share"] = """
WITH e AS (SELECT event_id AS id, event_type AS "group",
                  CAST(floor(value * 1000) AS BIGINT) AS value_milli
           FROM events)
SELECT id, "group", value_milli,
       CAST(value_milli * 1000
            // sum(value_milli) OVER (PARTITION BY "group")
            AS BIGINT) AS share_permille
FROM e
"""
    # cross-multiplied z-test: c*n > S and (c*n-S)^2 > k^2*(n*Q-S^2) —
    # mirrors stages/windows.bursty_hours
    sql["bursty_hours"] = """
WITH c AS (SELECT event_type AS key,
                  CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS w,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2),
m AS (SELECT key, CAST(count(*) AS BIGINT) AS nw,
             sum(n_events) AS s, sum(n_events * n_events) AS q
      FROM c GROUP BY 1)
SELECT c.key, CAST(c.w AS BIGINT) AS "window", c.n_events
FROM c JOIN m USING (key)
WHERE c.n_events * m.nw - m.s > 0
  AND (c.n_events * m.nw - m.s) * (c.n_events * m.nw - m.s)
      > 4 * (m.nw * m.q - m.s * m.s)
"""
    # mix64 reproduced in HUGEINT like bucket_sync_diff — mirrors
    # stages/joins.rebalance_matrix
    sql["rebalance_matrix"] = """
WITH h AS (SELECT ((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                   % 18446744073709551616 // 2) AS hv
           FROM documents)
SELECT CAST(hv % 32 AS BIGINT) AS old_bucket,
       CAST(hv % 48 AS BIGINT) AS new_bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM h GROUP BY 1, 2
"""
    # exact integer OLS components; t rebased to the global min ts —
    # mirrors stages/aggs.grouped_trend_components
    sql["user_value_trends"] = """
WITH t0 AS (SELECT min(epoch_us(ts)) AS u0 FROM events),
e AS (SELECT user_id AS "group",
             (CAST(epoch_us(ts) AS BIGINT) - (SELECT u0 FROM t0))
                 // 1000000 AS t,
             CAST(floor(value * 1000) AS BIGINT) AS v
      FROM events),
s AS (SELECT "group", CAST(count(*) AS BIGINT) AS n,
             sum(t) AS st, sum(v) AS sv,
             sum(t * v) AS stv, sum(t * t) AS stt
      FROM e GROUP BY 1)
SELECT "group", n,
       CAST(n * stv - st * sv AS BIGINT) AS slope_num,
       CAST(n * stt - st * st AS BIGINT) AS slope_den
FROM s
"""
    # per-column profile, string renderings — mirrors
    # stages/aggs.profile_columns over the events table
    sql["profile_events"] = """
WITH p AS (
  SELECT 'event_id' AS col, CAST(event_id AS VARCHAR) AS v FROM events
  UNION ALL
  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
  UNION ALL
  SELECT 'event_type', event_type FROM events)
SELECT col AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(v) AS BIGINT) AS n_null,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       min(v) AS min_value, max(v) AS max_value
FROM p GROUP BY 1
"""
    # uniform-fill fixture: 4x4 thumbnail bytes == 16 x fill, fill =
    # doc_id % 251 — mirrors stages/multimodal.image_signature_dedup
    sql["image_dedup"] = """
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_images
FROM documents GROUP BY doc_id % 251
"""
    # distinct-(lang, token) self-join per pair — mirrors
    # stages/corpus.lang_vocab_overlap's bitmask histogram
    sql["lang_vocab_overlap"] = """
WITH v AS (SELECT DISTINCT lang,
                  unnest(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS tok
           FROM documents),
sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
p AS (SELECT a.lang AS la, b.lang AS lb,
             CAST(count(*) AS BIGINT) AS shared
      FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY 1, 2)
SELECT sa.lang AS lang_a, sb.lang AS lang_b,
       COALESCE(p.shared, 0) AS n_shared,
       sa.n + sb.n - COALESCE(p.shared, 0) AS n_union,
       CAST(COALESCE(p.shared, 0) * 1000
            // (sa.n + sb.n - COALESCE(p.shared, 0)) AS BIGINT)
           AS jaccard_permille
FROM sz sa JOIN sz sb ON sa.lang < sb.lang
LEFT JOIN p ON p.la = sa.lang AND p.lb = sb.lang
"""
    # LCP(set) = LCP(lexmin, lexmax); prefix equality is monotone so the
    # max equal-prefix length IS the LCP — mirrors stages/skew.host_url_lcp
    sql["host_url_lcp"] = """
WITH u AS (SELECT 'https://s' || CAST(doc_id % 5 AS VARCHAR)
                  || '.example.org/d/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
h AS (SELECT regexp_replace(regexp_replace(url,
             '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS host,
             min(url) AS lo, max(url) AS hi
      FROM u GROUP BY 1),
l AS (SELECT host, lo,
             COALESCE((SELECT max(CAST(x.i AS BIGINT))
                       FROM unnest(generate_series(1,
                            least(len(lo), len(hi)))) x(i)
                       WHERE substr(lo, 1, CAST(x.i AS INT))
                           = substr(hi, 1, CAST(x.i AS INT))),
                      0) AS lcp_len
      FROM h)
SELECT host, CAST(lcp_len AS BIGINT) AS lcp_len,
       substr(lo, 1, CAST(lcp_len AS INT)) AS lcp
FROM l
"""
    # ED1 candidates via deletion neighborhoods (deletion / insertion /
    # position-matched substitution); correction = min candidate, exact
    # tokens map to themselves — mirrors stages/textnorm.ed1_correct
    sql["spellfix_vocab"] = """
WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
              FROM documents),
vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
          FROM toks GROUP BY 1),
dict AS (SELECT DISTINCT tok AS w FROM vocab),
t AS (SELECT CASE WHEN ascii(substr(md5(tok), 1, 1)) % 2 = 0
                  THEN substr(tok, 1, CAST(len(tok) - 1 AS INT)) || 'q'
                  ELSE tok || 'x' END AS token,
             sum(n) AS n
      FROM vocab GROUP BY 1),
tdel AS (SELECT token, CAST(u.i AS BIGINT) AS i,
                substr(token, 1, CAST(u.i - 1 AS INT))
                || substr(token, CAST(u.i + 1 AS INT)) AS d
         FROM t, unnest(generate_series(1, len(token))) u(i)),
wdel AS (SELECT w, CAST(u.i AS BIGINT) AS i,
                substr(w, 1, CAST(u.i - 1 AS INT))
                || substr(w, CAST(u.i + 1 AS INT)) AS d
         FROM dict, unnest(generate_series(1, len(w))) u(i)),
cand AS (
  SELECT td.token, d.w FROM tdel td JOIN dict d ON d.w = td.d
  UNION ALL
  SELECT t.token, wd.w FROM t JOIN wdel wd ON wd.d = t.token
  UNION ALL
  SELECT td.token, wd.w FROM tdel td JOIN wdel wd
         ON wd.d = td.d AND wd.i = td.i AND wd.w <> td.token),
res AS (SELECT t.token, CAST(t.n AS BIGINT) AS n,
               CASE WHEN t.token IN (SELECT w FROM dict) THEN t.token
                    ELSE (SELECT min(w) FROM cand c
                          WHERE c.token = t.token) END AS correction
        FROM t)
SELECT token, correction, n FROM res WHERE correction IS NOT NULL
"""
    # per-lang lower median over doubles — mirrors
    # stages/aggs.exact_kth_by_group
    sql["median_chars_by_lang"] = """
WITH d AS (SELECT lang, CAST(length(text) AS DOUBLE) AS v
           FROM documents),
r AS (SELECT lang, v,
             row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM d)
SELECT lang AS "group", CAST((n + 1) // 2 AS BIGINT) AS rank,
       v AS value
FROM r WHERE rn = (n + 1) // 2
"""
    # smallest n_chars whose cumulative token weight reaches
    # ceil(total/2) — mirrors stages/aggs.exact_weighted_kth
    sql["weighted_median_chars"] = """
WITH d AS (SELECT CAST(length(text) AS DOUBLE) AS value,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS w
           FROM documents
           WHERE len(string_split(text, ' ')) > 0),
r AS (SELECT value,
             sum(w) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cw,
             (SELECT (sum(w) + 1) // 2 FROM d) AS k
      FROM d)
SELECT CAST(min(k) AS BIGINT) AS k_weight, min(value) AS value
FROM r WHERE cw >= k
"""
    # recursive BFS over the same host link graph the HITS oracle builds;
    # min depth per node within max_depth 4 — mirrors stages/graph.bfs_depths
    sql["bfs_host_distance"] = """
WITH RECURSIVE src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
e AS (SELECT DISTINCT
             regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS src_host,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host
      FROM l),
bfs(node, depth) AS (
  SELECT 's0.example.org', 0
  UNION
  SELECT e.dst_host, bfs.depth + 1
  FROM e JOIN bfs ON bfs.node = e.src_host
  WHERE bfs.depth < 4)
SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM bfs GROUP BY 1
"""
    # lower median = value at rank ceil(n/2) ascending — mirrors
    # stages/aggs.exact_kth_value (radix-select)
    sql["exact_median_value"] = """
WITH r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn,
                  count(*) OVER () AS n
           FROM events)
SELECT CAST((n + 1) // 2 AS BIGINT) AS rank, value
FROM r WHERE rn = (n + 1) // 2
"""
    # Fibonacci mix64 reproduced in HUGEINT (wrap mod 2^64), checksum =
    # wrap-sum of 64-bit md5 row hashes — mirrors
    # stages/joins.bucket_sync_diff over write_bucketed layouts
    sql["bucket_sync_diff"] = """
WITH cur AS (SELECT doc_id, text FROM documents),
prev AS (SELECT doc_id,
                CASE WHEN doc_id % 89 = 0 THEN text || ' old'
                     ELSE text END AS text
         FROM documents WHERE doc_id % 97 <> 0),
ca AS (SELECT CAST(((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                    % 18446744073709551616 // 2) % 32 AS BIGINT)
              AS bucket,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || chr(31) || text), 1, 16))::UBIGINT AS HUGEINT)
              AS hv
       FROM cur),
cb AS (SELECT CAST(((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                    % 18446744073709551616 // 2) % 32 AS BIGINT)
              AS bucket,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || chr(31) || text), 1, 16))::UBIGINT AS HUGEINT)
              AS hv
       FROM prev),
sa AS (SELECT bucket, sum(hv) % 18446744073709551616 AS c,
              CAST(count(*) AS BIGINT) AS n FROM ca GROUP BY 1),
sb AS (SELECT bucket, sum(hv) % 18446744073709551616 AS c,
              CAST(count(*) AS BIGINT) AS n FROM cb GROUP BY 1),
bk AS (SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS bucket)
SELECT bk.bucket,
       CASE WHEN COALESCE(sa.n, 0) = 0 AND COALESCE(sb.n, 0) = 0
                 THEN 'empty'
            WHEN COALESCE(sa.n, 0) = 0 THEN 'only_b'
            WHEN COALESCE(sb.n, 0) = 0 THEN 'only_a'
            WHEN sa.c = sb.c AND sa.n = sb.n THEN 'match'
            ELSE 'mismatch' END AS status,
       COALESCE(sa.n, 0) AS n_a,
       COALESCE(sb.n, 0) AS n_b
FROM bk LEFT JOIN sa ON sa.bucket = bk.bucket
        LEFT JOIN sb ON sb.bucket = bk.bucket
"""
    # histogram over the recursive-CTE component sizes — mirrors
    # stages/graph.component_size_histogram over embedding_dup_components
    sql["dup_cluster_sizes"] = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
reach(node, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       FROM comp GROUP BY 1)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY 1
"""
    # mirrors stages/aggs.fd_violation_audit
    sql["fd_audit_source_lang"] = """
SELECT source AS det,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct_dep,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CASE WHEN count(DISTINCT lang) > 1 THEN 1 ELSE 0 END
            AS BIGINT) AS is_violation
FROM documents GROUP BY 1
"""
    sql["profit_by_nation_year"] = """
SELECT sn.n_name AS n_name,
       CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000)
                     AS BIGINT)
                - CAST(floor(p.p_retailprice * 1000) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_milli
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""
    sql["cheapest_supplier_per_part"] = """
WITH c AS (SELECT l_partkey,
                  CAST(floor(l_extendedprice * 1000) AS BIGINT) AS pm,
                  l_suppkey
           FROM lineitem
           JOIN part ON l_partkey = p_partkey AND p_size <= 10),
r AS (SELECT l_partkey, pm, l_suppkey,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY pm, l_suppkey) AS rn
      FROM c)
SELECT l_partkey AS p_partkey, pm AS best_price_milli,
       l_suppkey AS best_suppkey
FROM r WHERE rn = 1
"""
    sql["supplier_counts_by_part_class"] = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY 1, 2, 3
"""
    sql["longest_streak_per_user"] = """
WITH e AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn2
           FROM events),
r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM e GROUP BY user_id, event_type, rn - rn2)
SELECT user_id, max(len) AS longest_streak FROM r GROUP BY user_id
"""
    sql["peak_hour_by_type"] = """
WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, h, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, h) AS rn
      FROM c)
SELECT event_type, h AS peak_hour, n AS n_events FROM r WHERE rn = 1
"""
    sql["hapax_ratio_by_lang"] = """
WITH l AS (SELECT lang,
                  unnest(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS tok
           FROM documents),
c AS (SELECT lang, tok, count(*) AS n FROM l GROUP BY 1, 2)
SELECT lang,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(count(*) AS BIGINT) AS vocab_size
FROM c GROUP BY 1
"""
    _G_EDGES = """
WITH src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
e AS (SELECT regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS src_host,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host
      FROM l),
g AS (SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2)
"""
    sql["scc_of_s0"] = _G_EDGES.replace(
        "WITH ", "WITH RECURSIVE ", 1) + """
, d AS (SELECT DISTINCT src_host AS s, dst_host AS t FROM g),
f AS (SELECT 's0.example.org' AS node
      UNION
      SELECT d.t FROM d JOIN f ON d.s = f.node),
bk AS (SELECT 's0.example.org' AS node
       UNION
       SELECT d.s FROM d JOIN bk ON d.t = bk.node)
SELECT node FROM f INTERSECT SELECT node FROM bk
"""
    sql["internal_link_ratio"] = _G_EDGES + """
SELECT src_host,
       CAST(sum(CASE WHEN src_host = dst_host THEN n ELSE 0 END)
            AS BIGINT) AS n_internal,
       CAST(sum(CASE WHEN src_host <> dst_host THEN n ELSE 0 END)
            AS BIGINT) AS n_external
FROM g GROUP BY 1
"""
    sql["two_hop_neighborhood"] = _G_EDGES + """
, d AS (SELECT DISTINCT src_host AS s, dst_host AS t FROM g)
SELECT a.s AS node, CAST(count(DISTINCT b.t) AS BIGINT) AS n_two_hop
FROM d a JOIN d b ON b.s = a.t
WHERE b.t <> a.s
GROUP BY 1
"""
    sql["reciprocal_host_pairs"] = _G_EDGES + """
, p AS (SELECT least(src_host, dst_host) AS host_a,
               greatest(src_host, dst_host) AS host_b,
               sum(CASE WHEN src_host < dst_host THEN n ELSE 0 END) AS n_ab,
               sum(CASE WHEN src_host > dst_host THEN n ELSE 0 END) AS n_ba
        FROM g WHERE src_host <> dst_host GROUP BY 1, 2)
SELECT host_a, host_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(n_ba AS BIGINT) AS n_ba
FROM p WHERE n_ab > 0 AND n_ba > 0
"""
    sql["host_out_degree_histogram"] = _G_EDGES + """
, d AS (SELECT src_host, CAST(count(*) AS BIGINT) AS out_degree
        FROM g GROUP BY 1)
SELECT out_degree, CAST(count(*) AS BIGINT) AS n_hosts
FROM d GROUP BY 1
"""
    sql["scd2_user_state"] = """
WITH e AS (SELECT user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT user_id, event_type, us, event_id FROM e
      WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS valid_to_us
FROM c
"""
    sql["bibliographic_coupling"] = _G_EDGES + """
, dd AS (SELECT DISTINCT src_host, dst_host FROM e),
deg AS (SELECT src_host, CAST(count(*) AS BIGINT) AS deg
        FROM dd GROUP BY 1),
p AS (SELECT a.src_host AS host_a, b.src_host AS host_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM dd a JOIN dd b
        ON a.dst_host = b.dst_host AND a.src_host < b.src_host
      GROUP BY 1, 2)
SELECT p.host_a, p.host_b, p.n_common,
       CAST(da.deg + db.deg - p.n_common AS BIGINT) AS union_size
FROM p JOIN deg da ON da.src_host = p.host_a
       JOIN deg db ON db.src_host = p.host_b
"""
    sql["user_gap_histogram"] = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id
           FROM events),
g AS (SELECT us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM e),
b AS (SELECT CAST(length(printf('%b', gap_us // 1000000 + 1)) - 1
              AS BIGINT) AS gap_bucket
      FROM g WHERE gap_us IS NOT NULL)
SELECT gap_bucket, CAST(count(*) AS BIGINT) AS n_gaps
FROM b GROUP BY 1
"""
    sql["impute_value_by_type_median"] = """
WITH e AS (SELECT event_id, event_type,
                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
           FROM events),
nn AS (SELECT event_type, v FROM e WHERE v IS NOT NULL),
r AS (SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM nn),
med AS (SELECT event_type, v AS mv FROM r WHERE rn = (n + 1) // 2)
SELECT e.event_id, e.event_type,
       CAST(floor(coalesce(e.v, m.mv) * 1000) AS BIGINT) AS value_milli,
       e.v IS NULL AS was_imputed
FROM e JOIN med m USING (event_type)
"""
    sql["host_clustering_coefficients"] = _G_EDGES + """
, und AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                          greatest(src_host, dst_host) AS b
          FROM g WHERE src_host <> dst_host),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM und
              UNION ALL SELECT b AS node FROM und) GROUP BY 1),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
         FROM (SELECT x AS node FROM tri
               UNION ALL SELECT y AS node FROM tri
               UNION ALL SELECT z AS node FROM tri) GROUP BY 1)
SELECT deg.node AS host, COALESCE(t.n_triangles, 0) AS n_triangles,
       CAST(deg.deg * (deg.deg - 1) // 2 AS BIGINT) AS n_wedges
FROM deg LEFT JOIN tcnt t USING (node)
"""
    sql["extraction_rate_by_chars_decile"] = f"""
WITH d AS ({_D}),
t AS (SELECT length(base_text || {_TEXT_SUFFIX}) AS v,
             CASE WHEN ({_IDENTIFIER}) IS NOT NULL
                  THEN 1 ELSE 0 END AS found
      FROM d),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n FROM t),
q AS (SELECT CAST(unnest([100, 200, 300, 400, 500, 600, 700, 800, 900])
              AS BIGINT) AS qp),
b AS (SELECT qp, min(v) AS bv FROM r CROSS JOIN q
      WHERE rn >= ceil(qp * n / 1000.0) GROUP BY qp),
a AS (SELECT t.v, t.found,
             (SELECT count(*) FROM b WHERE b.bv <= t.v) AS decile
      FROM t)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(sum(found) AS BIGINT) AS n_found,
       CAST(count(*) AS BIGINT) AS n_pages
FROM a GROUP BY 1
"""
    sql["excess_share_suppliers"] = """
WITH f AS (SELECT l_partkey, l_suppkey,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
           FROM lineitem
           JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
           GROUP BY 1, 2),
t AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS part_total,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM f GROUP BY 1)
SELECT f.l_partkey AS p_partkey, f.l_suppkey AS s_suppkey, f.qty,
       t.part_total, t.n_suppliers
FROM f JOIN t USING (l_partkey)
WHERE f.qty * t.n_suppliers > 2 * t.part_total
"""
    sql["minmax_normalize_by_type"] = """
WITH e AS (SELECT event_id, event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
m AS (SELECT event_id, event_type, vm,
             min(vm) OVER (PARTITION BY event_type) AS lo,
             max(vm) OVER (PARTITION BY event_type) AS hi
      FROM e)
SELECT event_id, event_type,
       CASE WHEN hi > lo THEN (vm - lo) * 1000 // (hi - lo)
            ELSE 0 END AS norm_permille
FROM m
"""
    sql["dense_hourly_counts"] = """
WITH c AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
ty AS (SELECT DISTINCT event_type FROM events),
d AS (SELECT ty.event_type, b.h0 + g AS hour_bucket
      FROM ty, b, UNNEST(range(b.h1 - b.h0 + 1)) AS t(g))
SELECT d.event_type, CAST(d.hour_bucket AS BIGINT) AS hour_bucket,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM d LEFT JOIN c
  ON c.event_type = d.event_type AND c.h = d.hour_bucket
"""
    sql["topk_types_per_day"] = """
WITH c AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS w,
                  event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT w, event_type, n,
             CAST(row_number() OVER (PARTITION BY w
                  ORDER BY n DESC, event_type) AS BIGINT) AS rank
      FROM c)
SELECT w AS window_day, rank, n AS n_events, event_type
FROM r WHERE rank <= 3
"""
    sql["day_over_day_change"] = """
WITH c AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2)
SELECT c.event_type, c.day, c.n_events, p.n_events AS prev_n_events
FROM c LEFT JOIN c p
  ON p.event_type = c.event_type AND p.day = c.day - 1
"""
    sql["user_ltv_buckets"] = """
WITH u AS (SELECT user_id,
                  CAST(sum(CAST(floor(value * 1000) AS BIGINT))
                       AS BIGINT) AS vm
           FROM events GROUP BY 1)
SELECT CAST(length(printf('%b', vm + 1)) - 1 AS BIGINT) AS ltv_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""
    sql["url_pattern_counts"] = f"""
WITH d AS ({_D}),
u AS (SELECT 'site' || site || '.example.org' AS host,
             regexp_replace({_URL}, '\\d+', 'N', 'g') AS pattern
      FROM d)
SELECT host, pattern, CAST(count(*) AS BIGINT) AS n_pages
FROM u GROUP BY 1, 2
"""
    sql["token_budget_allocation"] = """
WITH toks AS (SELECT lang,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
              FROM documents),
c AS (SELECT lang AS "group", CAST(count(*) AS BIGINT) AS n_tokens
      FROM toks GROUP BY 1),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
b AS (SELECT "group", n_tokens,
             1000000 * n_tokens // total AS base,
             1000000 * n_tokens - (1000000 * n_tokens // total) * total
                 AS rem
      FROM c, t),
l AS (SELECT 1000000 - CAST(sum(base) AS BIGINT) AS leftover FROM b),
r AS (SELECT "group", n_tokens, base,
             row_number() OVER (ORDER BY rem DESC, "group") AS rk
      FROM b)
SELECT "group", n_tokens,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""
    sql["user_growth_curve"] = """
WITH f AS (SELECT user_id,
                  min(CAST(epoch_us(ts) AS BIGINT) // 86400000000) AS day
           FROM events GROUP BY 1),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new_users
      FROM f GROUP BY 1)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM d
"""
    sql["session_length_histogram"] = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us
           FROM events),
s AS (SELECT user_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
sid AS (SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS UNBOUNDED PRECEDING) AS sess
        FROM s),
per AS (SELECT CAST(count(*) AS BIGINT) AS session_len
        FROM sid GROUP BY user_id, sess)
SELECT session_len, CAST(count(*) AS BIGINT) AS n_sessions
FROM per GROUP BY 1
"""
    sql["verbose_docs_vs_lang_median"] = """
WITH c AS (SELECT doc_id, lang,
                  CAST(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS BIGINT)
                      AS n_tokens
           FROM documents),
r AS (SELECT lang, n_tokens AS v,
             row_number() OVER (PARTITION BY lang ORDER BY n_tokens)
                 AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM c),
med AS (SELECT lang, CAST(v AS BIGINT) AS lang_median
        FROM r WHERE rn = (n + 1) // 2)
SELECT c.doc_id, c.lang, c.n_tokens, m.lang_median
FROM c JOIN med m USING (lang)
WHERE 2 * c.n_tokens > 3 * m.lang_median
"""
    sql["global_value_rank"] = """
WITH e AS (SELECT event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events)
SELECT event_id,
       CAST(row_number() OVER (ORDER BY vm, event_id) AS BIGINT) AS rank
FROM e
"""
    sql["ks_value_click_vs_purchase"] = """
WITH a AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS vm,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ca,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS cb
           FROM events WHERE event_type IN ('click', 'purchase')),
h AS (SELECT vm, CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb
      FROM a GROUP BY 1),
t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
             CAST(sum(nb) AS BIGINT) AS tb FROM h),
c AS (SELECT vm,
             sum(na) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) AS cna,
             sum(nb) OVER (ORDER BY vm ROWS UNBOUNDED PRECEDING) AS cnb
      FROM h),
d AS (SELECT c.vm, abs(c.cna * t.tb - c.cnb * t.ta) AS diff FROM c, t)
SELECT CAST((SELECT max(diff) FROM d) AS BIGINT) AS ks_num,
       CAST((SELECT min(vm) FROM d
             WHERE diff = (SELECT max(diff) FROM d))
            AS BIGINT) AS at_value_milli,
       t.ta AS n_a, t.tb AS n_b
FROM t
"""
    sql["funnel_steps"] = """
WITH e AS (SELECT user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
m1 AS (SELECT user_id, min(us) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
m2 AS (SELECT e.user_id, min(e.us) AS t
       FROM e JOIN m1 ON m1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.us > m1.t GROUP BY 1),
m3 AS (SELECT e.user_id, min(e.us) AS t
       FROM e JOIN m2 ON m2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.us > m2.t GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
       CAST((SELECT count(*) FROM m1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM m2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM m3) AS BIGINT)
"""
    sql["benford_digit_counts"] = """
WITH v AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
d AS (SELECT CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v WHERE vm > 0)
SELECT digit, CAST(count(*) AS BIGINT) AS n_values
FROM d GROUP BY 1
"""
    sql["k_anonymity_audit"] = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size
FROM documents GROUP BY 1, 2 HAVING count(*) < 10
"""
    sql["value_moving_range"] = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
d AS (SELECT event_type,
             abs(vm - lag(vm) OVER (PARTITION BY event_type
                                    ORDER BY us, event_id)) AS ad
      FROM e)
SELECT event_type, CAST(sum(ad) AS BIGINT) AS sum_abs_diff,
       CAST(count(ad) AS BIGINT) AS n_diffs
FROM d WHERE ad IS NOT NULL GROUP BY 1
"""
    sql["event_type_user_overlap"] = """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events
           WHERE event_type IN ('click','error','purchase','signup',
                                'view')),
m AS (SELECT user_id,
             CAST(sum(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'error' THEN 2
                      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                      WHEN 'view' THEN 16 END) AS BIGINT) AS mask
      FROM p GROUP BY 1),
ty AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
                             ('purchase', 4), ('signup', 8),
                             ('view', 16)) AS t(name, bit)),
pr AS (SELECT a.name AS type_a, b.name AS type_b,
              a.bit AS ba, b.bit AS bb
       FROM ty a JOIN ty b ON a.name < b.name),
c AS (SELECT pr.type_a, pr.type_b,
             CAST(sum(CASE WHEN (m.mask & (pr.ba | pr.bb))
                                 = (pr.ba | pr.bb)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
             CAST(sum(CASE WHEN m.mask & pr.ba = pr.ba
                           THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN m.mask & pr.bb = pr.bb
                           THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM pr CROSS JOIN m GROUP BY 1, 2)
SELECT type_a, type_b, n_common, least(na, nb) AS min_size FROM c
"""
    sql["max_burst_per_user"] = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us
           FROM events),
c AS (SELECT user_id,
             CAST(count(*) OVER (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS burst
      FROM e)
SELECT user_id, max(burst) AS max_burst FROM c GROUP BY 1
"""
    sql["embedding_gram_matrix"] = """
WITH u AS (SELECT vec_id, g AS i,
                  CAST(floor(embedding[g + 1]::DOUBLE * 1000)
                       AS BIGINT) AS vi
           FROM embeddings, UNNEST(range(64)) AS t(g)),
p AS (SELECT a.i AS i, b.i AS j, a.vi * b.vi AS prod
      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(sum(prod) AS BIGINT) AS gram
FROM p GROUP BY 1, 2
"""
    sql["weighted_sssp_host"] = """
WITH RECURSIVE src AS (SELECT doc_id,
       'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
       text || ' <a href="https://s' || CAST(doc_id % 3 AS VARCHAR)
            || '.example.org/p/' || CAST(doc_id AS VARCHAR) || '">doc</a>'
            || CASE WHEN doc_id % 4 = 0
                    THEN ' <a href="https://hub.example.org/'
                         || CAST(doc_id % 7 AS VARCHAR) || '">hub</a>'
                    ELSE '' END AS text
       FROM documents),
l AS (SELECT url,
             UNNEST(regexp_extract_all(text,
                 '<a href="([^"]*)">([^<]*)', 1)) AS href
      FROM src),
e AS (SELECT regexp_replace(regexp_replace(url,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS src_host,
             regexp_replace(regexp_replace(href,
                 '^[a-z][a-z0-9+.-]*://', ''), '/.*$', '') AS dst_host
      FROM l),
g AS (SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
w AS (SELECT src_host AS s, dst_host AS d, n AS wt
      FROM g WHERE src_host <> dst_host),
p AS (SELECT 's0.example.org' AS node, CAST(0 AS BIGINT) AS dist,
             0 AS hops
      UNION ALL
      SELECT w.d, p.dist + w.wt, p.hops + 1
      FROM p JOIN w ON w.s = p.node WHERE p.hops < 6)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM p GROUP BY 1
"""
    sql["degree_assortativity"] = _G_EDGES + """
, und AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                          greatest(src_host, dst_host) AS b
          FROM g WHERE src_host <> dst_host),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM und
              UNION ALL SELECT b AS node FROM und) GROUP BY 1),
e2 AS (SELECT da.deg AS x, db.deg AS y
       FROM und JOIN deg da ON da.node = und.a
                JOIN deg db ON db.node = und.b)
SELECT CAST(2 * count(*) AS BIGINT) AS m_twice,
       CAST(sum(x + y) AS BIGINT) AS sum_x,
       CAST(sum(x * x + y * y) AS BIGINT) AS sum_xx,
       CAST(sum(2 * x * y) AS BIGINT) AS sum_xy
FROM e2
"""
    sql["stratified_kfold"] = """
WITH h AS (SELECT doc_id, lang,
                  CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 16))::UBIGINT >> 1)
                       AS BIGINT) AS hv
           FROM documents)
SELECT doc_id, lang,
       CAST((row_number() OVER (PARTITION BY lang
                                ORDER BY hv, doc_id) - 1) % 5
            AS BIGINT) AS fold
FROM h
"""
    sql["heavy_tokens_exact"] = """
WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS token
              FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM toks GROUP BY 1)
SELECT c.token AS value, c.n_occurrences
FROM c, t WHERE c.n_occurrences * 1000 > t.total * 5
"""
    sql["validation_report"] = """
WITH m AS (SELECT
    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS null_user_id,
    CAST(sum(CASE WHEN value < 0.0 OR value > 300.0
             THEN 1 ELSE 0 END) AS BIGINT) AS value_out_of_range,
    CAST(sum(CASE WHEN ts < TIMESTAMP '2023-01-01'
                    OR ts >= TIMESTAMP '2027-01-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_window,
    CAST(sum(CASE WHEN event_type NOT IN
                  ('click','error','purchase','signup','view')
             THEN 1 ELSE 0 END) AS BIGINT) AS unknown_event_type
  FROM events)
SELECT 'null_user_id' AS rule, null_user_id AS n_violations FROM m
UNION ALL SELECT 'value_out_of_range', value_out_of_range FROM m
UNION ALL SELECT 'ts_out_of_window', ts_out_of_window FROM m
UNION ALL SELECT 'unknown_event_type', unknown_event_type FROM m
"""
    sql["dangling_link_rate"] = _G_EDGES + """
, crawled AS (SELECT DISTINCT src_host AS h FROM g)
SELECT g.src_host,
       CAST(sum(CASE WHEN c.h IS NULL THEN g.n ELSE 0 END) AS BIGINT)
           AS n_dangling,
       CAST(sum(g.n) AS BIGINT) AS n_total
FROM g LEFT JOIN crawled c ON c.h = g.dst_host
GROUP BY 1
"""
    sql["max_concurrent_events"] = """
WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us,
                  CAST(floor(value * 1000) AS BIGINT) * 1000 AS dur
           FROM events),
b AS (SELECT us, 1 AS delta FROM e WHERE dur > 0
      UNION ALL
      SELECT us + dur, -1 FROM e WHERE dur > 0),
r AS (SELECT us,
             sum(delta) OVER (ORDER BY us, delta
                 ROWS UNBOUNDED PRECEDING) AS run
      FROM b),
m AS (SELECT max(run) AS mx FROM r)
SELECT CAST(m.mx AS BIGINT) AS max_concurrent,
       CAST((SELECT min(us) FROM r WHERE r.run = m.mx) AS BIGINT)
           AS at_us
FROM m
"""
    sql["host_rate_outliers"] = f"""
WITH d AS ({_D}),
r AS (SELECT 'site' || site || '.example.org' AS host,
             CAST(SUM(CASE WHEN ({_IDENTIFIER}) IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
             COUNT(*) AS n_pages
      FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n_failed) AS BIGINT) AS F,
             CAST(sum(n_pages) AS BIGINT) AS N FROM r)
SELECT r.host, r.n_failed, r.n_pages
FROM r, t
WHERE CAST(r.n_failed * t.N - r.n_pages * t.F AS HUGEINT)
      * (r.n_failed * t.N - r.n_pages * t.F) * t.N
      > CAST(4 AS HUGEINT) * r.n_pages * t.F * (t.N - t.F)
"""
    sql["gopher_impact_by_lang"] = """
WITH g AS (SELECT * FROM (""" + sql["gopher_quality"] + """) q)
SELECT d.lang,
       CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass,
       CAST(sum(CASE WHEN g.keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_fail
FROM documents d JOIN g ON g.doc_id = d.doc_id
GROUP BY 1
"""
    sql["partitioned_prune_roundtrip"] = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE lang = 'de'
"""
    sql["hashed_features"] = """
WITH toks AS (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
              FROM documents)
SELECT doc_id,
       CAST((('0x' || substr(md5(tok), 1, 16))::UBIGINT >> 1) % 1024
            AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS n
FROM toks GROUP BY 1, 2
"""
    sql["target_encode_loo"] = """
WITH e AS (SELECT event_id, event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
g AS (SELECT event_type, CAST(sum(vm) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1)
SELECT e.event_id, e.event_type,
       CAST(g.s - e.vm AS BIGINT) AS loo_num,
       CAST(g.n - 1 AS BIGINT) AS loo_den
FROM e JOIN g USING (event_type)
"""
    sql["rfm_scores"] = """
WITH pc_ AS (SELECT o_custkey AS c,
                    max(CAST(epoch_us(o_orderdate) AS BIGINT)
                        // 86400000000) AS recency_day,
                    CAST(count(*) AS BIGINT) AS frequency,
                    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS cents
             FROM orders GROUP BY 1),
qs AS (SELECT CAST(unnest([200, 400, 600, 800]) AS BIGINT) AS qp),
br AS (SELECT qp, min(v) AS bv FROM (
         SELECT recency_day AS v,
                row_number() OVER (ORDER BY recency_day) AS rn,
                count(*) OVER () AS n FROM pc_) r CROSS JOIN qs
       WHERE rn >= ceil(qp * n / 1000.0) GROUP BY qp),
bf AS (SELECT qp, min(v) AS bv FROM (
         SELECT frequency AS v,
                row_number() OVER (ORDER BY frequency) AS rn,
                count(*) OVER () AS n FROM pc_) r CROSS JOIN qs
       WHERE rn >= ceil(qp * n / 1000.0) GROUP BY qp),
bm AS (SELECT qp, min(v) AS bv FROM (
         SELECT cents // 100000 AS v,
                row_number() OVER (ORDER BY cents // 100000) AS rn,
                count(*) OVER () AS n FROM pc_) r CROSS JOIN qs
       WHERE rn >= ceil(qp * n / 1000.0) GROUP BY qp)
SELECT pc_.c AS c_custkey,
       CAST(1 + (SELECT count(*) FROM br
                 WHERE br.bv <= pc_.recency_day) AS BIGINT) AS r_score,
       CAST(1 + (SELECT count(*) FROM bf
                 WHERE bf.bv <= pc_.frequency) AS BIGINT) AS f_score,
       CAST(1 + (SELECT count(*) FROM bm
                 WHERE bm.bv <= pc_.cents // 100000) AS BIGINT)
           AS m_score
FROM pc_
"""
    sql["value_ohlc_hourly"] = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 1000 AS ms,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
p AS (SELECT event_type, ms // 3600000 AS hour,
             ms * 1048576 + vm AS packed, vm FROM e)
SELECT event_type, hour,
       CAST(min(packed) % 1048576 AS BIGINT) AS open_milli,
       CAST(max(vm) AS BIGINT) AS high_milli,
       CAST(min(vm) AS BIGINT) AS low_milli,
       CAST(max(packed) % 1048576 AS BIGINT) AS close_milli,
       CAST(count(*) AS BIGINT) AS n_events
FROM p GROUP BY 1, 2
"""
    sql["orders_vs_ship_days"] = """
WITH a AS (SELECT CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                      AS day, count(*) AS n FROM orders GROUP BY 1),
b AS (SELECT CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000
                 AS day, count(*) AS n FROM lineitem GROUP BY 1)
SELECT COALESCE(a.day, b.day) AS day,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_shipped
FROM a FULL OUTER JOIN b ON a.day = b.day
"""
    sql["active_day_streaks"] = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events),
i AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS island
      FROM d),
r AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS run
      FROM i GROUP BY 1, 2)
SELECT user_id, CAST(max(run) AS BIGINT) AS longest_run_days,
       CAST(sum(run) AS BIGINT) AS n_active_days
FROM r GROUP BY 1
"""
    sql["revenue_hhi"] = """
WITH r AS (SELECT l_suppkey,
                  CAST(sum(CAST(floor(l_extendedprice
                                      * (1 - l_discount) * 1000)
                                AS BIGINT)) AS HUGEINT) AS rev
           FROM lineitem GROUP BY 1),
j AS (SELECT n.n_name, r.rev
      FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
             JOIN nation n ON s.s_nationkey = n.n_nationkey)
SELECT n_name,
       CAST(CASE WHEN sum(rev) = 0 THEN 0
                 ELSE 1000 * sum(rev * rev)
                      // (sum(rev) * sum(rev)) END AS BIGINT)
           AS hhi_permille,
       CAST(count(*) AS BIGINT) AS n_suppliers
FROM j GROUP BY 1
"""
    sql["reorder_interval_median"] = """
WITH o AS (SELECT o_custkey,
                  CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                      AS day, o_orderkey FROM orders),
w AS (SELECT o_custkey,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap
      FROM o),
g AS (SELECT o_custkey, gap,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM w WHERE gap IS NOT NULL)
SELECT o_custkey, CAST(gap AS BIGINT) AS median_gap_days,
       CAST(n AS BIGINT) AS n_gaps
FROM g WHERE rn = (n - 1) // 2 + 1
"""
    sql["duplicate_order_flags"] = """
WITH o AS (SELECT o_orderkey, o_custkey,
                  CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                      AS day FROM orders)
SELECT DISTINCT a.o_orderkey
FROM o a JOIN o b ON a.o_custkey = b.o_custkey
     AND a.day = b.day AND a.o_orderkey <> b.o_orderkey
"""
    sql["theil_sen_trend"] = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events),
c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY 1, 2),
p AS (SELECT a.event_type, b.c - a.c AS num, b.day - a.day AS den
      FROM c a JOIN c b ON a.event_type = b.event_type
           AND b.day > a.day),
r AS (SELECT event_type, num, den,
             row_number() OVER (PARTITION BY event_type
                 ORDER BY num * 1.0 / den, num, den) AS rn,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM p)
SELECT event_type, CAST(num AS BIGINT) AS slope_num,
       CAST(den AS BIGINT) AS slope_den,
       CAST(np AS BIGINT) AS n_pairs
FROM r WHERE rn = (np - 1) // 2 + 1
"""
    sql["label_scatter"] = """
WITH u AS (SELECT CAST(label AS BIGINT) AS label, g AS i,
                  CAST(floor(embedding[g + 1]::DOUBLE * 1000)
                       AS BIGINT) AS vm
           FROM embeddings, UNNEST(range(64)) AS t(g))
SELECT label, CAST(i AS BIGINT) AS i,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vm) AS BIGINT) AS s,
       CAST(sum(vm * vm) AS BIGINT) AS ss
FROM u GROUP BY 1, 2
"""
    sql["contrastive_negatives"] = """
WITH n AS (SELECT count(*) AS n FROM embeddings),
r AS (SELECT vec_id, g AS neg_rank,
             CAST((('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':'
                                      || CAST(g AS VARCHAR)), 1, 16))
                   ::UBIGINT % (SELECT n - 1 FROM n)) AS BIGINT)
                 AS raw
      FROM embeddings, UNNEST(range(4)) t(g))
SELECT vec_id, CAST(neg_rank AS BIGINT) AS neg_rank,
       raw + CASE WHEN raw >= vec_id THEN 1 ELSE 0 END AS neg_id
FROM r
"""
    sql["consistent_hash_moves"] = """
WITH s AS (SELECT DISTINCT source FROM documents),
h AS (SELECT source,
             CAST((('0x' || substr(md5(source), 1, 16))::UBIGINT >> 3)
                  AS BIGINT) AS hh FROM s),
wn AS (SELECT g AS wid,
              CAST((('0x' || substr(md5('w' || CAST(g AS VARCHAR)), 1,
                                    16))::UBIGINT >> 3) AS BIGINT)
                  AS pos
       FROM (SELECT UNNEST(range(8)) AS g)),
wn1 AS (SELECT g AS wid,
               CAST((('0x' || substr(md5('w' || CAST(g AS VARCHAR)), 1,
                                     16))::UBIGINT >> 3) AS BIGINT)
                   AS pos
        FROM (SELECT UNNEST(range(9)) AS g)),
an AS (SELECT source, wid FROM (
         SELECT h.source, wn.wid,
                row_number() OVER (PARTITION BY h.source ORDER BY
                    (((wn.pos - h.hh) % 2305843009213693952) + 2305843009213693952) % 2305843009213693952, wn.wid)
                    AS rn
         FROM h, wn) WHERE rn = 1),
an1 AS (SELECT source, wid FROM (
          SELECT h.source, wn1.wid,
                 row_number() OVER (PARTITION BY h.source ORDER BY
                     (((wn1.pos - h.hh) % 2305843009213693952) + 2305843009213693952) % 2305843009213693952, wn1.wid)
                     AS rn
          FROM h, wn1) WHERE rn = 1)
SELECT a.source, CAST(a.wid AS BIGINT) AS worker_n,
       CAST(b.wid AS BIGINT) AS worker_n1,
       a.wid <> b.wid AS moved
FROM an a JOIN an1 b USING (source)
"""
    sql["source_similarity_pairs"] = """
WITH tok AS (SELECT DISTINCT source,
                    unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS token
             FROM documents),
sl AS (SELECT source, g AS slot, token
       FROM tok, UNNEST(range(16)) t(g)),
sig AS (SELECT source, slot,
               min((('0x' || substr(md5(CAST(slot AS VARCHAR) || ':'
                                        || token), 1, 16))::UBIGINT
                    >> 1)) AS sig63
        FROM sl GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_equal_slots
FROM sig a JOIN sig b ON a.slot = b.slot AND a.sig63 = b.sig63
     AND a.source < b.source
GROUP BY 1, 2
"""
    sql["source_minhash_signatures"] = """
WITH tok AS (SELECT DISTINCT source,
                    unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS token
             FROM documents),
s AS (SELECT source, g AS slot, token
      FROM tok, UNNEST(range(16)) t(g))
SELECT source, CAST(slot AS BIGINT) AS slot,
       CAST(min((('0x' || substr(md5(CAST(slot AS VARCHAR) || ':'
                                     || token), 1, 16))::UBIGINT >> 1))
            AS BIGINT) AS sig63
FROM s GROUP BY 1, 2
"""
    sql["max_drawdown"] = """
WITH e AS (SELECT event_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS us,
                  CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 1000) AS BIGINT)
                       ELSE -CAST(floor(value * 1000) AS BIGINT)
                  END AS d
           FROM events WHERE event_type IN ('purchase', 'click')),
p AS (SELECT event_id, user_id, us,
             sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS pre
      FROM e),
dd AS (SELECT user_id,
              greatest(max(pre) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING), 0)
                  - pre AS v
       FROM p)
SELECT user_id, CAST(max(v) AS BIGINT) AS max_drawdown_milli,
       CAST(count(*) AS BIGINT) AS n_events
FROM dd GROUP BY 1
"""
    sql["sliding_distinct_users"] = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h
           FROM events)
SELECT w AS window_hour,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM (SELECT user_id, h - g.g AS w
      FROM d, (SELECT UNNEST(range(24)) AS g) g)
GROUP BY 1
"""
    sql["daily_periodicity"] = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h
           FROM events),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
hours AS (SELECT t.event_type, b.h0 + g.g AS h
          FROM (SELECT DISTINCT event_type FROM e) t, b,
               (SELECT UNNEST(range(0, (SELECT h1 - h0 + 1 FROM b)))
                       AS g) g),
c AS (SELECT hours.event_type, hours.h,
             CAST(count(e.h) AS BIGINT) AS c
      FROM hours LEFT JOIN e
           ON e.event_type = hours.event_type AND e.h = hours.h
      GROUP BY 1, 2),
j AS (SELECT c1.event_type, c1.c AS ch, c2.c AS cl
      FROM c c1 JOIN c c2 ON c2.event_type = c1.event_type
           AND c2.h = c1.h + 24
      WHERE c1.h <= (SELECT h1 - 24 FROM b))
SELECT event_type, CAST(sum(ch * cl) AS BIGINT) AS lag_dot,
       CAST(sum(ch * ch) AS BIGINT) AS head_dot,
       CAST(sum(cl * cl) AS BIGINT) AS tail_dot,
       CAST(count(*) AS BIGINT) AS n_terms
FROM j GROUP BY 1
"""
    sql["part_copurchase_pairs"] = """
WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    sql["kmv_repeat_customers"] = """
WITH a0 AS (SELECT DISTINCT o_custkey AS c FROM orders
            WHERE year(o_orderdate) = 1995),
b0 AS (SELECT DISTINCT o_custkey AS c FROM orders
       WHERE year(o_orderdate) = 1996),
ah AS (SELECT c, CAST((('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 16))
                       ::UBIGINT >> 1) AS BIGINT) AS h
       FROM a0 ORDER BY h LIMIT 128),
bh AS (SELECT c, CAST((('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 16))
                       ::UBIGINT >> 1) AS BIGINT) AS h
       FROM b0 ORDER BY h LIMIT 128),
u AS (SELECT COALESCE(ah.h, bh.h) AS hash63,
             COALESCE(ah.c, bh.c) AS c_custkey,
             ah.h IS NOT NULL AS in_a,
             bh.h IS NOT NULL AS in_b
      FROM ah FULL OUTER JOIN bh ON ah.h = bh.h AND ah.c = bh.c)
SELECT hash63, c_custkey, in_a, in_b FROM u
ORDER BY hash63 LIMIT 128
"""
    sql["day_bitmap_index"] = """
WITH d AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events)
SELECT event_type, day // 32 AS word_idx,
       CAST(sum(DISTINCT (1::BIGINT << CAST(day % 32 AS INT)))
            AS BIGINT) AS bits
FROM d GROUP BY 1, 2
"""
    sql["supplier_fill_rate"] = """
WITH o AS (SELECT o_orderkey,
                  CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                      AS oday FROM orders),
l AS (SELECT l_orderkey, l_suppkey,
             CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000
                 AS sday FROM lineitem)
SELECT l.l_suppkey,
       CAST(sum(CASE WHEN l.sday - o.oday <= 30 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_on_time,
       CAST(count(*) AS BIGINT) AS n_items
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""
    sql["template_clusters"] = """
WITH n AS (SELECT regexp_replace(text, '[a-zA-Z0-9]+', '#', 'g')
               AS norm FROM documents),
c AS (SELECT CAST((('0x' || substr(md5(norm), 1, 16))::UBIGINT >> 1)
                  AS BIGINT) AS template_hash63,
             CAST(count(*) AS BIGINT) AS n_pages
      FROM n GROUP BY 1)
SELECT template_hash63, n_pages FROM c WHERE n_pages >= 2
"""
    sql["embedding_int8_quantize"] = """
WITH u AS (SELECT vec_id, g AS i,
                  CAST(floor(embedding[g + 1]::DOUBLE * 1000)
                       AS BIGINT) AS vm
           FROM embeddings, UNNEST(range(64)) AS t(g)),
s AS (SELECT vec_id, min(vm) AS mn, max(vm) - min(vm) AS rng
      FROM u GROUP BY 1)
SELECT u.vec_id, CAST(u.i AS BIGINT) AS i,
       CAST(CASE WHEN s.rng = 0 THEN 0
                 ELSE (u.vm - s.mn) * 255 // s.rng END AS BIGINT) AS q,
       CAST(s.mn AS BIGINT) AS min_milli,
       CAST(s.rng AS BIGINT) AS range_milli
FROM u JOIN s USING (vec_id)
"""
    sql["cusum_changepoint"] = """
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h
           FROM events),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
hours AS (SELECT t.event_type, b.h0 + g.g AS h
          FROM (SELECT DISTINCT event_type FROM e) t, b,
               (SELECT UNNEST(range(0, (SELECT h1 - h0 + 1 FROM b)))
                       AS g) g),
c AS (SELECT hours.event_type, hours.h,
             CAST(count(e.h) AS BIGINT) AS c
      FROM hours LEFT JOIN e
           ON e.event_type = hours.event_type AND e.h = hours.h
      GROUP BY 1, 2),
w AS (SELECT event_type, h,
             sum(c) OVER (PARTITION BY event_type ORDER BY h) AS pre,
             sum(c) OVER (PARTITION BY event_type) AS tot,
             count(*) OVER (PARTITION BY event_type) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY h) AS i
      FROM c),
s AS (SELECT event_type, h, abs(n * pre - i * tot) AS a, n, tot
      FROM w)
SELECT event_type, h AS change_hour, CAST(a AS BIGINT) AS cusum_abs,
       CAST(n AS BIGINT) AS n_hours, CAST(tot AS BIGINT) AS total
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY a DESC, h) AS rn FROM s)
WHERE rn = 1
"""
    sql["kmv_vocab_sample"] = """
WITH tok AS (SELECT DISTINCT
                    unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS token
             FROM documents)
SELECT CAST((('0x' || substr(md5(token), 1, 16))::UBIGINT >> 1)
            AS BIGINT) AS hash63,
       token
FROM tok ORDER BY hash63 LIMIT 64
"""
    sql["clamped_running_balance"] = """
WITH e AS (SELECT event_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS us,
                  CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 1000) AS BIGINT)
                       ELSE -CAST(floor(value * 1000) AS BIGINT)
                  END AS d
           FROM events WHERE event_type IN ('purchase', 'click')),
p AS (SELECT event_id, user_id, us,
             sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS pre
      FROM e)
SELECT event_id, user_id,
       CAST(pre - least(0, min(pre) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id
                                          ROWS UNBOUNDED PRECEDING))
            AS BIGINT) AS balance_milli
FROM p
"""
    sql["first_touch_attribution"] = """
WITH c AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us
      FROM events WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(min(c.us) AS BIGINT) AS first_click_us,
       CAST(count(*) AS BIGINT) AS n_clicks_window
FROM p JOIN c ON c.user_id = p.user_id
     AND c.us >= p.us - 86400000000 AND c.us < p.us
GROUP BY 1, 2
"""
    sql["zonemap_prune_scan"] = """
SELECT event_id, CAST(floor(value * 1000) AS BIGINT) AS vm
FROM events
WHERE CAST(floor(value * 1000) AS BIGINT) BETWEEN 100000 AND 150000
"""
    sql["video_scene_cuts"] = """
WITH f AS (SELECT doc_id,
                  UNNEST(range(1, 8 + doc_id % 8)) AS fi
           FROM documents),
d AS (SELECT doc_id, fi,
             abs(((doc_id * 37 + fi * fi * 11) % 251)
                 - ((doc_id * 37 + (fi-1) * (fi-1) * 11) % 251)) AS dl
      FROM f)
SELECT doc_id, fi AS frame_idx FROM d WHERE dl > 60
"""
    sql["vocab_coverage_curve"] = """
WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                       x -> x <> '')) AS token
             FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS v FROM cnt),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk
      FROM cnt),
cuts AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                             1024, 2048, 4096, 8192, 16384, 32768,
                             65536, 131072, 262144, 524288, 1048576])
                     AS BIGINT) AS rank_cut)
SELECT c.rank_cut,
       CAST(sum(r.n) AS BIGINT) AS cum_occurrences,
       CAST(sum(r.n) * 1000 // max(tot.tot) AS BIGINT) AS cum_permille
FROM cuts c JOIN r ON r.rnk <= c.rank_cut CROSS JOIN tot
WHERE c.rank_cut = 1 OR c.rank_cut // 2 < tot.v
GROUP BY c.rank_cut
"""
    sql["ship_latency_histogram"] = """
WITH o AS (SELECT o_orderkey,
                  CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                      AS oday FROM orders),
l AS (SELECT l_orderkey,
             CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000
                 AS sday FROM lineitem)
SELECT sday - oday AS latency_days,
       CAST(count(*) AS BIGINT) AS n_items
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""
    sql["time_weighted_value"] = """
WITH e AS (SELECT user_id, event_id,
                  CAST(epoch_us(ts) AS BIGINT) AS us,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
w AS (SELECT user_id, vm, us,
             lead(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS nxt
      FROM e)
SELECT user_id,
       CAST(COALESCE(sum(vm * ((nxt - us) // 1000000)), 0) AS BIGINT)
           AS tw_value_sum,
       CAST(count(nxt) AS BIGINT) AS n_gaps
FROM w GROUP BY 1
"""
    sql["type_weekday_contingency"] = """
WITH c AS (SELECT event_type,
                  (CAST(epoch_us(ts) AS BIGINT) // 86400000000) % 7
                      AS dow7,
                  CAST(count(*) AS BIGINT) AS o
           FROM events GROUP BY 1, 2)
SELECT event_type, dow7, o,
       CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT)
           AS row_total,
       CAST(sum(o) OVER (PARTITION BY dow7) AS BIGINT) AS col_total,
       CAST(sum(o) OVER () AS BIGINT) AS n
FROM c
"""
    sql["kcore_users_props"] = """
WITH RECURSIVE
e0 AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS a,
              'k' || regexp_extract(props, '"k": (\\d+)', 1) AS b
       FROM events),
ee AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
surv(round, node) AS (
  SELECT 0, a FROM ee GROUP BY a
  UNION ALL
  SELECT s.round + 1, ee.a
  FROM surv s JOIN ee ON ee.a = s.node
       JOIN surv s2 ON s2.node = ee.b
  WHERE s.round < 12
  GROUP BY s.round, ee.a
  HAVING count(*) >= 9
)
SELECT DISTINCT node FROM surv WHERE round = 12
"""
    sql["churned_users"] = """
WITH l AS (SELECT user_id,
                  max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                      AS last_seen_day
           FROM events GROUP BY 1),
m AS (SELECT max(last_seen_day) AS gmax FROM l)
SELECT l.user_id, l.last_seen_day,
       l.last_seen_day < m.gmax - 7 AS churned
FROM l, m
"""
    sql["char_class_profile"] = r"""
WITH t AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_lower,
         length(regexp_replace(text, '[^\t\n\f\r ]', '', 'g')) AS n_space,
         length(text) AS n
  FROM documents)
SELECT doc_id,
       CAST(n_digit AS BIGINT) AS n_digit,
       CAST(n_upper AS BIGINT) AS n_upper,
       CAST(n_lower AS BIGINT) AS n_lower,
       CAST(n_space AS BIGINT) AS n_space,
       CAST(n - n_digit - n_upper - n_lower - n_space AS BIGINT) AS n_other
FROM t
"""
    sql["char_simpson"] = """
WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
           FROM documents),
h AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(n * n) AS BIGINT) AS ss,
             CAST(sum(n) AS BIGINT) AS n
      FROM h GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n, 0) AS n_chars,
       coalesce(a.n_distinct, 0) AS n_distinct_chars,
       CAST(CASE WHEN coalesce(a.n, 0) > 0
                 THEN 1000 * a.ss // (a.n * a.n) ELSE 0 END AS BIGINT)
           AS simpson_permille
FROM documents d LEFT JOIN a USING (doc_id)
"""
    sql["word_len_histogram"] = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
SELECT CAST(length(w) AS BIGINT) AS word_len,
       CAST(count(*) AS BIGINT) AS n_words
FROM w WHERE w <> '' GROUP BY 1
"""
    sql["user_gap_moments"] = """
WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us
           FROM events),
g AS (SELECT user_id,
             (us - lag(us) OVER (PARTITION BY user_id ORDER BY us))
                 // 60000000 AS gap_min
      FROM e)
SELECT user_id,
       CAST(count(gap_min) AS BIGINT) AS n_gaps,
       CAST(sum(gap_min) AS BIGINT) AS sum_gap_min,
       CAST(sum(gap_min * gap_min) AS BIGINT) AS sum_gap_sq_min,
       CAST(max(gap_min) AS BIGINT) AS max_gap_min
FROM g WHERE gap_min IS NOT NULL GROUP BY 1
"""
    sql["bloom_semi_revenue"] = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT)
           AS sum_qty_milli,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                     AS BIGINT)) AS BIGINT) AS revenue_milli
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice >= 200000.0)
GROUP BY 1
"""
    sql["supplier_lead_quantiles"] = """
WITH j AS (SELECT l_suppkey,
                  1000 * (CAST(epoch_us(l_shipdate) AS BIGINT)
                              // 86400000000
                          - CAST(epoch_us(o_orderdate) AS BIGINT)
                              // 86400000000) AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
r AS (SELECT l_suppkey, v,
             row_number() OVER (PARTITION BY l_suppkey ORDER BY v) AS rn
      FROM j),
n AS (SELECT l_suppkey, count(*) AS total FROM j GROUP BY 1),
q AS (SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille)
SELECT n.l_suppkey, q.q_permille,
       (SELECT min(v) FROM r
        WHERE r.l_suppkey = n.l_suppkey
          AND rn >= ceil(q.q_permille * n.total / 1000.0)) AS value
FROM n, q
"""
    sql["promo_revenue_share"] = """
WITH j AS (SELECT CAST(date_diff('month', DATE '1970-01-01',
                                 CAST(l_shipdate AS DATE)) AS BIGINT)
               AS month,
           CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                AS BIGINT) AS rev,
           CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
           FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT month,
       CAST(sum(rev * is_promo) AS BIGINT) AS promo_rev_milli,
       CAST(sum(rev) AS BIGINT) AS total_rev_milli,
       CAST(1000 * sum(rev * is_promo)
            // greatest(sum(rev), 1) AS BIGINT) AS promo_permille
FROM j GROUP BY 1
"""
    sql["source_mix_plan"] = """
WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                      AS n_tokens
           FROM documents GROUP BY 1),
c AS (SELECT *, least(n_tokens, 3000) AS capped_tokens FROM s)
SELECT source, n_docs, n_tokens,
       CAST(capped_tokens AS BIGINT) AS capped_tokens,
       CAST(1000 * capped_tokens
            // greatest((SELECT sum(capped_tokens) FROM c), 1)
            AS BIGINT) AS mix_permille
FROM c
"""
    sql["dup_rate_by_source"] = """
WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
           FROM documents GROUP BY 1)
SELECT source, n_distinct, n_docs,
       CAST(1000 * (n_docs - n_distinct)
            // greatest(n_docs, 1) AS BIGINT) AS dup_permille
FROM s
"""
    sql["prefix_dup_flags"] = """
WITH s AS (SELECT doc_id, text,
                  lead(text) OVER (ORDER BY text, doc_id) AS nxt
           FROM documents)
SELECT doc_id,
       CAST(CASE WHEN nxt IS NOT NULL AND starts_with(nxt, text)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_prefix_dup
FROM s
"""
    sql["out_of_order_rate"] = """
WITH w AS (SELECT user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS us,
                  max(CAST(epoch_us(ts) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max
           FROM events),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN us < prev_max THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_out_of_order
      FROM w GROUP BY 1)
SELECT user_id, n_events, n_out_of_order,
       CAST(1000 * n_out_of_order // n_events AS BIGINT) AS ooo_permille
FROM a
"""
    sql["interleave_order"] = """
WITH s AS (SELECT source,
                  least(greatest(sum(len(string_split(text, ' '))),
                                 1), 3000) AS w
           FROM documents GROUP BY 1),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY doc_id) AS rk
      FROM documents),
v AS (SELECT r.doc_id, r.source, r.rk,
             CAST(r.rk * 1048576 // s.w AS BIGINT) AS vtime
      FROM r JOIN s USING (source))
SELECT doc_id, source, vtime,
       CAST(row_number() OVER (ORDER BY vtime, source, rk) AS BIGINT)
           AS global_pos
FROM v
"""
    sql["join_cardinality"] = """
WITH l AS (SELECT l_orderkey AS k, count(*) AS c
           FROM lineitem GROUP BY 1),
r AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
j AS (SELECT l.c * r.c AS p FROM l JOIN r USING (k))
SELECT CAST(sum(p) AS BIGINT) AS join_rows,
       CAST(count(*) AS BIGINT) AS n_matched_keys,
       CAST(max(p) AS BIGINT) AS max_fanout
FROM j
"""
    sql["open_order_backlog"] = """
WITH sp AS (SELECT o.o_orderkey,
                   CAST(epoch_us(o.o_orderdate) AS BIGINT)
                       // 86400000000 AS od,
                   max(CAST(epoch_us(l.l_shipdate) AS BIGINT)
                       // 86400000000) AS ed
            FROM orders o JOIN lineitem l
                 ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2),
d AS (SELECT unnest(range((SELECT min(od) FROM sp),
                          (SELECT max(ed) FROM sp) + 1)) AS day)
SELECT d.day, CAST(count(*) AS BIGINT) AS n_open
FROM d JOIN sp ON d.day BETWEEN sp.od AND sp.ed
GROUP BY 1
"""
    sql["padding_waste"] = """
WITH t AS (SELECT greatest((len(string_split(text, ' ')) + 63) // 64,
                           1) * 64 AS bucket_len,
                  len(string_split(text, ' ')) AS nt
           FROM documents),
a AS (SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS sum_tokens,
             CAST(sum(bucket_len - nt) AS BIGINT) AS sum_padding
      FROM t GROUP BY 1)
SELECT bucket_len, n_docs, sum_tokens, sum_padding,
       CAST(1000 * sum_padding
            // greatest(sum_tokens + sum_padding, 1) AS BIGINT)
           AS waste_permille
FROM a
"""
    sql["event_type_trigrams"] = """
WITH s AS (SELECT user_id, event_type,
                  lead(event_type, 1) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type AS t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
"""
    sql["gate_grid_report"] = """
WITH t AS (SELECT len(string_split(text, ' ')) AS n_tok,
                  len(list_filter(string_split(text, ' '),
                      x -> x IN ('the','and','of','to','is','it')))
                      AS n_stop
           FROM documents),
g AS (SELECT * FROM (VALUES (10, 25), (10, 50), (20, 25), (20, 50),
                            (40, 25), (40, 50))
      AS v(min_tokens, stop_permille_min)),
a AS (SELECT CAST(g.min_tokens AS BIGINT) AS min_tokens,
             CAST(g.stop_permille_min AS BIGINT) AS stop_permille_min,
             CAST(sum(CASE WHEN t.n_tok >= g.min_tokens
                            AND t.n_stop * 1000
                                >= g.stop_permille_min * t.n_tok
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM t CROSS JOIN g GROUP BY 1, 2)
SELECT min_tokens, stop_permille_min, n_pass, n_docs,
       CAST(1000 * n_pass // greatest(n_docs, 1) AS BIGINT)
           AS pass_permille
FROM a
"""
    sql["shard_skew_report"] = """
WITH h AS (SELECT CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 16))::UBIGINT >> 1)
                       % 16 AS BIGINT) AS shard
           FROM documents),
c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_shards_used,
       CAST(min(n) AS BIGINT) AS min_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(1000000 * max(n)
            // greatest(1000 * sum(n) // count(*), 1) AS BIGINT)
           AS imbalance_permille
FROM c
"""
    sql["crawl_frontier_topk"] = f"""
WITH d AS ({_D}),
u AS (SELECT 'site' || site || '.example.org' AS host, {_URL} AS url
      FROM d),
c AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
r AS (SELECT u.url, u.host, c.n AS host_pages
      FROM u JOIN c USING (host))
SELECT CAST(row_number() OVER (ORDER BY host_pages, url) AS BIGINT)
           AS rank,
       url, host, host_pages
FROM r ORDER BY rank LIMIT 100
"""
    sql["adjacent_vec_distance_histogram"] = """
WITH p AS (
  SELECT CAST(list_sum(list_transform(
             list_zip(a.embedding, b.embedding),
             x -> (CAST(floor(x[1]::DOUBLE * 1000) AS BIGINT)
                   - CAST(floor(x[2]::DOUBLE * 1000) AS BIGINT)) ** 2))
         AS BIGINT) AS d2
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
SELECT CAST(length(printf('%b', d2 + 1)) - 1 AS BIGINT) AS d2_bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1
"""
    sql["label_norm_stats"] = """
WITH n AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(list_sum(list_transform(embedding,
             x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT) ** 2))
         AS BIGINT) AS n2
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(n2) AS BIGINT) AS min_norm2,
       CAST(max(n2) AS BIGINT) AS max_norm2,
       CAST(sum(n2) AS BIGINT) AS sum_norm2
FROM n GROUP BY 1
"""
    sql["median_user_value"] = """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 1000) AS BIGINT)) AS s,
                  count(*) AS n
           FROM events GROUP BY 1),
m AS (SELECT CAST(1000 * s // n AS BIGINT) AS v FROM u),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM m),
t AS (SELECT count(*) AS total FROM m),
q AS (SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille)
SELECT q.q_permille,
       (SELECT min(v) FROM r
        WHERE rn >= ceil(q.q_permille * t.total / 1000.0)) AS value
FROM t, q
"""
    sql["encoding_advisor"] = """
WITH m AS (
  SELECT 'event_type' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT CAST(event_type AS VARCHAR)) AS BIGINT)
             AS n_distinct
  FROM events
  UNION ALL
  SELECT 'user_id', CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT CAST(user_id AS VARCHAR)) AS BIGINT)
  FROM events)
SELECT "column", n_rows, n_distinct,
       CAST(1000 * n_distinct // n_rows AS BIGINT) AS ndv_permille,
       CAST(CASE WHEN 1000 * n_distinct // n_rows <= 100
                 THEN 1 ELSE 0 END AS BIGINT) AS use_dictionary
FROM m
"""
    sql["weekly_retention"] = """
WITH u AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 // 7
                      AS week
           FROM events),
j AS (SELECT a.week,
             CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS ret
      FROM u a LEFT JOIN u b
           ON b.user_id = a.user_id AND b.week = a.week + 1),
a AS (SELECT week, CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(ret) AS BIGINT) AS n_retained
      FROM j GROUP BY 1)
SELECT week, n_active, n_retained,
       CAST(1000 * n_retained // n_active AS BIGINT)
           AS retention_permille
FROM a WHERE week < (SELECT max(week) FROM u)
"""
    sql["revenue_yoy_growth"] = """
WITH r AS (SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS year,
                  CAST(sum(CAST(floor(l_extendedprice
                                      * (1 - l_discount) * 1000)
                                AS BIGINT)) AS BIGINT) AS revenue_milli
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY 1, 2),
w AS (SELECT *,
             lag(revenue_milli) OVER (PARTITION BY n_name
                                      ORDER BY year) AS prev,
             lag(year) OVER (PARTITION BY n_name
                             ORDER BY year) AS py
      FROM r)
SELECT n_name, year, revenue_milli,
       CAST(prev AS BIGINT) AS prev_revenue_milli,
       CAST(1000 * (revenue_milli - prev)
            // greatest(prev, 1) AS BIGINT) AS growth_permille
FROM w WHERE year - py = 1
"""
    sql["dim_stats"] = """
WITH u AS (SELECT g AS dim,
                  CAST(floor(embedding[g + 1]::DOUBLE * 1000)
                       AS BIGINT) AS vm
           FROM embeddings, UNNEST(range(64)) AS t(g)),
a AS (SELECT CAST(dim AS BIGINT) AS dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS sum_milli,
             CAST(sum(vm * vm) AS BIGINT) AS sumsq_millisq,
             CAST(min(vm) AS BIGINT) AS min_milli,
             CAST(max(vm) AS BIGINT) AS max_milli
      FROM u GROUP BY 1)
SELECT dim, n, sum_milli, sumsq_millisq, min_milli, max_milli,
       CAST(CASE WHEN min_milli = max_milli THEN 1 ELSE 0 END
            AS BIGINT) AS is_dead
FROM a
"""
    sql["source_lang_concentration"] = """
WITH c AS (SELECT source, lang, count(*) AS n
           FROM documents GROUP BY 1, 2),
a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(n * n) AS BIGINT) AS ss
      FROM c GROUP BY 1)
SELECT source, n_docs, n_langs,
       CAST(1000 * ss // greatest(n_docs * n_docs, 1) AS BIGINT)
           AS lang_simpson_permille
FROM a
"""
    sql["conversion_latency_histogram"] = """
WITH e AS (SELECT user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS us, event_id
           FROM events),
w AS (SELECT user_id, event_type, us,
             max(CASE WHEN event_type = 'click' THEN us END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS lc
      FROM e),
g AS (SELECT (us - lc) // 60000000 AS gap_min
      FROM w WHERE event_type = 'purchase' AND lc IS NOT NULL)
SELECT CAST(length(printf('%b', gap_min + 1)) - 1 AS BIGINT)
           AS latency_bucket,
       CAST(count(*) AS BIGINT) AS n_conversions
FROM g GROUP BY 1
"""
    sql["lorenz_revenue_deciles"] = """
WITH c AS (SELECT o_custkey,
                  sum(CAST(floor(o_totalprice * 1000) AS BIGINT))
                      AS total
           FROM orders GROUP BY 1),
r AS (SELECT total, row_number() OVER (ORDER BY total) AS rn FROM c),
t AS (SELECT count(*) AS n, sum(total) AS v FROM c),
d AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS decile)
SELECT d.decile,
       CAST(ceil(d.decile * t.n / 10.0) AS BIGINT) AS n_customers_cum,
       CAST(1000 * (SELECT sum(total) FROM r
                    WHERE rn <= ceil(d.decile * t.n / 10.0))
            // t.v AS BIGINT) AS value_share_permille
FROM d, t
"""
    sql["rowgroup_advisor"] = """
WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(length(text)) AS BIGINT) AS sum_text_bytes
           FROM documents)
SELECT n_rows, sum_text_bytes,
       CAST(1000 * sum_text_bytes // greatest(n_rows, 1) AS BIGINT)
           AS avg_row_bytes_milli,
       CAST(134217728 * n_rows // greatest(sum_text_bytes, 1)
            AS BIGINT) AS rows_per_target
FROM a
"""
    # evaluation harness: the approximate detector's SQL and the exact
    # truth's SQL compose as subqueries — the confusion matrix is then
    # recomputable end-to-end by the oracle engine
    sql["neardup_eval"] = f"""
WITH pred AS (SELECT p.pair_a AS doc_id
              FROM ({sql['simhash_near_dups']}) p
              WHERE p.pair_b = p.pair_a + 1),
truth AS ({sql['ngram_jaccard']}),
j AS (SELECT t.doc_id,
             (t.jaccard_next_permille >= 500) AS pos,
             (pred.doc_id IS NOT NULL) AS pr
      FROM truth t LEFT JOIN pred USING (doc_id)),
c AS (SELECT
        CAST(sum(CASE WHEN pr AND pos THEN 1 ELSE 0 END) AS BIGINT)
            AS tp,
        CAST(sum(CASE WHEN pr AND NOT pos THEN 1 ELSE 0 END) AS BIGINT)
            AS fp,
        CAST(sum(CASE WHEN NOT pr AND pos THEN 1 ELSE 0 END) AS BIGINT)
            AS fn,
        CAST(sum(CASE WHEN NOT pr AND NOT pos THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
      FROM j)
SELECT tp, fp, fn, tn,
       CAST(1000 * tp // greatest(tp + fp, 1) AS BIGINT)
           AS precision_permille,
       CAST(1000 * tp // greatest(tp + fn, 1) AS BIGINT)
           AS recall_permille
FROM c
"""
    sql["char_bigram_familiarity"] = """
WITH bg AS (SELECT doc_id, substr(text, i, 2) AS b
            FROM documents,
                 UNNEST(range(1, length(text))) AS t(i)),
c AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1),
s AS (SELECT bg.doc_id, CAST(sum(c.n) AS BIGINT) AS fam_sum,
             CAST(count(*) AS BIGINT) AS nb
      FROM bg JOIN c USING (b) GROUP BY 1)
SELECT d.doc_id,
       coalesce(s.nb, 0) AS n_bigrams,
       CAST(coalesce(s.fam_sum // s.nb, 0) AS BIGINT) AS familiarity
FROM documents d LEFT JOIN s USING (doc_id)
"""
    sql["basket_size_histogram"] = """
WITH o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1)
SELECT n AS basket_size, CAST(count(*) AS BIGINT) AS n_orders
FROM o GROUP BY 1
"""
    sql["lang_run_stats"] = """
WITH s AS (SELECT doc_id, lang,
                  row_number() OVER (ORDER BY doc_id) AS rn,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY doc_id) AS rl
           FROM documents),
r AS (SELECT lang, rn - rl AS isl, CAST(count(*) AS BIGINT) AS run
      FROM s GROUP BY 1, 2)
SELECT lang, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run) AS BIGINT) AS max_run,
       CAST(sum(run) AS BIGINT) AS n_docs
FROM r GROUP BY 1
"""
    sql["dau_wau_stickiness"] = """
WITH u AS (SELECT DISTINCT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM u GROUP BY 1),
w AS (SELECT t.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT day FROM u) t
      JOIN u ON u.day BETWEEN t.day - 6 AND t.day
      GROUP BY 1)
SELECT d.day, d.dau, w.wau,
       CAST(1000 * d.dau // w.wau AS BIGINT) AS stickiness_permille
FROM d JOIN w USING (day)
"""
    sql["event_debounce"] = """
WITH x AS (SELECT event_id, user_id, event_type, ts,
                  lag(ts) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS pts
           FROM events)
SELECT event_id, user_id, event_type FROM x
WHERE pts IS NULL OR ts - pts > INTERVAL 60 SECOND
"""
    sql["batch_padding_plan"] = """
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
           FROM documents),
r AS (SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS rn
      FROM t)
SELECT CAST(rn // 64 AS BIGINT) AS batch_id,
       count(*) AS n_docs,
       CAST(max(n_tok) AS BIGINT) AS max_tokens,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
FROM r GROUP BY 1
"""
    sql["personalized_pagerank"] = """
WITH p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS src, vb AS dst FROM p
      UNION ALL SELECT vb AS src, va AS dst FROM p),
n AS (SELECT vec_id AS node,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS seed
      FROM embeddings),
d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(seed * 1000000 AS BIGINT) AS r FROM n),
s1 AS (SELECT e.dst AS node,
              CAST(sum((r0.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r0 ON r0.node = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.node, CAST(n.seed * 150000 + COALESCE(s1.s, 0) AS BIGINT)
               AS r
       FROM n LEFT JOIN s1 ON s1.node = n.node),
s2 AS (SELECT e.dst AS node,
              CAST(sum((r1.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r1 ON r1.node = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.node, CAST(n.seed * 150000 + COALESCE(s2.s, 0) AS BIGINT)
               AS r
       FROM n LEFT JOIN s2 ON s2.node = n.node),
s3 AS (SELECT e.dst AS node,
              CAST(sum((r2.r * 85) // (100 * d.outdeg)) AS BIGINT) AS s
       FROM e JOIN d ON d.src = e.src JOIN r2 ON r2.node = e.src
       GROUP BY e.dst),
r3 AS (SELECT n.node, CAST(n.seed * 150000 + COALESCE(s3.s, 0) AS BIGINT)
               AS r
       FROM n LEFT JOIN s3 ON s3.node = n.node)
SELECT node, r AS rank_micro FROM r3
"""
    sql["tag_census"] = f"""
WITH d AS ({_D}),
x AS (SELECT {_URL} AS url,
       base_text || {_TEXT_SUFFIX} AS text,
       '<!DOCTYPE html><html lang="' || lang
       || '"><head><meta charset="utf-8">'
       || '<meta name="generator" content="engine/2.1">'
       || CASE WHEN slot IN (0,1)
               THEN '<meta name="citation_doi" content="10.' || reg
                    || '/meta.' || ks || '">'
               WHEN slot = 2
               THEN '<meta name="wps-journaldoi" content="10.' || reg
                    || '/blocked.' || ks || '">'
               WHEN slot = 12
               THEN '<meta name="citation_doi" content="10.' || reg
                    || '/mc.' || ks || '">'
               WHEN slot = 16
               THEN '<meta name="author" content="nobody">'
                    || '<meta name="identifier" content="10.' || reg
                    || ':ns.' || ks || '">'
               ELSE '' END
       || '<title>Document ' || ks || ' from site' || site
       || '.example.org</title></head><body><header><nav>Home | About | '
       || 'site' || site || '.example.org</nav></header><h1>Study ' || ks
       || ' of stream processing</h1><main>'
       || replace(replace(replace(base_text || {_TEXT_SUFFIX},
                                  '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
       || '</main><footer>&copy; site' || site
       || '.example.org archive</footer></body></html>' AS html
      FROM d)
SELECT url,
       CAST(len(string_split(html, '<meta ')) - 1 AS BIGINT) AS n_meta,
       CAST(length(html) AS BIGINT) AS html_chars,
       CAST(length(text) AS BIGINT) AS text_chars,
       CAST(1000 * length(text) // length(html) AS BIGINT)
           AS markup_permille
FROM x
"""
    sql["crawl_recency_report"] = f"""
WITH d AS ({_D}),
m AS (SELECT max(k) AS mk FROM d)
SELECT 'site' || site || '.example.org' AS host,
       CAST(sum(CASE WHEN mk - k <= 21600 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fresh,
       CAST(sum(CASE WHEN mk - k > 21600 AND mk - k <= 86400
                THEN 1 ELSE 0 END) AS BIGINT) AS n_day,
       CAST(sum(CASE WHEN mk - k > 86400 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_old,
       CAST(min(mk - k) AS BIGINT) AS latest_age_s
FROM d, m GROUP BY 1
"""
    sql["recency_weighted_value"] = """
WITH e AS (SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS vm,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events),
m AS (SELECT max(day) AS md FROM e)
SELECT user_id,
       CAST(sum(CASE WHEN md - day >= 63 THEN 0
                ELSE vm // CAST(power(2, md - day) AS BIGINT) END)
            AS BIGINT) AS recency_score_milli
FROM e, m GROUP BY 1
"""
    sql["doc_frequency_spectrum"] = """
WITH x AS (SELECT DISTINCT doc_id, term
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents)),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS d FROM x GROUP BY 1)
SELECT d AS doc_freq, CAST(count(*) AS BIGINT) AS n_terms
FROM df GROUP BY 1
"""
    sql["vocab_growth_curve"] = """
WITH r AS (SELECT doc_id, source, text,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY doc_id) AS rn
           FROM documents),
t AS (SELECT DISTINCT source, rn, term
      FROM (SELECT source, rn, unnest(string_split(text, ' ')) AS term
            FROM r)),
f AS (SELECT source, term, min(rn) AS fr FROM t GROUP BY 1, 2),
p AS (SELECT unnest([8, 32, 128, 512]) AS probe)
SELECT f.source, CAST(p.probe AS BIGINT) AS probe,
       CAST(count(*) AS BIGINT) AS vocab_size
FROM f, p WHERE f.fr <= p.probe GROUP BY 1, 2
"""
    sql["method_agreement"] = f"""
WITH d AS ({_D}),
x AS (SELECT
  CASE WHEN slot IN (0,1) THEN '10.' || reg || '/meta.' || ks
       WHEN slot = 12 THEN '10.' || reg || '/mc.' || ks
       WHEN slot = 16 THEN '10.' || reg || '/ns.' || ks END AS meta_id,
  CASE WHEN slot IN (3,4,13)
       THEN '10.' || reg || '/u' || ks || '.pdf' END AS file_id,
  CASE WHEN slot = 2  THEN '10.' || reg || '/tx.' || ks
       WHEN slot = 6  THEN '10.' || reg || '/tm.' || ks
       WHEN slot IN (7,8) THEN '10.' || reg || '/tb.' || ks
       WHEN slot = 9  THEN '10.' || reg || '/v.' || ks
       WHEN slot = 10 THEN '10.' || reg || '/uf.' || ks
       WHEN slot IN (12,13) THEN '10.' || reg || '/tc.' || ks
       WHEN slot = 14 THEN '10.' || reg || '/dd.' || ks
       WHEN slot = 15 THEN '10.' || reg || '/m1.' || ks
       WHEN slot = 17 THEN '10.' || reg || '/td.' || ks END AS text_id
  FROM d)
SELECT 'document_infos' AS method_a, 'filename' AS method_b,
       CAST(sum(CASE WHEN meta_id IS NOT NULL AND file_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN meta_id = file_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
FROM x
UNION ALL
SELECT 'document_infos', 'document_text',
       CAST(sum(CASE WHEN meta_id IS NOT NULL AND text_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN meta_id = text_id THEN 1 ELSE 0 END) AS BIGINT)
FROM x
UNION ALL
SELECT 'filename', 'document_text',
       CAST(sum(CASE WHEN file_id IS NOT NULL AND text_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN file_id = text_id THEN 1 ELSE 0 END) AS BIGINT)
FROM x
"""
    sql["skipgram_cooccurrence"] = """
WITH l AS (SELECT list_filter(string_split(text, ' '), x -> x <> '')
               AS toks
           FROM documents),
sg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS pair
  FROM l WHERE len(toks) >= 2
  UNION ALL
  SELECT unnest(list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+2]))
  FROM l WHERE len(toks) >= 3
  UNION ALL
  SELECT unnest(list_transform(range(1, len(toks) - 2),
                               i -> toks[i] || ' ' || toks[i+3]))
  FROM l WHERE len(toks) >= 4)
SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, pair) AS BIGINT)
           AS rank,
       pair, count(*) AS n_occurrences
FROM sg GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 20
"""
    sql["edge_triangle_support"] = """
WITH p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.30),
t AS (SELECT e1.va AS x, e1.vb AS y, e2.vb AS z
      FROM p e1 JOIN p e2 ON e1.vb = e2.va
      JOIN p e3 ON e3.va = e1.va AND e3.vb = e2.vb),
u AS (SELECT x AS a, y AS b FROM t
      UNION ALL SELECT x, z FROM t
      UNION ALL SELECT y, z FROM t),
s AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2)
SELECT p.va AS vec_a, p.vb AS vec_b,
       CAST(COALESCE(s.c, 0) AS BIGINT) AS support
FROM p LEFT JOIN s ON s.a = p.va AND s.b = p.vb
"""
    sql["doc_novelty"] = """
WITH x AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
dx AS (SELECT DISTINCT doc_id, term FROM x),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dx GROUP BY 1),
fd AS (SELECT term, min(doc_id) AS d0 FROM dx GROUP BY 1),
nw AS (SELECT d0 AS doc_id, CAST(count(*) AS BIGINT) AS n FROM fd
       GROUP BY 1)
SELECT t.doc_id, t.n AS n_terms,
       CAST(COALESCE(w.n, 0) AS BIGINT) AS n_new_terms,
       CAST(1000 * COALESCE(w.n, 0) // t.n AS BIGINT) AS novelty_permille
FROM tot t LEFT JOIN nw w USING (doc_id)
"""
    sql["delta_oov_rate"] = """
WITH ov AS (SELECT DISTINCT term
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents WHERE doc_id % 2 = 0)),
np AS (SELECT DISTINCT doc_id, term
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents WHERE doc_id % 2 = 1)),
agg AS (SELECT np.doc_id,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(CASE WHEN ov.term IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM np LEFT JOIN ov ON np.term = ov.term
        GROUP BY 1)
SELECT doc_id, n_terms, n_oov,
       CAST(1000 * n_oov // n_terms AS BIGINT) AS oov_permille
FROM agg
"""
    sql["aspect_bucket_plan"] = """
WITH i AS (SELECT 8 + doc_id % 32 AS w, 8 + doc_id % 16 AS h
           FROM documents),
r AS (SELECT 1000 * w // h AS rp FROM i)
SELECT CAST(CASE WHEN rp <= 625 THEN 500
                 WHEN rp <= 875 THEN 750
                 WHEN rp <= 1167 THEN 1000
                 WHEN rp <= 1667 THEN 1333
                 ELSE 2000 END AS BIGINT) AS bucket_permille,
       count(*) AS n_images
FROM r GROUP BY 1
"""
    sql["manifest_reconcile"] = """
WITH l AS (SELECT doc_id AS id FROM documents WHERE n_chars >= 100),
r AS (SELECT vec_id AS id FROM embeddings WHERE label <> 2)
SELECT COALESCE(l.id, r.id) AS id,
       CAST(CASE WHEN l.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS has_text,
       CAST(CASE WHEN r.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS has_embedding
FROM l FULL OUTER JOIN r ON l.id = r.id
WHERE l.id IS NULL OR r.id IS NULL
"""
    sql["lineage_stamps"] = f"""
WITH d AS ({_D}),
x AS (SELECT k % 16 AS shard,
             md5({_URL} || '|' || COALESCE({_IDENTIFIER}, '')) AS stamp,
             CASE WHEN {_IDENTIFIER} IS NOT NULL THEN 1 ELSE 0 END AS f
      FROM d)
SELECT CAST(shard AS BIGINT) AS shard,
       count(*) AS n_rows,
       CAST(sum(f) AS BIGINT) AS n_found,
       min(stamp) AS min_stamp,
       max(stamp) AS max_stamp
FROM x GROUP BY 1
"""
    sql["title_h1_consistency"] = f"""
WITH d AS ({_D}),
x AS (SELECT {_URL} AS url,
       list_distinct(string_split(
           'Document ' || ks || ' from site' || site || '.example.org',
           ' ')) AS tt,
       list_distinct(string_split(
           'Study ' || ks || ' of stream processing', ' ')) AS th
      FROM d),
y AS (SELECT url, len(tt) AS nt, len(th) AS nh,
             len(list_intersect(tt, th)) AS nc
      FROM x)
SELECT url, CAST(nt AS BIGINT) AS n_title_terms,
       CAST(nh AS BIGINT) AS n_h1_terms,
       CAST(nc AS BIGINT) AS n_common,
       CAST(1000 * nc // (nt + nh - nc) AS BIGINT) AS jaccard_permille
FROM y
"""
    sql["value_decile_transition"] = """
WITH e AS (SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS vm,
                  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
           FROM events),
m AS (SELECT min(day) AS d0 FROM e),
w AS (SELECT user_id, (day - d0) // 7 AS wk, vm FROM e, m
      WHERE (day - d0) // 7 IN (0, 1)),
s AS (SELECT user_id, wk, CAST(sum(vm) AS BIGINT) AS sv
      FROM w GROUP BY 1, 2),
r AS (SELECT user_id, wk,
             row_number() OVER (PARTITION BY wk
                                ORDER BY sv, user_id) - 1 AS rk,
             count(*) OVER (PARTITION BY wk) AS n
      FROM s),
d AS (SELECT user_id, wk, rk * 10 // n AS dec FROM r)
SELECT CAST(d1.dec AS BIGINT) AS dec_w1,
       CAST(d2.dec AS BIGINT) AS dec_w2,
       count(*) AS n_users
FROM (SELECT * FROM d WHERE wk = 0) d1
JOIN (SELECT * FROM d WHERE wk = 1) d2 USING (user_id)
GROUP BY 1, 2
"""
    # ADVICE r4 fix: the engine counts UTF-8 BYTES; the oracle now
    # derives each codepoint's UTF-8 byte sequence arithmetically
    # (1-4 bytes per cp) instead of counting codepoints, so non-ASCII
    # corpora stay byte-exact.
    sql["byte_inventory_by_lang"] = """
WITH d AS (SELECT lang, text, length(text) AS n FROM documents),
c AS (SELECT lang, unicode(substr(text, CAST(i AS INT), 1)) AS cp
      FROM d, unnest(range(1, n + 1)) AS g(i)),
bb AS (SELECT lang, CASE
          WHEN cp < 128 THEN cp
          WHEN cp < 2048 THEN
            CASE j WHEN 1 THEN 192 + cp // 64 ELSE 128 + cp % 64 END
          WHEN cp < 65536 THEN
            CASE j WHEN 1 THEN 224 + cp // 4096
                   WHEN 2 THEN 128 + (cp // 64) % 64
                   ELSE 128 + cp % 64 END
          ELSE
            CASE j WHEN 1 THEN 240 + cp // 262144
                   WHEN 2 THEN 128 + (cp // 4096) % 64
                   WHEN 3 THEN 128 + (cp // 64) % 64
                   ELSE 128 + cp % 64 END
        END AS b
      FROM c, unnest(range(1, CASE WHEN cp < 128 THEN 2
                                   WHEN cp < 2048 THEN 3
                                   WHEN cp < 65536 THEN 4
                                   ELSE 5 END)) AS gj(j)),
h AS (SELECT lang, b, CAST(count(*) AS BIGINT) AS cnt
      FROM bb GROUP BY 1, 2),
t AS (SELECT lang, b, cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, b) AS rk
      FROM h)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
       CAST(sum(cnt) AS BIGINT) AS n_bytes,
       CAST(max(CASE WHEN rk = 1 THEN b END) AS BIGINT) AS top_byte,
       CAST(max(CASE WHEN rk = 1 THEN cnt END) AS BIGINT)
           AS top_byte_count
FROM t GROUP BY 1
"""
    sql["top_docs_per_lang_ties"] = """
WITH t AS (SELECT lang, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
r AS (SELECT lang, n_tokens,
             rank() OVER (PARTITION BY lang
                          ORDER BY n_tokens DESC) AS rk
      FROM t)
SELECT lang, CAST(rk AS BIGINT) AS rank,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM r WHERE rk <= 5
"""
    sql["token_weighted_char_quantiles"] = """
WITH t AS (SELECT length(text) AS n_chars,
                  len(string_split(text, ' ')) AS tok
           FROM documents),
h AS (SELECT n_chars, CAST(sum(tok) AS BIGINT) AS toks
      FROM t GROUP BY 1),
c AS (SELECT n_chars,
             CAST(sum(toks) OVER (ORDER BY n_chars) AS BIGINT) AS cum,
             CAST((SELECT sum(toks) FROM h) AS BIGINT) AS total
      FROM h),
p AS (SELECT unnest([250, 500, 750, 900]) AS q),
sel AS (SELECT p.q, min(c.n_chars) AS nc
        FROM p JOIN c ON c.cum * 1000 >= p.q * c.total GROUP BY 1)
SELECT CAST(sel.q AS BIGINT) AS quantile_permille,
       CAST(sel.nc AS BIGINT) AS n_chars,
       c.cum AS cum_tokens, c.total AS total_tokens
FROM sel JOIN c ON c.n_chars = sel.nc
"""
    sql["strip_tags_baseline"] = f"""
WITH d AS ({_D}),
x AS (SELECT {_URL} AS url,
       replace(replace(replace(base_text || {_TEXT_SUFFIX},
                               '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
           AS esc,
       '<!DOCTYPE html><html lang="' || lang
       || '"><head><meta charset="utf-8">'
       || '<meta name="generator" content="engine/2.1">'
       || CASE WHEN slot IN (0,1)
               THEN '<meta name="citation_doi" content="10.' || reg
                    || '/meta.' || ks || '">'
               WHEN slot = 2
               THEN '<meta name="wps-journaldoi" content="10.' || reg
                    || '/blocked.' || ks || '">'
               WHEN slot = 12
               THEN '<meta name="citation_doi" content="10.' || reg
                    || '/mc.' || ks || '">'
               WHEN slot = 16
               THEN '<meta name="author" content="nobody">'
                    || '<meta name="identifier" content="10.' || reg
                    || ':ns.' || ks || '">'
               ELSE '' END
       || '<title>Document ' || ks || ' from site' || site
       || '.example.org</title></head><body><header><nav>Home | About | '
       || 'site' || site || '.example.org</nav></header><h1>Study ' || ks
       || ' of stream processing</h1><main>' AS head,
       '</main><footer>&copy; site' || site
       || '.example.org archive</footer></body></html>' AS tail
      FROM d),
y AS (SELECT url,
             length(regexp_replace(head || esc || tail,
                                   '<[^>]*>', '', 'g')) AS sl,
             length(esc) AS ml
      FROM x)
SELECT url, CAST(sl AS BIGINT) AS n_stripped_chars,
       CAST(ml AS BIGINT) AS n_main_chars,
       CAST(1000 * (sl - ml) // sl AS BIGINT) AS chrome_permille
FROM y
"""
    sql["dup_canonical_map"] = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
reach(node, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
q AS (SELECT c.node, c.component, m.label AS ql
      FROM comp c JOIN embeddings m ON m.vec_id = c.node),
champ AS (SELECT component, node AS canonical,
                 row_number() OVER (PARTITION BY component
                                    ORDER BY ql DESC, node) AS rk
          FROM q)
SELECT q.node, ch.canonical
FROM q JOIN (SELECT component, canonical FROM champ WHERE rk = 1) ch
USING (component)
WHERE q.node <> ch.canonical
"""
    sql["corpus_datacard"] = """
WITH q AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','and','of','to','is','it'))) AS n_stop
  FROM documents)
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value
FROM documents
UNION ALL
SELECT 'n_tokens', CAST(sum(len(string_split(text, ' '))) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', CAST(sum(length(text)) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_quality',
       CAST(sum(CASE WHEN n_tokens >= 20
                      AND n_stop * 1000 >= 50 * n_tokens
                THEN 1 ELSE 0 END) AS BIGINT)
FROM q
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_distinct_texts', CAST(count(DISTINCT text) AS BIGINT)
FROM documents
"""
    # incremental maintenance must be transparent: oracle IS the
    # full-graph recompute
    sql["components_incremental"] = sql["embedding_dup_components"]
    sql["title_template_diversity"] = f"""
WITH d AS ({_D}),
x AS (SELECT 'site' || site || '.example.org' AS host,
             regexp_replace('Document ' || ks || ' from site' || site
                            || '.example.org', '[0-9]+', '#', 'g')
                 AS template
      FROM d),
t AS (SELECT host, template, CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY 1, 2)
SELECT host, CAST(sum(n) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_templates,
       CAST(sum(n) // count(*) AS BIGINT) AS pages_per_template
FROM t GROUP BY 1
"""
    sql["cluster_churn_report"] = """
WITH RECURSIVE p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= 0.40),
pe AS (SELECT va, vb FROM p WHERE va % 2 = 0 AND vb % 2 = 0),
e1 AS (SELECT va AS a, vb AS b FROM pe UNION SELECT vb, va FROM pe),
r1(node, r) AS (
  SELECT a, a FROM e1
  UNION
  SELECT e1.a, r1.r FROM e1 JOIN r1 ON r1.node = e1.b),
c1 AS (SELECT node, min(r) AS oc FROM r1 GROUP BY node),
e2 AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
r2(node, r) AS (
  SELECT a, a FROM e2
  UNION
  SELECT e2.a, r2.r FROM e2 JOIN r2 ON r2.node = e2.b),
c2 AS (SELECT node, min(r) AS nc FROM r2 GROUP BY node),
j AS (SELECT c1.oc, c2.nc
      FROM c1 FULL OUTER JOIN c2 ON c1.node = c2.node),
ed AS (SELECT DISTINCT oc, nc FROM j
       WHERE oc IS NOT NULL AND nc IS NOT NULL),
so AS (SELECT oc, count(*) AS c FROM ed GROUP BY 1),
sn AS (SELECT nc, count(*) AS c FROM ed GROUP BY 1)
SELECT 'n_old_clusters' AS metric,
       CAST(count(DISTINCT oc) AS BIGINT) AS value FROM c1
UNION ALL
SELECT 'n_new_clusters', CAST(count(DISTINCT nc) AS BIGINT) FROM c2
UNION ALL
SELECT 'n_shared_nodes', CAST(count(*) AS BIGINT) FROM j
WHERE oc IS NOT NULL AND nc IS NOT NULL
UNION ALL
SELECT 'n_new_nodes', CAST(count(*) AS BIGINT) FROM j WHERE oc IS NULL
UNION ALL
SELECT 'n_dropped_nodes', CAST(count(*) AS BIGINT) FROM j
WHERE nc IS NULL
UNION ALL
SELECT 'n_split_old', CAST(count(*) AS BIGINT) FROM so WHERE c > 1
UNION ALL
SELECT 'n_merged_new', CAST(count(*) AS BIGINT) FROM sn WHERE c > 1
"""
    sql["pps_systematic_sample"] = """
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT doc_id, tok,
             CAST(sum(tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ca,
             CAST((SELECT sum(tok) FROM t) AS BIGINT) AS total
      FROM t)
SELECT doc_id, CAST(tok AS BIGINT) AS n_tokens
FROM c
WHERE (ca * 100) // total > ((ca - tok) * 100) // total
"""

    sql["langid_trigram"] = """
WITH d AS (SELECT doc_id, lang, text, length(text) AS n FROM documents),
tg AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS g
       FROM d, unnest(range(1, n - 1)) AS u(i)),
cnt AS (SELECT lang, g, count(*) AS c FROM tg GROUP BY 1, 2),
prof AS (SELECT lang AS plang, g FROM
           (SELECT lang, g,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY c DESC, g) AS rk
            FROM cnt) WHERE rk <= 20),
dt AS (SELECT DISTINCT doc_id, g FROM tg),
langs AS (SELECT DISTINCT plang FROM prof),
ovr AS (SELECT dt.doc_id, prof.plang, count(*) AS o
        FROM dt JOIN prof ON dt.g = prof.g GROUP BY 1, 2),
grid AS (SELECT d.doc_id, d.lang, l.plang, coalesce(ovr.o, 0) AS o
         FROM d CROSS JOIN langs l
         LEFT JOIN ovr ON ovr.doc_id = d.doc_id AND ovr.plang = l.plang),
pick AS (SELECT doc_id, lang, plang,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY o DESC, plang) AS rk
         FROM grid)
SELECT lang, plang AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pick WHERE rk = 1 GROUP BY 1, 2
"""
    sql["tokenizer_fertility"] = r"""
WITH t AS (SELECT lang,
                  len(string_split(text, ' ')) AS w,
                  len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS s,
                  length(text) AS c
           FROM documents),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS n_words,
             CAST(sum(s) AS BIGINT) AS n_subtokens,
             CAST(sum(c) AS BIGINT) AS nc
      FROM t GROUP BY 1)
SELECT lang, n_docs, n_words, n_subtokens,
       CAST(CASE WHEN n_words > 0 THEN 1000 * n_subtokens // n_words
            ELSE 0 END AS BIGINT) AS fertility_permille,
       CAST(CASE WHEN n_subtokens > 0 THEN 1000 * nc // n_subtokens
            ELSE 0 END AS BIGINT) AS chars_per_subtoken_permille
FROM a
"""

    sql["temperature_mixture_plan"] = """
WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                      AS n_tokens
           FROM documents GROUP BY 1),
w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS wgt FROM a),
tot AS (SELECT sum(n_tokens) AS tt, sum(wgt) AS tw FROM w)
SELECT source, n_docs, n_tokens,
       CAST(1000 * wgt // tw AS BIGINT) AS weight_permille,
       CAST(CAST(1000 AS HUGEINT) * tt * wgt // (tw * n_tokens)
            AS BIGINT) AS epochs_permille
FROM w, tot
"""
    sql["bitext_candidates"] = """
SELECT a.source AS key, a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.lang AS lang_a, b.lang AS lang_b,
       CAST(abs(length(a.text) - length(b.text)) AS BIGINT) AS len_diff
FROM documents a JOIN documents b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE a.lang <> b.lang
  AND abs(length(a.text) - length(b.text)) <= 200
"""
    sql["url_tree_rollup"] = """
WITH u AS (SELECT 's' || CAST(doc_id % 5 AS VARCHAR) || '.example.org'
                      AS host,
                  '/a' || CAST(doc_id % 7 AS VARCHAR)
                  || CASE WHEN doc_id % 3 > 0
                          THEN '/b' || CAST(doc_id % 3 AS VARCHAR)
                          ELSE '' END
                  || '/p' || CAST(doc_id AS VARCHAR) AS path
           FROM documents),
s AS (SELECT host, string_split(path, '/') AS segs FROM u),
p AS (SELECT host, CAST(r.d AS BIGINT) AS depth,
             '/' || array_to_string(segs[2:CAST(r.d AS INT) + 1], '/')
                 AS prefix
      FROM s, unnest(range(1, len(segs))) AS r(d))
SELECT host, depth, prefix, CAST(count(*) AS BIGINT) AS n_pages
FROM p GROUP BY 1, 2, 3
"""

    sql["near_dup_delta"] = f"""
WITH split AS (SELECT (max(doc_id) + 1) // 2 AS sp FROM documents),
fp AS ({sql["minhash_near_dups"]})
SELECT CASE WHEN fp.doc_a < split.sp THEN fp.doc_a ELSE fp.doc_b END
           AS doc_old,
       CASE WHEN fp.doc_a < split.sp THEN fp.doc_b ELSE fp.doc_a END
           AS doc_new,
       fp.jaccard_permille
FROM fp, split
WHERE (fp.doc_a < split.sp) <> (fp.doc_b < split.sp)
"""

    sql["bigram_collision"] = """
WITH d AS (SELECT lang, text, length(text) AS n FROM documents),
b AS (SELECT lang, substr(text, CAST(i AS INT), 2) AS bg
      FROM d, unnest(range(1, n)) AS u(i)),
c AS (SELECT lang, bg, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2)
SELECT lang, CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(CAST(1000000 AS HUGEINT) * sum(CAST(c AS HUGEINT) * c)
            // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT)
           AS collision_ppm
FROM c GROUP BY 1
"""
    sql["suffix_prefix_overlap"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
s AS (
  SELECT doc_id * 2 AS doc_id,
         array_to_string(tk[1:len(tk) // 2 + 8], ' ') AS text
  FROM t WHERE len(tk) >= 24
  UNION ALL
  SELECT doc_id * 2 + 1,
         array_to_string(tk[len(tk) // 2 + 1:len(tk)], ' ')
  FROM t WHERE len(tk) >= 24
  UNION ALL
  SELECT doc_id * 2, array_to_string(tk, ' ')
  FROM t WHERE len(tk) < 24),
e AS (SELECT doc_id, string_split(text, ' ') AS k2 FROM s),
f AS (SELECT doc_id,
             array_to_string(k2[1:8], ' ') AS head,
             array_to_string(k2[len(k2) - 7:len(k2)], ' ') AS tail
      FROM e WHERE len(k2) >= 8)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tail AS boundary_gram
FROM f a JOIN f b ON a.tail = b.head AND a.doc_id <> b.doc_id
"""

    sql["containment_pairs"] = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '')
                         AS tk
              FROM documents),
g AS (SELECT doc_id,
             array_to_string(tk[CAST(i + 1 AS INT):CAST(i + 3 AS INT)],
                             ' ') AS gr
      FROM toks, unnest(range(0, len(tk) - 2)) AS t(i)
      WHERE len(tk) >= 3),
sh AS (SELECT DISTINCT doc_id,
              CAST((('0x' || substr(md5(gr), 1, 16))::UBIGINT >> 1)
                   AS BIGINT) AS h
       FROM g),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM sh GROUP BY 1),
ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS inter
       FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT ov.doc_a, ov.doc_b,
       CAST(1000 * inter // least(sa.s, sb.s) AS BIGINT)
           AS containment_permille
FROM ov JOIN sz sa ON sa.doc_id = ov.doc_a
        JOIN sz sb ON sb.doc_id = ov.doc_b
WHERE 1000 * inter >= 500 * least(sa.s, sb.s)
"""
    sql["kcore_embedding_graph"] = """
WITH p AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.30),
e AS MATERIALIZED (SELECT va AS s, vb AS d FROM p
                   UNION ALL SELECT vb, va FROM p),
nodes AS MATERIALIZED (SELECT DISTINCT s AS n FROM e),
rm0(v) AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) WHERE false),
dg0 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm0)
          AND e.d NOT IN (SELECT v FROM rm0)
  GROUP BY 1),
rm1(v) AS MATERIALIZED (SELECT v FROM rm0 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm0)
    AND coalesce((SELECT c FROM dg0 WHERE dg0.n = nodes.n), 0) < 2),
dg1 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm1)
          AND e.d NOT IN (SELECT v FROM rm1)
  GROUP BY 1),
rm2(v) AS MATERIALIZED (SELECT v FROM rm1 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm1)
    AND coalesce((SELECT c FROM dg1 WHERE dg1.n = nodes.n), 0) < 2),
dg2 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm2)
          AND e.d NOT IN (SELECT v FROM rm2)
  GROUP BY 1),
rm3(v) AS MATERIALIZED (SELECT v FROM rm2 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm2)
    AND coalesce((SELECT c FROM dg2 WHERE dg2.n = nodes.n), 0) < 2),
dg3 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm3)
          AND e.d NOT IN (SELECT v FROM rm3)
  GROUP BY 1),
rm4(v) AS MATERIALIZED (SELECT v FROM rm3 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm3)
    AND coalesce((SELECT c FROM dg3 WHERE dg3.n = nodes.n), 0) < 2),
dg4 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm4)
          AND e.d NOT IN (SELECT v FROM rm4)
  GROUP BY 1),
rm5(v) AS MATERIALIZED (SELECT v FROM rm4 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm4)
    AND coalesce((SELECT c FROM dg4 WHERE dg4.n = nodes.n), 0) < 2),
dg5 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm5)
          AND e.d NOT IN (SELECT v FROM rm5)
  GROUP BY 1),
rm6(v) AS MATERIALIZED (SELECT v FROM rm5 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm5)
    AND coalesce((SELECT c FROM dg5 WHERE dg5.n = nodes.n), 0) < 2),
dg6 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm6)
          AND e.d NOT IN (SELECT v FROM rm6)
  GROUP BY 1),
rm7(v) AS MATERIALIZED (SELECT v FROM rm6 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm6)
    AND coalesce((SELECT c FROM dg6 WHERE dg6.n = nodes.n), 0) < 2),
dg7 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm7)
          AND e.d NOT IN (SELECT v FROM rm7)
  GROUP BY 1),
rm8(v) AS MATERIALIZED (SELECT v FROM rm7 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm7)
    AND coalesce((SELECT c FROM dg7 WHERE dg7.n = nodes.n), 0) < 2),
dg8 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm8)
          AND e.d NOT IN (SELECT v FROM rm8)
  GROUP BY 1),
rm9(v) AS MATERIALIZED (SELECT v FROM rm8 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm8)
    AND coalesce((SELECT c FROM dg8 WHERE dg8.n = nodes.n), 0) < 2),
dg9 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm9)
          AND e.d NOT IN (SELECT v FROM rm9)
  GROUP BY 1),
rm10(v) AS MATERIALIZED (SELECT v FROM rm9 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm9)
    AND coalesce((SELECT c FROM dg9 WHERE dg9.n = nodes.n), 0) < 2),
dg10 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm10)
          AND e.d NOT IN (SELECT v FROM rm10)
  GROUP BY 1),
rm11(v) AS MATERIALIZED (SELECT v FROM rm10 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm10)
    AND coalesce((SELECT c FROM dg10 WHERE dg10.n = nodes.n), 0) < 2),
dg11 AS MATERIALIZED (SELECT e.s AS n, CAST(count(*) AS BIGINT) AS c
  FROM e WHERE e.s NOT IN (SELECT v FROM rm11)
          AND e.d NOT IN (SELECT v FROM rm11)
  GROUP BY 1),
rm12(v) AS MATERIALIZED (SELECT v FROM rm11 UNION
  SELECT n FROM nodes WHERE n NOT IN (SELECT v FROM rm11)
    AND coalesce((SELECT c FROM dg11 WHERE dg11.n = nodes.n), 0) < 2)
SELECT n AS node, c AS core_degree FROM dg11
WHERE n NOT IN (SELECT v FROM rm12)"""

    sql["curate_v4"] = """
WITH d0 AS (SELECT doc_id, text, lang, source, length(text) AS n
            FROM documents),
tg AS (SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS g
       FROM d0, unnest(range(1, n - 1)) AS u(i)),
cnt AS (SELECT lang, g, count(*) AS c FROM tg GROUP BY 1, 2),
prof AS (SELECT lang AS plang, g FROM
           (SELECT lang, g,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY c DESC, g) AS rk
            FROM cnt) WHERE rk <= 20),
dt AS (SELECT DISTINCT doc_id, g FROM tg),
langs AS (SELECT DISTINCT plang FROM prof),
ovr AS (SELECT dt.doc_id, prof.plang, count(*) AS o
        FROM dt JOIN prof ON dt.g = prof.g GROUP BY 1, 2),
grid AS (SELECT d0.doc_id, d0.lang, l.plang, coalesce(ovr.o, 0) AS o
         FROM d0 CROSS JOIN langs l
         LEFT JOIN ovr ON ovr.doc_id = d0.doc_id
                      AND ovr.plang = l.plang),
pick AS (SELECT doc_id, lang, plang,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY o DESC, plang) AS rk
         FROM grid),
surv1 AS (SELECT d0.* FROM d0
          JOIN pick ON pick.doc_id = d0.doc_id AND pick.rk = 1
                   AND pick.plang = d0.lang),
toks AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS tk
         FROM surv1),
gr AS (SELECT doc_id,
              array_to_string(tk[CAST(i + 1 AS INT):CAST(i + 3 AS INT)],
                              ' ') AS gtxt
       FROM toks, unnest(range(0, len(tk) - 2)) AS t(i)
       WHERE len(tk) >= 3),
sh AS (SELECT DISTINCT doc_id,
              CAST((('0x' || substr(md5(gtxt), 1, 16))::UBIGINT >> 1)
                   AS BIGINT) AS h
       FROM gr),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM sh GROUP BY 1),
ov2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
drops AS (SELECT DISTINCT ov2.doc_b FROM ov2
          JOIN sz sa ON sa.doc_id = ov2.doc_a
          JOIN sz sb ON sb.doc_id = ov2.doc_b
          WHERE 1000 * inter >= 900 * least(sa.s, sb.s)),
surv2 AS (SELECT * FROM surv1
          WHERE doc_id NOT IN (SELECT doc_b FROM drops)),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                 AS n_tokens
      FROM surv2 GROUP BY 1),
w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS wgt FROM a),
tot AS (SELECT sum(n_tokens) AS tt, sum(wgt) AS tw FROM w)
SELECT source, n_docs, n_tokens,
       CAST(1000 * wgt // tw AS BIGINT) AS weight_permille,
       CAST(CAST(1000 AS HUGEINT) * tt * wgt // (tw * n_tokens)
            AS BIGINT) AS epochs_permille
FROM w, tot
"""

    sql["feather_roundtrip"] = """
SELECT doc_id, text, lang, n_chars FROM documents
"""

    sql["t5_span_corruption"] = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), y -> y <> '') AS tk
           FROM documents),
x AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             tk[CAST(u.i AS INT) + 1] AS tok
      FROM t, unnest(range(0, len(tk))) AS u(i)),
m AS (SELECT *, CASE WHEN (pos * 31 + doc_id * 17) % 8 = 0
                     THEN 1 ELSE 0 END AS msk FROM x),
r AS (SELECT *, CASE WHEN msk = 1 AND coalesce(
                       lag(msk) OVER (PARTITION BY doc_id ORDER BY pos),
                       0) = 0 THEN 1 ELSE 0 END AS run_start FROM m),
r2 AS (SELECT *, sum(run_start) OVER (PARTITION BY doc_id
                                      ORDER BY pos) - 1 AS rid FROM r),
inp AS (SELECT doc_id,
               2 * pos + CASE WHEN msk = 0 THEN 1 ELSE 0 END AS k,
               CASE WHEN msk = 0 THEN tok
                    ELSE '<X_' || rid || '>' END AS v
        FROM r2 WHERE msk = 0 OR run_start = 1),
tgt AS (SELECT doc_id, 2 * pos AS k, '<X_' || rid || '>' AS v
        FROM r2 WHERE run_start = 1
        UNION ALL
        SELECT doc_id, 2 * pos + 1, tok FROM r2 WHERE msk = 1),
agg_i AS (SELECT doc_id, string_agg(v, ' ' ORDER BY k) AS input_text
          FROM inp GROUP BY 1),
agg_t AS (SELECT doc_id, string_agg(v, ' ' ORDER BY k) AS target_text
          FROM tgt GROUP BY 1),
nm AS (SELECT doc_id, CAST(sum(msk) AS BIGINT) AS n_masked
       FROM m GROUP BY 1)
SELECT d.doc_id, coalesce(agg_i.input_text, '') AS input_text,
       coalesce(agg_t.target_text, '') AS target_text,
       CAST(coalesce(nm.n_masked, 0) AS BIGINT) AS n_masked
FROM documents d
LEFT JOIN agg_i USING (doc_id)
LEFT JOIN agg_t USING (doc_id)
LEFT JOIN nm USING (doc_id)
"""

    sql["mlm_masking_pairs"] = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), y -> y <> '') AS tk
           FROM documents),
x AS (SELECT doc_id, len(tk) AS n, CAST(u.i AS BIGINT) AS pos,
             tk[CAST(u.i AS INT) + 1] AS tok, tk
      FROM t, unnest(range(0, len(tk))) AS u(i)),
m AS (SELECT doc_id, pos,
             CASE WHEN (pos * 31 + doc_id * 17) % 7 = 0 THEN
               CASE WHEN (pos + doc_id) % 10 < 8 THEN '[MASK]'
                    WHEN (pos + doc_id) % 10 = 8
                    THEN tk[CAST((pos * 13 + 7) % n AS INT) + 1]
                    ELSE tok END
             ELSE tok END AS otok,
             CASE WHEN (pos * 31 + doc_id * 17) % 7 = 0
                  THEN 1 ELSE 0 END AS sel,
             CASE WHEN (pos * 31 + doc_id * 17) % 7 = 0
                   AND (pos + doc_id) % 10 < 8 THEN 1 ELSE 0 END AS msk,
             CASE WHEN (pos * 31 + doc_id * 17) % 7 = 0
                   AND (pos + doc_id) % 10 = 8 THEN 1 ELSE 0 END AS rnd
      FROM x),
agg AS (SELECT doc_id, string_agg(otok, ' ' ORDER BY pos) AS masked_text,
               CAST(sum(sel) AS BIGINT) AS n_selected,
               CAST(sum(msk) AS BIGINT) AS n_masked,
               CAST(sum(rnd) AS BIGINT) AS n_random
        FROM m GROUP BY 1)
SELECT d.doc_id, coalesce(agg.masked_text, '') AS masked_text,
       CAST(coalesce(n_selected, 0) AS BIGINT) AS n_selected,
       CAST(coalesce(n_masked, 0) AS BIGINT) AS n_masked,
       CAST(coalesce(n_random, 0) AS BIGINT) AS n_random
FROM documents d LEFT JOIN agg USING (doc_id)
"""
    return sql
