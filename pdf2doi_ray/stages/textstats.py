"""Text-analysis operators for training-data pipelines.

All kernels are vectorized (pyarrow.compute / numpy) and hash-stable against
a DuckDB oracle: outputs are integers / strings only — no accumulated floats
whose rounding could differ between engines.

Operators (each exposed as a ``queries()`` entry):

* token/char counting         (``token_stats``)
* quality scoring             (``quality_flags``: stopword / punctuation /
                               length gates as integer counts + a 0/1 flag)
* language identification     (``lang_id``: stopword-set voting heuristic
                               with deterministic tie-break)
* document fingerprinting     (``fingerprint``: md5 content hash — identical
                               in Python hashlib and DuckDB ``md5()``)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Stopword vote sets per language.  Tiny on purpose: the heuristic must be
# expressible in the SQL oracle (list_filter counts), and the vote is
# deterministic — ties break by alphabetical language order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "it"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "que"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}
_LANGS = tuple(sorted(LANG_STOPWORDS))   # alphabetical = tie-break order

QUALITY_MIN_TOKENS = 20      # gates for the 0/1 quality flag
QUALITY_STOP_PERMILLE = 50   # ≥5% stopwords


def _tokens(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Single-space tokenization (matches SQL ``string_split(text, ' ')``)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.split_pattern(arr, " ")


#: BPE-ish pre-tokenizer shape (letter runs / digit runs / single symbols) —
#: RE2-compatible so the count vectorizes in Arrow and DuckDB identically.
BPE_TOKEN_SRC = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(batch: pa.Table) -> pa.Table:
    toks = _tokens(batch["text"])
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.utf8_length(batch["text"]).cast(pa.int64()),
        "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
        "n_bpe_tokens": pc.count_substring_regex(
            batch["text"], BPE_TOKEN_SRC).cast(pa.int64()),
    })


def _count_in_set(toks: pa.Array, words: tuple[str, ...]) -> np.ndarray:
    """Per-row count of tokens in ``words`` via one vectorized is_in over the
    flattened token column + offset reduction."""
    from ..arrowutil import rowwise_flag_counts

    flat = toks.flatten()
    return rowwise_flag_counts(toks, pc.is_in(flat, value_set=pa.array(words)))


def quality_flags(batch: pa.Table) -> pa.Table:
    toks = _tokens(batch["text"])
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    n_stop = _count_in_set(toks, LANG_STOPWORDS["en"])
    n_chars = pc.utf8_length(batch["text"]).cast(pa.int64())
    # punctuation count, vectorized: chars remaining after dropping word
    # characters and whitespace
    stripped = pc.replace_substring_regex(batch["text"], r"[\w\s]", "")
    n_punct = pc.utf8_length(stripped).cast(pa.int64())
    nt = np.asarray(n_tokens)
    is_quality = ((nt >= QUALITY_MIN_TOKENS)
                  & (n_stop * 1000 >= QUALITY_STOP_PERMILLE * nt)).astype(np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": pa.array(n_stop, type=pa.int64()),
        "n_punct": n_punct,
        "is_quality": pa.array(is_quality, type=pa.int64()),
    })


# Gopher (Rae et al. 2021, Table A1) repetition-independent quality rules.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WORDLEN_MILLI, GOPHER_MAX_WORDLEN_MILLI = 3_000, 10_000
GOPHER_MAX_SYMBOL_PERMILLE = 100       # (# + …)/words < 0.1
GOPHER_MAX_BULLET_PERMILLE = 100       # ≥90% of lines not bullet-led
GOPHER_MAX_ELLIPSIS_PERMILLE = 300     # ≤30% of lines ellipsis-ended
GOPHER_MIN_ALPHA_PERMILLE = 800        # ≥80% of words contain a letter
GOPHER_MIN_STOP_HITS = 2


def gopher_quality(batch: pa.Table) -> pa.Table:
    """The full Gopher document-quality rule set (word-count band, mean
    word length band, symbol-to-word ratio, bullet / ellipsis line rates,
    alphabetic-word rate, stopword floor) as exact integer permilles —
    every division is a floor over non-negative integers, so a SQL oracle
    matches bit-for-bit.  Words are NONEMPTY space-split tokens; lines are
    ``\\n``-split (blank lines count toward the line denominators, as in
    the paper's per-line rates).  Zero denominators yield 0 permilles and
    ``keep=false``.  Complements :func:`quality_flags` (the cheap gate)
    and ``corpus.top_bigram_repetition`` (the repetition rules).
    """
    from ..arrowutil import one_chunk, rowwise_flag_counts, rowwise_sums

    text = one_chunk(batch["text"])
    toks = pc.split_pattern(text, " ")
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "")
    n_words = rowwise_flag_counts(toks, nonempty)
    sum_len = rowwise_sums(toks, pc.utf8_length(flat).fill_null(0))
    n_alpha = rowwise_flag_counts(
        toks, pc.match_substring_regex(flat, "[A-Za-z]"))
    n_stop = rowwise_flag_counts(
        toks, pc.is_in(flat, value_set=pa.array(GOPHER_STOPWORDS)))
    n_hash = np.asarray(pc.count_substring(text, "#").cast(pa.int64()))
    n_ell = np.asarray(pc.count_substring(text, "...").cast(pa.int64()))

    lines = pc.split_pattern(text, "\n")
    lflat = lines.flatten()
    n_lines = np.asarray(pc.list_value_length(lines)
                         .fill_null(0)).astype(np.int64)
    n_bullet = rowwise_flag_counts(
        lines, pc.match_substring_regex(lflat, r"^[-*•]"))
    n_ell_line = rowwise_flag_counts(
        lines, pc.match_substring_regex(lflat, r"\.\.\.$"))

    def permille(num, den):
        return np.where(den > 0, num * 1000 // np.maximum(den, 1), 0)

    mean_len = permille(sum_len, n_words)
    symbol_pm = permille(n_hash + n_ell, n_words)
    alpha_pm = permille(n_alpha, n_words)
    bullet_pm = permille(n_bullet, n_lines)
    ell_pm = permille(n_ell_line, n_lines)
    keep = ((n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_len >= GOPHER_MIN_WORDLEN_MILLI)
            & (mean_len <= GOPHER_MAX_WORDLEN_MILLI)
            & (symbol_pm <= GOPHER_MAX_SYMBOL_PERMILLE)
            & (bullet_pm <= GOPHER_MAX_BULLET_PERMILLE)
            & (ell_pm <= GOPHER_MAX_ELLIPSIS_PERMILLE)
            & (alpha_pm >= GOPHER_MIN_ALPHA_PERMILLE)
            & (n_stop >= GOPHER_MIN_STOP_HITS))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "mean_word_len_milli": pa.array(mean_len.astype(np.int64)),
        "symbol_permille": pa.array(symbol_pm.astype(np.int64)),
        "alpha_word_permille": pa.array(alpha_pm.astype(np.int64)),
        "bullet_line_permille": pa.array(bullet_pm.astype(np.int64)),
        "ellipsis_line_permille": pa.array(ell_pm.astype(np.int64)),
        "n_stop_hits": pa.array(n_stop),
        "keep": pa.array(keep),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    toks = _tokens(batch["text"])
    counts = np.stack([_count_in_set(toks, LANG_STOPWORDS[lg])
                       for lg in _LANGS])            # [lang, row]
    best = counts.argmax(axis=0)                     # first max = alphabetical tie-break
    pred = np.array(_LANGS, dtype=object)[best]
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang": batch["lang"],
        "pred_lang": pa.array(list(pred), type=pa.string()),
        "vote_count": pa.array(counts.max(axis=0), type=pa.int64()),
    })


def ascii_first_n(batch: pa.Table, n: int = 1000) -> pa.Table:
    """The reference's query-preparation scrub (finders.py:844-852):
    non-ASCII → space, ``\\n \\r \\t`` → space, first ``n`` characters.
    Fully vectorized (three RE2 kernels + a slice)."""
    t = batch["text"]
    t = pc.replace_substring_regex(t, r"[^\x00-\x7f]", " ")
    for ch in ("\n", "\r", "\t"):
        t = pc.replace_substring(t, ch, " ")
    t = pc.utf8_slice_codeunits(t, 0, n)
    return pa.table({"doc_id": batch["doc_id"], "snippet": t})


def fingerprint(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_hash": pa.array(digests, type=pa.string()),
    })


def top_docs_by_tokens(docs, k: int = 20):
    """Global top-k documents by (n_tokens desc, doc_id asc) WITHOUT a
    global sort: each batch emits only its own deterministic top-k (ties at
    the k-th boundary kept by the lexsort), and the tiny ≤k-per-batch
    partials reduce on the driver — the bounded-result pattern that replaces
    ``Dataset.sort(...).limit(k)`` (an all-to-all shuffle) at any corpus
    size.  Returns a small pandas frame (rank, doc_id, n_tokens).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t["text"])
        n = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
        ids = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"])
        order = np.lexsort((ids, -n))[:k]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "n_tokens": pa.array(n[order], type=pa.int64())})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "doc_id" not in parts.columns:    # fully-empty input -> schemaless
        parts = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64")})
    parts = parts.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True]).head(k)
    return pd.DataFrame({
        "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
        "doc_id": parts["doc_id"].to_numpy(),
        "n_tokens": parts["n_tokens"].to_numpy(),
    })


def token_count_quantiles(docs, quantiles_permille=(250, 500, 750, 900)):
    """EXACT distributed quantiles of the per-doc token count WITHOUT a
    global sort: per-batch value→count histogram partials (one arrow
    group_by per batch), a small ``groupby(value)`` merge (distinct token
    counts ≪ corpus size), then a driver-side cumulative walk over the tiny
    histogram.  Quantile definition (explicit, mirrored verbatim by the SQL
    oracle): the value at 1-based rank ``ceil(q/1000 · n)`` of the ascending
    sort.  Works for any bounded-cardinality integer statistic — the exact
    alternative to t-digest sketches when values are discrete.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t["text"])
        n = pc.list_value_length(toks).cast(pa.int64())
        g = pa.table({"value": n}).group_by("value") \
            .aggregate([("value", "count")])
        return g.select(["value", "value_count"]) \
            .rename_columns(["value", "n"])

    hist = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("value").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    return quantiles_from_histogram(hist, quantiles_permille)


def quantiles_from_histogram(hist, quantiles_permille):
    """Driver-side walk over a tiny (value, n) histogram frame → the exact
    quantile table (value at 1-based rank ``ceil(q/1000 · n)`` ascending).
    Shared by every exact-quantile operator in the repo."""
    import pandas as pd

    if len(hist) == 0 or "value" not in hist.columns:
        # an empty dataset aggregates to a schemaless empty frame
        cum = np.empty(0, dtype=np.int64)
        values = np.empty(0, dtype=np.int64)
        total = 0
    else:
        hist = hist.sort_values("value").reset_index(drop=True)
        cum = hist["n"].cumsum().to_numpy()
        total = int(cum[-1]) if len(cum) else 0
        values = hist["value"].to_numpy()
    out_q, out_v = [], []
    for q in quantiles_permille:
        rank = -(-q * total // 1000)            # ceil without floats
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(int(q))
        out_v.append(int(values[idx]) if total else None)
    # empty input yields NULL quantile values (matching the SQL oracle) via
    # the nullable dtype; the non-empty path keeps plain int64 so dtypes
    # line up with the DuckDB result frame
    vdtype = "int64" if all(v is not None for v in out_v) else "Int64"
    return pd.DataFrame({"q_permille": pd.Series(out_q, dtype="int64"),
                         "value": pd.Series(out_v, dtype=vdtype)})


def filter_above_quantile(docs, q_permille: int = 900):
    """Docs whose token count exceeds the corpus's exact ``q_permille``
    quantile (e.g. the longest decile for a long-context training mix).

    Two-phase broadcast-scalar pattern: phase 1 computes the EXACT quantile
    with :func:`token_count_quantiles` (value→count histogram partials — the
    driver only ever sees the tiny distinct-value histogram, never rows);
    phase 2 re-streams the corpus through a pure vectorized filter with the
    threshold captured in the closure (a scalar broadcast, not a join).
    Same token-count and quantile definitions as the quantile operator, so
    the SQL oracle mirrors both verbatim.  Returns (doc_id, n_tokens).
    """
    import pandas as pd

    q = token_count_quantiles(docs, (q_permille,))
    thr = q["value"][0]
    # empty corpus → NULL quantile (pd.NA / None) → empty output
    thr = np.iinfo(np.int64).max if pd.isna(thr) else int(thr)

    def pick(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(_tokens(t["text"])).cast(pa.int64())
        keep = pc.greater(n, thr)
        return pa.table({
            "doc_id": t["doc_id"].filter(keep),
            "n_tokens": n.filter(keep),
        })

    return docs.map_batches(pick, batch_format="pyarrow")


# --- winnowing rolling-hash fingerprints ----------------------------------

WINNOW_K = 5      # char k-gram size
WINNOW_W = 8      # winnowing window

_B = 257


def _kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """Base-257 polynomial value of every byte k-gram, fully vectorized:
    k shifted multiply-adds over the byte array (no per-character Python).
    For k ≤ 7 the value fits int64 without modular reduction and is
    INJECTIVE (base > max byte), so 'hash' equality is k-gram equality."""
    if k > 7:
        raise ValueError("vectorized k-gram hash supports k <= 7")
    vals = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = len(data) - k + 1
    out = np.zeros(m, dtype=np.uint64)
    for i in range(k):
        out += vals[i:i + m] * (np.uint64(_B) ** np.uint64(k - 1 - i))
    return out.astype(np.int64)


def winnow_fingerprints(text: str, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> list[int]:
    """Winnowing fingerprint set (Schleimer et al., SIGMOD 2003): polynomial
    k-gram hashes, keep the minimum of each window of w consecutive hashes,
    deduplicated in first-occurrence order.  Every step is a numpy kernel:
    k-gram hashing (:func:`_kgram_hashes`), sliding-window min (stride
    tricks), order-preserving dedup (unique + first-index sort).  Locked by
    the independent golden implementation in ``tests/golden_impl.py``."""
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return [int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(),
                               "big") >> 1] if n else []
    hashes = _kgram_hashes(data, k)
    if len(hashes) <= w:
        return [int(hashes.min())]
    sw = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = sw.min(axis=1)
    _, first_idx = np.unique(mins, return_index=True)
    return mins[np.sort(first_idx)].tolist()


def winnow_table(docs):
    """documents → (doc_id, fingerprints list<int64>, n_fingerprints)."""
    def per_batch(t: pa.Table) -> pa.Table:
        fps = [winnow_fingerprints(x) for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "fingerprints": pa.array(fps, type=pa.list_(pa.int64())),
            "n_fingerprints": pa.array([len(f) for f in fps],
                                       type=pa.int64()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow")


def token_count_quantiles_by_group(docs, group_col: str = "lang",
                                   quantiles_permille=(250, 500, 750, 900)):
    """:func:`token_count_quantiles` partitioned by ``group_col`` — exact
    per-group quantiles from keyed (group, value)→count histogram partials.
    The merged histogram holds |groups| × |distinct counts| rows (tiny for
    bounded-cardinality statistics), walked per group on the driver.  Same
    rank rule, mirrored by the SQL oracle: value at 1-based ascending rank
    ``ceil(q/1000 · n_group)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t["text"])
        n = pc.list_value_length(toks).cast(pa.int64())
        g = pa.table({group_col: t[group_col], "value": n}) \
            .group_by([group_col, "value"]) \
            .aggregate([("value", "count")])
        return g.select([group_col, "value", "value_count"]) \
            .rename_columns([group_col, "value", "n"])

    hist = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "value"]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    out_g, out_q, out_v = [], [], []
    if len(hist) and group_col in hist.columns:
        for gval, sub in hist.groupby(group_col, sort=True):
            sub = sub.sort_values("value").reset_index(drop=True)
            cum = sub["n"].cumsum().to_numpy()
            total = int(cum[-1])
            values = sub["value"].to_numpy()
            for q in quantiles_permille:
                rank = -(-q * total // 1000)
                idx = int(np.searchsorted(cum, rank, side="left"))
                out_g.append(gval)
                out_q.append(int(q))
                out_v.append(int(values[idx]))
    return pd.DataFrame({group_col: pd.Series(out_g, dtype="object"),
                         "q_permille": pd.Series(out_q, dtype="int64"),
                         "value": pd.Series(out_v, dtype="int64")})


def lang_confusion(docs):
    """Label-vs-prediction confusion matrix for the stopword language
    identifier — the curation health check that catches a mislabeled
    crawl slice or a degraded classifier in one ≤|langs|² table.
    Combiner-first: :func:`lang_id` per batch, an in-batch Arrow
    ``group_by`` collapse, then one tiny groupby merge.  Returns
    (lang, pred_lang, n_docs)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        p = lang_id(t)
        g = p.select(["lang", "pred_lang"]) \
            .group_by(["lang", "pred_lang"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "pred_lang": g["pred_lang"],
                         "n_partial": g["count_all"].cast(pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "pred_lang"])
            .aggregate(Sum("n_partial", alias_name="n_docs")))


def flesch_readability(batch: pa.Table) -> pa.Table:
    """Flesch Reading Ease per document, integer-exact in milli units —
    the classic prose-difficulty gate a curation pipeline runs alongside
    the Gopher rules.  Pure vectorized map, zero shuffles.

    Contract (shared bit-for-bit with the SQL oracle): words = nonempty
    single-space tokens (min 1), sentences = ``[.!?]+`` runs (min 1),
    syllables = ``[aeiouy]+`` runs over the lowercased text — a crude
    but deterministic syllable proxy; all three count via one RE2 kernel
    each.  ``flesch_milli = 206835 - 1015·(W·1000//S)//1000 -
    84600·(Syl·1000//W)//1000`` with floor division at every step (all
    quantities non-negative, so numpy ``//`` and SQL ``//`` agree).
    """
    text = (batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"])
    toks = _tokens(text)
    flat = toks.flatten()
    per_row = np.asarray(pc.list_value_length(toks).fill_null(0),
                         dtype=np.int64)
    nonempty = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    # nonempty token count per row: reduceat over the flattened mask
    offsets = np.concatenate([[0], np.cumsum(per_row)])[:-1]
    w = np.zeros(len(per_row), dtype=np.int64)
    has = per_row > 0
    if nonempty.size:
        # reduceat quirks: equal/decreasing index pairs (empty rows)
        # return a single element instead of 0, and an offset == len(a)
        # (trailing empty rows) is out of range — clip, then copy only
        # the rows that really have tokens
        sums = np.add.reduceat(nonempty.astype(np.int64),
                               np.minimum(offsets, nonempty.size - 1))
        w[has] = sums[has]
    w = np.maximum(w, 1)
    s = np.maximum(np.asarray(
        pc.count_substring_regex(text, r"[.!?]+"), dtype=np.int64), 1)
    syl = np.asarray(
        pc.count_substring_regex(pc.utf8_lower(text), r"[aeiouy]+"),
        dtype=np.int64)
    wps = w * 1000 // s
    spw = syl * 1000 // w
    score = 206835 - (1015 * wps) // 1000 - (84600 * spw) // 1000
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(w),
        "n_sentences": pa.array(s),
        "n_syllables": pa.array(syl),
        "flesch_milli": pa.array(score),
    })


#: default banned phrases for the C4-style content filter — substrings,
#: chosen to hit the synthetic corpus; real deployments pass their own list
BANNED_PHRASES = ("batch batch batch", "slow slow", "dup dup")


def banned_phrase_filter(docs, phrases=BANNED_PHRASES):
    """C4-style banned-content gate: drop every document whose text
    contains ANY of the phrases as a substring.  One compiled RE2
    alternation over the whole batch (phrases regex-escaped) — a pure
    streaming filter, no shuffle, no per-row Python.  Returns the
    surviving (doc_id, n_chars) rows plus the match flag count semantics
    of the SQL ``NOT (text LIKE ...)`` chain."""
    import re as _re

    pattern = "|".join(_re.escape(p) for p in phrases)

    def keep(t: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            pattern)
        mask = pc.invert(hit)
        return pa.table({
            "doc_id": t["doc_id"].filter(mask),
            "n_chars": t["n_chars"].filter(mask),
        })

    return docs.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# char-class forensics (gibberish / markup detection signals)

#: byte → class id lookup (ASCII): 0 digit, 1 upper, 2 lower, 3 space, 4 other.
#: The space class is RE2's ``\s`` set ({\t \n \f \r ' '}) so the SQL oracle
#: can recompute it with a plain character class.
_CHAR_CLASS = np.full(256, 4, dtype=np.int64)
_CHAR_CLASS[ord("0"):ord("9") + 1] = 0
_CHAR_CLASS[ord("A"):ord("Z") + 1] = 1
_CHAR_CLASS[ord("a"):ord("z") + 1] = 2
for _b in (9, 10, 12, 13, 32):
    _CHAR_CLASS[_b] = 3


def _text_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat byte array, row offsets) for an Arrow string column —
    zero-copy views of the column's buffers."""
    from ..arrowutil import one_chunk

    arr = one_chunk(col)
    # normalise away any non-zero offset so buffer views line up
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                            count=len(arr) + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offsets[-1]))
    return data, offsets.astype(np.int64)


def char_class_profile(batch: pa.Table) -> pa.Table:
    """Per-document character-class census: digits / uppercase /
    lowercase / whitespace / other, exact integer counts.

    One pass over the batch's raw UTF-8 buffer: a 256-entry lookup
    classifies every byte at once, ``np.add.at`` scatters into a
    (rows × 5) count matrix — no per-row Python, no copies of the text.
    Corpus texts are ASCII (pinned by tests); non-ASCII bytes would
    land in "other", matching byte (not codepoint) semantics.

    The analog signal in the reference is its ascii scrub before title
    search (reference ``finders.py`` text cleanup); at corpus scale the
    class mix is the standard gibberish / markup-residue detector.
    """
    data, offsets = _text_bytes(batch["text"])
    n = batch.num_rows
    counts = np.zeros((n, 5), dtype=np.int64)
    if len(data):
        row_of = np.repeat(np.arange(n, dtype=np.int64),
                           np.diff(offsets))
        np.add.at(counts, (row_of, _CHAR_CLASS[data]), 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_digit": pa.array(counts[:, 0]),
        "n_upper": pa.array(counts[:, 1]),
        "n_lower": pa.array(counts[:, 2]),
        "n_space": pa.array(counts[:, 3]),
        "n_other": pa.array(counts[:, 4]),
    })


def char_simpson(batch: pa.Table) -> pa.Table:
    """Per-document character collision index (Simpson / repeat
    probability): ``1000 * Σ c_i² // n²`` over byte frequencies, plus
    the distinct-byte count.  High values flag degenerate/repetitive
    text (a classic cheap quality gate before expensive dedup).

    Vectorized per batch: one ``bincount`` over ``row_id*256 + byte``
    builds every document's byte histogram at once.  Integers only —
    exact against the SQL oracle's char-unnest recomputation.
    """
    data, offsets = _text_bytes(batch["text"])
    n = batch.num_rows
    lens = np.diff(offsets)
    if len(data):
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(row_of * 256 + data,
                           minlength=n * 256).reshape(n, 256)
    else:
        hist = np.zeros((n, 256), dtype=np.int64)
    ss = (hist.astype(np.int64) ** 2).sum(axis=1)
    distinct = np.count_nonzero(hist, axis=1).astype(np.int64)
    denom = np.maximum(lens, 1).astype(np.int64)
    permille = np.where(lens > 0, 1000 * ss // (denom * denom), 0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(lens.astype(np.int64)),
        "n_distinct_chars": pa.array(distinct),
        "simpson_permille": pa.array(permille.astype(np.int64)),
    })


def word_len_histogram(docs):
    """Corpus-wide word-length histogram: ``(word_len, n_words)``.

    Combiner-first: each batch tokenizes (single-space split, the
    repo-wide tokenizer contract), takes ``utf8_length`` of the
    flattened word values, and collapses to one partial histogram row
    per length via ``bincount`` — the global ``groupby`` merges only
    ~tens of partial rows per block, never words.  Empty tokens (from
    leading/adjacent delimiters) are excluded on both engines.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t["text"])
        flat = toks.flatten()
        lens = pc.utf8_length(flat).cast(pa.int64())
        lens_np = np.asarray(lens.combine_chunks()
                             if isinstance(lens, pa.ChunkedArray) else lens)
        lens_np = lens_np[lens_np > 0]
        if len(lens_np) == 0:
            return pa.table({"word_len": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64())})
        h = np.bincount(lens_np)
        nz = np.nonzero(h)[0]
        return pa.table({"word_len": pa.array(nz.astype(np.int64)),
                         "n_p": pa.array(h[nz].astype(np.int64))})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("word_len")
            .aggregate(Sum("n_p", alias_name="n_words")))


def char_bigram_familiarity(docs):
    """Language-model-free fluency proxy: per document, the average
    CORPUS frequency of its character bigrams — gibberish and
    wrong-charset text score low because its bigrams are rare.
    Returns (doc_id, n_bigrams, familiarity) with
    ``familiarity = Σ corpus_count(bigram) // n_bigrams`` (exact ints).

    Two passes: (1) corpus bigram census — per-batch ``bincount`` over
    byte-pair codes, nonzero (bigram, n) combiner rows, ONE groupby
    whose key domain is ≤ 65 536; (2) the ≤ 512 KB dense count table
    broadcasts via ``ray.put`` and every document scores in a
    vectorized gather + ``reduceat``.  Cross-row byte pairs are
    masked; documents shorter than 2 bytes score 0.
    """
    import ray
    from ray.data.aggregate import Sum

    def codes_of(batch: pa.Table):
        data, offsets = _text_bytes(batch["text"])
        if len(data) < 1:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.int64), offsets)
        pair = data[:-1].astype(np.int64) * 256 + data[1:]
        # position j pairs bytes (j, j+1); invalid where j+1 starts a row
        valid = np.ones(len(pair), dtype=bool)
        pos = offsets[1:-1] - 1               # row starts after the first
        # empty leading/trailing rows yield positions outside the pair
        # array — no pair exists there to invalidate
        pos = pos[(pos >= 0) & (pos < len(pair))]
        valid[pos] = False
        return pair, valid, offsets

    def census(t: pa.Table) -> pa.Table:
        pair, valid, _ = codes_of(t)
        if len(pair) == 0:
            return pa.table({"bigram": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64())})
        counts = np.bincount(pair[valid], minlength=65536)
        nz = np.nonzero(counts)[0]
        return pa.table({"bigram": pa.array(nz.astype(np.int64)),
                         "n_p": pa.array(counts[nz].astype(np.int64))})

    freq = (docs.map_batches(census, batch_format="pyarrow")
            .groupby("bigram").aggregate(Sum("n_p", alias_name="n"))
            .to_pandas())
    table = np.zeros(65536, dtype=np.int64)
    table[freq["bigram"].to_numpy()] = freq["n"].to_numpy()
    table_ref = ray.put(table)

    def score(t: pa.Table) -> pa.Table:
        tab = ray.get(table_ref)
        pair, valid, offsets = codes_of(t)
        vals = np.where(valid, tab[pair], 0) if len(pair) else \
            np.zeros(0, dtype=np.int64)
        # per-row sums over the pair positions [off[i], off[i+1]-1)
        cum = np.concatenate([[0], np.cumsum(vals)])
        lo = np.minimum(offsets[:-1], len(vals))
        hi = np.minimum(np.maximum(offsets[1:] - 1, lo), len(vals))
        sums = cum[hi] - cum[lo]
        nb = np.maximum(np.diff(offsets) - 1, 0)
        fam = np.where(nb > 0, sums // np.maximum(nb, 1), 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bigrams": pa.array(nb.astype(np.int64)),
            "familiarity": pa.array(fam.astype(np.int64))})

    return docs.map_batches(score, batch_format="pyarrow")


def byte_inventory_by_lang(docs):
    """Tokenizer-design byte census per language: how many distinct byte
    values a language's text actually uses, total byte volume, and the
    modal byte — the inventory a byte-level BPE trainer consults to size
    its base alphabet and catch mojibake (a lang suddenly using 200
    distinct bytes is an encoding bug, not vocabulary).

    Fully vectorized per batch: one zero-copy flat-byte view of the text
    column, one ``np.repeat`` of per-row lang codes to byte positions,
    and ONE ``bincount`` over ``code·256 + byte`` produces every
    (lang, byte) cell; the exchange then moves ≤ |langs|·256 combiner
    rows per block, never text.  Ties for the modal byte break toward
    the smaller byte.  Returns (lang, n_distinct_bytes, n_bytes,
    top_byte, top_byte_count).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "byte": pa.array([], type=pa.int64()),
                          "n_p": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        data, offsets = _text_bytes(t["text"])
        if len(data) == 0:
            return empty
        langs = one_chunk(t["lang"]).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(langs, sort=False)
        row_len = np.diff(offsets)
        per_byte_code = np.repeat(codes.astype(np.int64), row_len)
        cells = np.bincount(per_byte_code * 256 + data,
                            minlength=len(uniq) * 256)
        nz = np.nonzero(cells)[0]
        return pa.table({
            "lang": pa.array(uniq[nz // 256], type=pa.string()),
            "byte": pa.array(nz % 256),
            "n_p": pa.array(cells[nz]),
        })

    cells = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "byte"])
             .aggregate(Sum("n_p", alias_name="n")))

    def fold(t: pa.Table) -> pa.Table:
        if "lang" not in t.column_names:   # schemaless empty groupby output
            return pa.table({
                "lang": pa.array([], type=pa.string()),
                "n_distinct_bytes": pa.array([], type=pa.int64()),
                "n_bytes": pa.array([], type=pa.int64()),
                "top_byte": pa.array([], type=pa.int64()),
                "top_byte_count": pa.array([], type=pa.int64())})
        df = t.to_pandas()
        rows = []
        for lang, sub in df.groupby("lang", sort=True):
            sub = sub.sort_values(["n", "byte"],
                                  ascending=[False, True])
            rows.append({
                "lang": lang,
                "n_distinct_bytes": len(sub),
                "n_bytes": int(sub["n"].sum()),
                "top_byte": int(sub.iloc[0]["byte"]),
                "top_byte_count": int(sub.iloc[0]["n"]),
            })
        out = pd.DataFrame(rows, columns=["lang", "n_distinct_bytes",
                                          "n_bytes", "top_byte",
                                          "top_byte_count"])
        return pa.Table.from_pandas(out, preserve_index=False)

    # |langs|·256 rows max — one driver-bounded fold task
    return cells.repartition(1).map_batches(fold, batch_format="pyarrow",
                                            batch_size=None)


def token_weighted_char_quantiles(docs,
                                  quantiles_permille=(250, 500, 750, 900)):
    """TOKEN-weighted document-length quantiles: for each probe p‰, the
    smallest ``n_chars`` value such that documents of that length or
    shorter hold at least p‰ of ALL corpus tokens — the cut a packing
    planner uses ("docs up to X chars cover half the token budget"),
    which the unweighted length quantiles cannot answer.

    One ``groupby(n_chars)`` over per-batch (length → token-sum)
    combiners, then a driver walk over the ≤ |distinct lengths| histogram
    rows (the bounded-distinct contract shared with every histogram-walk
    operator).  Integer-exact: the comparison is ``cum_tokens * 1000 >=
    p * total_tokens``.  Returns pandas (quantile_permille, n_chars,
    cum_tokens, total_tokens).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(one_chunk(t["text"]))
        g = pa.table({
            "n_chars": pc.utf8_length(one_chunk(t["text"])).cast(pa.int64()),
            "t_p": pc.list_value_length(toks).cast(pa.int64()),
        }).group_by("n_chars").aggregate([("t_p", "sum")])
        return g.rename_columns(["n_chars", "t_p"])

    hist = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("n_chars").aggregate(Sum("t_p", alias_name="toks"))
            .to_pandas())
    if "n_chars" not in hist.columns:      # schemaless empty groupby
        hist = pd.DataFrame({"n_chars": pd.Series(dtype="int64"),
                             "toks": pd.Series(dtype="int64")})
    hist = hist.sort_values("n_chars").reset_index(drop=True)
    cum = hist["toks"].cumsum().to_numpy().astype(np.int64)
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for p in quantiles_permille:
        idx = int(np.searchsorted(cum * 1000, p * total))
        rows.append({
            "quantile_permille": p,
            "n_chars": int(hist["n_chars"].iloc[idx]) if len(hist) else 0,
            "cum_tokens": int(cum[idx]) if len(cum) else 0,
            "total_tokens": total,
        })
    return pd.DataFrame(rows, columns=["quantile_permille", "n_chars",
                                       "cum_tokens", "total_tokens"])


def _row_trigram_ints(t: pa.Table, text_col: str = "text"):
    """(row_idx, trigram_int) for every char trigram of every row —
    trigram encoded ``b0·65536 + b1·256 + b2`` over the zero-copy flat
    byte view, so numeric order == lexicographic order (ASCII corpus
    contract, pinned by ``test_documents_text_is_ascii``)."""
    data, offsets = _text_bytes(t[text_col])
    n_rows = t.num_rows
    lens = np.diff(offsets)
    n_tg = np.maximum(lens - 2, 0)
    if int(n_tg.sum()) == 0:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), n_tg)
    within = np.arange(len(row_idx), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_tg)[:-1]]), n_tg)
    starts = np.repeat(offsets[:-1], n_tg) + within
    d = data.astype(np.int64)
    tg = d[starts] * 65536 + d[starts + 1] * 256 + d[starts + 2]
    return row_idx, tg


def langid_trigram_confusion(docs, k_profile: int = 20):
    """Corpus-trained character-trigram language identifier, evaluated
    against the stored labels as a confusion matrix — the classic
    n-gram-profile language-ID heuristic (Cavnar & Trenkle style)
    trained ON the corpus itself, fully distributed and integer-exact.

    Train: per-(lang, trigram) counts (per-batch combiner → ONE
    ``groupby``), then the top ``k_profile`` trigrams per lang by
    (count DESC, trigram ASC) via the bucketed
    :func:`~.windowfns.grouped_top_k` merge.  The |langs|·k profile
    table broadcasts via ``ray.put``.

    Score: per batch, each doc's DISTINCT trigrams overlap-count against
    every lang profile (one ``searchsorted`` membership + ``add.at``
    scatter per lang — langs are a handful); predicted lang = argmax
    with alphabetical tie-break (the numpy ``argmax`` first-hit over the
    lang-sorted stack).  Docs too short for any trigram predict the
    alphabetically first profiled lang — same rule in the SQL oracle.

    Returns (lang, pred_lang, n_docs).  Exchange: the trigram-count
    groupby + the tiny confusion groupby; texts never move.
    """
    from ray.data.aggregate import Sum

    per_doc = langid_trigram_predictions(docs, k_profile,
                                         keep_cols=("lang",))

    def conf_partial(t: pa.Table) -> pa.Table:
        g = t.select(["lang", "pred_lang"]) \
            .group_by(["lang", "pred_lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "pred_lang", "n_p"])

    return (per_doc.map_batches(conf_partial, batch_format="pyarrow")
            .groupby(["lang", "pred_lang"])
            .aggregate(Sum("n_p", alias_name="n_docs")))


def langid_trigram_predictions(docs, k_profile: int = 20,
                               keep_cols=("lang",)):
    """Per-document trigram language predictions — the reusable core of
    :func:`langid_trigram_confusion` (train profiles, broadcast, score)
    exposed so curation pipelines can FILTER on label agreement instead
    of only auditing it.  Returns (doc_id, *keep_cols, pred_lang).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk
    from .windowfns import grouped_top_k

    def count_partial(t: pa.Table) -> pa.Table:
        row_idx, tg = _row_trigram_ints(t)
        if not len(tg):
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "tg": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64())})
        langs = one_chunk(t["lang"]).to_numpy(zero_copy_only=False)
        import pandas as pd
        codes, uniq = pd.factorize(langs, sort=False)
        key = codes[row_idx].astype(np.int64) * (1 << 24) + tg
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(uniq[uk >> 24], type=pa.string()),
            "tg": pa.array(uk & ((1 << 24) - 1)),
            "n_p": pa.array(cnt.astype(np.int64))})

    counts = (docs.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["lang", "tg"]).aggregate(Sum("n_p",
                                                     alias_name="n")))
    prof = grouped_top_k(counts, "lang", "n", "tg", k_profile) \
        .to_pandas()                     # |langs|·k rows — tiny
    plangs = sorted(prof["lang"].unique())
    prof_sets = [np.sort(prof.loc[prof["lang"] == lg, "tg"]
                         .to_numpy().astype(np.int64))
                 for lg in plangs]
    prof_ref = ray.put((plangs, prof_sets))

    def score_partial(t: pa.Table) -> pa.Table:
        langs_p, sets_p = ray.get(prof_ref)
        n_rows = t.num_rows
        if n_rows == 0 or not langs_p:
            out = {"doc_id": pa.array([], type=pa.int64())}
            for c in keep_cols:
                out[c] = pa.array([], type=pa.string())
            out["pred_lang"] = pa.array([], type=pa.string())
            return pa.table(out)
        row_idx, tg = _row_trigram_ints(t)
        # per-row DISTINCT trigrams
        if len(tg):
            order = np.lexsort((tg, row_idx))
            r, g = row_idx[order], tg[order]
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
            r, g = r[keep], g[keep]
        else:
            r = g = np.array([], dtype=np.int64)
        ov = np.zeros((len(langs_p), n_rows), dtype=np.int64)
        for li, ps in enumerate(sets_p):
            if len(ps) and len(g):
                pos = np.searchsorted(ps, g)
                pos_c = np.minimum(pos, len(ps) - 1)
                hit = ps[pos_c] == g
                np.add.at(ov[li], r[hit], 1)
        pred = np.array(langs_p, dtype=object)[ov.argmax(axis=0)]
        out = {"doc_id": one_chunk(t["doc_id"]).cast(pa.int64())}
        for c in keep_cols:
            out[c] = t[c]
        out["pred_lang"] = pa.array(list(pred), type=pa.string())
        return pa.table(out)

    return docs.map_batches(score_partial, batch_format="pyarrow")


def tokenizer_fertility(docs):
    """Tokenizer-design fertility census per language: whitespace words
    vs BPE-style subtokens (RE2 word/number/punct split — the
    GPT-2-pretokenizer shape) and the exact integer permille ratios a
    tokenizer team tracks per language (high fertility = the tokenizer
    fragments that language).  Both the engine and the DuckDB oracle
    run the SAME RE2 pattern, so counts are bit-exact.

    Pure per-batch combiner → one |langs|-row groupby; zero text moves.
    Returns (lang, n_docs, n_words, n_subtokens, fertility_permille,
    chars_per_subtoken_permille).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def partial(t: pa.Table) -> pa.Table:
        txt = one_chunk(t["text"])
        words = pc.list_value_length(
            pc.split_pattern(txt, " ")).cast(pa.int64())
        sub = pc.count_substring_regex(txt, pattern).cast(pa.int64())
        chars = pc.utf8_length(txt).cast(pa.int64())
        g = pa.table({"lang": t["lang"], "w": words, "s": sub,
                      "c": chars}) \
            .group_by("lang").aggregate([([], "count_all"), ("w", "sum"),
                                         ("s", "sum"), ("c", "sum")])
        return g.rename_columns(["lang", "d_p", "w_p", "s_p", "c_p"])

    def finalize(t: pa.Table) -> pa.Table:
        w = np.asarray(one_chunk(t["n_words"])).astype(np.int64)
        s = np.asarray(one_chunk(t["n_subtokens"])).astype(np.int64)
        c = np.asarray(one_chunk(t["c"])).astype(np.int64)
        return pa.table({
            "lang": one_chunk(t["lang"]),
            "n_docs": one_chunk(t["n_docs"]).cast(pa.int64()),
            "n_words": pa.array(w),
            "n_subtokens": pa.array(s),
            "fertility_permille": pa.array(
                np.where(w > 0, 1000 * s // np.maximum(w, 1), 0)),
            "chars_per_subtoken_permille": pa.array(
                np.where(s > 0, 1000 * c // np.maximum(s, 1), 0)),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("d_p", alias_name="n_docs"),
                       Sum("w_p", alias_name="n_words"),
                       Sum("s_p", alias_name="n_subtokens"),
                       Sum("c_p", alias_name="c"))
            .map_batches(finalize, batch_format="pyarrow"))


def bigram_collision_homogeneity(docs):
    """Corpus-homogeneity audit per language: the EXACT Rényi-2
    collision probability of the char-bigram distribution (the chance
    two random bigrams coincide, in parts-per-million) — a
    template-spam / mojibake tripwire: natural language sits in a
    band, machine-generated or single-template corpora spike, encoding
    noise craters it.  Integer-exact: ``ppm = 10⁶·Σc² // N²`` with the
    squares taken AFTER global aggregation, folded in Python big ints
    (Σc² overflows int64 at corpus scale; the resulting ppm is small).

    The global (lang, bigram) count table is bounded by
    |langs|·alphabet² rows — independent of corpus size — so the final
    fold is one block by construction (same bound as
    :func:`byte_inventory_by_lang`).  Returns (lang, n_bigrams,
    n_distinct_bigrams, collision_ppm).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "bg": pa.array([], type=pa.int64()),
                          "n_p": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        data, offsets = _text_bytes(t["text"])
        lens = np.diff(offsets)
        n_bg = np.maximum(lens - 1, 0)
        if int(n_bg.sum()) == 0:
            return empty
        langs = one_chunk(t["lang"]).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(langs, sort=False)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_bg)
        within = np.arange(len(row_idx), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_bg)[:-1]]), n_bg)
        starts = np.repeat(offsets[:-1], n_bg) + within
        d = data.astype(np.int64)
        bg = d[starts] * 256 + d[starts + 1]
        key = codes[row_idx].astype(np.int64) * 65536 + bg
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(uniq[uk >> 16], type=pa.string()),
            "bg": pa.array(uk & 65535),
            "n_p": pa.array(cnt.astype(np.int64))})

    cells = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "bg"])
             .aggregate(Sum("n_p", alias_name="n")))

    def fold(t: pa.Table) -> pa.Table:
        cols = ["lang", "n_bigrams", "n_distinct_bigrams",
                "collision_ppm"]
        if "lang" not in t.column_names or t.num_rows == 0:
            return pa.table({c: pa.array(
                [], type=pa.string() if c == "lang" else pa.int64())
                for c in cols})
        df = t.to_pandas()
        rows = []
        for lang, sub in df.groupby("lang", sort=True):
            c = [int(x) for x in sub["n"]]
            n = sum(c)
            rows.append({"lang": lang, "n_bigrams": n,
                         "n_distinct_bigrams": len(c),
                         "collision_ppm":
                             10**6 * sum(x * x for x in c) // (n * n)})
        return pa.Table.from_pandas(pd.DataFrame(rows, columns=cols),
                                    preserve_index=False)

    return cells.repartition(1).map_batches(fold, batch_format="pyarrow",
                                            batch_size=None)


def compression_ratio_flags(docs, max_ratio_permille: int = 450,
                            level: int = 6):
    """The gzip/deflate quality filter (C4 / MassiveText staple): a
    document that compresses too WELL is templated or repetitive
    (boilerplate, keyword stuffing, generated spam); one that barely
    compresses is likely binary junk or high-entropy noise.  Emits
    (doc_id, raw_bytes, deflate_bytes, ratio_permille, keep) where
    ``ratio = 1000·deflate // raw`` and ``keep = ratio >=
    max_ratio_permille`` (below the floor = too compressible = drop).

    Per-batch kernel: one ``zlib.compress`` per document (zlib is a C
    kernel; the loop is I/O-free and releases the GIL between calls) —
    no shuffle, no state, embarrassingly parallel.  NOT SQL-expressible
    (DuckDB has no deflate), so the driver records a rows-only check;
    the pytest golden recomputes ratios with the same zlib directly.
    """
    import zlib

    from ..arrowutil import one_chunk

    def score(t: pa.Table) -> pa.Table:
        txt = one_chunk(t["text"])
        raws, gzs = [], []
        for s in txt.to_pylist():
            b = s.encode("utf-8")
            raws.append(len(b))
            gzs.append(len(zlib.compress(b, level)))
        raw = np.array(raws, dtype=np.int64)
        gz = np.array(gzs, dtype=np.int64)
        ratio = np.where(raw > 0, 1000 * gz // np.maximum(raw, 1), 1000)
        return pa.table({
            "doc_id": one_chunk(t["doc_id"]).cast(pa.int64()),
            "raw_bytes": pa.array(raw),
            "deflate_bytes": pa.array(gz),
            "ratio_permille": pa.array(ratio),
            "keep": pa.array((ratio >= max_ratio_permille)
                             .astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")
