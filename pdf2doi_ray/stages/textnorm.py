"""Webtext normalization: Unicode text normalization and URL
canonicalization as pure vectorized map stages (no shuffle, no state).

Every step is an Arrow compute kernel whose semantics are mirrored exactly
by the SQL oracle — both sides run RE2 regexes and Unicode NFC, so results
hash-match byte-for-byte:

* :func:`normalize_text`: NFC → lowercase → collapse ``\\s+`` runs → strip
  leading/trailing whitespace.  The canonical pre-dedup text form (exact
  dedup after normalization catches case/whitespace-only near-dups for
  free, before any MinHash machinery runs).
* :func:`canonicalize_urls`: strip ``#fragment`` → lowercase
  ``scheme://host[:port]`` (path/query case preserved — path case is
  significant on most servers) → drop default ports (``http…:80``,
  ``https…:443``) → drop a bare trailing ``/``.  The canonical key for
  cross-crawl page dedup and per-host statistics.

Reference: pdf2doi normalizes candidate identifiers, not documents
(``finders.py`` standardise path); document/url normalization is the
corpus-scale analog a crawl pipeline needs before any dedup pass.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import one_chunk


def _nfc_kernel(col: pa.Array) -> pa.Array:
    """NFC-normalize a string array.

    This sandbox's pyarrow (16.1.0) ships a broken ``utf8_normalize``: it
    DECOMPOSES a composed ``é`` under form="NFC" (verified — NFC and NFD
    return identical codepoints), which would silently diverge from every
    other NFC implementation (DuckDB's ``nfc_normalize``, Python's
    ``unicodedata``).  Instead: ASCII is NFC-invariant, so a vectorized
    ``string_is_ascii`` gate passes the common web-crawl case through
    zero-copy, and only the non-ASCII minority is normalized row-wise with
    ``unicodedata.normalize`` and scattered back via ``replace_with_mask``.
    """
    mask = pc.fill_null(pc.invert(pc.string_is_ascii(col)), False)
    if not pc.any(mask).as_py():
        return col
    taken = pc.take(col, pc.indices_nonzero(mask)).to_pylist()
    fixed = pa.array([unicodedata.normalize("NFC", s) for s in taken],
                     type=pa.string())
    return pc.replace_with_mask(col, mask, fixed)


def _norm_text_kernel(col: pa.Array) -> pa.Array:
    s = _nfc_kernel(col)
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.replace_substring_regex(s, r"^ | $", "")


def normalize_text(docs):
    """(doc_id, text) → (doc_id, norm_text, n_chars_norm)."""
    def fn(t: pa.Table) -> pa.Table:
        norm = _norm_text_kernel(one_chunk(t["text"]))
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


# PII patterns chosen for exact RE2 parity between pyarrow's
# replace_substring_regex and DuckDB's regexp_replace (both RE2): no
# lookaround, no backreferences, \b anchors only around digits.  Verified
# byte-identical on adversarial fixtures in tests/test_textnorm.py.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d[\d-]{7,14}\d"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Application order matters: the email pattern can consume digits a phone
# or IP pattern would otherwise claim (user name parts), and the phone
# pattern's leading "+" disambiguates it from dotted IPs — email, then
# phone, then IP, mirrored verbatim by the SQL oracle's nesting order.
_PII_STEPS = ((PII_EMAIL, "<EMAIL>"), (PII_PHONE, "<PHONE>"),
              (PII_IPV4, "<IP>"))


def _redact_kernel(col: pa.Array) -> pa.Array:
    out = col
    for pat, repl in _PII_STEPS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def redact_pii(docs, text_col: str = "text"):
    """PII scrubbing — the standard pre-release pass over web-crawl text
    (emails, phone numbers, IPv4 addresses → typed placeholder tokens).

    (doc_id, text) → (doc_id, clean_text, n_emails, n_phones, n_ips).

    Pure vectorized map: three RE2 ``replace_substring_regex`` kernels and
    three ``count_substring_regex`` kernels per batch, no shuffle, no
    state, documents never move.  Counts are taken on the ORIGINAL text
    (before any placeholder insertion) so they are independent of
    replacement order.  Reference: pdf2doi has no corpus-release path;
    this is the crawl-pipeline analog of its per-field scrubbing
    (``finders.py`` strips URL-encodings before matching).
    """
    def fn(t: pa.Table) -> pa.Table:
        txt = one_chunk(t[text_col])
        counts = {
            name: pc.count_substring_regex(txt, pattern=pat).cast(pa.int64())
            for name, (pat, _) in zip(("n_emails", "n_phones", "n_ips"),
                                      _PII_STEPS)
        }
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": _redact_kernel(txt),
            **counts,
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _canon_url_kernel(col: pa.Array) -> pa.Array:
    u = pc.replace_substring_regex(col, r"(?s)#.*$", "")
    # scheme://host[:port] prefix lowercases; path/query suffix unchanged.
    # Without a scheme neither regex matches and both halves would echo the
    # whole string — mask the suffix to "" so such values pass through once.
    has_scheme = pc.match_substring_regex(u, r"^[^/]*://")
    prefix = pc.utf8_lower(
        pc.replace_substring_regex(u, r"(?s)^([^/]*://[^/]*).*$", r"\1"))
    suffix = pc.if_else(
        has_scheme, pc.replace_substring_regex(u, r"^[^/]*://[^/]*", ""), "")
    prefix = pc.replace_substring_regex(prefix, r"^(http://[^/:]*):80$",
                                        r"\1")
    prefix = pc.replace_substring_regex(prefix, r"^(https://[^/:]*):443$",
                                        r"\1")
    full = pc.binary_join_element_wise(prefix, suffix, "")
    return pc.replace_substring_regex(full, r"(?s)^([^/]*://[^/]*)/$", r"\1")


def canonicalize_urls(pages, keep=()):
    """(url, ...) → (url, canonical_url[, *keep]).  Urls without ``://``
    pass through the host step once (never duplicated) — synthetic and
    crawl urls always carry a scheme.  ``keep`` names extra input columns
    to carry through (e.g. ``doc_id`` for a downstream keyed dedup)."""
    def fn(t: pa.Table) -> pa.Table:
        urls = one_chunk(t["url"])
        cols = {"url": urls, "canonical_url": _canon_url_kernel(urls)}
        for c in keep:
            cols[c] = t[c]
        return pa.table(cols)

    return pages.map_batches(fn, batch_format="pyarrow")


class ED1Corrector:
    """Actor-pool stage: SymSpell-style edit-distance-1 spell correction
    of a token table against a broadcast dictionary — the
    approximate-string-matching join (OCR/typo normalization of a web
    vocabulary before counting/deduping on it).

    The dictionary's DELETION NEIGHBORHOOD index is built ONCE per actor
    in ``__init__`` (the stateful-stage contract: setup per actor, work
    per batch): for every dict word ``w`` and position ``i``, the pair
    ``(w minus char i, i)`` plus the plain deleted string — so a token
    ``t`` matches ``w`` at edit distance exactly 1 iff one of

    * deletion:     ``t`` minus some char equals ``w``
    * insertion:    ``t`` equals ``w`` minus some char
    * substitution: ``t`` minus char ``i`` equals ``w`` minus char ``i``

    The correction is the LEXICOGRAPHICALLY SMALLEST matching dict word
    (deterministic; the SQL oracle mirrors the same min).  In-dictionary
    tokens pass through unchanged with ``correction == token``.  Tokens
    with no ED1 match emit no row.  Per-batch work loops over the
    DISTINCT tokens of the block (the md5-u64 precedent: unique-value
    loops are fine where values are vocabulary-bounded); everything
    around it is a plain streaming map — no shuffle, dictionary
    broadcast once via ``ray.put``.
    """

    def __init__(self, dict_ref) -> None:
        import ray

        words = ray.get(dict_ref) if not isinstance(dict_ref, list) \
            else dict_ref
        self.exact = set(words)
        self.by_del = {}        # deleted-string -> sorted [words]
        self.by_del_pos = {}    # (deleted, i)   -> sorted [words]
        for w in sorted(self.exact):
            for i in range(len(w)):
                d = w[:i] + w[i + 1:]
                self.by_del.setdefault(d, []).append(w)
                self.by_del_pos.setdefault((d, i), []).append(w)

    def _correct_one(self, t: str):
        if t in self.exact:
            return t
        best = None
        # insertion into t (t == w minus a char): w is t plus one char
        for w in self.by_del.get(t, ()):
            if best is None or w < best:
                best = w
        for i in range(len(t)):
            d = t[:i] + t[i + 1:]
            # deletion from t
            if d in self.exact and (best is None or d < best):
                best = d
            # substitution at i
            for w in self.by_del_pos.get((d, i), ()):
                if w != t and (best is None or w < best):
                    best = w
        return best

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = (t["token"].combine_chunks()
                if isinstance(t["token"], pa.ChunkedArray)
                else t["token"]).to_pylist()
        n = np.asarray(t["n"].combine_chunks()
                       if isinstance(t["n"], pa.ChunkedArray)
                       else t["n"], dtype=np.int64)
        uniq = {}
        for tok in toks:
            if tok not in uniq:
                uniq[tok] = self._correct_one(tok)
        keep, corr = [], []
        for j, tok in enumerate(toks):
            c = uniq[tok]
            if c is not None:
                keep.append(j)
                corr.append(c)
        keep = np.asarray(keep, dtype=np.int64)
        return pa.table({
            "token": pa.array([toks[j] for j in keep],
                              type=pa.string()),
            "correction": pa.array(corr, type=pa.string()),
            "n": pa.array(n[keep]),
        })


def ed1_correct(tokens, dict_words, concurrency=(1, 4)):
    """Run :class:`ED1Corrector` over a ``(token, n)`` Dataset with the
    dictionary broadcast once.  Returns ``(token, correction, n)`` for
    tokens within edit distance 1 of the dictionary (in-vocab tokens map
    to themselves); unmatched tokens drop."""
    import ray

    dict_ref = ray.put(sorted(set(dict_words)))
    return tokens.map_batches(
        ED1Corrector, fn_constructor_args=(dict_ref,),
        batch_format="pyarrow", concurrency=concurrency)
