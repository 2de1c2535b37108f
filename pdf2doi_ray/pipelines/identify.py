"""Flagship pipeline: pages → parse → extract → identifiers.

Assembles the streaming Ray Data pipeline mirroring the reference's
per-document driver cascade (``/root/reference/pdf2doi/main.py:105-189``) as
two batch stages:

1. :class:`pdf2doi_ray.stages.parse.HtmlParse` — actor pool over the binary
   ``html`` column, emits text/title/h1/meta and drops the payload;
2. :func:`pdf2doi_ray.stages.extract.make_extract_fn` — stateless vectorized
   prefilter + exact cascade, emits the identifier columns.

The whole pipeline is shuffle-free (embarrassingly parallel per row); the
only wide operations in this engine live in the resume/dedup and metrics
paths (see :mod:`pdf2doi_ray.state.checkpoint` and
:func:`method_stats`).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.extract import make_extract_fn
from ..stages.parse import HtmlParse

#: identifier output schema (FIXTURES.md §2)
RESULT_COLUMNS = ["url", "identifier", "identifier_type", "method",
                  "validation_info"]


def identify_pages(pages, cfg: EngineConfig = DEFAULT_CONFIG,
                   keep_columns: tuple[str, ...] = ()):
    """pages Dataset → identifiers Dataset (streaming, lazy).

    Uses the fused parse+extract actor stage (see
    :class:`pdf2doi_ray.stages.fused.IdentifyPages`) so the wide parsed
    intermediate never crosses the object store.  ``keep_columns`` carries
    extra input columns (e.g. ``lang``) through for downstream metrics.
    """
    from ..stages.fused import IdentifyPages

    if cfg.parse_mode == "actors":
        return pages.map_batches(
            IdentifyPages,
            fn_constructor_kwargs={"cfg": cfg,
                                   "keep_columns": tuple(keep_columns)},
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            concurrency=cfg.parse_concurrency or (1, 8),
            num_cpus=1,
        )
    # task mode: the fused instance is pickled to warm worker processes; its
    # state is module-level compiled regexes, imported once per worker.
    fused = IdentifyPages(cfg, tuple(keep_columns))
    return pages.map_batches(
        fused,
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )


def _parse_then_extract(pages, cfg: EngineConfig):
    """Shared parse→extract prefix (parsed columns still attached), honoring
    ``cfg.parse_mode`` the same way everywhere."""
    if cfg.use_html:
        if cfg.parse_mode == "actors":
            parsed = pages.map_batches(
                HtmlParse,
                batch_format="pyarrow",
                batch_size=cfg.parse_batch_size,
                concurrency=cfg.parse_concurrency or (1, 8),
                num_cpus=1,
            )
        else:
            parser = HtmlParse()
            parsed = pages.map_batches(
                parser, batch_format="pyarrow",
                batch_size=cfg.parse_batch_size)
    else:
        parsed = pages
    return parsed.map_batches(
        make_extract_fn(cfg),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )


def identify_pages_staged(pages, cfg: EngineConfig = DEFAULT_CONFIG,
                          keep_columns: tuple[str, ...] = ()):
    """Two-stage variant (parse stage → stateless extract tasks) —
    composable when a pipeline needs the parsed text between the stages.

    Since round 2 this honors ``cfg.parse_mode`` like every other pipeline
    (default "tasks"); pass ``cfg.with_(parse_mode="actors")`` to get the
    actor-pool parse this function used unconditionally in round 1."""
    return _parse_then_extract(pages, cfg).select_columns(
        RESULT_COLUMNS + list(keep_columns))


#: the reference's full 5-method finder registry (finders.py:867-873).
def finder_registry(base_cfg: EngineConfig = DEFAULT_CONFIG):
    """Offline methods map to an EngineConfig running ONLY that method
    (mirrors ``find_identifier(file, method=...)``); the two websearch
    methods map to the transport-injected stage factory
    (:func:`pdf2doi_ray.stages.google.attach_google_search`) — like the
    reference, they are inert unless a search transport is supplied
    (``websearch=True`` analog)."""
    from ..stages.google import attach_google_search

    reg = {name: base_cfg.with_(methods=(name,))
           for name in ("document_infos", "filename", "document_text")}
    reg["title_google"] = attach_google_search
    reg["first_N_characters_google"] = attach_google_search
    return reg


def identify_pages_websearch(pages, search, fetch,
                             cfg: EngineConfig = DEFAULT_CONFIG,
                             keep_columns: tuple[str, ...] = (),
                             numb_results: int = 6,
                             web_concurrency=(1, 4)):
    """Full 5-method cascade: parse → offline extract (methods 1–3) →
    websearch actor pool re-attempting exhausted rows (methods 4–5 of the
    reference registry, finders.py:792-861).  The parsed columns
    (title/h1/meta/text) stay alive through the web stage and are dropped at
    the end."""
    from ..stages.google import attach_google_search

    extracted = _parse_then_extract(pages, cfg)
    webbed = attach_google_search(extracted, search, fetch, cfg,
                                  numb_results=numb_results,
                                  concurrency=web_concurrency)
    return webbed.select_columns(RESULT_COLUMNS + list(keep_columns))


def identify_pages_online(pages, cfg: EngineConfig,
                          splices: dict[str, object],
                          keep_columns: tuple[str, ...] = ()):
    """Full cascade with production online stages attached (round 3).

    ``splices`` is ``dict(transports.online_splices(cfg))`` — constructed on
    the driver so a missing HTTP library fails at startup, not in a worker.
    ``websearch`` needs the parsed columns still attached, so it splices
    between extract and the column drop; ``webvalidation`` runs over the
    final identifier stream.
    """
    if "websearch" in splices:
        extracted = _parse_then_extract(pages, cfg)
        out = splices["websearch"](extracted) \
            .select_columns(RESULT_COLUMNS + list(keep_columns))
    else:
        out = identify_pages(pages, cfg, keep_columns=keep_columns)
    if "webvalidation" in splices:
        out = splices["webvalidation"](out)
    return out


def format_report_lines(identifiers):
    """Fixed-width report rows, byte-compatible with the reference's
    identifier-table writer (main.py:218-221): ``type id url`` columns at
    widths 15/40/10, ``n.a.`` placeholders for unvalidated rows."""
    import pyarrow as pa

    def fmt(t: pa.Table) -> pa.Table:
        lines = []
        for ident, kind, vinfo, url in zip(
                t["identifier"].to_pylist(), t["identifier_type"].to_pylist(),
                t["validation_info"].to_pylist(), t["url"].to_pylist()):
            if vinfo:
                lines.append("{:<15s} {:<40s} {:<10s}".format(kind, ident, url))
            else:
                lines.append("{:<15s} {:<40s} {:<10s}".format("n.a.", "n.a.", url))
        return pa.table({"line": pa.array(lines, type=pa.string())})

    return identifiers.map_batches(fmt, batch_format="pyarrow")


def write_report(identifiers, path: str) -> int:
    """Stream the formatted report into one text file (the reference's
    single-file CLI sink).  Returns the line count."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for batch in format_report_lines(identifiers).iter_batches(
                batch_size=8192, batch_format="pyarrow"):
            for line in batch["line"].to_pylist():
                f.write(line + "\n")
                n += 1
    return n


def clip_text(identifiers) -> str:
    """The reference's clipboard sink (main.py:229-241): concatenate
    ``identifier + "\\n"`` for every VALIDATED row, skipping unvalidated
    ones entirely (unlike the report file, which emits ``n.a.`` rows).

    The reference walks files in directory order; the distributed analog
    sorts by url so the join is deterministic.  Contract: the validated-
    identifier set is a small result by definition (it is bound for a
    clipboard/stdout) — blocks pre-join in parallel after the sort and the
    driver receives one partial string per block, never one row per page.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    def keep_valid(t: pa.Table) -> pa.Table:
        v = one_chunk(t["validation_info"])
        keep = pc.and_kleene(v.is_valid(), pc.not_equal(v, ""))
        return t.filter(pc.fill_null(keep, False)) \
            .select(["url", "identifier"])

    def join_block(t: pa.Table) -> pa.Table:
        ids = t["identifier"].to_pylist()
        return pa.table({
            "min_url": pa.array([t["url"][0].as_py()], type=pa.string()),
            "part": pa.array(["".join(i + "\n" for i in ids)],
                             type=pa.string())})

    # blocks out of sort() are internally ordered and range-disjoint, but
    # the streaming executor does not promise block ORDER downstream —
    # each partial carries its range's first url and the driver reorders
    parts = (identifiers.map_batches(keep_valid, batch_format="pyarrow")
             .sort("url")
             .map_batches(join_block, batch_size=None,
                          batch_format="pyarrow")
             .take_all())
    return "".join(p["part"] for p in sorted(parts,
                                             key=lambda p: p["min_url"]))


def clip_sink(identifiers, path: str | None = None) -> str:
    """Deliver :func:`clip_text` the way the reference does: to the system
    clipboard when pyperclip is importable, else (and additionally when
    ``path`` is given) to a file/stdout-friendly string."""
    text = clip_text(identifiers)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    try:                                      # optional, like -clip
        import pyperclip
        pyperclip.copy(text)
    except Exception:                         # noqa: BLE001 — no clipboard
        pass
    return text


_NULL_KEY = "\x00null"  # sentinel: Ray's sort-based groupby can't order nulls


def method_stats(identifiers):
    """Per-method result counts — the run-metrics aggregation.

    Pre-aggregates inside ``map_batches`` (combiner) so the shuffle moves one
    row per (method, batch) instead of one per page, and maps the nullable
    ``method`` key through a non-null sentinel because Ray Data's sort-based
    shuffle cannot partition on null keys.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        key = pc.fill_null(t["method"], _NULL_KEY)
        g = pa.table({"m": key}).group_by("m").aggregate([("m", "count")])
        # select by NAME before renaming: pyarrow's keys-first column order
        # is version-dependent
        return g.select(["m", "m_count"]).rename_columns(["method_key", "n"])

    agg = (identifiers
           .map_batches(partial, batch_format="pyarrow")
           .groupby("method_key")
           .aggregate(Sum("n", alias_name="n_rows")))

    def restore(t: pa.Table) -> pa.Table:
        key = t["method_key"]
        method = pc.if_else(pc.equal(key, _NULL_KEY),
                            pa.scalar(None, pa.string()), key)
        return pa.table({"method": method, "n_rows": t["n_rows"]})

    return agg.map_batches(restore, batch_format="pyarrow")


def identify_incremental(curr_pages, prev_pages, prev_results_dir: str,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         num_partitions: int = 8,
                         reuse_join: str = "shuffle"):
    """Record-level incremental extraction: run the cascade ONLY on pages
    whose payload is new or changed since the previous crawl, reuse the
    previous run's identifier rows for unchanged pages, and drop rows for
    removed pages — byte-identical to ``identify_pages(curr_pages)`` by
    construction (the driver oracle proves it with the full-crawl SQL,
    like the shard-level ``resume_semi_join`` transparency proof).

    Plan (record-level incrementality on top of the shard-level resume
    machinery):

    1. page diff: per-batch (url, md5(html)) reductions on both crawls —
       ~50 B/row, payloads never leave their batch — through ONE
       full-outer hash join (:func:`..stages.corpus.crawl_diff`);
    2. previous results filtered to UNCHANGED urls by one inner hash
       join of identifier rows (~90 B/row) — results for changed urls
       are stale and recomputed, rows for removed urls never re-enter;
    3. the existing broadcast resume anti-join
       (:func:`..state.checkpoint.with_previous_results`) runs the
       cascade only on the uncovered (added + changed) slice and unions
       the reused rows back.

    The current crawl streams twice (once hashed for the diff, once
    through the cascade's anti-join) — inherent to diffing; the heavy
    html column crosses no exchange in either pass.  Crossover: the path
    adds two ~40–90 B/row hash joins and saves the cascade on the
    unchanged fraction — it wins once per-page work exceeds roughly the
    join cost divided by (1 − churn), i.e. immediately for real parse /
    model-scoring workloads, while for this engine's vectorized cascade
    at bench scale the full run is cheaper (measured in BASELINE.md).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..arrowutil import one_chunk
    from ..stages.corpus import crawl_diff
    from ..stages.joins import broadcast_hash_join, shuffle_hash_join
    from ..state.checkpoint import with_previous_results_dataset

    # hash EVERY payload column the cascade can consume (html when
    # cfg.use_html, plus the pre-extracted text either way): a page whose
    # html is unchanged but whose text column changed must classify as
    # changed, or the reuse would violate the transparency contract
    payload_cols = (["html", "text"] if cfg.use_html else ["text"])

    def url_payload(t: pa.Table) -> pa.Table:
        # all-Arrow: string→binary casts are zero-copy (utf-8 bytes ==
        # encode("utf-8")) and the join is one C kernel — the widest
        # column in the engine never crosses into Python (VERDICT r3 #4)
        parts = []
        for c in payload_cols:
            col = one_chunk(t[c])
            if not pa.types.is_binary(col.type):
                col = col.cast(pa.binary())
            parts.append(pc.fill_null(col, b""))
        payload = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(
                *parts, pa.scalar(b"\x00", type=pa.binary()))
        return pa.table({"url": t["url"], "payload": payload})

    statuses = crawl_diff(
        curr_pages.map_batches(url_payload, batch_format="pyarrow"),
        prev_pages.map_batches(url_payload, batch_format="pyarrow"),
        key_col="url", text_col="payload", num_partitions=num_partitions,
        key_type=pa.string())

    def unchanged_urls(t: pa.Table) -> pa.Table:
        keep = pc.equal(one_chunk(t["status"]), "unchanged")
        return pa.table({"url": t.filter(keep)["url"]})

    # a first-ever run has NO unchanged urls: the null-url sentinel keeps
    # the join side non-empty (null keys match nothing) so every page
    # flows to the cascade
    sentinel = rd.from_arrow(pa.table({
        "url": pa.array([None], type=pa.string())}))
    unchanged = statuses.map_batches(
        unchanged_urls, batch_format="pyarrow").union(sentinel)
    prev_ids = rd.read_parquet(prev_results_dir)
    # reuse filter: LEFT SEMI against the unchanged-url set.  SHUFFLE by
    # default — the broadcast variant was A/B'd at bench scale and LOST
    # (33.8 s shuffle vs 50–62 s broadcast: a stateless broadcast join
    # rebuilds the ~unchanged-sized Acero hash table per BATCH, while the
    # hash-partitioned join builds each partition's table once; the
    # aggregator-actor spawn it saves does not pay for that).  Broadcast
    # stays available for genuinely small unchanged sets (high-churn
    # crawls), where the per-batch build is cheap.  Both modes are proven
    # byte-identical by tests/test_round4_fixes.py.
    if reuse_join == "broadcast":
        valid_prev = broadcast_hash_join(prev_ids, unchanged, on="url",
                                         join_type="left semi").materialize()
    else:
        valid_prev = shuffle_hash_join(prev_ids, unchanged, on="url",
                                       join_type="left_semi",
                                       num_partitions=num_partitions
                                       ).materialize()
    if valid_prev.count() == 0:
        return identify_pages(curr_pages, cfg)
    return with_previous_results_dataset(
        curr_pages, valid_prev, lambda rem: identify_pages(rem, cfg))


def method_agreement(pages, cfg: EngineConfig = DEFAULT_CONFIG):
    """Finder-method agreement matrix: for every unordered pair of finder
    methods, how many pages BOTH methods resolve and on how many they
    agree — the audit that exposes metadata drift vs body text (the
    reference resolves the conflict silently by priority,
    ``/root/reference/pdf2doi/finders.py`` cascade order; this surfaces
    it corpus-wide).

    One fused stage parses each page ONCE and runs the three
    single-method extract kernels on the same parsed batch in-worker
    (no reparse, no join — the three results never leave the task);
    per-batch pair counts combine into a 3-row groupby.  Returns
    (method_a, method_b, n_both, n_agree).
    """
    import itertools

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.extract import make_extract_fn
    from ..stages.parse import HtmlParse

    methods = ("document_infos", "filename", "document_text")

    class _Agree:
        def __init__(self) -> None:
            self._parse = HtmlParse()
            self._ex = {m: make_extract_fn(cfg.with_(methods=(m,)))
                        for m in methods}

        def __call__(self, batch: pa.Table) -> pa.Table:
            parsed = self._parse(batch) if cfg.use_html else batch
            ids = {}
            for m in methods:
                col = self._ex[m](parsed)["identifier"]
                ids[m] = col.combine_chunks() \
                    if isinstance(col, pa.ChunkedArray) else col
            ma, mb, nb, na = [], [], [], []
            for a, b in itertools.combinations(methods, 2):
                both = pc.and_(pc.is_valid(ids[a]), pc.is_valid(ids[b]))
                agree = pc.fill_null(
                    pc.and_kleene(both, pc.equal(ids[a], ids[b])), False)
                ma.append(a)
                mb.append(b)
                nb.append(int(np.asarray(both).sum()))
                na.append(int(np.asarray(agree).sum()))
            return pa.table({
                "method_a": pa.array(ma, type=pa.string()),
                "method_b": pa.array(mb, type=pa.string()),
                "b_p": pa.array(nb, type=pa.int64()),
                "a_p": pa.array(na, type=pa.int64()),
            })

    counted = pages.map_batches(
        _Agree,
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        concurrency=cfg.parse_concurrency or (1, 8),
        num_cpus=1,
    )
    return (counted.groupby(["method_a", "method_b"])
            .aggregate(Sum("b_p", alias_name="n_both"),
                       Sum("a_p", alias_name="n_agree")))


def lineage_stamps(pages, cfg: EngineConfig = DEFAULT_CONFIG,
                   n_shards: int = 16):
    """Per-partition lineage + metrics stamps for a resumable extraction
    run (the north-rule checkpoint contract): every page maps to a shard
    (its crawl-key second mod ``n_shards`` — a stable partition id), and
    each shard reports row count, identifier-found count, and an
    order-independent content stamp (the min and max of a per-row md5
    over ``url|identifier``), so a re-run of any shard can be verified
    byte-for-byte against the manifest without re-reading other shards.

    Combiner-first: the per-batch kernel reduces to ≤ ``n_shards`` rows
    (count/found sums + md5 min/max) before one tiny groupby merge.  The
    md5 is per-row Python over short strings — the same cost class as the
    ``fingerprint`` stage, negligible next to the parse.  Returns
    (shard, n_rows, n_found, min_stamp, max_stamp).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    ids = identify_pages(pages, cfg, keep_columns=("warc_ts",))

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(pc.cast(t["warc_ts"], pa.timestamp("us")),
                                pa.int64()))
        shard = pa.array((ts // 1_000_000) % n_shards, type=pa.int64())
        url = t["url"].to_pylist()
        ident = t["identifier"].to_pylist()
        stamps = [hashlib.md5(
            (u + "|" + (i or "")).encode()).hexdigest()
            for u, i in zip(url, ident)]
        g = pa.table({
            "shard": shard,
            "n_p": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "f_p": pa.array(
                np.asarray(pc.is_valid(t["identifier"])).astype(np.int64)),
            "s": pa.array(stamps, type=pa.string()),
        }).group_by("shard").aggregate([("n_p", "sum"), ("f_p", "sum"),
                                        ("s", "min"), ("s", "max")])
        return g.rename_columns(["shard", "n_p", "f_p", "mn_p", "mx_p"])

    return (ids.map_batches(partial, batch_format="pyarrow")
            .groupby("shard")
            .aggregate(Sum("n_p", alias_name="n_rows"),
                       Sum("f_p", alias_name="n_found"),
                       Min("mn_p", alias_name="min_stamp"),
                       Max("mx_p", alias_name="max_stamp")))
