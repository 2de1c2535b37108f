"""Skew handling: salted two-phase aggregation for hot keys.

Web corpora are zipfian in ``host(url)`` — a bare ``groupby(host)`` sends a
hot domain's billions of rows to one reducer.  The salted pattern keeps the
exchange balanced while staying exact:

1. phase 1 groups on ``(host, salt)`` where ``salt = crc32(url) % S`` —
   a hot host's rows spread over S reducers;
2. phase 2 merges the S partials per host — S rows per host, trivially small.

Both phases also pre-aggregate inside ``map_batches`` first (combiner), so
the phase-1 shuffle moves one row per (host, salt) per batch, never pages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_SALTS = 8


def host_of(url: str) -> str:
    """scheme://HOST/... → host (cheap split, no urllib per row)."""
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def _hosts_vec(urls: pa.Array) -> pa.Array:
    # strip scheme then take up to the first '/': two vectorized kernels
    no_scheme = pc.replace_substring_regex(urls, r"^[a-z][a-z0-9+.-]*://", "")
    return pc.replace_substring_regex(no_scheme, r"/.*$", "")


def pages_per_host(pages, n_salts: int = DEFAULT_SALTS):
    """url stream → (host, n_pages), exact counts via salted two-phase agg."""
    from ray.data.aggregate import Sum

    def phase1_partial(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) \
            else t["url"]
        hosts = _hosts_vec(urls)
        # salt choice is arbitrary (any deterministic spread): pandas'
        # C string-hash kernel replaces the per-row Python crc32 loop
        import pandas as pd

        salts = (pd.util.hash_array(
            np.asarray(urls.to_pylist(), dtype=object)) % n_salts) \
            .astype(np.int64)
        tbl = pa.table({"host": hosts,
                        "salt": pa.array(salts, type=pa.int64())})
        g = tbl.group_by(["host", "salt"]).aggregate([("host", "count")])
        return g.select(["host", "salt", "host_count"]) \
            .rename_columns(["host", "salt", "n"])

    phase1 = (pages.map_batches(phase1_partial, batch_format="pyarrow")
              .groupby(["host", "salt"])
              .aggregate(Sum("n", alias_name="n")))
    # phase 2: merge the ≤ n_salts partials per host (tiny)
    return (phase1.groupby("host")
            .aggregate(Sum("n", alias_name="n_pages")))


def filter_blocked_hosts(pages, blocked_hosts, keep_cols=("url", "lang")):
    """C4-style domain blocklist filter: drop every page whose host is in
    ``blocked_hosts`` (the reference-scale analog of the "bad domains"
    list every web-corpus curation run applies first).

    The blocklist is a SMALL side by definition (a curated list, not
    data-derived): it broadcasts once via ``ray.put`` and every task reads
    the shared copy — never re-shipped per batch, never a shuffle join.
    The membership test is one vectorized ``pc.is_in`` over the
    batch-extracted hosts.  Returns the kept pages projected to
    ``keep_cols`` + ``host``.
    """
    import ray

    bl_ref = ray.put(pa.array(sorted(set(blocked_hosts)), type=pa.string()))
    cols = list(keep_cols)

    def keep(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks() \
            if isinstance(t["url"], pa.ChunkedArray) else t["url"]
        hosts = _hosts_vec(urls)
        mask = pc.invert(pc.is_in(hosts, value_set=ray.get(bl_ref)))
        out = t.select(cols).append_column("host", hosts)
        return out.filter(mask)

    return pages.map_batches(keep, batch_format="pyarrow")


def host_crawl_gaps(pages):
    """Per-host fetch-gap audit — n_fetches plus the min/max seconds
    between consecutive fetches of the same host (the crawl-politeness /
    rate-limit compliance metric).  NULL min/max for single-fetch hosts
    (SQL min-of-nothing semantics).

    Sorted-block plan (the :func:`pdf2doi_ray.stages.aggs
    .event_transitions` shape): sort (host, warc_ts); adjacent same-host
    rows inside a block yield gaps vectorized, each block carries exactly
    its first and last row to a host-sharded stitch for the straddling
    gaps, and per-host (n, min, max) partials merge through one tiny
    ``groupby(host)`` — int64 sentinels ride the Min/Max aggregates and
    null out in the final projection.  Exchange volume: ≤ |hosts| partial
    rows per block + 2 carries per block, independent of fetch skew.
    Returns (host, n_fetches, min_gap_s, max_gap_s).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from ..arrowutil import one_chunk
    from .stitch import DEFAULT_STITCH_SHARDS, hash_shard_str, sharded_stitch

    I64MAX = np.iinfo(np.int64).max
    I64MIN = np.iinfo(np.int64).min

    def to_host_ts(t: pa.Table):
        urls = one_chunk(t["url"])
        hosts = _hosts_vec(urls)
        ts = np.asarray(pc.cast(pc.cast(one_chunk(t["warc_ts"]),
                                        pa.timestamp("us")), pa.int64()))
        return hosts, ts

    def project(t: pa.Table) -> pa.Table:
        hosts, ts = to_host_ts(t)
        return pa.table({"host": hosts, "ts_us": pa.array(ts)})

    def gap_partials(hosts, ts, adj):
        """(host, n=0, min, max) rows from adjacent index pairs."""
        gaps = (ts[adj + 1] - ts[adj]) // np.int64(1_000_000)
        tbl = pa.table({"host": hosts.take(pa.array(adj)),
                        "gap": pa.array(gaps)})
        g = tbl.group_by("host").aggregate([("gap", "min"), ("gap", "max")])
        z = np.zeros(g.num_rows, dtype=np.int64)
        return pa.table({
            "host": g["host"], "n_fetches": pa.array(z),
            "min_gap_s": g["gap_min"].cast(pa.int64()),
            "max_gap_s": g["gap_max"].cast(pa.int64())})

    def block_gaps(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "host": pa.array([], type=pa.string()),
            "n_fetches": pa.array([], type=pa.int64()),
            "min_gap_s": pa.array([], type=pa.int64()),
            "max_gap_s": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "is_first": pa.array([], type=pa.bool_()),
            "is_last": pa.array([], type=pa.bool_()),
            "boundary": pa.array([], type=pa.bool_())})
        n = t.num_rows
        if n == 0:
            return empty
        hosts = one_chunk(t["host"])
        ts = np.asarray(one_chunk(t["ts_us"])).astype(np.int64)
        same = np.asarray(pc.equal(hosts.slice(1), hosts.slice(0, n - 1)),
                          dtype=bool) if n > 1 else np.empty(0, bool)
        adj = np.nonzero(same)[0]
        gp = gap_partials(hosts, ts, adj)
        # per-host fetch counts (additive)
        c = pa.table({"host": hosts}).group_by("host") \
            .aggregate([([], "count_all")])
        k1, k2 = gp.num_rows, c.num_rows
        edge = np.array([0, n - 1]) if n > 1 else np.array([0])
        e = len(edge)
        return pa.table({
            "host": pa.concat_arrays([
                one_chunk(gp["host"]), one_chunk(c["host"]),
                hosts.take(pa.array(edge)).cast(pa.string())]),
            "n_fetches": pa.array(np.concatenate([
                np.zeros(k1, np.int64),
                np.asarray(c["count_all"], dtype=np.int64),
                np.zeros(e, np.int64)])),
            "min_gap_s": pa.array(np.concatenate([
                np.asarray(one_chunk(gp["min_gap_s"])),
                np.full(k2, I64MAX, np.int64),
                np.full(e, I64MAX, np.int64)])),
            "max_gap_s": pa.array(np.concatenate([
                np.asarray(one_chunk(gp["max_gap_s"])),
                np.full(k2, I64MIN, np.int64),
                np.full(e, I64MIN, np.int64)])),
            "ts_us": pa.array(np.concatenate([
                np.full(k1 + k2, -1, np.int64), ts[edge]])),
            "is_first": pa.array([False] * (k1 + k2)
                                 + [True] + [False] * (e - 1)),
            "is_last": pa.array([False] * (k1 + k2)
                                + [False] * (e - 1) + [True]),
            "boundary": pa.array([False] * (k1 + k2) + [True] * e)})

    def stitch(t: pa.Table) -> pa.Table:
        out_empty = pa.table({
            "host": pa.array([], type=pa.string()),
            "n_fetches": pa.array([], type=pa.int64()),
            "min_gap_s": pa.array([], type=pa.int64()),
            "max_gap_s": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return out_empty
        hosts = one_chunk(t["host"])
        ts = np.asarray(one_chunk(t["ts_us"])).astype(np.int64)
        isf = np.asarray(one_chunk(t["is_first"]), dtype=bool)
        isl = np.asarray(one_chunk(t["is_last"]), dtype=bool)
        # primary key must be the host VALUE (a hash would interleave
        # colliding hosts and break the is_last→is_first adjacency)
        order = np.lexsort(
            (ts, np.asarray(hosts.to_numpy(zero_copy_only=False),
                            dtype=object)))
        hosts = hosts.take(pa.array(order))
        ts, isf, isl = ts[order], isf[order], isl[order]
        m = len(ts)
        same = np.asarray(pc.equal(hosts.slice(1), hosts.slice(0, m - 1)),
                          dtype=bool) if m > 1 else np.empty(0, bool)
        pair = np.nonzero(same & isl[:-1] & isf[1:])[0]
        return gap_partials(hosts, ts, pair)

    srt = pages.map_batches(project, batch_format="pyarrow") \
        .sort(["host", "ts_us"])
    mixed = srt.map_batches(block_gaps, batch_format="pyarrow",
                            batch_size=None).materialize()
    interior = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["boundary"], False))
        .select(["host", "n_fetches", "min_gap_s", "max_gap_s"]),
        batch_format="pyarrow")
    carries = mixed.map_batches(
        lambda t: t.filter(t["boundary"])
        .select(["host", "ts_us", "is_first", "is_last"]),
        batch_format="pyarrow")
    cross = sharded_stitch(
        carries, lambda t: hash_shard_str(one_chunk(t["host"])),
        stitch, num_shards=DEFAULT_STITCH_SHARDS)

    def finish(t: pa.Table) -> pa.Table:
        none_seen = pc.equal(one_chunk(t["min_gap_s"]),
                             pa.scalar(I64MAX, pa.int64()))
        return pa.table({
            "host": t["host"],
            "n_fetches": t["n_fetches"],
            "min_gap_s": pc.if_else(none_seen, pa.scalar(None, pa.int64()),
                                    one_chunk(t["min_gap_s"])),
            "max_gap_s": pc.if_else(none_seen, pa.scalar(None, pa.int64()),
                                    one_chunk(t["max_gap_s"])),
        })

    return (interior.union(cross)
            .groupby("host")
            .aggregate(Sum("n_fetches", alias_name="n_fetches"),
                       Min("min_gap_s", alias_name="min_gap_s"),
                       Max("max_gap_s", alias_name="max_gap_s"))
            .map_batches(finish, batch_format="pyarrow"))


def filter_robots_disallow(pages, rules, keep_cols=("url", "lang")):
    """robots.txt-style disallow filter: drop every page whose host lists
    a disallow PATH-PREFIX matching the page's url path — the politeness
    gate a crawler's post-hoc audit (or a takedown pass) applies over an
    already-fetched corpus.

    ``rules`` is ``{host: (path_prefix, ...)}`` — curated and tiny by
    definition, so it broadcasts once via ``ray.put``.  Evaluation is
    grouped by DISTINCT prefix (many hosts share a few canonical rules):
    one ``is_in(host, hosts-with-this-prefix) AND starts_with(path,
    prefix)`` pair of vectorized kernels per distinct prefix, never a
    per-row Python loop and never a shuffle.  Returns kept pages
    projected to ``keep_cols`` + ``host``.
    """
    from collections import defaultdict

    import numpy as np
    import ray

    by_prefix = defaultdict(list)
    for h, prefixes in rules.items():
        for p in prefixes:
            by_prefix[p].append(h)
    bp_ref = ray.put({p: pa.array(sorted(hs), type=pa.string())
                      for p, hs in by_prefix.items()})
    cols = list(keep_cols)

    def keep(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks() \
            if isinstance(t["url"], pa.ChunkedArray) else t["url"]
        hosts = _hosts_vec(urls)
        no_scheme = pc.replace_substring_regex(
            urls, r"^[a-z][a-z0-9+.-]*://", "")
        paths = pc.replace_substring_regex(no_scheme, r"^[^/]*", "")
        drop = np.zeros(len(urls), dtype=bool)
        for p, hs in ray.get(bp_ref).items():
            m = pc.and_(pc.is_in(hosts, value_set=hs),
                        pc.starts_with(paths, p))
            drop |= np.asarray(m)
        out = t.select(cols).append_column("host", hosts)
        return out.filter(pa.array(~drop))

    return pages.map_batches(keep, batch_format="pyarrow")


def crawl_budget_apportion(pages, total_budget: int,
                           n_salts: int = DEFAULT_SALTS,
                           topk_block: int = 4096):
    """Largest-remainder (Hamilton) apportionment of a recrawl budget
    across hosts, proportional to each host's page count — the politeness
    scheduler's allocation step, exact in integers (no float shares, so
    every engine and the SQL oracle agree bit-for-bit).

    Math: with ``N`` total pages and host count ``n_h``, each host first
    gets ``floor(B * n_h / N)``; the ``R = B - sum(floors)`` leftover
    slots go to the ``R`` hosts with the largest remainders
    ``(B * n_h) mod N`` (ties: host ascending).  ``R < #hosts`` always.

    Plan: exact per-host counts via the salted two-phase
    :func:`pages_per_host` (hot hosts cost combiner rows, not
    occurrences); ``N``, ``sum(floors)`` reduce as O(1) scalars; the
    bonus set is a bounded-partial global top-``R`` over ``(rem DESC,
    host ASC)`` — each block of the host table forwards ≤min(R,
    block_rows) candidate rows, never the full host list — and comes back
    as ONE broadcast membership array.  int64 bound: ``B * max(n_h) <
    2**63``.

    Returns a Dataset of ``(host, n_pages, budget)``.
    """
    from ray.data.aggregate import Sum

    if total_budget < 0:
        raise ValueError("crawl_budget_apportion: negative budget")
    counts = pages_per_host(pages, n_salts=n_salts).materialize()
    tot = counts.aggregate(Sum("n_pages"))["sum(n_pages)"]
    if not tot:
        raise ValueError("crawl_budget_apportion: empty page set")
    n_total = int(tot)
    b = int(total_budget)

    def floors_partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_pages"].combine_chunks()
                       if isinstance(t["n_pages"], pa.ChunkedArray)
                       else t["n_pages"], dtype=np.int64)
        return pa.table({"f": pa.array([int((b * n // n_total).sum())],
                                       type=pa.int64())})

    sum_floors = int(counts.map_batches(
        floors_partial, batch_format="pyarrow").aggregate(Sum("f"))["sum(f)"]
        or 0)
    r = b - sum_floors

    # bounded-partial top-R: each block emits its own best ≤R remainder
    # rows; the driver merges ≤R×blocks rows — never the whole host table
    def block_top(t: pa.Table) -> pa.Table:
        import pandas as pd
        n = np.asarray(t["n_pages"].combine_chunks()
                       if isinstance(t["n_pages"], pa.ChunkedArray)
                       else t["n_pages"], dtype=np.int64)
        df = pd.DataFrame({
            "host": (t["host"].combine_chunks()
                     if isinstance(t["host"], pa.ChunkedArray)
                     else t["host"]).to_pandas(),
            "rem": (b * n) % n_total})
        df = df.sort_values(["rem", "host"],
                            ascending=[False, True]).head(r)
        return pa.Table.from_pandas(df, preserve_index=False)

    bonus_hosts = set()
    if r > 0:
        cand = counts.map_batches(block_top, batch_format="pyarrow",
                                  batch_size=topk_block).to_pandas()
        cand = cand.sort_values(["rem", "host"],
                                ascending=[False, True]).head(r)
        bonus_hosts = set(cand["host"])
    import ray
    bonus_ref = ray.put(pa.array(sorted(bonus_hosts), type=pa.string()))

    def finalize(t: pa.Table) -> pa.Table:
        hosts = t["host"].combine_chunks() \
            if isinstance(t["host"], pa.ChunkedArray) else t["host"]
        n = np.asarray(t["n_pages"].combine_chunks()
                       if isinstance(t["n_pages"], pa.ChunkedArray)
                       else t["n_pages"], dtype=np.int64)
        extra = np.asarray(pc.is_in(hosts, value_set=ray.get(bonus_ref)),
                           dtype=np.int64)
        return pa.table({"host": hosts,
                         "n_pages": pa.array(n, type=pa.int64()),
                         "budget": pa.array(b * n // n_total + extra,
                                            type=pa.int64())})

    return counts.map_batches(finalize, batch_format="pyarrow")


def host_crawl_overlap(cur, prev, url_col: str = "url"):
    """Per-host url-set Jaccard between two crawl snapshots — the
    crawl-freshness audit ("how much of each site did we see last time").

    Plan: each side collapses per batch to DISTINCT ``(host, url)`` rows
    tagged with a presence flag (one Arrow group_by per batch — a hot
    host costs its distinct urls per batch, never its row count); ONE
    ``groupby(host, url)`` Max-merges the flags (the set-ops combiner
    shape of `stages/setops`); per-batch partials then count
    intersection and union per host into a tiny ``groupby(host)`` Sum.
    Jaccard is an exact integer permille: ``n_both * 1000 // n_union``.

    Returns a Dataset of ``(host, n_both, n_union, jaccard_permille)``.
    """
    from ray.data.aggregate import Max, Sum

    def tag(flag_a: bool):
        def partial(t: pa.Table) -> pa.Table:
            urls = t[url_col].combine_chunks() \
                if isinstance(t[url_col], pa.ChunkedArray) else t[url_col]
            g = pa.table({"host": _hosts_vec(urls), "url": urls}) \
                .group_by(["host", "url"]).aggregate([])
            one = np.ones(g.num_rows, dtype=np.int64)
            zero = np.zeros(g.num_rows, dtype=np.int64)
            return pa.table({
                "host": g["host"], "url": g["url"],
                "a": pa.array(one if flag_a else zero),
                "b": pa.array(zero if flag_a else one)})
        return partial

    both = (cur.map_batches(tag(True), batch_format="pyarrow")
            .union(prev.map_batches(tag(False), batch_format="pyarrow"))
            .groupby(["host", "url"])
            .aggregate(Max("a", alias_name="a"), Max("b", alias_name="b")))

    def host_partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].combine_chunks()
                       if isinstance(t["a"], pa.ChunkedArray) else t["a"],
                       dtype=np.int64)
        b = np.asarray(t["b"].combine_chunks()
                       if isinstance(t["b"], pa.ChunkedArray) else t["b"],
                       dtype=np.int64)
        g = pa.table({"host": t["host"],
                      "nb": pa.array(a & b),
                      "nu": pa.array(np.ones(len(a), dtype=np.int64))}) \
            .group_by("host").aggregate([("nb", "sum"), ("nu", "sum")])
        return g.rename_columns(["host", "nb", "nu"])

    counts = (both.map_batches(host_partial, batch_format="pyarrow")
              .groupby("host")
              .aggregate(Sum("nb", alias_name="n_both"),
                         Sum("nu", alias_name="n_union")))

    def finalize(t: pa.Table) -> pa.Table:
        nb = np.asarray(t["n_both"].combine_chunks()
                        if isinstance(t["n_both"], pa.ChunkedArray)
                        else t["n_both"], dtype=np.int64)
        nu = np.asarray(t["n_union"].combine_chunks()
                        if isinstance(t["n_union"], pa.ChunkedArray)
                        else t["n_union"], dtype=np.int64)
        return pa.table({"host": t["host"],
                         "n_both": pa.array(nb),
                         "n_union": pa.array(nu),
                         "jaccard_permille": pa.array(nb * 1000 // nu)})

    return counts.map_batches(finalize, batch_format="pyarrow")


def host_url_lcp(pages, url_col: str = "url"):
    """Per-host longest common url prefix — the site-structure probe
    (how deep a shared path root each host's crawled urls have; feeds
    seed selection and path-based sharding).

    Uses the lexicographic-extremes identity: the common prefix of a SET
    of strings equals the common prefix of its lexicographic MIN and MAX
    alone — so the whole reduction is one ``groupby(host)`` with two
    built-in ``Min``/``Max`` string aggregates over per-batch combiner
    rows (LCP itself is associative; the extremes make it a two-value
    problem).  The final LCP of the two survivors is one vectorized
    byte-position sweep (O(max url length) numpy passes over host-count
    rows, never page-count).

    Returns a Dataset of ``(host, lcp_len, lcp)``.
    """
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        urls = t[url_col].combine_chunks() \
            if isinstance(t[url_col], pa.ChunkedArray) else t[url_col]
        g = pa.table({"host": _hosts_vec(urls), "u": urls}) \
            .group_by("host").aggregate([("u", "min"), ("u", "max")])
        return g.rename_columns(["host", "lo", "hi"])

    def stack(t: pa.Table) -> pa.Table:
        # combiner rows -> (host, u) pairs so ONE groupby handles both
        # extremes with the built-in aggregates
        return pa.table({
            "host": pa.chunked_array([t["host"],
                                      t["host"]]).combine_chunks(),
            "u": pa.chunked_array([t["lo"], t["hi"]]).combine_chunks()})

    ext = (pages.map_batches(partial, batch_format="pyarrow")
           .map_batches(stack, batch_format="pyarrow")
           .groupby("host").aggregate(Min("u", alias_name="lo"),
                                      Max("u", alias_name="hi")))

    def lcp(t: pa.Table) -> pa.Table:
        lo = pc.cast(t["lo"].combine_chunks()
                     if isinstance(t["lo"], pa.ChunkedArray) else t["lo"],
                     pa.large_utf8())
        hi = pc.cast(t["hi"].combine_chunks()
                     if isinstance(t["hi"], pa.ChunkedArray) else t["hi"],
                     pa.large_utf8())
        n = len(lo)
        lens = np.minimum(np.asarray(pc.binary_length(lo)),
                          np.asarray(pc.binary_length(hi))).astype(np.int64)
        out = np.zeros(n, dtype=np.int64)
        active = lens > 0
        pos = 0
        while active.any() and pos < int(lens.max()):
            a = pc.utf8_slice_codeunits(lo, pos, pos + 1)
            b = pc.utf8_slice_codeunits(hi, pos, pos + 1)
            eq = np.asarray(pc.equal(a, b)) & active & (pos < lens)
            out = np.where(eq, pos + 1, out)
            active = eq
            pos += 1
        # rows here are HOSTS, not pages — a plain comprehension over the
        # aggregated extremes is in-contract (like the bounded top-k
        # finalizers)
        lo_py = lo.to_pylist()
        res = [s[:int(L)] for s, L in zip(lo_py, out)]
        return pa.table({"host": t["host"],
                         "lcp_len": pa.array(out),
                         "lcp": pa.array(res, type=pa.string())})

    return ext.map_batches(lcp, batch_format="pyarrow")


def tag_census(pages):
    """DOM-heuristic markup census per page: ``<meta >`` tag count, html
    vs extracted-text sizes and the text-to-markup ratio — the signal a
    main-content extractor thresholds to drop chrome-heavy pages before
    parsing (north-star "DOM heuristics" tier).

    Pure vectorized map over zero-copy Arrow batches: one binary→utf8
    cast, one ``count_substring`` kernel, two length kernels, one integer
    permille — no shuffle, html never leaves the stage.  The SQL oracle
    independently REBUILDS the full html string from the base table and
    counts in DuckDB, so the check pins the pages synthesizer and the
    engine kernels against each other byte-for-byte.
    """
    from ..arrowutil import one_chunk

    def per_batch(t: pa.Table) -> pa.Table:
        h = one_chunk(t["html"]).cast(pa.string())
        tx = one_chunk(t["text"])
        hl = pc.utf8_length(h).cast(pa.int64())
        tl = pc.utf8_length(tx).cast(pa.int64())
        ratio = np.asarray(tl) * 1000 // np.asarray(hl)
        return pa.table({
            "url": one_chunk(t["url"]),
            "n_meta": pc.count_substring(h, "<meta ").cast(pa.int64()),
            "html_chars": hl,
            "text_chars": tl,
            "markup_permille": pa.array(ratio, type=pa.int64()),
        })

    return pages.map_batches(per_batch, batch_format="pyarrow")


def crawl_recency_report(pages, fresh_s: int = 6 * 3600,
                         day_s: int = 86400):
    """Crawl-freshness scorecard per host: how many of a host's pages were
    fetched within ``fresh_s`` of the crawl frontier (the corpus-wide max
    ``warc_ts``), within a day, or earlier — the staleness report a
    recrawl scheduler consumes.

    Two passes, both combiner-first: a one-scalar global max (tree
    aggregate, no shuffle of page rows), broadcast into a per-batch
    bucket-count partial, then one tiny groupby(host) merge over ≤
    3·|hosts| partial rows.  Returns (host, n_fresh, n_day, n_old,
    latest_age_s).
    """
    from ray.data.aggregate import Min, Sum

    from ..arrowutil import one_chunk

    def ts_us(t: pa.Table) -> np.ndarray:
        return np.asarray(pc.cast(pc.cast(one_chunk(t["warc_ts"]),
                                          pa.timestamp("us")), pa.int64()))

    max_ts = pages.map_batches(
        lambda t: pa.table({"m": pa.array([int(ts_us(t).max())]
                                          if t.num_rows else [],
                                          type=pa.int64())}),
        batch_format="pyarrow", batch_size=None).max("m")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "f_p": pa.array([], type=pa.int64()),
                             "d_p": pa.array([], type=pa.int64()),
                             "o_p": pa.array([], type=pa.int64()),
                             "age_p": pa.array([], type=pa.int64())})
        age = (max_ts - ts_us(t)) // 1_000_000
        host = pc.replace_substring_regex(
            one_chunk(t["url"]), r"^https://([^/]*)/.*$", r"\1")
        g = pa.table({
            "host": host,
            "f_p": pa.array((age <= fresh_s).astype(np.int64)),
            "d_p": pa.array(((age > fresh_s)
                             & (age <= day_s)).astype(np.int64)),
            "o_p": pa.array((age > day_s).astype(np.int64)),
            "age_p": pa.array(age),
        }).group_by("host").aggregate([("f_p", "sum"), ("d_p", "sum"),
                                       ("o_p", "sum"), ("age_p", "min")])
        return g.rename_columns(["host", "f_p", "d_p", "o_p", "age_p"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "n_fresh": t["n_fresh"].combine_chunks().cast(pa.int64())
            if isinstance(t["n_fresh"], pa.ChunkedArray)
            else t["n_fresh"].cast(pa.int64()),
            "n_day": t["n_day"].combine_chunks().cast(pa.int64())
            if isinstance(t["n_day"], pa.ChunkedArray)
            else t["n_day"].cast(pa.int64()),
            "n_old": t["n_old"].combine_chunks().cast(pa.int64())
            if isinstance(t["n_old"], pa.ChunkedArray)
            else t["n_old"].cast(pa.int64()),
            "latest_age_s": t["latest_age_s"].combine_chunks()
            .cast(pa.int64())
            if isinstance(t["latest_age_s"], pa.ChunkedArray)
            else t["latest_age_s"].cast(pa.int64()),
        })

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Sum("f_p", alias_name="n_fresh"),
                       Sum("d_p", alias_name="n_day"),
                       Sum("o_p", alias_name="n_old"),
                       Min("age_p", alias_name="latest_age_s"))
            .map_batches(finish, batch_format="pyarrow"))


def title_h1_consistency(pages, cfg=None):
    """DOM-extraction quality signal: token-set agreement between a page's
    ``<title>`` and its ``<h1>`` — low agreement flags templated or
    misextracted headlines before a title-based identifier lookup spends
    network budget on them (reference title sources 1–3 feed the google
    methods).

    Row-wise set intersection WITHOUT per-row Python: both columns
    tokenize once, explode to (row, term) pairs, in-batch arrow
    ``group_by`` dedups each side, and one in-batch C++ hash join counts
    the common terms per row — payloads stay in the parse actor, the
    output is five narrow columns, no cluster-wide shuffle.  Returns
    (url, n_title_terms, n_h1_terms, n_common, jaccard_permille).
    """
    from ..config import DEFAULT_CONFIG
    from ..arrowutil import one_chunk
    from .parse import HtmlParse
    from .textstats import _tokens

    cfg = cfg or DEFAULT_CONFIG

    def pairs_of(col, n_rows):
        toks = _tokens(one_chunk(col))
        t = pa.table({"r": pc.list_parent_indices(toks),
                      "term": toks.flatten()})
        d = t.group_by(["r", "term"]).aggregate([])
        cnt = d.group_by("r").aggregate([([], "count_all")])
        sizes = np.zeros(n_rows, dtype=np.int64)
        sizes[np.asarray(cnt["r"])] = np.asarray(
            cnt["count_all"], dtype=np.int64)
        return d, sizes

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        dt, n_title = pairs_of(t["title"], n)
        dh, n_h1 = pairs_of(t["h1"], n)
        j = dt.join(dh, keys=["r", "term"], join_type="inner")
        common = np.zeros(n, dtype=np.int64)
        if j.num_rows:
            cc = j.group_by("r").aggregate([([], "count_all")])
            common[np.asarray(cc["r"])] = np.asarray(
                cc["count_all"], dtype=np.int64)
        union = n_title + n_h1 - common
        jac = np.where(union > 0, 1000 * common // np.maximum(union, 1), 0)
        return pa.table({
            "url": one_chunk(t["url"]),
            "n_title_terms": pa.array(n_title),
            "n_h1_terms": pa.array(n_h1),
            "n_common": pa.array(common),
            "jaccard_permille": pa.array(jac.astype(np.int64)),
        })

    parsed = pages.map_batches(
        HtmlParse, batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        concurrency=cfg.parse_concurrency or (1, 8), num_cpus=1)
    return parsed.map_batches(kernel, batch_format="pyarrow")


def strip_tags_baseline(pages):
    """Baseline main-content extraction (the strip-all-tags fallback every
    boilerplate-removal evaluation compares against, à la jusText /
    trafilatura baselines) and its per-page delta vs the DOM-aware
    extractor: the tag-stripped html retains chrome (title, nav, h1,
    footer) that the ``text`` column — the engine's DOM extraction,
    byte-parity-proven elsewhere — excludes, so ``chrome_permille``
    measures template weight per page.

    One RE2 ``replace_substring_regex`` over the html column (entities
    stay escaped on BOTH sides — the metric is raw stripped bytes, so
    the SQL oracle reproduces it exactly); no shuffle; payloads never
    leave the stage.  Returns (url, n_stripped_chars, n_main_chars,
    chrome_permille).
    """
    from ..arrowutil import one_chunk

    def per_batch(t: pa.Table) -> pa.Table:
        h = one_chunk(t["html"]).cast(pa.string())
        stripped = pc.replace_substring_regex(h, "<[^>]*>", "")
        sl = np.asarray(pc.utf8_length(stripped).cast(pa.int64()))
        # main text as the DOM extractor will emit it — but ESCAPED, to
        # stay comparable with the raw stripped bytes
        ml = np.asarray(pc.utf8_length(pc.replace_substring(
            pc.replace_substring(pc.replace_substring(
                one_chunk(t["text"]), "&", "&amp;"), "<", "&lt;"),
            ">", "&gt;")).cast(pa.int64()))
        chrome = sl - ml
        return pa.table({
            "url": one_chunk(t["url"]),
            "n_stripped_chars": pa.array(sl),
            "n_main_chars": pa.array(ml),
            "chrome_permille": pa.array(1000 * chrome // sl),
        })

    return pages.map_batches(per_batch, batch_format="pyarrow")


def title_template_diversity(pages):
    """Template-mining signal per host: how many DISTINCT title templates
    (title with digit runs collapsed to ``#``) a host serves, vs its page
    count — a host whose thousands of pages share one template is a
    calendar/listing trap; one with rich templates is content.

    One vectorized digit-collapse regex + a per-batch (host, template)
    dedup combiner, one ``groupby(host, template)`` exchange carrying
    template strings once, then a ≤-templates-per-host count.  Returns
    (host, n_pages, n_templates, pages_per_template).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            one_chunk(t["url"]), r"^https://([^/]*)/.*$", r"\1")
        # title lives in the html <title>; collapse digit runs.
        # extract_regex (not a whole-string replace) so multi-line HTML
        # and pages with NO <title> behave: non-matching rows map to an
        # explicit empty template instead of the whole document.
        h = one_chunk(t["html"]).cast(pa.string())
        title = pc.coalesce(
            pc.struct_field(
                pc.extract_regex(h, r"<title>(?P<t>[^<]*)</title>"), "t"),
            "")
        tmpl = pc.replace_substring_regex(title, r"[0-9]+", "#")
        g = pa.table({"host": host, "template": tmpl,
                      "n_p": pa.array(np.ones(t.num_rows,
                                              dtype=np.int64))}) \
            .group_by(["host", "template"]).aggregate([("n_p", "sum")])
        return g.rename_columns(["host", "template", "n_p"])

    per_tmpl = (pages.map_batches(partial, batch_format="pyarrow")
                .groupby(["host", "template"])
                .aggregate(Sum("n_p", alias_name="n")))

    def fold_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"host": one_chunk(t["host"]),
                      "np_p": one_chunk(t["n"]).cast(pa.int64()),
                      "nt_p": pa.array(np.ones(t.num_rows,
                                               dtype=np.int64))}) \
            .group_by("host").aggregate([("np_p", "sum"), ("nt_p", "sum")])
        return g.rename_columns(["host", "np_p", "nt_p"])

    def finish(t: pa.Table) -> pa.Table:
        np_ = np.asarray(one_chunk(t["n_pages"])).astype(np.int64)
        nt = np.asarray(one_chunk(t["n_templates"])).astype(np.int64)
        return pa.table({
            "host": one_chunk(t["host"]),
            "n_pages": pa.array(np_),
            "n_templates": pa.array(nt),
            "pages_per_template": pa.array(np_ // nt),
        })

    from ray.data.aggregate import Sum as _Sum
    return (per_tmpl.map_batches(fold_partial, batch_format="pyarrow")
            .groupby("host")
            .aggregate(_Sum("np_p", alias_name="n_pages"),
                       _Sum("nt_p", alias_name="n_templates"))
            .map_batches(finish, batch_format="pyarrow"))


def url_tree_rollup(pages, max_depth: int = 3):
    """Crawl-frontier shape census: page counts per (host, URL path
    prefix) for every prefix depth ≤ ``max_depth`` — the hierarchical
    rollup a crawl scheduler reads to see which directory subtrees
    dominate a host (one ``/calendar/`` subtree owning 95% of a host's
    pages is a trap signal).

    Vectorized prefix explosion per batch (split once, join back
    per-depth with Arrow kernels), then a per-batch (host, depth,
    prefix) combiner so the single ``groupby`` exchange carries
    combiner rows, never pages.  Returns (host, depth, prefix,
    n_pages).
    """
    from ray.data.aggregate import Sum

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        url = one_chunk(t["url"])
        rest = pc.replace_substring_regex(url, r"^[a-z][a-z0-9+.-]*://",
                                          "")
        host = pc.replace_substring_regex(rest, r"/.*$", "")
        path = pc.replace_substring_regex(rest, r"^[^/]*", "")
        # drop query/fragment, then split path segments
        path = pc.replace_substring_regex(path, r"[?#].*$", "")
        segs = pc.split_pattern(path, "/")       # ['', seg1, seg2, ...]
        n_segs = np.asarray(pc.list_value_length(segs).cast(pa.int64()))
        hosts, depths, prefixes = [], [], []
        hv = host.to_numpy(zero_copy_only=False)
        # depth d prefix exists when the path has > d segments after the
        # leading '' (a page at /a/b has prefixes /a at d1, /a/b at d2);
        # prefix strings build vectorized: list_slice + binary_join
        for d in range(1, max_depth + 1):
            has = n_segs > d
            if not has.any():
                break
            idx = np.nonzero(has)[0]
            sub = segs.take(pa.array(idx))
            joined = pc.binary_join(pc.list_slice(sub, 1, 1 + d), "/")
            pre = pc.binary_join_element_wise("/", joined, "")
            hosts.append(hv[idx])
            depths.append(np.full(len(idx), d, dtype=np.int64))
            prefixes.append(pre.to_numpy(zero_copy_only=False))
        if not hosts:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "depth": pa.array([], type=pa.int64()),
                             "prefix": pa.array([], type=pa.string()),
                             "n_p": pa.array([], type=pa.int64())})
        import pandas as pd
        g = pd.DataFrame({
            "host": np.concatenate(hosts),
            "depth": np.concatenate(depths),
            "prefix": np.concatenate(prefixes),
        }).value_counts().reset_index(name="n_p")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby(["host", "depth", "prefix"])
            .aggregate(Sum("n_p", alias_name="n_pages")))
