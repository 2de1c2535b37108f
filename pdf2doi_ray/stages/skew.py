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
