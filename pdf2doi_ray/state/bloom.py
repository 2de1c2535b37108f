"""Bloom-filter resume skip + distributed bucketed anti-join.

At fleet scale the resolved-url set no longer fits a broadcast Python set
(10^8 urls ≈ 10 GB of strings), so the resume anti-join becomes:

1. build a Bloom filter of resolved urls (bits broadcast once: ~1.2 GB at
   10^9 urls / 1% fpp — object-store friendly, shared per node);
2. bloom-NEGATIVE pages are definitely unresolved → processed directly
   (no false negatives by construction);
3. bloom-POSITIVE pages are *mostly* resolved and skipped — but a false
   positive here would silently LOSE an unresolved page, so the positives
   (a small slice: resolved + fpp of the rest) go through an exact
   distributed anti-join against the resolved urls: hash-bucket both sides
   on ``crc32(url) % B``, set-difference per bucket.  Survivors are the
   false positives → processed after all.

The exactness argument: every page is either processed (bloom-negative or
recovered false positive) or provably resolved (bloom-positive and present
in the prev output, whose row is unioned back in).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa


class BloomFilter:
    """Plain double-hashing Bloom filter over strings (numpy bit array).

    Deterministic (blake2b-derived hash pair), picklable, and cheap to ship
    via ``ray.put`` — workers share the node's plasma copy.
    """

    def __init__(self, n_items: int, fpp: float = 0.01) -> None:
        n_items = max(1, n_items)
        m = int(-n_items * np.log(fpp) / (np.log(2) ** 2)) + 1
        self.n_bits = m
        self.n_hashes = max(1, int(round(m / n_items * np.log(2))))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    @staticmethod
    def _hash_pair(item: str) -> tuple[int, int]:
        d = hashlib.blake2b(item.encode("utf-8"), digest_size=16).digest()
        return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big"))

    def _positions(self, item: str) -> np.ndarray:
        h1, h2 = self._hash_pair(item)
        ks = np.arange(self.n_hashes, dtype=np.uint64)
        return (np.uint64(h1) + ks * np.uint64(h2)) % np.uint64(self.n_bits)

    def add(self, item: str) -> None:
        pos = self._positions(item)
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def __contains__(self, item: str) -> bool:
        pos = self._positions(item)
        return bool(np.all(
            self.bits[pos >> np.uint64(3)]
            & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))))

    @classmethod
    def build(cls, items, n_items: int | None = None,
              fpp: float = 0.01) -> "BloomFilter":
        items = list(items)
        bf = cls(n_items or len(items), fpp)
        for it in items:
            bf.add(it)
        return bf

    def set_positions(self, pos: np.ndarray) -> None:
        """OR a batch of bit positions (uint64) into the bitmap."""
        pos = pos.astype(np.uint64, copy=False)
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))


def _positions_for(items, n_bits: int, n_hashes: int) -> np.ndarray:
    """Bit positions for many items under the (n_bits, n_hashes) geometry —
    identical arithmetic to :meth:`BloomFilter._positions`."""
    ks = np.arange(n_hashes, dtype=np.uint64)
    nb = np.uint64(n_bits)
    out = np.empty(len(items) * n_hashes, dtype=np.uint64)
    for i, it in enumerate(items):
        h1, h2 = BloomFilter._hash_pair(it)
        out[i * n_hashes:(i + 1) * n_hashes] = \
            (np.uint64(h1) + ks * np.uint64(h2)) % nb
    return out


def build_bloom_distributed(ds, column: str = "url",
                            fpp: float = 0.01,
                            n_items: int | None = None) -> BloomFilter:
    """Build a Bloom filter over ``ds[column]`` WITHOUT materializing the
    strings on the driver: each batch hashes its own values inside
    ``map_batches`` and ships only deduplicated bit POSITIONS (8 bytes per
    hash — comparable to the strings themselves and independent of bitmap
    size); the driver ORs position blocks into the single bitmap.

    Fleet-scale note: when even position streams are too much for one
    driver, shard the filter by ``hash(url) % P`` into P independent blooms
    built by the reducers that own each shard (same per-batch kernel,
    plus one small groupby) and broadcast the list of bitmaps; the operator
    shape here is the P=1 case.
    """
    if n_items is None:
        ds = ds.materialize()            # url column only — distributed,
        n_items = ds.count()             # never on the driver
    bf = BloomFilter(n_items, fpp)
    n_bits, n_hashes = bf.n_bits, bf.n_hashes

    def partial(t: pa.Table) -> pa.Table:
        vals = t[column].to_pylist()
        pos = np.unique(_positions_for(vals, n_bits, n_hashes))
        return pa.table({"pos": pa.array([pos.astype(np.int64).tobytes()],
                                         type=pa.binary())})

    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bf.set_positions(np.frombuffer(row["pos"], dtype=np.int64)
                         .astype(np.uint64))
    return bf


def bucketed_anti_join_urls(left, right, n_buckets: int = 64):
    """Distributed exact anti-join on a ``url`` column: rows of ``left``
    whose url does NOT appear in ``right``.

    Both sides gain a ``bucket = crc32(url) % B`` column in a vectorized-ish
    ``map_batches``; the composite groupby co-locates matching urls; the
    per-bucket set difference is plain Python over that bucket only.  Only
    url strings shuffle — never payloads.
    """
    import pandas as pd

    def add_bucket(side: int):
        def fn(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            buckets = [zlib.crc32(u.encode()) % n_buckets for u in urls]
            return pa.table({
                "url": t["url"],
                "bucket": pa.array(buckets, type=pa.int64()),
                "side": pa.array([side] * len(urls), type=pa.int64()),
            })
        return fn

    both = left.map_batches(add_bucket(0), batch_format="pyarrow").union(
        right.map_batches(add_bucket(1), batch_format="pyarrow"))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        right_urls = set(g.loc[g["side"] == 1, "url"])
        keep = g.loc[(g["side"] == 0) & ~g["url"].isin(right_urls), ["url"]]
        return keep.drop_duplicates()

    return both.groupby("bucket").map_groups(diff, batch_format="pandas")


def with_previous_results_bloom(pages, prev_dir: str, identify_fn,
                                fpp: float = 0.01):
    """Bloom-filter resume (the scale path of
    :func:`pdf2doi_ray.state.checkpoint.with_previous_results`).

    Byte-identical final result to a from-scratch run: bloom-negatives and
    recovered false positives are processed; true resolved rows come from
    the previous output.
    """
    import ray
    import ray.data

    from .checkpoint import previous_found_rows

    found_urls_ds = previous_found_rows(
        prev_dir, columns=["url", "identifier"]).map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow").materialize()
    # distributed build: workers hash, the driver only ORs bitmaps —
    # url strings never reach the driver
    bf_ref = ray.put(build_bloom_distributed(found_urls_ds, "url", fpp=fpp))

    def split(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            bf = ray.get(bf_ref)
            mask = np.array([(u in bf) == flag
                             for u in t["url"].to_pylist()], dtype=bool)
            return t.filter(pa.array(mask))
        return fn

    negatives = pages.map_batches(split(False), batch_format="pyarrow")

    # exact recovery of false positives among the bloom-positive slice
    positives_urls = pages.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow") \
        .map_batches(split(True), batch_format="pyarrow")
    fp_urls = {r["url"] for r in
               bucketed_anti_join_urls(positives_urls, found_urls_ds)
               .take_all()}
    fp_ref = ray.put(fp_urls)

    def only_fp(t: pa.Table) -> pa.Table:
        wanted = ray.get(fp_ref)
        mask = np.array([u in wanted for u in t["url"].to_pylist()],
                        dtype=bool)
        return t.filter(pa.array(mask))

    recovered = pages.map_batches(only_fp, batch_format="pyarrow")

    fresh = identify_fn(negatives.union(recovered))
    return fresh.union(previous_found_rows(prev_dir))
