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

    def contains_many(self, items) -> np.ndarray:
        """Batch membership: bool mask aligned with ``items``.  Positions
        for the whole batch come from one :func:`_positions_for` call (the
        per-item blake2b is a C call); the bit test is a single gather —
        no per-item Python bit arithmetic (round-3 vectorization)."""
        n = len(items)
        if n == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions_for(items, self.n_bits, self.n_hashes) \
            .reshape(n, self.n_hashes)
        hit = (self.bits[(pos >> np.uint64(3)).astype(np.int64)]
               & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
        return hit.all(axis=1)

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


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a vectorized, deterministic uint64 mixer."""
    x = x + _GOLD
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _int_positions(vals: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) bit positions for an int64 key array — vectorized splitmix64
    double hashing.  Module-level so distributed builders capture only the
    (n_bits, n_hashes) geometry, never a bitmap."""
    v = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    h1 = _mix64(v)
    h2 = _mix64(v ^ _GOLD) | np.uint64(1)
    ks = np.arange(n_hashes, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(n_bits)


class IntBloomFilter:
    """Bloom filter over int64 keys with FULLY vectorized hashing: the
    double-hash pair comes from two splitmix64 mixes, so ``add_many`` and
    ``contains_many`` run as pure numpy over whole batches — no per-key
    Python, unlike the string filter whose blake2b is per-item.

    Used as the scale path for candidate-id membership in
    ``minhash_near_dups``: false positives only admit extra shingle rows
    that the pair-groupby drops, so ANY fpp gives byte-identical output.
    """

    def __init__(self, n_items: int, fpp: float = 0.01) -> None:
        n_items = max(1, n_items)
        m = int(-n_items * np.log(fpp) / (np.log(2) ** 2)) + 1
        self.n_bits = m
        self.n_hashes = max(1, int(round(m / n_items * np.log(2))))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _positions(self, vals: np.ndarray) -> np.ndarray:
        """(n, k) bit positions for an int64/uint64 key array."""
        return _int_positions(vals, self.n_bits, self.n_hashes)

    def add_many(self, vals: np.ndarray) -> None:
        pos = self._positions(vals).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains_many(self, vals: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool mask aligned with ``vals``."""
        if len(vals) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(vals)
        hit = (self.bits[(pos >> np.uint64(3)).astype(np.int64)]
               & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
        return hit.all(axis=1)

    def set_positions(self, pos: np.ndarray) -> None:
        pos = pos.astype(np.uint64, copy=False)
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))


def build_int_bloom_distributed(ds, column: str, n_items: int,
                                fpp: float = 0.01) -> IntBloomFilter:
    """Distributed :class:`IntBloomFilter` build over an int64 column: each
    batch hashes its own keys (vectorized) and ships only deduplicated bit
    POSITIONS; the driver ORs position blocks into the one bitmap.  The
    int64 analog of :func:`build_bloom_distributed` (same P-sharded escape
    hatch applies when position streams outgrow one driver)."""
    bf = IntBloomFilter(n_items, fpp)
    n_bits, n_hashes = bf.n_bits, bf.n_hashes

    def partial(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks() if isinstance(t[column], pa.ChunkedArray) \
            else t[column]
        pos = np.unique(
            _int_positions(np.asarray(col), n_bits, n_hashes).ravel())
        return pa.table({"pos": pa.array([pos.astype(np.int64).tobytes()],
                                         type=pa.binary())})

    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bf.set_positions(np.frombuffer(row["pos"], dtype=np.int64)
                         .astype(np.uint64))
    return bf


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

    Both sides gain a ``bucket = hash(url) % B`` column (pandas' C
    string-hash kernel — round 3 replaced a per-url Python crc32 loop); the
    composite groupby co-locates matching urls; the per-bucket difference is
    one vectorized ``is_in`` + Arrow group_by over that bucket only.  Only
    url strings shuffle — never payloads.
    """
    import pyarrow.compute as pc

    from ..stages.stitch import hash_shard_str

    def add_bucket(side: int):
        def fn(t: pa.Table) -> pa.Table:
            urls = t["url"].combine_chunks() \
                if isinstance(t["url"], pa.ChunkedArray) else t["url"]
            buckets = hash_shard_str(urls) % n_buckets
            return pa.table({
                "url": urls,
                "bucket": pa.array(buckets, type=pa.int64()),
                "side": pa.array(np.full(len(urls), side, dtype=np.int64)),
            })
        return fn

    both = left.map_batches(add_bucket(0), batch_format="pyarrow").union(
        right.map_batches(add_bucket(1), batch_format="pyarrow"))

    def diff(g: pa.Table) -> pa.Table:
        side = g["side"].combine_chunks() \
            if isinstance(g["side"], pa.ChunkedArray) else g["side"]
        right_urls = g.filter(pc.equal(side, 1))["url"]
        lefts = g.filter(pc.equal(side, 0))
        keep = lefts.filter(
            pc.invert(pc.is_in(lefts["url"],
                               value_set=right_urls.combine_chunks())))
        return keep.select(["url"]).group_by("url").aggregate([])

    return both.groupby("bucket").map_groups(diff, batch_format="pyarrow")


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
            mask = bf.contains_many(t["url"].to_pylist())
            return t.filter(pa.array(mask if flag else ~mask))
        return fn

    negatives = pages.map_batches(split(False), batch_format="pyarrow")

    # exact recovery of false positives among the bloom-positive slice
    positives_urls = pages.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow") \
        .map_batches(split(True), batch_format="pyarrow")
    fp_urls = pa.array(
        sorted({r["url"] for r in
                bucketed_anti_join_urls(positives_urls, found_urls_ds)
                .take_all()}), type=pa.string())
    fp_ref = ray.put(fp_urls)

    def only_fp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        urls = t["url"].combine_chunks() \
            if isinstance(t["url"], pa.ChunkedArray) else t["url"]
        return t.filter(pc.is_in(urls, value_set=ray.get(fp_ref)))

    recovered = pages.map_batches(only_fp, batch_format="pyarrow")

    fresh = identify_fn(negatives.union(recovered))
    return fresh.union(previous_found_rows(prev_dir))
