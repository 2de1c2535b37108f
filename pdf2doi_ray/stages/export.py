"""Deterministic training-data export: hash-shard assignment + per-shard
partitioned Parquet.

The last mile of a curation pipeline is a REPRODUCIBLE shard layout: the
same corpus must land in the same shard files on every run (so a failed
export resumes by skipping finished shards, and a training job can address
shard i without a manifest).  ``ray.data.random_shuffle`` is neither
deterministic across runs nor cheap (full all-to-all over the payload);
hash sharding gets the same statistical de-clustering — any key locality is
destroyed by the hash — with ONE exchange keyed by a 64-bit md5 of the
doc id, and md5 keeps the assignment recomputable by any engine (the
driver's DuckDB oracle included).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa


def _shard_hash_vec(doc_ids: np.ndarray) -> np.ndarray:
    """63-bit md5 hash of the DECIMAL doc-id string (factorize-free: ids
    are already unique, one md5 per row is the floor).  Matches DuckDB's
    ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT >> 1``
    exactly."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8],
                        "big") >> 1 for d in doc_ids),
        dtype=np.int64, count=len(doc_ids))


def shard_assignment(docs, n_shards: int = 64):
    """(doc_id, …) → (doc_id, shard, shard_hash): the pure assignment
    table.  ``shard = md5_63(doc_id) % n_shards``; ``shard_hash`` is kept
    so consumers can order WITHIN a shard deterministically (the
    hash-order is the reproducible stand-in for a random permutation)."""
    from ..arrowutil import one_chunk

    def assign(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        h = _shard_hash_vec(ids)
        return pa.table({
            "doc_id": pa.array(ids),
            "shard": pa.array(h % n_shards),
            "shard_hash": pa.array(h),
        })

    return docs.map_batches(assign, batch_format="pyarrow")


def seeded_shuffle(docs, seed: str = "s42"):
    """Deterministic seeded GLOBAL permutation: assign every document its
    position in the md5-order ``md5(seed ':' doc_id)`` — the reproducible
    corpus shuffle that precedes sequence packing (same permutation on
    every run and every engine; change ``seed`` for a fresh epoch order).
    Returns (doc_id, position), position ∈ [0, N) dense.

    ``ray.data.random_shuffle`` is non-deterministic and moves payloads;
    this op moves only 16-byte (doc_id, skey) rows:

    1. per-row 63-bit key ``md5_63(seed ':' doc_id)`` (one md5 per DOC —
       the shingle family pays one per token-gram, so this is far off the
       hot path), SQL-exact as
       ``('0x' || substr(md5(seed || ':' || doc_id), 1, 16))::UBIGINT >> 1``;
    2. ``sort(skey, doc_id)`` over the narrow key rows;
    3. each sorted block emits its rows with LOCAL ranks plus ONE carry
       row (block-min key, row count); the driver cumsums the ≤ #blocks
       carries into per-block base offsets and broadcasts the tiny dict —
       the pack_sequences block-carry pattern (`corpus.py:1869`), one row
       per BLOCK at the driver, never per doc.

    The doc_id tie-break makes the order total even under an md5 collision;
    carry bases additionally key on the block-min (skey, doc_id) PAIR, so
    a boundary-straddling duplicate key cannot alias two blocks' bases.
    """
    import ray

    from ..arrowutil import one_chunk

    def key_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        ks = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{seed}:{int(d)}".encode()).digest()[:8],
                "big") >> 1 for d in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({"doc_id": pa.array(ids), "skey": pa.array(ks)})

    def block_local(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        n = len(ids)
        if not n:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "bkey": z, "bdoc": z,
                             "local": z,
                             "is_carry": pa.array([], type=pa.bool_())})
        ks = np.asarray(one_chunk(t["skey"]), dtype=np.int64)
        bkey, bdoc = int(ks[0]), int(ids[0])   # block min under the sort
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, [bdoc]])),
            "bkey": pa.array(np.full(n + 1, bkey, dtype=np.int64)),
            "bdoc": pa.array(np.full(n + 1, bdoc, dtype=np.int64)),
            "local": pa.array(np.concatenate(
                [np.arange(n, dtype=np.int64), [n]])),
            "is_carry": pa.array([False] * n + [True]),
        })

    tagged = (docs.select_columns(["doc_id"])
              .map_batches(key_rows, batch_format="pyarrow")
              .sort(["skey", "doc_id"])
              .map_batches(block_local, batch_format="pyarrow",
                           batch_size=None)).materialize()
    carries = sorted(
        ((r["bkey"], r["bdoc"], r["local"])
         for r in tagged.map_batches(
             lambda t: t.filter(one_chunk(t["is_carry"])),
             batch_format="pyarrow").take_all()))
    bases, acc = {}, 0
    for bk, bd, cnt in carries:
        bases[(bk, bd)] = acc
        acc += cnt
    bases_ref = ray.put(bases)

    def add_base(t: pa.Table) -> pa.Table:
        b = ray.get(bases_ref)
        import pyarrow.compute as pc
        sub = t.filter(pc.invert(one_chunk(t["is_carry"])))
        if sub.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"doc_id": z, "position": z})
        bk = np.asarray(one_chunk(sub["bkey"]), dtype=np.int64)
        bd = np.asarray(one_chunk(sub["bdoc"]), dtype=np.int64)
        local = np.asarray(one_chunk(sub["local"]), dtype=np.int64)
        # one block per batch by construction, but stay general
        pairs = np.stack([bk, bd], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        base = np.array([b[(int(x), int(y))] for x, y in uniq],
                        dtype=np.int64)[inv]
        return pa.table({"doc_id": sub["doc_id"],
                         "position": pa.array(local + base)})

    return tagged.map_batches(add_base, batch_format="pyarrow")


def export_training_shards(docs, out_dir: str, n_shards: int = 64,
                           columns=("doc_id", "text"), resume: bool = False):
    """Write ``docs`` as hive-partitioned ``out_dir/shard=N/*.parquet`` —
    one directory per hash shard (never one giant file).

    Two modes, same deterministic layout:

    * ``resume=False`` (default, the scale path): ONE streaming
      ``write_parquet(partition_cols=["shard"])`` pass — nothing
      materializes, blocks flow straight from the tag stage to the
      per-partition writers.  Row order within a shard is block-arrival
      order; the ``shard_hash`` column is kept in the files so any reader
      recovers the canonical order with a per-shard (small) sort.
    * ``resume=True``: per-shard loop that skips every directory already
      stamped ``_SHARD_DONE`` — a crashed export re-runs only the missing
      shards (the assignment is deterministic, so a finished shard is
      finished forever).  Costs one materialize of the tagged stream;
      meant for re-entry, not the first pass.

    Returns the list of shard ids written this run.
    """
    from ..arrowutil import one_chunk

    cols = list(columns)

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        h = _shard_hash_vec(ids)
        return t.select(cols) \
            .append_column("shard", pa.array(h % n_shards)) \
            .append_column("shard_hash", pa.array(h))

    tagged = docs.map_batches(tag, batch_format="pyarrow")
    if not resume:
        tagged.write_parquet(out_dir, partition_cols=["shard"])
        return list(range(n_shards))

    tagged = tagged.materialize()
    written = []
    for s in range(n_shards):
        sdir = os.path.join(out_dir, f"shard={s}")
        if os.path.exists(os.path.join(sdir, "_SHARD_DONE")):
            continue
        part = tagged.filter(expr=f"shard == {s}").sort("shard_hash") \
            .drop_columns(["shard"])         # the hive dir carries shard=
        os.makedirs(sdir, exist_ok=True)
        if part.count() > 0:
            part.write_parquet(sdir)
        with open(os.path.join(sdir, "_SHARD_DONE"), "w") as f:
            f.write("ok")
        written.append(s)
    return written


def _morton_spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 so bit k lands at bit 2k
    (the classic Morton bit-twiddle, vectorized)."""
    v = v & np.int64(0xFFFF)
    v = (v | (v << 8)) & np.int64(0x00FF00FF)
    v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.int64(0x33333333)
    v = (v | (v << 1)) & np.int64(0x55555555)
    return v


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton interleave of two non-negative 16-bit values —
    ``x`` on odd bits, ``y`` on even."""
    if (len(x) and x.min() < 0) or (len(y) and y.min() < 0):
        raise ValueError("zorder_key: inputs must be non-negative "
                         "(numpy and SQL disagree on negative bit ops)")
    return (_morton_spread16(x) << 1) | _morton_spread16(y)


def zorder_layout(events, x_col: str = "user_id", y_col: str = "value",
                  x_mod: int = 65536, y_mod: int = 65536):
    """Z-order (Morton-curve) data layout: interleave the bits of two
    dimensions into one sort key and range-sort on it, so rows close in
    BOTH dimensions land in the same output blocks — the multi-column
    clustering trick behind Delta/Iceberg OPTIMIZE ZORDER, here so a
    downstream reader filtering on either column prunes most blocks
    (min/max zone maps stay tight on both dimensions at once).

    One exchange (the range sort on the 32-bit key); the key itself is a
    pure vectorized map.  ``y_col`` floats enter through the repo's milli
    convention; both dimensions fold modulo 2^16 (coarse clustering only
    needs high bits — the fold is part of the contract and the SQL
    oracle).  Returns (event_id, x16, y16, zkey) sorted by (zkey,
    event_id).
    """
    import pyarrow.compute as pc

    from .windowfns import _milli

    def key_batch(t: pa.Table) -> pa.Table:
        from ..arrowutil import one_chunk

        x = np.asarray(one_chunk(t[x_col])).astype(np.int64)
        y = (_milli(one_chunk(t[y_col]))
             if pa.types.is_floating(t.schema.field(y_col).type)
             else np.asarray(one_chunk(t[y_col])).astype(np.int64))
        if (len(x) and x.min() < 0) or (len(y) and y.min() < 0):
            # numpy % would silently wrap negatives positive while SQL %
            # keeps the sign — refuse rather than diverge
            raise ValueError("zorder_layout: dimensions must be "
                             "non-negative before the 2^16 fold")
        x = x % np.int64(x_mod)
        y = y % np.int64(y_mod)
        return pa.table({
            "event_id": t["event_id"],
            "x16": pa.array(x),
            "y16": pa.array(y),
            "zkey": pa.array(zorder_key(x, y)),
        })

    return events.map_batches(key_batch, batch_format="pyarrow") \
        .sort(["zkey", "event_id"])


def stratified_kfold(docs, k: int = 5):
    """Deterministic stratified k-fold assignment: within each language
    stratum, docs order by their 63-bit md5 hash (the repo's shard-hash
    convention) and take fold = (rank − 1) mod k — every fold gets an
    equal-±1 share of EVERY stratum, reproducible from doc_id alone
    (the eval-split builder).  Returns (doc_id, lang, fold).

    Rides the shared per-group window engine
    (:func:`..stages.windowfns.row_number_user`): langs encode to int
    codes (tiny broadcast), the hash plays the order key, and the
    engine's sorted-block + stitch plan delivers the per-stratum rank
    distributed; fold is one vectorized mod.
    """
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk
    from .corpus import md5_u64
    from .windowfns import row_number_user

    langs = sorted(set(
        docs.groupby("lang").count().to_pandas()["lang"]))
    lcode = np.array(langs, dtype=object).astype(str)

    def prep(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        hv = (md5_u64(np.char.mod("%d", ids)) >> np.uint64(1)) \
            .astype(np.int64)
        lg = np.asarray(one_chunk(t["lang"]), dtype=str)
        code = np.searchsorted(lcode, lg).astype(np.int64)
        return pa.table({
            "event_id": pa.array(ids),
            "user_id": pa.array(code),
            "ts": pa.array(hv),
            "value": pa.array(np.zeros(len(ids), dtype=np.float64))})

    rn = row_number_user(docs.map_batches(prep, batch_format="pyarrow"))

    def decode(t: pa.Table) -> pa.Table:
        code = np.asarray(one_chunk(t["user_id"])).astype(np.int64)
        r = np.asarray(one_chunk(t["rn"])).astype(np.int64)
        return pa.table({
            "doc_id": t["event_id"],
            "lang": pa.array(lcode[code].astype(object),
                             type=pa.string()),
            "fold": pa.array((r - 1) % k)})

    return rn.map_batches(decode, batch_format="pyarrow")


def partitioned_write_prune_read(docs, root: str, lang: str = "de"):
    """Hive-partitioned sink + pruned source, round-tripped: write the
    docs partitioned by ``lang`` (one directory per language — the
    resumable layout contract: a re-run skips finished partitions), then
    read back ONLY the requested partition directory with a column
    projection — the read never touches the other partitions' files
    (partition pruning by path, the cheapest predicate there is).
    Returns the partition's rows (doc_id, n_chars) for oracle compare.
    """
    import os

    import pyarrow.compute as pc
    import ray.data

    from ..arrowutil import one_chunk

    def tag(t: pa.Table) -> pa.Table:
        return t

    # one write per partition value, driver-discovered from a tiny
    # distinct pass (|langs| by contract); each write streams its
    # filtered view — rows of one lang land in exactly one directory
    langs = sorted(set(
        docs.groupby("lang").count().to_pandas()["lang"]))
    for lg in langs:
        sub = docs.map_batches(
            lambda t, lg=lg: t.filter(pc.equal(t["lang"], lg)),
            batch_format="pyarrow")
        sub.write_parquet(os.path.join(root, f"lang={lg}"))

    part = ray.data.read_parquet(os.path.join(root, f"lang={lang}"),
                                 columns=["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(one_chunk(t["text"])),
                               pa.int64())})

    return part.map_batches(project, batch_format="pyarrow")


def hashed_features(docs, n_features: int = 1024):
    """The hashing trick: every token maps to ``md5(token) % D`` and
    each document emits its sparse (doc_id, feature_idx, n) counts —
    the vocabulary-free vectorizer feeding linear quality models at any
    scale (no vocabulary shuffle, no driver state).  Pure map with a
    per-batch combiner; hashing reuses the repo's 63-bit md5 kernel so
    the SQL oracle recomputes it verbatim.
    """
    from ..arrowutil import one_chunk
    from .corpus import _tokens_nonempty, md5_u64

    def partial(t: pa.Table) -> pa.Table:
        flat, row_idx = _tokens_nonempty(t)
        ids = np.asarray(one_chunk(t["doc_id"])).astype(np.int64)
        toks = np.asarray(flat, dtype=object).astype(str)
        hv = (md5_u64(toks) >> np.uint64(1)).astype(np.int64)
        feat = hv % n_features
        g = pa.table({"doc_id": pa.array(ids[row_idx]),
                      "feature_idx": pa.array(feat)}) \
            .group_by(["doc_id", "feature_idx"]).aggregate(
                [([], "count_all")])
        return g.select(["doc_id", "feature_idx", "count_all"]) \
            .rename_columns(["doc_id", "feature_idx", "n"])

    from ray.data.aggregate import Sum

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["doc_id", "feature_idx"])
            .aggregate(Sum("n", alias_name="n")))


def zonemap_prune_scan(events, root: str, lo_milli: int, hi_milli: int,
                       return_stats: bool = False):
    """Zone-map-pruned range scan — the Delta/Iceberg data-skipping
    mechanism end to end: the milli-projected events range-sort on the
    value and land as parquet (the sort makes every file's [min, max]
    tight and disjoint), then the scan consults ONLY the parquet footer
    column statistics to drop whole files before any row is read, and a
    vectorized residual filter finishes inside the kept files.

    The footer stats are the real zone maps parquet always writes — no
    side table to maintain, and a selective predicate reads
    O(matching files), not O(dataset).  Returns the matching
    (event_id, vm) rows; with ``return_stats`` also
    (n_files, n_kept) so callers/tests can audit the skipping.
    """
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from .windowfns import _milli
    from ..arrowutil import one_chunk

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"],
                         "vm": pa.array(_milli(one_chunk(t["value"])))})

    events.map_batches(prep, batch_format="pyarrow") \
        .sort("vm").write_parquet(root)

    files = sorted(glob.glob(os.path.join(root, "*.parquet")))
    keep = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        vm_idx = md.schema.names.index("vm")
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(vm_idx).statistics
            if st is None or not st.has_min_max:
                fmin, fmax = None, None
                break  # stats missing → cannot skip this file
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmin <= hi_milli and fmax >= lo_milli):
            keep.append(f)

    if keep:
        def residual(t: pa.Table) -> pa.Table:
            vm = one_chunk(t["vm"])
            return t.filter(pc.and_(pc.greater_equal(vm, lo_milli),
                                    pc.less_equal(vm, hi_milli)))
        out = ray.data.read_parquet(keep).map_batches(
            residual, batch_format="pyarrow")
    else:
        out = ray.data.from_arrow(pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "vm": pa.array([], type=pa.int64())}))
    return (out, len(files), len(keep)) if return_stats else out


def consistent_hash_moves(docs, n_workers: int = 8):
    """Consistent-hashing shard audit — every source host maps to its
    clockwise-first worker on an md5 ring, under N and N+1 workers,
    with the ``moved`` flag exposing the minimal-reshuffle property
    that makes ring sharding the right crawl-frontier partitioner
    (adding a worker moves only the hosts that land on it — ~1/(N+1)
    of the keyspace — where modulo sharding moves almost everything).
    Returns (source, worker_n, worker_n1, moved).

    Hashes are the repo's :func:`..stages.corpus.md5_u64` folded to 61
    bits so ring distances stay in int64 on both engines; the ring
    (N+1 positions) rides the task closure, the distinct-source set
    comes from one combiner groupby, and the assignment is a
    vectorized hosts × workers argmin (first min ⇒ smallest worker id
    on a tie — the SQL ``ORDER BY dist, wid`` mirror).
    """
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    from ..arrowutil import one_chunk
    from .corpus import md5_u64

    M = np.int64(1) << np.int64(61)

    def ring(n):
        return np.array(
            [int(md5_u64(np.array([f"w{i}"], dtype=object))[0]
                 >> np.uint64(3)) for i in range(n)], dtype=np.int64)

    r_n, r_n1 = ring(n_workers), ring(n_workers + 1)

    distinct = docs.map_batches(
        lambda t: pa.table({"source": pc.unique(one_chunk(t["source"]))}),
        batch_format="pyarrow") \
        .groupby("source").count().drop_columns(["count()"])

    def assign(t: pa.Table) -> pa.Table:
        src = np.asarray(one_chunk(t["source"]), dtype=object)
        if len(src) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"source": pa.array([], type=pa.string()),
                             "worker_n": z, "worker_n1": z,
                             "moved": pa.array([], type=pa.bool_())})
        hh = (md5_u64(src.astype(str)) >> np.uint64(3)).astype(np.int64)

        def first_clockwise(ringpos):
            d = (ringpos[None, :] - hh[:, None]) % M
            return np.argmin(d, axis=1).astype(np.int64)

        a, b = first_clockwise(r_n), first_clockwise(r_n1)
        return pa.table({"source": pa.array(src, type=pa.string()),
                         "worker_n": pa.array(a),
                         "worker_n1": pa.array(b),
                         "moved": pa.array(a != b)})

    return distinct.map_batches(assign, batch_format="pyarrow")


def shard_skew_report(docs, n_shards: int = 16):
    """Balance audit for the hash sharding: per-run one-row report
    (n_shards_used, min_rows, max_rows, total_rows,
    imbalance_permille = 1000·max/mean) — the number a 256-node fleet
    operator checks before trusting a partitioned write.

    One combiner groupby over shard ids (≤ n_shards rows per batch),
    then a one-block fold.  Shares :func:`shard_assignment`'s hash so
    the report describes the REAL layout.
    """
    from ray.data.aggregate import Sum
    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(one_chunk(t["doc_id"]), dtype=np.int64)
        h = _shard_hash_vec(ids) % n_shards
        cnt = np.bincount(h, minlength=n_shards)
        nz = np.nonzero(cnt)[0]
        return pa.table({"shard": pa.array(nz.astype(np.int64)),
                         "n_p": pa.array(cnt[nz].astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        n = np.asarray(one_chunk(t["n_rows"])).astype(np.int64)
        total = int(n.sum())
        used = len(n)
        mean_milli = 1000 * total // max(used, 1)
        return pa.table({
            "n_shards_used": pa.array([used], type=pa.int64()),
            "min_rows": pa.array([int(n.min()) if used else 0],
                                 type=pa.int64()),
            "max_rows": pa.array([int(n.max()) if used else 0],
                                 type=pa.int64()),
            "total_rows": pa.array([total], type=pa.int64()),
            "imbalance_permille": pa.array(
                [1000 * 1000 * int(n.max()) // max(mean_milli, 1)
                 if used else 0], type=pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("shard").aggregate(Sum("n_p", alias_name="n_rows"))
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None))
