"""Mergeable cardinality sketch: HyperLogLog distinct-count over a column.

The distributed-sketch pattern (Flajolet et al., AofA 2007): every batch
builds a fixed-size register array (2^P bytes) from deterministic 64-bit
hashes; register arrays merge by element-wise max — associative and
commutative, so partials combine in any order and the driver only ever
holds registers, never values.  Deterministic end-to-end (md5-derived
64-bit hash, no process salt): every run and every worker produces the
identical sketch, and a SQL oracle can recompute the full register state
(see :func:`hll_register_rows`).

Standard bias corrections: linear counting below 2.5·m, the 2^64
large-range correction above 2^63/30.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HLL_P = 12                      # 4096 registers → ~1.6% standard error
HLL_M = 1 << HLL_P


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hash64(value: str) -> int:
    """First 8 bytes of md5, big-endian (round 4; was blake2b) — the repo's
    SQL-recomputable hash convention:
    ``('0x' || substr(md5(v), 1, 16))::UBIGINT`` in DuckDB."""
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:8],
                          "big")


def registers_for(values) -> np.ndarray:
    """HLL register array for an iterable of strings (vectorized rank
    computation; only the hashing itself is a per-value C call)."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if not values:
        return regs
    hs = np.fromiter((hash64(v) for v in values), dtype=np.uint64,
                     count=len(values))
    idx = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (hs << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining 64-P bits, + 1
    shifted = rest
    rank = np.ones(len(hs), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    live = (shifted & mask) == 0
    while live.any():
        rank[live] += 1
        shifted = shifted << np.uint64(1)
        live = live & ((shifted & mask) == 0)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(parts: list[np.ndarray]) -> np.ndarray:
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for p in parts:
        np.maximum(regs, p, out=regs)
    return regs


def estimate(regs: np.ndarray) -> int:
    m = len(regs)
    inv = np.power(2.0, -regs.astype(np.float64)).sum()
    e = _alpha(m) * m * m / inv
    if e <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            e = m * np.log(m / zeros)
    elif e > (1 << 63) / 30.0:
        # near-saturated registers can push raw e past 2^64 (max ~2.7e19 at
        # P=12), where the correction's log argument goes non-positive — cap
        # at the 2^64 domain size instead of returning NaN.  The corrected
        # value itself is also clamped: just below the cap the correction
        # blows up (−2^64·ln(1−e/2^64) → ~37×2^64), which would make the
        # estimator non-monotone across the cap boundary.
        if e < 2.0 ** 64:
            e = min(-(2.0 ** 64) * np.log(1 - e / 2.0 ** 64), 2.0 ** 64)
        else:
            e = 2.0 ** 64
    return int(round(e))


def approx_ndv(ds, column: str) -> int:
    """Distributed approximate distinct count of ``ds[column]``: per-batch
    register partials (one 4 KiB row per batch), max-merged on the driver.
    Values never leave their batch; the shuffle-free alternative to
    ``Dataset.unique`` when an estimate suffices."""
    def partial(t: pa.Table) -> pa.Table:
        regs = registers_for(t[column].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})

    parts = [np.frombuffer(r["regs"], dtype=np.uint8)
             for r in ds.map_batches(partial, batch_format="pyarrow")
             .take_all()]
    return estimate(merge_registers(parts))


def hll_register_rows(ds, column: str):
    """The HLL sketch's FULL register state as (bucket, register) rows —
    nonzero registers only, max-merged through one ``groupby(bucket)``.

    This is the driver-checkable face of the sketch: the register state is
    deterministic (md5 hash, max-merge is order-free), so a SQL oracle
    recomputes it exactly — ``bucket = hv >> 52``, ``rank = 65 -
    length(ltrim(bin((hv % 2^52) * 4096 + 4095), '0'))`` — turning the
    approximate-op check from rows-only into value-hash-exact.  The
    shuffle carries at most 2^P rows per batch (the register array's
    nonzero support), never values; :func:`estimate` over the merged rows
    equals :func:`approx_ndv` by construction (same registers).
    """
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        regs = registers_for(t[column].to_pylist())
        nz = np.nonzero(regs)[0]
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "register": pa.array(regs[nz].astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Max("register", alias_name="register")))


def exact_ndv_by_group(ds, group_col: str, value_col: str,
                       alias: str = "ndv"):
    """EXACT distinct count of ``value_col`` per ``group_col`` — the exact
    counterpart to :func:`approx_ndv` when per-group cardinalities must be
    right, not estimated.

    Two-phase plan, both phases combiner-first so the exchanges carry
    deduplicated rows only:

    1. per-batch distinct (group, value) pairs (one Arrow ``group_by`` per
       batch) → global ``groupby([group, value])`` — shuffle volume is the
       number of DISTINCT pairs per batch, not input rows;
    2. per-batch counts per group over the now-unique pairs → tiny
       ``groupby(group)`` sum.

    A zipfian group with many distinct values spreads over phase-1 reducers
    by the (group, value) composite key; only its per-batch partial COUNTS
    meet in phase 2 (one row per group per batch).
    """
    from ray.data.aggregate import Count, Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        return pa.table({group_col: t[group_col], value_col: t[value_col]}) \
            .group_by([group_col, value_col]).aggregate([])

    uniq = (ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby([group_col, value_col])
            .aggregate(Count(alias_name="_dup")))

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table({group_col: t[group_col]}).group_by(group_col) \
            .aggregate([(group_col, "count")])
        return g.rename_columns([group_col, "c"])

    return (uniq.map_batches(count_partial, batch_format="pyarrow")
            .groupby(group_col).aggregate(Sum("c", alias_name=alias)))


# --- Misra-Gries / mergeable heavy-hitters summary -------------------------

def _mg_compress(keys: np.ndarray, counts: np.ndarray, m: int):
    """Compress exact (key, count) pairs to a Misra-Gries summary of ≤ m
    entries.  Returns (keys, counts, err): counts are lowered by the
    (m+1)-th largest value, so every kept estimate UNDER-counts by ≤ err
    and dropped keys had true count ≤ err (Agarwal et al., "Mergeable
    Summaries", PODS 2012 merge rule)."""
    if len(keys) <= m:
        return keys, counts, 0
    order = np.argsort(-counts, kind="stable")
    cut = int(counts[order[m]])
    keep = order[:m]
    new_counts = counts[keep] - cut
    live = new_counts > 0
    return keys[keep][live], new_counts[live], cut


def _hh_partial(t: pa.Table, column: str, m: int) -> pa.Table:
    """Per-block Misra-Gries summary rows (v, c) plus one null-keyed
    block-marker row carrying the block's subtraction error.  Nulls in the
    data are excluded (count-of-value semantics, like SQL count(col)) so
    they cannot collide with the marker.  Contract: string column (the
    marker schema is pa.string())."""
    col = t[column].combine_chunks() \
        if isinstance(t[column], pa.ChunkedArray) else t[column]
    g = pa.table({"v": col.drop_null()}).group_by("v") \
        .aggregate([([], "count_all")])
    keys = np.asarray(g["v"].to_pylist(), dtype=object)
    counts = np.asarray(g["count_all"].combine_chunks()
                        if isinstance(g["count_all"], pa.ChunkedArray)
                        else g["count_all"]).astype(np.int64)
    keys, counts, err = _mg_compress(keys, counts, m)
    return pa.table({
        "v": pa.array(list(keys) + [None], type=pa.string()),
        "c": pa.array(np.concatenate([counts, [-1]]), type=pa.int64()),
        "err": pa.array([0] * len(keys) + [err], type=pa.int64()),
    })


def heavy_hitters(ds, column: str, m: int = 256, k: int = 20):
    """Approximate top-k heavy hitters of ``ds[column]`` without a
    vocabulary-wide shuffle.

    Per-block: exact Arrow counts compressed to a Misra-Gries summary of
    ≤ ``m`` entries (plus its subtraction error).  Driver: key-wise sum of
    the small summaries, one final compress, errors add.  Guarantees (the
    mergeable-summaries invariants, property-tested):

    * every reported ``est_count`` UNDER-estimates: est ≤ true;
    * true − est ≤ ``err_bound`` (the summed subtractions);
    * any key with true count > err_bound survives somewhere in the merged
      summary — so with m sized to n/φ, no φ-heavy hitter is ever lost;
    * with m ≥ total distinct keys the result is EXACT (err_bound 0).

    The driver holds B·m summary rows (B = block count).  At fleet scale
    merge the summaries in a tree instead (groupby(hash(key) % P) over
    summary rows, compress per shard, then one driver pass); the summary
    merge is associative, so the tree is semantics-preserving.
    Returns pandas (rank, value, est_count, err_bound).
    """
    import pandas as pd

    rows = ds.map_batches(lambda t: _hh_partial(t, column, m),
                          batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "v" not in rows.columns:          # fully-empty input -> schemaless
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype=object),
                             "est_count": pd.Series(dtype="int64"),
                             "err_bound": pd.Series(dtype="int64")})
    err_total = int(rows.loc[rows["v"].isna(), "err"].sum())
    data = rows[rows["v"].notna()]
    merged = data.groupby("v", sort=False)["c"].sum()
    keys = merged.index.to_numpy(dtype=object)
    counts = merged.to_numpy(dtype=np.int64)
    keys, counts, cut = _mg_compress(keys, counts, m)
    err_total += int(cut)
    order = np.lexsort((keys, -counts))[:k]
    return pd.DataFrame({
        "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        "value": keys[order],
        "est_count": counts[order],
        "err_bound": np.full(len(order), err_total, dtype=np.int64),
    })


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (MRL/KLL-style compactor hierarchy)
#
# Completes the sketch trio (HLL cardinality, Misra-Gries heavy hitters,
# quantiles).  The EXACT quantile path in this repo milli-quantizes and
# histograms (stages/aggs.value_quantiles_milli) — that is the right answer
# while the quantized domain stays bounded.  This sketch is the scale path
# for genuinely unbounded domains: per-batch state is O(k·log(n/k)) values
# regardless of cardinality, partials merge associatively, and the driver
# never sees raw values.
#
# Simple fixed-capacity variant (Manku-Rajagopalan-Lindsay): every level
# holds up to 2k values; a full level sorts and promotes every other value
# (weight doubles per level), with the survivor offset alternating per
# compaction so the bias cancels in expectation.  Rank error is
# O(log(n/k) / k)·n; the property tests assert a conservative 3% at
# k=512 / n=1e5.  Deterministic for a fixed add/merge order; merge order
# may shift an estimate within the same bound (tested both ways).
# ---------------------------------------------------------------------------

KLL_K = 512


def kll_new() -> dict:
    return {"levels": [np.empty(0, dtype=np.int64)], "n": 0, "flips": 0}


def _kll_compact(sk: dict, k: int) -> None:
    levels = sk["levels"]
    i = 0
    while i < len(levels):
        if len(levels[i]) >= 2 * k:
            v = np.sort(levels[i])
            # an odd count cannot halve weight-preservingly: hold the
            # largest value back at this level (deterministic) and
            # compact the even remainder — Σ 2^level·|level| stays n
            keep = v[-1:] if len(v) & 1 else v[:0]
            v = v[:len(v) - (len(v) & 1)]
            off = sk["flips"] & 1
            sk["flips"] += 1
            if i + 1 == len(levels):
                levels.append(np.empty(0, dtype=np.int64))
            levels[i + 1] = np.concatenate([levels[i + 1], v[off::2]])
            levels[i] = keep
        i += 1


def kll_add(sk: dict, values: np.ndarray, k: int = KLL_K) -> None:
    """Add a batch of int64 values (chunked so level 0 never skips its
    capacity check)."""
    vals = np.asarray(values, dtype=np.int64)
    sk["n"] += len(vals)
    for lo in range(0, len(vals), k):
        sk["levels"][0] = np.concatenate([sk["levels"][0],
                                          vals[lo:lo + k]])
        _kll_compact(sk, k)


def kll_merge(a: dict, b: dict, k: int = KLL_K) -> dict:
    """Merge two sketches (associative up to the stated error bound)."""
    out = kll_new()
    out["n"] = a["n"] + b["n"]
    out["flips"] = a["flips"] + b["flips"]
    depth = max(len(a["levels"]), len(b["levels"]))
    out["levels"] = [
        np.concatenate([
            a["levels"][i] if i < len(a["levels"])
            else np.empty(0, dtype=np.int64),
            b["levels"][i] if i < len(b["levels"])
            else np.empty(0, dtype=np.int64),
        ]) for i in range(depth)]
    _kll_compact(out, k)
    return out


def kll_total_weight(sk: dict) -> int:
    """Σ 2^level · |level| — MUST equal n exactly (compaction preserves
    total weight); the structural invariant the tests pin."""
    return int(sum((1 << i) * len(v) for i, v in enumerate(sk["levels"])))


def kll_quantiles(sk: dict, quantiles_permille) -> list[tuple[int, int]]:
    """(q_permille, value) at 1-based weighted rank ceil(q/1000 · n) —
    the same rank definition as the exact histogram walk."""
    vals = np.concatenate(sk["levels"]) if sk["n"] else np.empty(0, np.int64)
    wts = np.concatenate([
        np.full(len(v), 1 << i, dtype=np.int64)
        for i, v in enumerate(sk["levels"])]) if sk["n"] else vals
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    out = []
    for q in quantiles_permille:
        target = -(-q * sk["n"] // 1000)          # ceil
        j = int(np.searchsorted(cum, max(target, 1)))
        j = min(j, len(vals) - 1)
        out.append((int(q), int(vals[j]) if len(vals) else 0))
    return out


def kll_serialize(sk: dict) -> bytes:
    import struct
    parts = [struct.pack("<qqq", sk["n"], sk["flips"], len(sk["levels"]))]
    for v in sk["levels"]:
        parts.append(struct.pack("<q", len(v)))
        parts.append(np.ascontiguousarray(v).tobytes())
    return b"".join(parts)


def kll_deserialize(blob: bytes) -> dict:
    import struct
    n, flips, depth = struct.unpack_from("<qqq", blob, 0)
    off = 24
    levels = []
    for _ in range(depth):
        (ln,) = struct.unpack_from("<q", blob, off)
        off += 8
        levels.append(np.frombuffer(blob, dtype=np.int64,
                                    count=ln, offset=off).copy())
        off += 8 * ln
    return {"levels": levels, "n": n, "flips": flips}


def approx_quantiles_milli(ds, value_col: str,
                           quantiles_permille=(250, 500, 750, 900),
                           k: int = KLL_K):
    """Distributed approximate quantiles of a float column on the milli
    grid: each batch folds into one KLL partial (a few KiB regardless of
    batch size), the driver merges blobs — values never shuffle, the
    driver never holds raw data.  Error: rank within O(log(n/k)/k)·n of
    exact; use :func:`.aggs.value_quantiles_milli` when the quantized
    domain is bounded and exactness is required.  Returns a pandas frame
    (q_permille, value) in milli units."""
    import pandas as pd

    from .windowfns import _milli
    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        sk = kll_new()
        kll_add(sk, _milli(one_chunk(t[value_col])), k)
        return pa.table({"blob": pa.array([kll_serialize(sk)],
                                          type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = kll_new()
    for r in rows:
        merged = kll_merge(merged, kll_deserialize(r["blob"]), k)
    qs = kll_quantiles(merged, quantiles_permille)
    return pd.DataFrame({
        "q_permille": pd.array([q for q, _ in qs], dtype="int64"),
        "value": pd.array([v for _, v in qs], dtype="int64"),
    })


def approx_quantiles_milli_by_group(ds, group_col: str, value_col: str,
                                    quantiles_permille=(250, 500, 750, 900),
                                    k: int = KLL_K):
    """Per-group distributed approximate quantiles — the documented
    escape for :func:`.textstats.token_count_quantiles_by_group` /
    :func:`.aggs.value_quantiles_milli_by_group` when a group's quantized
    value domain is unbounded (the keyed histogram would outgrow its
    reducer): one KLL partial per (group, batch) (a few KiB each,
    regardless of rows), ONE ``groupby(group)`` over blob rows, per-group
    blob merge + quantile walk in the reducer.  Values never shuffle and
    no driver-side state exists — the reducer sees #batches blobs per
    group, not rows.  The per-group Python loop in the combiner is
    bounded by the batch's group cardinality (blob construction is
    per-group by definition); rank error matches the global sketch.

    Returns a Dataset of (group, q_permille, value) in milli units.
    """
    import pandas as pd

    from ..arrowutil import one_chunk
    from .windowfns import _milli

    def partial(t: pa.Table) -> pa.Table:
        g_arr = one_chunk(t[group_col])
        codes, uniques = pd.factorize(g_arr.to_pandas(), sort=False)
        if (codes < 0).any():
            # a null group factorizes to -1 and would silently attach its
            # values to the LAST group's sketch via uniques[-1]
            raise ValueError("approx_quantiles_milli_by_group: null group "
                             "values — filter or fill the group column")
        if not len(codes):
            return pa.table({
                group_col: pa.array([], type=g_arr.type),
                "blob": pa.array([], type=pa.binary()),
            })
        v = _milli(one_chunk(t[value_col]))
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        bounds = np.concatenate(
            [[0], np.nonzero(sorted_codes[1:] != sorted_codes[:-1])[0] + 1,
             [len(sorted_codes)]])
        groups, blobs = [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            sk = kll_new()
            kll_add(sk, v[order[lo:hi]], k)
            groups.append(uniques[sorted_codes[lo]])
            blobs.append(kll_serialize(sk))
        return pa.table({
            group_col: pa.array(groups, type=g_arr.type),
            "blob": pa.array(blobs, type=pa.binary()),
        })

    def reduce_group(t: pa.Table) -> pa.Table:
        merged = kll_new()
        for blob in t["blob"].to_pylist():
            merged = kll_merge(merged, kll_deserialize(blob), k)
        qs = kll_quantiles(merged, quantiles_permille)
        n = len(qs)
        g_arr = one_chunk(t[group_col])
        return pa.table({
            group_col: pa.array([g_arr[0].as_py()] * n, type=g_arr.type),
            "q_permille": pa.array([q for q, _ in qs], type=pa.int64()),
            "value": pa.array([val for _, val in qs], type=pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(reduce_group, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimates with an additive eps*N bound.
# Completes the mergeable-summary family: HLL (distinct counts), Misra-Gries
# (heavy hitters, under-estimates), KLL (quantiles) — CM gives OVER-estimates
# for arbitrary point queries, including keys never seen (Cormode &
# Muthukrishnan 2005).  Element-wise SUM of CM tables == CM of the
# concatenated stream, exactly — the distributed merge is lossless.

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_positions(values, depth: int = CM_DEPTH,
                  width: int = CM_WIDTH) -> np.ndarray:
    """(depth, n) bucket positions; row j hashes ``"cm{j}:" + value`` with
    the repo's SQL-recomputable md5 convention (first 8 bytes, big-endian
    — :func:`hash64`), so a DuckDB oracle can rebuild the full sketch:
    ``('0x' || substr(md5('cm' || j || ':' || v), 1, 16))::UBIGINT %
    width``.  Deterministic across processes (no PYTHONHASHSEED
    dependence); was salted blake2b before round 4."""
    pos = np.empty((depth, len(values)), dtype=np.int64)
    for i, v in enumerate(values):
        for j in range(depth):
            h = hashlib.md5(f"cm{j}:{v}".encode("utf-8")).digest()[:8]
            pos[j, i] = int.from_bytes(h, "big") % width
    return pos


def cm_from_counts(keys, counts, depth: int = CM_DEPTH,
                   width: int = CM_WIDTH) -> np.ndarray:
    """Build a (depth, width) CM table from exact (key, count) pairs —
    the per-batch combiner runs ONE exact Arrow group-by first, so the
    Python hash loop is bounded by the batch's NDV, not its rows."""
    table = np.zeros((depth, width), dtype=np.int64)
    if len(keys):
        pos = _cm_positions(keys, depth, width)
        for j in range(depth):
            np.add.at(table[j], pos[j], counts)
    return table


def cm_estimate(table: np.ndarray, values,
                depth: int = CM_DEPTH, width: int = CM_WIDTH) -> np.ndarray:
    """Point estimates: min over rows.  est >= true always; with prob
    1 - 2^-depth, est <= true + (e / width) * N."""
    if not len(values):
        return np.empty(0, dtype=np.int64)
    pos = _cm_positions(values, depth, width)
    return np.stack([table[j, pos[j]] for j in range(depth)]).min(axis=0)


def count_min_frequencies(ds, column: str, probes,
                          depth: int = CM_DEPTH, width: int = CM_WIDTH):
    """Distributed point-frequency estimates: each batch reduces to ONE
    (depth x width) int64 CM table (a few KiB regardless of rows), the
    driver element-wise sums the tables (lossless merge) and answers the
    probe queries — values never shuffle, the driver never holds keys.
    Returns pandas (value, est_count).  The estimate is an upper bound
    within e/width*N of the truth, but it is DETERMINISTIC given the
    data: the md5 bucket map means a SQL oracle can recompute every
    register (sum counts per (row, bucket)) and take the same min —
    over-estimates and all — so the driver check is exact."""
    import pandas as pd

    from ..arrowutil import one_chunk

    def partial(t: pa.Table) -> pa.Table:
        col = one_chunk(t[column])
        g = pa.table({"v": col.drop_null()}).group_by("v") \
            .aggregate([([], "count_all")])
        keys = np.asarray(g["v"].to_pylist(), dtype=object)
        counts = np.asarray(one_chunk(g["count_all"])).astype(np.int64)
        table = cm_from_counts(keys, counts, depth, width)
        return pa.table({"blob": pa.array([table.tobytes()],
                                          type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        merged += np.frombuffer(r["blob"],
                                dtype=np.int64).reshape(depth, width)
    probes = list(probes)
    est = cm_estimate(merged, probes, depth, width)
    return pd.DataFrame({
        "value": pd.array(probes, dtype="object"),
        "est_count": pd.array(est, dtype="int64"),
    })


def heavy_hitters_tree(ds, column: str, m: int = 256, k: int = 20,
                       num_shards: int = 16):
    """Tree-merged variant of :func:`heavy_hitters` — the documented
    escape for fleet scale, where the driver's B·m summary rows (B =
    block count) outgrow one process: summary DATA rows hash-partition by
    key into ``num_shards`` groups (a key lives in exactly ONE shard, so
    per-shard keywise sums are the global sums), each shard compresses to
    ≤ m entries with its own cut, and the driver sees ≤ num_shards·m rows
    plus the marker rows.

    Error accounting: a key's under-count is ≤ Σ block errs (any block
    may have dropped any key) + its OWN shard's cut + the final driver
    cut; the reported ``err_bound`` uses max(shard cuts), a uniform bound
    ≥ every per-key bound.  With m ≥ total distinct keys every cut is 0
    and the result is EXACT — asserted equal to the flat variant.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..arrowutil import one_chunk

    summaries = ds.map_batches(lambda t: _hh_partial(t, column, m),
                               batch_format="pyarrow", batch_size=None)

    def shard_of(t: pa.Table) -> pa.Table:
        v = one_chunk(t["v"])
        # markers (null v) collect in shard -1; data shards by key hash
        shard = pd.util.hash_array(
            np.asarray(v.to_pylist(), dtype=object)).astype("int64") \
            % num_shards
        shard[np.asarray(pc.is_null(v))] = -1
        return t.append_column("shard", pa.array(shard))

    def per_shard(t: pa.Table) -> pa.Table:
        sh = int(t["shard"][0].as_py())
        if sh == -1:     # marker shard: fold the block errs into one row
            err = int(np.asarray(one_chunk(t["err"])).sum())
            return pa.table({
                "v": pa.array([None], type=pa.string()),
                "c": pa.array([-1], type=pa.int64()),
                "err": pa.array([err], type=pa.int64()),
            })
        df = t.select(["v", "c"]).to_pandas()
        merged = df.groupby("v", sort=False)["c"].sum()
        keys = merged.index.to_numpy(dtype=object)
        counts = merged.to_numpy(dtype=np.int64)
        keys, counts, cut = _mg_compress(keys, counts, m)
        return pa.table({
            "v": pa.array(list(keys) + [None], type=pa.string()),
            "c": pa.array(np.concatenate([counts, [-2]]), type=pa.int64()),
            "err": pa.array([0] * len(keys) + [cut], type=pa.int64()),
        })

    rows = (summaries.map_batches(shard_of, batch_format="pyarrow")
            .groupby("shard").map_groups(per_shard, batch_format="pyarrow")
            .to_pandas())
    if "v" not in rows.columns:
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype=object),
                             "est_count": pd.Series(dtype="int64"),
                             "err_bound": pd.Series(dtype="int64")})
    marks = rows[rows["v"].isna()]
    block_err = int(marks.loc[marks["c"] == -1, "err"].sum())
    shard_cuts = marks.loc[marks["c"] == -2, "err"]
    err_total = block_err + (int(shard_cuts.max()) if len(shard_cuts)
                             else 0)
    data = rows[rows["v"].notna()]
    # keys are disjoint across shards: no cross-shard sums remain
    keys = data["v"].to_numpy(dtype=object)
    counts = data["c"].to_numpy(dtype=np.int64)
    keys, counts, cut = _mg_compress(keys, counts, m)
    err_total += int(cut)
    order = np.lexsort((keys, -counts))[:k]
    return pd.DataFrame({
        "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        "value": keys[order],
        "est_count": counts[order],
        "err_bound": np.full(len(order), err_total, dtype=np.int64),
    })


def _hll_bucket_rank(values):
    """(bucket, rank) per value — the per-row face of
    :func:`registers_for`, shared by the grouped variant."""
    hs = np.fromiter((hash64(v) for v in values), dtype=np.uint64,
                     count=len(values))
    idx = (hs >> np.uint64(64 - HLL_P)).astype(np.int64)
    shifted = (hs << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    rank = np.ones(len(hs), dtype=np.int64)
    mask = np.uint64(1) << np.uint64(63)
    live = (shifted & mask) == 0
    while live.any():
        rank[live] += 1
        shifted = shifted << np.uint64(1)
        live = live & ((shifted & mask) == 0)
    return idx, rank


def hll_register_rows_by_group(ds, group_col: str, column: str):
    """Per-group HLL register state — the grouped twin of
    :func:`hll_register_rows` (approximate distinct ``column`` per
    ``group_col``, e.g. distinct sources per language, mergeable across
    any partitioning).  Exchange volume is ≤ |groups|·2^P rows per batch
    after the in-batch (group, bucket) max collapse; the register
    arithmetic is the md5 convention, so the SQL oracle recomputes the
    state exactly and the check is value-hash-strict even though the
    ESTIMATE is approximate.  Returns (group, bucket, register);
    :func:`estimate` over one group's rows gives its NDV estimate.
    """
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        vals = (t[column].combine_chunks()
                if isinstance(t[column], pa.ChunkedArray)
                else t[column]).to_pylist()
        if not vals:
            return pa.table({
                group_col: pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.int64()),
                "register": pa.array([], type=pa.int64())})
        idx, rank = _hll_bucket_rank(vals)
        g = pa.table({
            group_col: t[group_col],
            "bucket": pa.array(idx),
            "register": pa.array(rank),
        }).group_by([group_col, "bucket"]).aggregate([("register", "max")])
        return pa.table({group_col: g[group_col], "bucket": g["bucket"],
                         "register": g["register_max"].cast(pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "bucket"])
            .aggregate(Max("register", alias_name="register")))


def heavy_hitters_exact_2pass(ds, column: str,
                              threshold_permille: int = 5,
                              m: int = 1024):
    """EXACT frequency of every value whose share exceeds
    ``threshold_permille``/1000 — the canonical two-pass scale pattern:
    a Misra-Gries pass proposes a ≤``m``-entry candidate superset (the
    MG no-loss guarantee: any key with true count > n/m survives, so
    with m > 1000/threshold no qualifying key is missed), then a second
    streaming pass counts ONLY the candidates exactly (one vectorized
    ``is_in`` filter + a ≤m-key groupby) and the threshold applies to
    true counts.  Neither pass shuffles the vocabulary.  Returns
    (value, n_occurrences), exact.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if m * threshold_permille <= 1000:
        raise ValueError("heavy_hitters_exact_2pass: need "
                         "m > 1000/threshold_permille for the "
                         "no-loss candidate guarantee")
    red = ds.materialize()
    total = red.count()
    cands = heavy_hitters(red, column, m=m, k=m)
    cand_set = pa.array(sorted(cands["value"].astype(str)),
                        type=pa.string())

    def exact_partial(t: pa.Table) -> pa.Table:
        col = t[column].combine_chunks() \
            if isinstance(t[column], pa.ChunkedArray) else t[column]
        keep = pc.is_in(col, value_set=cand_set)
        g = pa.table({"value": col.filter(keep)}).group_by("value") \
            .aggregate([([], "count_all")])
        return g.select(["value", "count_all"]) \
            .rename_columns(["value", "n"])

    counts = (red.map_batches(exact_partial, batch_format="pyarrow")
              .groupby("value")
              .aggregate(Sum("n", alias_name="n_occurrences")))

    def gate(t: pa.Table) -> pa.Table:
        n = t["n_occurrences"]
        keep = pc.greater(pc.multiply(n, pa.scalar(1000, pa.int64())),
                          pa.scalar(total * threshold_permille,
                                    pa.int64()))
        return t.filter(keep)

    return counts.map_batches(gate, batch_format="pyarrow")
