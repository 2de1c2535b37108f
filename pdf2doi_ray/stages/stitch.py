"""Sharded boundary-carry stitch for the sorted-block operators.

The sorted-block pattern (minhash candidate pairs, wordset shift-join,
session windows, as-of join) resolves everything interior to a block with
vectorized kernels and re-emits the few cross-block rows to a stitch step.
Round 2 funneled those carries into ONE task via ``repartition(1)``; carry
volume is a handful of rows per block for typical inputs, but carries
ACCUMULATE across all blocks, and adversarial shapes (a right-sparse as-of
input where every left row is unmatched) funnel O(input) rows into that
single task — the round-2 verdict's named scale risk.

This helper shards the stitch by a caller-supplied int64 key: every
cross-block group shares its key by construction (the same user, the same
LSH bucket, the same adjacent-pair key), so sharding never splits a group,
and each of the ≤ ``num_shards`` stitch calls sees only its shard's
carries.  ``num_shards=1`` degenerates to the round-2 single-task stitch
(kept as a test parameter for parity checks).

Empty-carry safety: ``groupby().map_groups`` on a 0-row dataset yields a
0-row schema-less dataset, and Ray's union tolerates that alongside a
schema-ful branch — verified behavior on this Ray version, relied on by all
four call sites (their interior slice always carries the output schema).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_STITCH_SHARDS = 32


def hash_shard_str(arr) -> np.ndarray:
    """Deterministic int64 shard ids for a string Arrow array.  Pandas'
    khash kernel hashes the strings in one C loop — no Python-level
    per-row bytecode, though the strings do materialize as objects first
    (unavoidable: string hashing has no zero-copy Arrow kernel here)."""
    import pandas as pd

    from ..arrowutil import one_chunk

    vals = one_chunk(arr).to_numpy(zero_copy_only=False)
    return pd.util.hash_array(vals) \
        .astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def sharded_stitch(carries, shard_of, stitch_fn,
                   num_shards: int = DEFAULT_STITCH_SHARDS):
    """Partition ``carries`` into ``num_shards`` groups by
    ``shard_of(table) -> int64 array`` (taken modulo ``num_shards``) and run
    ``stitch_fn`` once per non-empty shard over ALL of that shard's rows.

    Correctness contract (caller's obligation): any set of carry rows that
    must be stitched together maps to the same shard id.
    """
    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            s = np.empty(0, dtype=np.int64)
        else:
            s = (np.asarray(shard_of(t), dtype=np.int64)
                 & np.int64(0x7FFFFFFFFFFFFFFF)) % num_shards
        return t.append_column("_shard", pa.array(s, type=pa.int64()))

    def per_shard(g: pa.Table) -> pa.Table:
        return stitch_fn(g.drop_columns(["_shard"]))

    return (carries.map_batches(tag, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(per_shard, batch_format="pyarrow"))
