"""Interchange source/sink formats beyond Parquet: JSONL and CSV.

Web-crawl corpora overwhelmingly arrive as line-delimited JSON (WET/WAT
exports, API dumps) or CSV; at 100 TB these are *ingest* formats — read
once, file-parallel, and streamed straight into Parquet — not working
formats.  Both readers are Ray Data native (``read_json`` / ``read_csv``):
one task per file, columnar Arrow blocks out, so a directory of N shards
parallelizes N-wide with no driver involvement.  Neither format carries
row-group statistics or column projection, which is exactly why the
engine's working format stays Parquet (``read_parquet(columns=...)``
prunes at the read); the wrappers here exist so a reference user's
non-Parquet inputs enter the same pipelines without a pre-conversion step.

Round-trip contract (locked by the ``jsonl_roundtrip`` / ``csv_roundtrip``
identity oracles): ``read(write(t)) == t`` for int64 / string columns —
no value, type, row, or encoding detail may be lost in either direction.
"""

from __future__ import annotations

import ray.data


def export_jsonl(ds, path: str) -> str:
    """Streaming line-delimited-JSON sink: one ``.json`` file per block
    under ``path`` (created if missing).  Block-parallel, no driver
    materialization; pair with :func:`read_jsonl`."""
    ds.write_json(path)
    return path


def read_jsonl(path: str):
    """Line-delimited-JSON source: one read task per file, Arrow blocks
    out (types inferred per file — ints stay int64, strings stay utf8)."""
    return ray.data.read_json(path)


def export_csv(ds, path: str) -> str:
    """Streaming CSV sink: one ``.csv`` file per block under ``path``
    (headers per file; Arrow-standard quoting, so embedded commas/quotes
    survive).  Pair with :func:`read_csv_dir`."""
    ds.write_csv(path)
    return path


def read_csv_dir(path: str):
    """CSV source: one read task per file, header-driven schema
    inference per file."""
    return ray.data.read_csv(path)


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_bytes: int = 128 << 20):
    """Small-file compaction: rewrite a fragmented parquet directory (the
    debris of many incremental/streaming writes) as ``ceil(total_bytes /
    target_bytes)`` right-sized files — the periodic maintenance pass
    every long-lived 100 TB layout needs, since a reader pays per-file
    open/footer costs and tiny row groups defeat column-chunk pruning.

    File count is decided from the directory's on-disk bytes (metadata
    only, no data read); the rewrite is one ``read_parquet →
    repartition(n) → write_parquet`` pass — ``repartition`` without
    ``shuffle=True`` is Ray's split/coalesce plan (blocks concatenate,
    rows never hash-exchange), so compaction moves every byte exactly
    once.  Row order is NOT preserved (blocks coalesce in arrival order)
    — the documented contract of every unordered pipeline in this engine.
    Returns the output file count.
    """
    import glob
    import math
    import os

    # '**/' matches zero directories too, so this covers flat and nested
    total = sum(os.path.getsize(p)
                for p in glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                                   recursive=True))
    n_out = max(1, math.ceil(total / target_bytes))
    ray.data.read_parquet(in_dir).repartition(n_out).write_parquet(out_dir)
    return n_out


def export_orc(ds, out_dir: str):
    """Streaming ORC sink: one ``.orc`` file per block under ``out_dir``
    — each map task serializes its own Arrow batch with ``pyarrow.orc``
    and emits one bookkeeping row (path, n_rows), so nothing gathers at
    the driver.  ORC is the interchange format of the Hive/Trino world;
    like JSONL/CSV it is an *edge* format here — the working format
    stays Parquet.  Returns the bookkeeping Dataset (consume it to run
    the sink)."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_rows": pa.array([], type=pa.int64())})
        from pyarrow import orc
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(t, path)
        return pa.table({"path": pa.array([path]),
                         "n_rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_orc_dir(path: str):
    """ORC source: ``read_binary_files`` (one task per ``.orc`` file) →
    ``pyarrow.orc`` decode per blob → Arrow blocks.  File-parallel like
    the other edge-format readers; no driver involvement."""
    import pyarrow as pa

    def parse(t: pa.Table) -> pa.Table:
        from pyarrow import orc
        tables = [orc.ORCFile(pa.BufferReader(blob)).read()
                  for blob in t["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")


def export_feather(ds, out_dir: str):
    """Streaming Arrow-IPC (Feather v2) sink: one ``.arrow`` file per
    block, same per-task bookkeeping contract as :func:`export_orc`.
    IPC is the zero-parse interchange for Arrow-native consumers (the
    format a downstream Ray/Polars/DuckDB stage can mmap directly)."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_rows": pa.array([], type=pa.int64())})
        from pyarrow import feather
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        feather.write_feather(t, path, compression="zstd")
        return pa.table({"path": pa.array([path]),
                         "n_rows": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_feather_dir(path: str):
    """Feather/Arrow-IPC source: file-parallel ``read_binary_files`` →
    ``pyarrow.feather`` decode per blob (zero-copy after the zstd
    frame)."""
    import pyarrow as pa

    def parse(t: pa.Table) -> pa.Table:
        from pyarrow import feather
        tables = [feather.read_table(pa.BufferReader(blob))
                  for blob in t["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")
