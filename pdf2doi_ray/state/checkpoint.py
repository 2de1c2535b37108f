"""Resumable partitioned output: shard checkpoints, lineage, resume joins.

The reference's only resume mechanism is writing the found identifier back
into each PDF's own metadata so a re-run short-circuits via method 1
(``/root/reference/pdf2doi/finders.py:587-608``).  Mutating 100 TB of source
data is not an option, so the engine replaces it with:

* **shard checkpoints** (:func:`checkpointed_run`): the unit of work is one
  input parquet shard; each shard's output is written to its own partition
  directory via temp-dir + atomic rename, then a lineage record (shard →
  partition, row counts, found count) is appended to ``manifest.jsonl``.  A
  restart skips every shard already in the manifest — exactly-once output
  per shard without a transactional sink.
* **previous-output skip** (:func:`with_previous_results`): the engine-side
  analog of the metadata memo — a broadcast anti-join on ``url`` against an
  earlier run's results, so already-resolved pages skip the parse cascade
  entirely and their prior rows are unioned back in.
* **finalize dedup** (:func:`dedup_by_url`): exact first-wins dedup keyed on
  ``url`` guarding against re-processed partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _manifest_path(out_dir: str) -> str:
    # underscore prefix: parquet dataset discovery skips the file, so the
    # output directory stays directly readable with read_parquet
    return os.path.join(out_dir, "_manifest.jsonl")


def read_manifest(out_dir: str) -> dict[str, dict]:
    done = {}
    path = _manifest_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    # torn line from a crash mid-append: the shard is simply
                    # not done — it re-runs and its atomic part publish
                    # overwrites any remnants
                    continue
                done[rec["shard"]] = rec
    return done


def list_shards(input_path: str) -> list[str]:
    """Input shards = the parquet files of a dataset directory (or the one
    file itself)."""
    if os.path.isfile(input_path):
        return [input_path]
    return sorted(
        os.path.join(input_path, f) for f in os.listdir(input_path)
        if f.endswith(".parquet"))


def checkpointed_run(input_path: str, out_dir: str, pipeline_builder,
                     columns: list[str] | None = None) -> dict:
    """Run ``pipeline_builder(shard_dataset) -> Dataset`` per input shard
    with per-shard checkpointing and lineage.

    Already-manifested shards are skipped (resume).  Each shard still runs
    as a parallel streaming pipeline internally; at fleet scale input has
    many shards per node so this outer loop is the partition axis, not a
    serialization point.
    """
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    done = read_manifest(out_dir)
    summary = {"shards_total": 0, "shards_skipped": 0, "shards_run": 0,
               "rows_out": 0}
    for shard in list_shards(input_path):
        key = os.path.basename(shard)
        summary["shards_total"] += 1
        if key in done:
            summary["shards_skipped"] += 1
            summary["rows_out"] += done[key]["rows_out"]
            continue
        part_dir = os.path.join(out_dir, f"part={os.path.splitext(key)[0]}")
        tmp_dir = os.path.join(out_dir, f"_tmp_{os.path.splitext(key)[0]}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)

        ds = ray.data.read_parquet(shard, columns=columns)
        result = pipeline_builder(ds)
        result.write_parquet(tmp_dir)

        # an all-filtered shard writes ZERO files — write_parquet doesn't
        # even create the directory; publish an empty partition dir so the
        # manifest can still record the shard as done
        if not os.path.isdir(tmp_dir):
            os.makedirs(tmp_dir, exist_ok=True)
            rows_out = 0
            n_found = 0
        else:
            # lineage metrics from the written partition (cheap re-read of
            # the small result, not the input)
            import pyarrow as pa
            import pyarrow.compute as pc

            out_ds = ray.data.read_parquet(tmp_dir)
            rows_out = out_ds.count()
            schema = out_ds.schema() if rows_out else None
            if schema is not None and "identifier" in (schema.names or []):
                n_found = int(ray.data.read_parquet(
                    tmp_dir, columns=["identifier"]).map_batches(
                    lambda t: pa.table({"f": pa.array(
                        [pc.sum(pc.is_valid(t["identifier"]).cast(pa.int64()))
                         .as_py() or 0], type=pa.int64())}),
                    batch_format="pyarrow").sum("f") or 0)
            else:
                n_found = 0 if rows_out == 0 else None

        os.rename(tmp_dir, part_dir)          # atomic publish
        rec = {"shard": key, "part": os.path.basename(part_dir),
               "rows_out": rows_out, "n_found": n_found,
               "ts": time.time()}
        with open(_manifest_path(out_dir), "a") as f:
            f.write(json.dumps(rec) + "\n")
        summary["shards_run"] += 1
        summary["rows_out"] += rows_out
    return summary


def previous_result_urls(prev_dir: str):
    """urls already resolved (identifier found) by a previous run — the
    broadcast small side of the resume anti-join."""
    import pyarrow.compute as pc
    import ray.data

    prev = ray.data.read_parquet(prev_dir, columns=["url", "identifier"])
    found = prev.map_batches(
        lambda t: t.filter(pc.is_valid(t["identifier"])).select(["url"]),
        batch_format="pyarrow")
    # NOTE scale path: at fleet scale the url set becomes a Bloom filter (or
    # a hash-bucketed anti-join) instead of an exact broadcast set; the
    # operator shape (broadcast small side, filter inside map_batches) stays.
    return {r["url"] for r in found.take_all()}


def drop_resolved_filter(resolved_ref):
    """Batch filter dropping rows whose url is in the broadcast resolved set
    (the anti-join half of the resume, reusable per shard)."""
    import numpy as np
    import pyarrow as pa
    import ray

    def fn(t: pa.Table) -> pa.Table:
        seen = ray.get(resolved_ref)
        mask = np.array([u not in seen for u in t["url"].to_pylist()],
                        dtype=bool)
        return t.filter(pa.array(mask))

    return fn


def previous_found_rows(prev_dir: str, columns: list[str] | None = None):
    """Dataset of the previous run's resolved rows (identifier non-null).
    Pass ``columns`` to push the projection into the parquet read."""
    import pyarrow.compute as pc
    import ray.data

    return ray.data.read_parquet(prev_dir, columns=columns).map_batches(
        lambda t: t.filter(pc.is_valid(t["identifier"])),
        batch_format="pyarrow")


def with_previous_results(pages, prev_dir: str, identify_fn):
    """Broadcast anti-join resume: pages already resolved in ``prev_dir``
    skip the cascade; their previous rows are unioned back in.

    ``identify_fn(pages_subset) -> identifiers`` runs only on the remainder.
    """
    import ray.data

    return with_previous_results_dataset(
        pages, ray.data.read_parquet(prev_dir), identify_fn)


def with_previous_results_dataset(pages, prev_results, identify_fn):
    """:func:`with_previous_results` over an in-memory identifiers
    Dataset — the zero-round-trip variant for callers that just computed
    the previous rows (``identify_incremental``); the dir-based entry is
    a thin parquet-read wrapper over this."""
    import pyarrow.compute as pc
    import ray

    prev_results = prev_results.materialize()
    found = prev_results.map_batches(
        lambda t: t.filter(pc.is_valid(t["identifier"])),
        batch_format="pyarrow")
    resolved = {r["url"] for r in found.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow").take_all()}
    resolved_ref = ray.put(resolved)
    remaining = pages.map_batches(drop_resolved_filter(resolved_ref),
                                  batch_format="pyarrow")
    fresh = identify_fn(remaining)
    return fresh.union(found)


def seed_identifier(out_dir: str, url: str, identifier: str,
                    cfg=None) -> dict:
    """Engine analog of the reference's manual ``-id`` metadata write
    (``main.py:340-353`` → ``finders.py:587-608``): instead of mutating the
    source document, append a pre-seeded result row under ``out_dir``; a
    later run with ``--skip-resolved-from out_dir`` short-circuits this url
    exactly as the reference's method-1 metadata lookup would.

    Fidelity: the seeded value is scanned through the SAME cascade a re-run
    would apply to the stored ``pdf2doi_identifier`` metadata key, so the
    stored row is byte-identical to what that re-run would compute —
    including the empty-string case (the reference's 'reset' idiom), which
    stores a null identifier that the resume anti-join will NOT skip.
    """
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..cascade import identify_row
    from ..config import DEFAULT_CONFIG

    cfg = (cfg or DEFAULT_CONFIG).with_(methods=("document_infos",))
    found = identify_row(url, None, ["pdf2doi_identifier"], [identifier], cfg)
    row = pa.table({
        "url": pa.array([url], type=pa.string()),
        "identifier": pa.array([found.identifier], type=pa.string()),
        "identifier_type": pa.array([found.id_type], type=pa.string()),
        "method": pa.array([found.method], type=pa.string()),
        "validation_info": pa.array([found.validation_info], type=pa.string()),
    })
    part = os.path.join(out_dir, "part=__seed__")
    os.makedirs(part, exist_ok=True)
    # collision-resistant file name: two urls sharing a crc32 would silently
    # overwrite each other's seed row (round-2 advice) — 64-bit blake2b
    digest = hashlib.blake2b(url.encode(), digest_size=8).hexdigest()
    path = os.path.join(part, f"seed-{digest}.parquet")
    pq.write_table(row, path)
    return {"mode": "seed", "url": url,
            "identifier": found.identifier, "path": path}


def dedup_by_url(identifiers):
    """Exact dedup on ``url`` — guards against double-counted rows from
    re-processed partitions (whose duplicates are identical full rows, so
    any representative is correct).

    Two-phase: a vectorized per-batch Arrow combiner (first row per url via
    group_by-min over a row index) shrinks each batch to one row per url
    BEFORE the shuffle; the final per-group head is a zero-copy pyarrow
    slice — no per-group pandas DataFrame construction on the reducers.
    """
    import numpy as np
    import pyarrow as pa

    def batch_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        t2 = t.append_column("_ri", pa.array(np.arange(t.num_rows),
                                             type=pa.int64()))
        g = t2.select(["url", "_ri"]).group_by("url") \
            .aggregate([("_ri", "min")])
        keep = np.sort(np.asarray(g["_ri_min"]))
        return t.take(pa.array(keep))

    def head1(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (identifiers.map_batches(batch_dedup, batch_format="pyarrow")
            .groupby("url").map_groups(head1, batch_format="pyarrow"))
