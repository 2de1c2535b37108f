"""Job entry point: ``python -m pdf2doi_ray.run`` (``ray job submit`` target).

Mirrors the reference CLI's offline-relevant flags
(``/root/reference/pdf2doi/main.py:244-378``): the google/web flags are
omitted because the engine targets offline extraction (web stages are
pluggable actor pools, off by default, matching ``-nws -nwv``).

Examples::

    # extract identifiers from a pages parquet table, checkpointed per shard
    python -m pdf2doi_ray.run --input /data/pages --output /out/run1

    # resume after interruption: already-manifested shards are skipped
    python -m pdf2doi_ray.run --input /data/pages --output /out/run1

    # synthesize the deterministic fixture table first (testing)
    python -m pdf2doi_ray.run --synth-sf-dir /root/testdata/sf0.001 \
        --output /tmp/out

    # ray job submit -- python -m pdf2doi_ray.run --input ... --output ...
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pdf2doi_ray",
        description="Ray-Data-native DOI/arXiv identifier extraction over "
                    "Common-Crawl-style pages parquet")
    src = p.add_mutually_exclusive_group(required=False)
    src.add_argument("--input", help="pages parquet file or directory "
                                     "(url, warc_ts, html, text, lang)")
    src.add_argument("--synth-sf-dir",
                     help="synthesize the deterministic pages table from "
                          "this testdata dir instead of reading --input")
    src.add_argument("--set-id", nargs=2, metavar=("URL", "IDENTIFIER"),
                     help="manually pre-seed one url's identifier into the "
                          "output (the reference's -id metadata write, "
                          "main.py:340-353); an empty IDENTIFIER resets. "
                          "Nothing else runs.")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--replication", type=int, default=1,
                   help="pages per document when synthesizing")
    p.add_argument("--no-arxiv2doi", action="store_true",
                   help="keep arXiv IDs instead of the (offline-degrading) "
                        "arXiv→DOI rewrite (reference -no_arxiv2doi)")
    p.add_argument("--text-only", action="store_true",
                   help="trust the pre-extracted text column; skip html parse")
    p.add_argument("--skip-resolved-from", metavar="PREV_OUT",
                   help="broadcast anti-join: skip urls already resolved by "
                        "a previous run's output and union its rows in")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="single streaming write instead of per-shard "
                        "checkpointed partitions")
    p.add_argument("--stats", action="store_true",
                   help="print per-method counts after the run")
    p.add_argument("--report", metavar="FILE",
                   help="also write the reference-format fixed-width "
                        "identifier report to FILE")
    p.add_argument("--clip", metavar="FILE", nargs="?", const="-",
                   help="reference -clip parity: newline-join the VALIDATED "
                        "identifiers (url order) to the system clipboard if "
                        "pyperclip is available, plus FILE (or stdout)")
    p.add_argument("--online", action="store_true",
                   help="enable BOTH online stages (websearch methods 4-5 "
                        "and dx.doi.org-style validation) with real "
                        "requests/googlesearch transports constructed at "
                        "startup; equivalent to --websearch --webvalidation")
    p.add_argument("--websearch", action="store_true",
                   help="enable the google-search finder methods (reference "
                        "default; our offline default mirrors -nws)")
    p.add_argument("--webvalidation", action="store_true",
                   help="enable web validation of extracted identifiers "
                        "(reference default; our offline default mirrors "
                        "-nwv)")
    p.add_argument("--config-ini", metavar="INI",
                   help="load EngineConfig overrides from an INI file "
                        "(CLI flags still win)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all)")
    return p


def resolve_config(base, args):
    """CLI flags → EngineConfig (pure; the flag→config seam tests hook).
    ``--online`` is shorthand for both online stages; INI-enabled online
    flags survive (CLI can only turn them ON, mirroring how the reference's
    -nwv/-nws only turn them OFF)."""
    return base.with_(
        replace_arxiv_by_doi=(base.replace_arxiv_by_doi
                              and not args.no_arxiv2doi),
        use_html=base.use_html and not args.text_only,
        websearch=base.websearch or args.online or args.websearch,
        webvalidation=(base.webvalidation or args.online
                       or args.webvalidation),
    )


def _check_pages_schema(path: str, cols) -> None:
    """Fail fast with a readable message when --input is not a pages
    table (the raw KeyError from the parquet reader names the column but
    not the fix: testdata sf dirs go through --synth-sf-dir)."""
    import glob
    import os

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            raise SystemExit(f"--input {path}: no parquet files found")
        probe = files[0]
    names = set(pq.read_schema(probe).names)
    missing = [c for c in cols if c not in names]
    if missing:
        raise SystemExit(
            f"--input {path}: parquet schema lacks column(s) {missing} "
            f"(has {sorted(names)}); expected a pages table "
            "(url, warc_ts, html, text, lang). For a testdata sf dir "
            "use --synth-sf-dir instead.")


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not (args.input or args.synth_sf_dir or args.set_id):
        parser.error("one of --input / --synth-sf-dir / --set-id is required")

    if args.set_id:
        # driver-side single-row write; no Ray session needed (reference
        # parity: '-id' writes the metadata and exits, main.py:347-352)
        from .state.checkpoint import seed_identifier

        url, identifier = args.set_id
        print(json.dumps(seed_identifier(args.output, url, identifier)))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from .config import DEFAULT_CONFIG
    from .pipelines.identify import identify_pages, method_stats
    from .state.checkpoint import (
        checkpointed_run,
        drop_resolved_filter,
        previous_found_rows,
        previous_result_urls,
        with_previous_results,
    )

    base = DEFAULT_CONFIG
    if args.config_ini:
        from .config import from_ini
        base = from_ini(args.config_ini)
    cfg = resolve_config(base, args)

    # flag → constructed transports, eagerly on the driver: a missing HTTP
    # library fails here, not inside a worker actor mid-run
    online = {}
    if cfg.websearch or cfg.webvalidation:
        from .transports import online_splices
        online = dict(online_splices(cfg))

    # In single-write modes the resume union happens inline (its helper
    # builds its own broadcast); in checkpointed mode the anti-join filter
    # runs per shard from ONE broadcast set, and the previous rows are
    # written ONCE as their own partition (unioning them per shard would
    # duplicate every resolved row once per input shard).
    checkpointed = not (args.synth_sf_dir or args.no_checkpoint)
    resolved_ref = None
    if args.skip_resolved_from and checkpointed:
        resolved_ref = ray.put(previous_result_urls(args.skip_resolved_from))

    def identify(ds):
        if online:
            from .pipelines.identify import identify_pages_online
            return identify_pages_online(ds, cfg, online)
        return identify_pages(ds, cfg)

    def build_single(ds):
        if args.skip_resolved_from:
            return with_previous_results(
                ds, args.skip_resolved_from, identify)
        return identify(ds)

    def build_shard(ds):
        if resolved_ref is not None:
            ds = ds.map_batches(drop_resolved_filter(resolved_ref),
                                batch_format="pyarrow")
        return identify(ds)

    if args.synth_sf_dir:
        from .sources.pages import pages_dataset

        pages = pages_dataset(args.synth_sf_dir, replication=args.replication)
        out = build_single(pages)
        out.write_parquet(args.output)
        summary = {"rows_out": "written", "mode": "synth-single-write"}
    elif args.no_checkpoint:
        import ray.data

        cols = ["url", "text", "lang"] if args.text_only \
            else ["url", "html", "lang"]
        _check_pages_schema(args.input, cols)
        pages = ray.data.read_parquet(args.input, columns=cols)
        build_single(pages).write_parquet(args.output)
        summary = {"rows_out": "written", "mode": "single-write"}
    else:
        cols = ["url", "text", "lang"] if args.text_only \
            else ["url", "html", "lang"]
        _check_pages_schema(args.input, cols)
        summary = checkpointed_run(args.input, args.output, build_shard,
                                   columns=cols)
        summary["mode"] = "checkpointed"
        if args.skip_resolved_from:
            # previous resolved rows become their own partition, exactly
            # once, published atomically (temp dir + rename) so a crash
            # mid-write cannot leave a partial dir that blocks the rerun
            import os
            import shutil

            prev_part = os.path.join(args.output, "part=__previous__")
            if not os.path.isdir(prev_part):
                tmp = os.path.join(args.output, "_tmp___previous__")
                shutil.rmtree(tmp, ignore_errors=True)
                previous_found_rows(args.skip_resolved_from) \
                    .write_parquet(tmp)
                os.rename(tmp, prev_part)

    if args.stats:
        import ray.data

        stats = method_stats(ray.data.read_parquet(args.output)).to_pandas()
        summary["method_stats"] = {
            str(r["method"]): int(r["n_rows"])
            for _, r in stats.iterrows()}

    if args.report:
        import ray.data

        from .pipelines.identify import write_report

        ids = ray.data.read_parquet(args.output)
        summary["report_lines"] = write_report(ids, args.report)

    if args.clip:
        import ray.data

        from .pipelines.identify import clip_sink

        ids = ray.data.read_parquet(args.output)
        text = clip_sink(ids, None if args.clip == "-" else args.clip)
        if args.clip == "-":
            sys.stdout.write(text)
        summary["clip_identifiers"] = text.count("\n")

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
