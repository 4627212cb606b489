"""CLI entry: the ``ray job submit`` target (reference entry-point analog:
``deidentify_from_path``, src/services/deidentification_service.py:417-458).

    python -m redactifai_ray.run --input DIR --output DIR
        [--masking-level safe_harbor] [--mask-style token|block]
        [--detect-on extracted|text] [--files-per-partition 8] [--no-dedup]
    python -m redactifai_ray.run --status OUT_ROOT

Re-running with the same --output resumes automatically: completed
partitions (matching lineage fingerprints) are skipped. Owns its Ray
session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="redactifai_ray deidentify pipeline")
    ap.add_argument("--status", metavar="OUT_ROOT",
                    help="print the lineage/job report for a prior run and exit")
    ap.add_argument("--input", help="pages parquet dir or file")
    ap.add_argument("--output", help="output root")
    ap.add_argument(
        "--masking-level",
        default="safe_harbor",
        choices=["safe_harbor", "limited_dataset", "custom"],
    )
    ap.add_argument("--mask-style", default="token", choices=["token", "block"])
    ap.add_argument("--confidence-threshold", type=float, default=0.0)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument(
        "--detect-on", default="extracted", choices=["extracted", "text"],
        help="detect on canonical extracted text, or on the crawl text "
             "column with fuzzy span relocation (EntityMatcher path)",
    )
    ap.add_argument(
        "--extractor", default="dom-density",
        choices=["dom-density", "dom-density-strict"],
        help="extraction profile (registry.EXTRACTORS): default recall-"
             "leaning DOM-density walk, or the strict precision variant",
    )
    ap.add_argument(
        "--detector", default="regex-ner",
        choices=["regex-ner", "trained-ner"],
        help="detection provider (registry.DETECTORS): default warm "
             "regex+heuristic NER, or the corpus-trained gazetteer + "
             "char-trigram name model (trains on a bounded sample of the "
             "input's text column, then runs as an actor pool)",
    )
    ap.add_argument(
        "--ner-sample-rows", type=int, default=50_000,
        help="rows of the input text column sampled to train "
             "--detector trained-ner",
    )
    ap.add_argument(
        "--patterns-file", default=None,
        help="extra detector patterns (YAML/JSON, reference "
             "phi_patterns.yaml schema); shipped example: "
             "redactifai_ray/patterns/webtext_extra.json (IP, credit "
             "card, MAC, IBAN, social handle)",
    )
    ap.add_argument(
        "--blocklist", default=None, metavar="FILE",
        help="text file of blocked registrable domains (one per line, "
             "# comments); pages whose url's registrable domain matches "
             "are dropped before extraction — subdomains inherit",
    )
    ap.add_argument(
        "--canonical-urls", action="store_true",
        help="key url-dedup on the canonical URL form "
             "(functions.urls.canonical_url: lowercase host, strip www./"
             "default port/fragment/tracking params, sort query) so crawl "
             "spelling variants of one page dedup together",
    )
    ap.add_argument(
        "--boilerplate-min-docs", type=int, default=0, metavar="N",
        help="CCNet-style boilerplate removal: drop lines shared by >= N "
             "extracted documents (0 = off). Runs one extra extract-only "
             "stats pass over the full input to build the hot-line "
             "vocabulary, then applies it inside every partition so the "
             "removal is global across resumable partitions",
    )
    ap.add_argument(
        "--host-cap", type=int, default=0, metavar="K",
        help="keep at most K distinct pages per host (newest warc_ts "
             "first, url-ascending ties; 0 = off). Computed ONCE over "
             "the full input via a slim (url, warc_ts) pre-scan so the "
             "cap is global across resumable partitions; above the "
             "loser-broadcast budget it degrades to a per-partition "
             "full-shuffle cut (documented: cap then holds per "
             "partition, a conservative over-keep)",
    )
    ap.add_argument("--files-per-partition", type=int, default=8)
    ap.add_argument(
        "--partition-by", default=None,
        help="hive-partition the pages output by this column (e.g. lang)",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    if args.status:
        from .pipelines.reports import lineage_report

        df = lineage_report(args.status)
        if df.empty:
            print(f"no lineage under {args.status}", file=sys.stderr)
            return 1
        cols = [c for c in ("partition_id", "status", "n_rows", "n_spans",
                            "wall_s", "extractor_version") if c in df.columns]
        print(df[cols].to_string(index=False))
        return 0
    if not args.input or not args.output:
        ap.error("--input and --output are required (or use --status)")

    import ray

    # own the session only if we created it (in-process callers — tests,
    # notebooks — keep theirs; the `ray job submit` path always creates)
    owns_session = not ray.is_initialized()
    if owns_session:
        from .cluster import quiet_ray_data_logging_env

        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            runtime_env={"env_vars": quiet_ray_data_logging_env()},
        )
    from .cluster import configure_data_context

    configure_data_context()
    try:
        from .pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
            spans_table,
        )
        from .state.lineage import run_resumable

        if os.path.isdir(args.input):
            files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        elif os.path.exists(args.input):
            files = [args.input]
        else:
            print(f"error: input not found: {args.input}", file=sys.stderr)
            return 2
        if not files:
            print(f"error: no parquet files under {args.input}", file=sys.stderr)
            return 2

        # url-dedup winners computed ONCE over the FULL input (slim
        # 2-column pre-scan — cheap) so duplicates spanning partition
        # boundaries are caught; per-partition pipelines just apply the
        # shared broadcast filter. Falls back to per-partition dedup when
        # the global winner map would not fit the driver (documented:
        # cross-partition dups can then survive).
        from .pipelines.deidentify import compute_dup_winners

        url_key_fn = None
        if args.canonical_urls:
            from .functions.urls import canonical_url

            url_key_fn = canonical_url

        global_winners = None
        if not args.no_dedup:
            global_winners = compute_dup_winners(files, key_fn=url_key_fn)

        host_losers = None
        host_cap_fallback = False
        if args.host_cap > 0:
            from .pipelines.deidentify import compute_host_cap_losers

            host_losers = compute_host_cap_losers(files, args.host_cap)
            if host_losers is None:  # over the loser-broadcast budget
                host_cap_fallback = True
                print(
                    "warning: host-cap loser set over budget; capping "
                    "per partition (full-shuffle cut)",
                    file=sys.stderr,
                )

        extra_patterns = None
        if args.patterns_file:
            from .stages.content import load_patterns_file

            extra_patterns = load_patterns_file(args.patterns_file)

        # trained detector: one bounded training scan over the FULL input
        # file list (so every resumable partition detects with the same
        # model), broadcast once via ray.put
        detector_init = None
        if args.detector == "trained-ner":
            from .stages.ner import train_ner_from_files

            model = train_ner_from_files(files, sample_rows=args.ner_sample_rows)
            detector_init = {"model_ref": ray.put(model)}

        # boilerplate vocabulary: one extract-only stats pass over the
        # FULL input (the CCNet production shape — stats job, then apply
        # job) so removal is global even across resumable partitions.
        # The hot set is a boilerplate vocabulary (nav/footer lines),
        # naturally ≪ corpus; the cap guards the driver gather.
        boilerplate_hot = None
        if args.boilerplate_min_docs > 0:
            import numpy as np

            from .sources.pages import read_pages
            from .stages.curate import hot_line_hashes
            from .stages.extract import make_extract_batch

            extracted = read_pages(files).map_batches(
                make_extract_batch(extractor=args.extractor),
                batch_format="pyarrow",
            )
            hot = hot_line_hashes(
                extracted, "extracted_text", args.boilerplate_min_docs
            )
            chunks = [
                b["lh"].to_numpy(zero_copy_only=False)
                for b in hot.iter_batches(
                    batch_size=None, batch_format="pyarrow"
                )
            ]
            boilerplate_hot = (
                np.concatenate(chunks).astype(np.uint64)
                if chunks
                else np.empty(0, dtype=np.uint64)
            )

        blocked = None
        if args.blocklist:
            with open(args.blocklist) as f:
                blocked = [
                    ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")
                ]

        def build(part_files):
            pipe_input = part_files
            if blocked:
                from .functions.urls import filter_blocklist
                from .sources.pages import read_pages as _rp

                pipe_input = filter_blocklist(
                    _rp(part_files, include_text=(args.detect_on == "text")),
                    blocked,
                )
            if host_cap_fallback:
                from .pipelines.deidentify import cap_per_host
                from .sources.pages import read_pages as _rp2

                if not isinstance(pipe_input, ray.data.Dataset):
                    pipe_input = _rp2(
                        part_files,
                        include_text=(args.detect_on == "text"),
                    )
                pipe_input = cap_per_host(pipe_input, args.host_cap)
            return build_deidentify_pipeline(
                pipe_input,
                masking_level=args.masking_level,
                confidence_threshold=args.confidence_threshold,
                mask_style=args.mask_style,
                dedup=not args.no_dedup,
                detect_on=args.detect_on,
                extractor=args.extractor,
                detector=args.detector,
                detector_init=detector_init,
                dup_winners=global_winners,
                host_cap_losers=host_losers,
                extra_patterns=extra_patterns,
                boilerplate_hot=boilerplate_hot,
                url_key_fn=url_key_fn,
            )

        from .stages.extract import EXTRACT_PROFILES

        # the manifest's version guard is a pipeline-config fingerprint:
        # fold the (non-default) detector in so a resume with a different
        # provider reruns instead of mixing detector outputs (ADVICE r2)
        config_version = EXTRACT_PROFILES[args.extractor]["version"]
        if args.detector != "regex-ner":
            config_version += f"+{args.detector}"
        if args.boilerplate_min_docs > 0:
            config_version += f"+bp{args.boilerplate_min_docs}"
        if args.canonical_urls:
            config_version += "+canon"
        if args.host_cap > 0:
            config_version += f"+hc{args.host_cap}"
        if blocked:
            import hashlib as _hl

            config_version += "+bl" + _hl.md5(
                "\n".join(sorted(blocked)).encode()
            ).hexdigest()[:8]

        summary = run_resumable(
            files,
            args.output,
            build,
            spans_fn=spans_table,
            pages_fn=finalize_output,
            files_per_partition=args.files_per_partition,
            partition_cols=[args.partition_by] if args.partition_by else None,
            extractor_version=config_version,
        )
        print(json.dumps(summary))
        return 0 if summary["failed"] == 0 else 1
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
