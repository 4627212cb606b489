"""Corpus-curation CLI: the training-data counterpart of ``run.py``.

Chains the curation operators into one streaming job over a documents
table — the cleaning→dedup→carve sequence a 100 TB webtext corpus runs
between extraction/masking (``run.py``'s output) and training:

    python -m redactifai_ray.curate_cli --input DOCS --output DIR
        [--normalize] [--gopher]
        [--dedup exact|paragraph|near|jaccard|none]
        [--dedup-store DIR --dedup-store-mode exact|near]
        [--decontaminate TEST_PARQUET [--decontaminate-bloom]]
        [--split 80,10,10]
        [--mixture source=weight,...] [--shard-tokens N]
        [--pack-sequences L]

Stage order (each optional, all lazy — ONE streaming execution writes
the documents output; dedup/decontamination add their own slim
pre-scans, never a full-corpus materialization):

1. normalize   — NFC + lowercase + whitespace collapse (pre-hash canon)
1b. dedup-lines — intra-document first-wins line dedup (zero-shuffle)
2. gopher      — composite quality gate (drops keep=false rows)
3. dedup       — exact (min-id per content hash), paragraph
                 (chunk-level first-wins), MinHash near-dedup,
                 exact-recall Jaccard dedup (prefix-filter join), or
                 the incremental cross-run store (exact hash store or
                 band+signature near store)
4. decontaminate — drop docs sharing a 13-gram with the test set
                 (--decontaminate-bloom: constant-size Bloom broadcast,
                 FPs over-remove at ~1e-4)
5. mixture     — deterministic per-source downsampling
6. split       — md5-bucket train/val/test labels; output is
                 hive-partitioned by split so each carve is one subtree
7. shard-tokens — token-budget shard manifest (distributed prefix sum)
                 written alongside as ``shards/``
8. pack-sequences — fixed-length (L-token) dense sequence packing plan
                 (per-doc first/last sequence + offsets) written
                 alongside as ``sequences/``

Prints ONE JSON line: rows in/out, per-split counts, shard and
sequence counts.
Owns its Ray session only when it creates it (same contract as run.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="redactifai_ray corpus curation")
    ap.add_argument("--input", required=True,
                    help="documents parquet file or directory")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--dedup-lines", action="store_true",
                    help="intra-document first-wins line dedup (empty "
                         "lines kept), before the quality gate")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC+lower+whitespace-collapse the text column first")
    ap.add_argument("--max-pii-bp", type=int, default=None, metavar="N",
                    help="drop docs whose regex-PII density (spans per "
                         "10k chars, Email/Phone/SSN) exceeds N basis "
                         "points — gate instead of mask")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher composite quality gate")
    ap.add_argument("--dedup", default="none",
                    choices=["none", "exact", "paragraph", "near",
                             "jaccard"],
                    help="exact content dedup, paragraph-level first-wins, "
                         "MinHash-LSH near-dedup (keep one per cluster), "
                         "or exact-recall Jaccard dedup (prefix-filter "
                         "join — no qualifying pair missed)")
    ap.add_argument("--near-threshold", type=float, default=0.8,
                    help="Jaccard threshold for --dedup near/jaccard "
                         "(jaccard mode converts the decimal to an exact "
                         "integer fraction)")
    ap.add_argument("--dedup-store-mode", default="exact",
                    choices=["exact", "near"],
                    help="incremental store flavor: exact content hashes, "
                         "or MinHash near-dup (band+signature store, "
                         "--near-threshold applies)")
    ap.add_argument("--dedup-store", default=None, metavar="DIR",
                    help="incremental mode: dedup this input against the "
                         "persisted content-hash store at DIR (and within "
                         "itself), then append this run's surviving hashes "
                         "under DIR/run=<name of the output dir>. The run "
                         "name identifies an attempt-idempotent increment: "
                         "a retry with the same output dir never dedups "
                         "against its own crashed attempt and overwrites "
                         "its store subdir. Combine with --dedup none; "
                         "mutually exclusive with other dedup modes")
    ap.add_argument("--substr-dedup", type=int, default=None, metavar="K",
                    help="ExactSubstr-style cross-document substring "
                         "dedup: remove K-token windows shared with a "
                         "lower-id document (first doc wins; runs after "
                         "the doc-level dedup stage)")
    ap.add_argument("--decontaminate-bloom", action="store_true",
                    help="use the constant-size Bloom broadcast for "
                    "--decontaminate (FPs over-remove at ~1e-4; the "
                    "test-side broadcast stops scaling with gram count)")
    ap.add_argument("--decontaminate", default=None, metavar="TEST_PARQUET",
                    help="parquet of eval documents; drop training docs "
                         "sharing a 13-gram with it")
    ap.add_argument("--mixture", default=None, metavar="K=W,...",
                    help="per-source keep weights, e.g. web=0.5,wiki=1.0")
    ap.add_argument("--temperature", type=float, default=None,
                    metavar="ALPHA",
                    help="temperature-resample by --temperature-col "
                         "(rate (n_min/n)^(1-ALPHA); ALPHA=1 natural, "
                         "0 uniform); mutually exclusive with --mixture")
    ap.add_argument("--temperature-col", default="source",
                    help="key column for --temperature (default source)")
    ap.add_argument("--split", default=None, metavar="TRAIN,VAL,TEST",
                    help="percent widths, e.g. 80,10,10 — output partitions "
                         "by the split label")
    ap.add_argument("--shard-tokens", type=int, default=0, metavar="N",
                    help="also write a token-budget shard manifest "
                         "(~N tokens per shard)")
    ap.add_argument("--pack-sequences", type=int, default=0, metavar="L",
                    help="also write a fixed-length sequence packing plan "
                         "(L tokens per training sequence, dense GPT-style "
                         "packing) under sequences/")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.decontaminate_bloom and not args.decontaminate:
        ap.error("--decontaminate-bloom requires --decontaminate TEST_PARQUET")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        from .cluster import quiet_ray_data_logging_env

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 runtime_env={"env_vars": quiet_ray_data_logging_env()})
    from .cluster import configure_data_context

    configure_data_context()
    try:
        import pyarrow.dataset as pads
        import ray.data

        if os.path.isdir(args.input):
            files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        else:
            files = [args.input]
        if not files:
            print(f"error: no parquet under {args.input}", file=sys.stderr)
            return 2
        rows_in = pads.dataset(files).count_rows()
        ds = ray.data.read_parquet(files)

        if args.normalize:
            from .stages.analyze import normalize_text

            ds = normalize_text(ds, text_col=args.text_col)
        if args.dedup_lines:
            from .stages.curate import dedup_lines

            ds = dedup_lines(ds, text_col=args.text_col).drop_columns(
                ["n_lines", "n_lines_kept"]
            )
        if args.gopher:
            from .stages.curate import gopher_gate

            ds = gopher_gate(ds, text_col=args.text_col)
        if args.max_pii_bp is not None:
            from .stages.curate import pii_gate

            ds = pii_gate(ds, max_bp=args.max_pii_bp,
                          text_col=args.text_col)
        if args.dedup_store and args.dedup != "none":
            print("error: --dedup-store requires --dedup none",
                  file=sys.stderr)
            return 2
        if args.dedup_store:
            run_name = os.path.basename(os.path.normpath(args.output))
            if args.dedup_store_mode == "near":
                from .stages.dedup import incremental_minhash_dedup

                ds = incremental_minhash_dedup(
                    ds, args.dedup_store,
                    text_col=args.text_col, id_col=args.id_col,
                    run_id=run_name, threshold=args.near_threshold,
                )
            else:
                from .stages.dedup import incremental_exact_dedup

                ds = incremental_exact_dedup(
                    ds, args.dedup_store,
                    text_col=args.text_col, id_col=args.id_col,
                    run_id=run_name,
                )
        elif args.dedup == "exact":
            from .stages.dedup import exact_dedup

            ds = exact_dedup(ds, text_col=args.text_col, id_col=args.id_col)
        elif args.dedup == "paragraph":
            from .stages.curate import chunk_dedup

            ds = chunk_dedup(ds, text_col=args.text_col, id_col=args.id_col)
        elif args.dedup == "near":
            from .stages.dedup import near_dedup

            ds = near_dedup(
                ds, threshold=args.near_threshold,
                text_col=args.text_col, id_col=args.id_col,
            )
        elif args.dedup == "jaccard":
            from fractions import Fraction

            from .stages.dedup import jaccard_dedup

            # exact decimal → integer fraction so the in-fold threshold
            # compare is cross-multiplied int math (no float anywhere)
            fr = Fraction(str(args.near_threshold)).limit_denominator(
                10**6
            )
            ds = jaccard_dedup(
                ds, threshold=(fr.numerator, fr.denominator),
                text_col=args.text_col, id_col=args.id_col,
            )
        if args.substr_dedup:
            from .stages.curate import remove_repeated_substrings

            ds = remove_repeated_substrings(
                ds, text_col=args.text_col, id_col=args.id_col,
                k=args.substr_dedup,
            )
        if args.decontaminate:
            from .stages.curate import decontaminate, decontaminate_bloom

            test = ray.data.read_parquet(args.decontaminate)
            decon = (
                decontaminate_bloom if args.decontaminate_bloom
                else decontaminate
            )
            ds = decon(
                ds, test, text_col=args.text_col, id_col=args.id_col
            )
        if args.mixture:
            from .stages.curate import mixture_sample

            weights = {}
            for part in args.mixture.split(","):
                k, w = part.split("=", 1)
                weights[k] = float(w)
            ds = mixture_sample(ds, weights, id_col=args.id_col)
        if args.temperature is not None:
            if args.mixture:
                ap.error("--temperature and --mixture are exclusive")
            from .stages.curate import temperature_mixture

            ds = temperature_mixture(
                ds,
                alpha=args.temperature,
                key_col=args.temperature_col,
                id_col=args.id_col,
            )
        partition_cols = None
        if args.split:
            from .stages.curate import assign_split

            widths = [int(x) for x in args.split.split(",")]
            names = ["train", "val", "test"][: len(widths)]
            ds = assign_split(
                ds, id_col=args.id_col,
                splits=list(zip(names, widths)),
                n_buckets=sum(widths),
            )
            partition_cols = ["split"]

        # A re-run into the same output root must REPLACE the previous
        # attempt, not append beside it — Ray's write_parquet adds new
        # files into an existing dir, silently doubling docs/shards on
        # retry (the same attempt-idempotency contract as the dedup
        # store's run=<id> overwrite).
        import shutil

        docs_dir = os.path.join(args.output, "docs")
        for sub in ("docs", "shards", "sequences"):
            shutil.rmtree(os.path.join(args.output, sub), ignore_errors=True)
        ds.write_parquet(docs_dir, partition_cols=partition_cols)

        wrote_any = bool(
            glob.glob(os.path.join(docs_dir, "**", "*.parquet"),
                      recursive=True)
        )
        rows_out = 0
        split_counts = {}
        if wrote_any:
            out_ds = ray.data.read_parquet(docs_dir)
            rows_out = out_ds.count()
            if partition_cols:
                from .collect import collect_table

                sct = collect_table(out_ds.groupby("split").count())
                if "split" in sct.column_names:
                    split_counts = dict(
                        zip(
                            sct.column("split").to_pylist(),
                            sct.column("count()").to_pylist(),
                        )
                    )

        n_shards = 0
        if wrote_any and args.shard_tokens > 0:
            from .stages.curate import token_shards

            shards = token_shards(
                ray.data.read_parquet(docs_dir),
                text_col=args.text_col,
                id_col=args.id_col,
                budget=args.shard_tokens,
            )
            shards_dir = os.path.join(args.output, "shards")
            shards.write_parquet(shards_dir)
            n_shards = int(
                ray.data.read_parquet(shards_dir, columns=["shard_id"])
                .groupby("shard_id")
                .count()
                .count()
            )

        n_sequences = 0
        if wrote_any and args.pack_sequences > 0:
            from .stages.curate import pack_sequences

            plan = pack_sequences(
                ray.data.read_parquet(docs_dir),
                text_col=args.text_col,
                id_col=args.id_col,
                seq_len=args.pack_sequences,
            )
            seq_dir = os.path.join(args.output, "sequences")
            plan.write_parquet(seq_dir)
            last = ray.data.read_parquet(
                seq_dir, columns=["last_seq"]
            ).max("last_seq")
            n_sequences = int(last) + 1 if last is not None else 0

        print(json.dumps({
            "rows_in": rows_in,
            "rows_out": rows_out,
            "splits": split_counts,
            "n_shards": n_shards,
            "n_sequences": n_sequences,
        }))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
