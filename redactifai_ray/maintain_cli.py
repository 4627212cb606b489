"""Table-maintenance CLI: the lakehouse OPTIMIZE surface over the
output directories the other two CLIs produce.

    python -m redactifai_ray.maintain_cli compact --input DIR --output DIR
        [--target-mb N] [--columns a,b]
    python -m redactifai_ray.maintain_cli cluster --input DIR --output DIR
        --by COL [--columns a,b]
    python -m redactifai_ray.maintain_cli zonemap --input DIR --by COL
        [--output MANIFEST_DIR]
    python -m redactifai_ray.maintain_cli prune-count --input DIR --by COL
        --lo V --hi V
    python -m redactifai_ray.maintain_cli bucketize --input DIR --output DIR
        --key COL --buckets N [--columns a,b]
    python -m redactifai_ray.maintain_cli bucket-join --left DIR --right DIR
        --key COL --buckets N --output DIR [--how inner] [--columns-left a,b]
        [--columns-right c,d] [--max-task-mb M]

Subcommands map 1:1 onto ``pipelines/maintenance.py``: ``compact``
rewrites small files into ≈target-MB files (footer-only planning),
``cluster`` range-sorts so files cover disjoint key ranges, ``zonemap``
writes/prints the per-file min/max manifest (footer statistics only —
no data pages read), and ``prune-count`` demonstrates the zone-map scan
path (files skipped + matching-row count). ``lo``/``hi`` parse as ints
when possible, else floats, else stay strings (parquet stats compare in
the column's type).

Prints ONE JSON line per invocation. Owns its Ray session only when it
creates it (same contract as run.py / curate_cli)."""

from __future__ import annotations

import argparse
import json
import sys


def _parse_bound(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="redactifai_ray maintenance")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compact")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--target-mb", type=int, default=256)
    p.add_argument("--columns", default=None)

    p = sub.add_parser("cluster")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--by", required=True)
    p.add_argument("--columns", default=None)

    p = sub.add_parser("zonemap")
    p.add_argument("--input", required=True)
    p.add_argument("--by", required=True)
    p.add_argument("--output", default=None,
                   help="write the manifest parquet here instead of "
                        "printing row counts only")

    p = sub.add_parser("prune-count")
    p.add_argument("--input", required=True)
    p.add_argument("--by", required=True)
    p.add_argument("--lo", required=True)
    p.add_argument("--hi", required=True)

    p = sub.add_parser("bucketize")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--key", required=True)
    p.add_argument("--buckets", type=int, required=True)
    p.add_argument("--columns", default=None)

    p = sub.add_parser("bucket-join")
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--key", required=True)
    p.add_argument("--buckets", type=int, required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--how", default="inner")
    p.add_argument("--columns-left", default=None)
    p.add_argument("--columns-right", default=None)
    p.add_argument("--max-task-mb", type=int, default=1024)

    for sp in sub.choices.values():
        sp.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args(argv)

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
        from .pipelines import maintenance as m

        cols = args.columns.split(",") if getattr(args, "columns", None) else None
        if args.cmd == "compact":
            out = m.compact_parquet(
                args.input, args.output, target_mb=args.target_mb,
                columns=cols,
            )
        elif args.cmd == "cluster":
            by = args.by.split(",")
            if len(by) > 1:  # multi-column -> Z-order clustering
                out = m.cluster_by_zorder(args.input, args.output, cols=by,
                                          columns=cols)
            else:
                out = m.cluster_by(args.input, args.output, col=by[0],
                                   columns=cols)
        elif args.cmd == "zonemap":
            zm = m.build_zonemap(args.input, args.by)
            if args.output:
                zm.write_parquet(args.output)
                out = {"files": zm.count(), "manifest": args.output}
            else:
                df = zm.to_pandas()
                out = {
                    "files": len(df),
                    "rows": int(df["n_rows"].sum()) if len(df) else 0,
                }
        elif args.cmd == "bucketize":
            out = m.bucketize_write(
                args.input, args.output, key=args.key,
                n_buckets=args.buckets, columns=cols,
            )
        elif args.cmd == "bucket-join":
            joined = m.bucket_join(
                args.left, args.right, key=args.key,
                n_buckets=args.buckets, how=args.how,
                columns_a=(args.columns_left.split(",")
                           if args.columns_left else None),
                columns_b=(args.columns_right.split(",")
                           if args.columns_right else None),
                max_task_bytes=args.max_task_mb << 20,
            )
            joined.write_parquet(args.output)
            import pyarrow.dataset as pads

            outds = pads.dataset(args.output, format="parquet")
            out = {
                "files_out": len(list(outds.files)),
                "rows_out": sum(
                    f.metadata.num_rows for f in outds.get_fragments()
                ),
            }
        else:  # prune-count
            ds, stats = m.pruned_read(
                args.input, args.by,
                _parse_bound(args.lo), _parse_bound(args.hi),
            )
            out = {**stats, "rows_matched": ds.count()}
        print(json.dumps(out))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
