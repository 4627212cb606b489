"""sf1 data-scale witness (round-4 VERDICT next-round #5).

The scaling gate measures across CORES (4 vs 16 cpus, same data); this
script measures across DATA: the same three headline ops — flagship
deidentify, exact dedup, MinHash+LSH candidate pairs — at sf0.1
(400k pages) and sf1 (4M pages, ~16 GB html) in ONE window at 32 vCPU,
reporting both walls plus the wall ratio vs the 10x data ratio.

Linearity (ratio ~<= 10) is the pass signal: a superlinear blowup would
indicate a stage that materializes or shuffles the whole corpus; an OOM
would indicate a batch/block sizing bug. Corpus generation is untimed
setup (cached under /tmp, same fixture family as bench.py).

Run from /root/repo:  python scripts/sf1_witness.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

N_SMALL = 400_000   # = bench.py sf0.1 protocol
N_LARGE = 4_000_000  # = sf1 (10x)
SEED = 42


def _ensure_pages(n: int) -> str:
    import glob
    import os

    from redactifai_ray.fixtures import write_pages_parquet

    out = f"/tmp/rrx_pages_n{n}_rpf5000_seed{SEED}"
    if not glob.glob(os.path.join(out, "*.parquet")):
        write_pages_parquet(out, n, rows_per_file=5000)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    for _name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(_name).setLevel(logging.ERROR)

    from redactifai_ray.cluster import configure_data_context

    configure_data_context()

    t0 = time.perf_counter()
    small = _ensure_pages(N_SMALL)
    large = _ensure_pages(N_LARGE)
    print(f"[setup] corpora ready in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    import ray.data

    from redactifai_ray.pipelines.deidentify import (
        build_deidentify_pipeline,
        finalize_output,
    )
    from redactifai_ray.stages.dedup import exact_dedup, minhash_lsh_pairs

    def flagship(pages_dir: str) -> None:
        out = "/tmp/rrx_sf1_witness_out"
        shutil.rmtree(out, ignore_errors=True)
        finalize_output(build_deidentify_pipeline(pages_dir)).write_parquet(out)

    def _df_free_gb() -> float:
        du = shutil.disk_usage("/tmp")
        return round(du.free / 2**30, 1)

    import pyarrow as pa
    import pyarrow.compute as pc

    from redactifai_ray.functions.hashing import stable_hash64

    def _texts(pages_dir: str) -> ray.data.Dataset:
        # pages carry the fixture's gold `text` column; ~14% are NULL
        # (empty/boilerplate pages) — drop them so the op matches the
        # documents-table semantics bench.py compares against instead
        # of measuring one artificial 560k-member hash group. The
        # near-dup family is int64-keyed (slim pair exchanges), so
        # derive doc_id = stable_hash64(url), exactly as a CC-scale
        # user of these ops would.
        def prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["text"]))
            ids = [
                stable_hash64(u) >> 1  # int64-positive
                for u in t["url"].to_pylist()
            ]
            return t.append_column("doc_id", pa.array(ids, pa.int64()))

        return ray.data.read_parquet(
            pages_dir, columns=["url", "text"]
        ).map_batches(prep, batch_format="pyarrow")

    def dedup(pages_dir: str) -> int:
        return exact_dedup(
            _texts(pages_dir), text_col="text", id_col="doc_id"
        ).count()

    def minhash(pages_dir: str) -> int:
        return minhash_lsh_pairs(
            _texts(pages_dir), text_col="text", id_col="doc_id",
            threshold=0.5,
        ).count()

    # warm worker processes + detector caches so sf0.1 (first) is not
    # penalized by cold start relative to sf1
    flagship(_ensure_pages(2000))

    results: dict[str, dict] = {}
    for name, fn in (("flagship", flagship), ("dedup_exact", dedup),
                     ("minhash_pairs", minhash)):
        per: dict[str, float] = {}
        for label, pages_dir, n in (("sf0.1", small, N_SMALL),
                                    ("sf1", large, N_LARGE)):
            t0 = time.perf_counter()
            out = fn(pages_dir)
            dt = time.perf_counter() - t0
            per[label] = round(dt, 2)
            per[f"{label}_pages_per_sec"] = round(n / dt, 1)
            if isinstance(out, int):
                per[f"{label}_rows"] = out
            print(f"[{name}] {label}: {dt:.1f}s (disk free {_df_free_gb()}G)",
                  file=sys.stderr)
        per["wall_ratio_10x_data"] = round(per["sf1"] / per["sf0.1"], 2)
        results[name] = per
        # the flagship's 10 GB witness output is dead weight for the
        # remaining legs — free it so object-store spill has headroom
        shutil.rmtree("/tmp/rrx_sf1_witness_out", ignore_errors=True)

    ray.shutdown()
    print(json.dumps({"witness": "sf1_data_scale", "num_cpus": 32,
                      "n_small": N_SMALL, "n_large": N_LARGE,
                      "ops": results}))


if __name__ == "__main__":
    main()
