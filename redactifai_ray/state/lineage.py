"""Per-partition lineage records + resumable partitioned execution.

Replaces the reference's Postgres job table + idempotent overwrite-by-key
outputs (``Job`` state machine PENDING→PROCESSING→COMPLETE/FAILED,
src/db/models.py:13-59; output keyed ``masked/{job_id}.tiff`` so reruns
overwrite, src/tasks.py:134-144) with a filesystem protocol that works on
any Arrow filesystem:

  * the input file listing is split into *partitions* (N files each — at
    cluster scale one partition ≈ one crawl segment);
  * each partition writes outputs under ``{out_root}/pages/part={pid}/``
    (+ ``spans/part={pid}/``) and then atomically records a manifest
    ``{out_root}/_lineage/{pid}.json`` (write temp + rename —
    SURVEY §7.5.6) holding the input fingerprint, row/span counts,
    extractor version, status and wall time;
  * on restart the driver lists completed manifests, verifies fingerprints
    and skips those partitions — ``ray job submit`` reruns are incremental.

Failure isolation: a partition that raises records a ``failed`` manifest
(with the error) and the run continues — the at-least-once / terminal
FAILED semantics of the reference's Celery task (src/tasks.py:45-52,197-226)
without a queue.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Optional, Sequence

import ray.data

from .. import EXTRACTOR_VERSION


def file_fingerprint(path: str) -> str:
    """Cheap input fingerprint: path + size + mtime_ns (content hashing
    would re-read 100 TB; this catches replaced/regenerated inputs)."""
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def partition_inputs(files: Sequence[str], files_per_partition: int = 8) -> list[dict]:
    files = sorted(files)
    parts = []
    for i in range(0, len(files), files_per_partition):
        chunk = list(files[i : i + files_per_partition])
        parts.append(
            {
                "partition_id": f"{i // files_per_partition:06d}",
                "files": chunk,
                "fingerprint": "|".join(file_fingerprint(f) for f in chunk),
            }
        )
    return parts


def _manifest_path(out_root: str, pid: str) -> str:
    return os.path.join(out_root, "_lineage", f"{pid}.json")


def load_manifest(out_root: str, pid: str) -> Optional[dict]:
    p = _manifest_path(out_root, pid)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_manifest(out_root: str, manifest: dict) -> None:
    """Atomic-ish manifest write: temp file + rename (SURVEY §7.5.6)."""
    d = os.path.join(out_root, "_lineage")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{manifest['partition_id']}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, _manifest_path(out_root, manifest["partition_id"]))


def completed_partitions(out_root: str) -> dict[str, dict]:
    d = os.path.join(out_root, "_lineage")
    out = {}
    if os.path.isdir(d):
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    m = json.load(f)
                if m.get("status") == "complete":
                    out[m["partition_id"]] = m
    return out


def run_resumable(
    input_files: Sequence[str],
    out_root: str,
    build_fn: Callable[[list[str]], ray.data.Dataset],
    spans_fn: Optional[Callable[[ray.data.Dataset], ray.data.Dataset]] = None,
    pages_fn: Optional[Callable[[ray.data.Dataset], ray.data.Dataset]] = None,
    files_per_partition: int = 8,
    partition_cols: Optional[list[str]] = None,
) -> dict:
    """Run ``build_fn(files)`` per partition, skipping completed ones.

    Returns a summary dict (the job report analog). Partition outputs land
    under ``pages/part={pid}/`` so a consumer reads ``{out_root}/pages``
    as one dataset.
    """
    parts = partition_inputs(input_files, files_per_partition)
    done = completed_partitions(out_root)
    summary = {"total": len(parts), "skipped": 0, "ran": 0, "failed": 0}

    for part in parts:
        pid = part["partition_id"]
        prior = done.get(pid)
        if prior and prior.get("fingerprint") == part["fingerprint"]:
            summary["skipped"] += 1
            continue
        pages_dir = os.path.join(out_root, "pages", f"part={pid}")
        spans_dir = os.path.join(out_root, "spans", f"part={pid}")
        # a half-written partition from a crashed run: clear and redo
        for d in (pages_dir, spans_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
        t0 = time.perf_counter()
        manifest = {
            "partition_id": pid,
            "fingerprint": part["fingerprint"],
            "files": part["files"],
            "extractor_version": EXTRACTOR_VERSION,
        }
        try:
            ds = build_fn(part["files"])
            if spans_fn is not None:
                # one execution feeds both sinks (partition-bounded
                # materialize — never the whole input)
                out_ds = ds.materialize()
                (pages_fn(out_ds) if pages_fn else out_ds).write_parquet(
                    pages_dir, partition_cols=partition_cols
                )
                spans_ds = spans_fn(out_ds).materialize()
                n_spans = spans_ds.count()
                spans_ds.write_parquet(spans_dir)
                n_rows = out_ds.count()
            else:
                (pages_fn(ds) if pages_fn else ds).write_parquet(pages_dir)
                n_rows = ray.data.read_parquet(pages_dir).count()
                n_spans = 0
            manifest.update(
                status="complete",
                n_rows=int(n_rows),
                n_spans=int(n_spans),
                wall_s=round(time.perf_counter() - t0, 3),
            )
            summary["ran"] += 1
        except Exception as exc:
            manifest.update(
                status="failed",
                error=f"{type(exc).__name__}: {exc}",
                wall_s=round(time.perf_counter() - t0, 3),
            )
            summary["failed"] += 1
        write_manifest(out_root, manifest)
    return summary
