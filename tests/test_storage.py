"""Remote-filesystem + resume-integrity tests (reference analog: S3
storage behind one interface, tests/unit/test_storage.py:133-193 via moto).

No S3 server exists in this environment, so the remote path is exercised
through the same abstraction seams an S3 deployment uses:

  * lineage manifests + input fingerprints on an fsspec ``memory://``
    filesystem (a genuinely non-local protocol: no os.stat, no os paths);
  * parquet data writes through an explicit ``pyarrow.fs`` filesystem
    object (SubTreeFileSystem — the injection point where S3FileSystem
    plugs in; memory:// cannot carry the data plane because Ray write
    tasks run in other processes and fsspec's memory store is
    process-local).
"""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def mem_fs():
    import fsspec

    fs = fsspec.filesystem("memory")
    # memory:// store is global per process — isolate per test
    for path in list(fs.store):
        fs.rm(path)
    return fs


def _write_mem_parquet(fs, path: str, n: int, base: int = 0) -> None:
    t = pa.table(
        {
            "url": pa.array([f"http://m/{base + i}" for i in range(n)]),
            "val": pa.array(list(range(n)), pa.int64()),
        }
    )
    with fs.open(path, "wb") as f:
        pq.write_table(t, f)


class TestLineageOnMemoryFS:
    def test_fingerprint_uses_fs_info(self, mem_fs):
        from redactifai_ray.state.lineage import file_fingerprint

        _write_mem_parquet(mem_fs, "/in/a.parquet", 5)
        fp1 = file_fingerprint("/in/a.parquet", fs=mem_fs)
        assert "a.parquet" in fp1 and ":" in fp1
        # content change → new fingerprint (size differs)
        _write_mem_parquet(mem_fs, "/in/a.parquet", 50)
        fp2 = file_fingerprint("/in/a.parquet", fs=mem_fs)
        assert fp1 != fp2

    def test_manifest_roundtrip_and_listing(self, mem_fs):
        from redactifai_ray.state.lineage import (
            completed_partitions,
            load_manifest,
            write_manifest,
        )

        write_manifest(
            "/out", {"partition_id": "000000", "status": "complete",
                     "fingerprint": "x", "n_rows": 3}, fs=mem_fs,
        )
        write_manifest(
            "/out", {"partition_id": "000001", "status": "failed",
                     "fingerprint": "y", "error": "boom"}, fs=mem_fs,
        )
        m = load_manifest("/out", "000000", fs=mem_fs)
        assert m["n_rows"] == 3
        done = completed_partitions("/out", fs=mem_fs)
        assert list(done) == ["000000"]  # failed one excluded
        # no temp files left behind (write is temp + move)
        names = [p for p in mem_fs.ls("/out/_lineage", detail=False)]
        assert all(not os.path.basename(p).startswith(".") for p in names)

    def test_resumable_run_with_memory_lineage(self, ray_session, mem_fs, tmp_path):
        """Full run_resumable: inputs fingerprinted on memory://, manifests
        on memory://, data written locally. Second run skips everything."""
        import ray.data

        from redactifai_ray.state.lineage import run_resumable

        _write_mem_parquet(mem_fs, "/in/a.parquet", 4, base=0)
        _write_mem_parquet(mem_fs, "/in/b.parquet", 4, base=100)
        out_root = str(tmp_path / "out")

        def build(files):
            tables = []
            for f in files:
                with mem_fs.open(f, "rb") as fh:
                    tables.append(pq.read_table(fh))
            return ray.data.from_arrow(pa.concat_tables(tables))

        summary = run_resumable(
            ["/in/a.parquet", "/in/b.parquet"], out_root, build,
            files_per_partition=1, lineage_fs=mem_fs, input_fs=mem_fs,
        )
        assert summary == {"total": 2, "skipped": 0, "ran": 2, "failed": 0}
        assert mem_fs.exists("/in/a.parquet")
        assert len(mem_fs.ls(os.path.join(out_root, "_lineage"))) == 2

        summary2 = run_resumable(
            ["/in/a.parquet", "/in/b.parquet"], out_root, build,
            files_per_partition=1, lineage_fs=mem_fs, input_fs=mem_fs,
        )
        assert summary2["skipped"] == 2 and summary2["ran"] == 0

        # changed input → fingerprint mismatch → partition reruns
        _write_mem_parquet(mem_fs, "/in/a.parquet", 9, base=0)
        summary3 = run_resumable(
            ["/in/a.parquet", "/in/b.parquet"], out_root, build,
            files_per_partition=1, lineage_fs=mem_fs, input_fs=mem_fs,
        )
        assert summary3["ran"] == 1 and summary3["skipped"] == 1


class TestDataPlaneThroughArrowFS:
    def test_write_parquet_via_subtree_filesystem(self, ray_session, tmp_path):
        """Data writes flow through an injected pyarrow filesystem object
        (relative paths under the subtree root) — the S3FileSystem seam."""
        import fsspec
        import ray.data
        from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

        from redactifai_ray.state.lineage import run_resumable

        base = str(tmp_path)
        sub = SubTreeFileSystem(base, LocalFileSystem())
        dirfs = fsspec.filesystem("dir", path=base)

        src = tmp_path / "in.parquet"
        pq.write_table(
            pa.table({"url": ["u1", "u2"], "val": [1, 2]}), str(src)
        )

        def build(files):
            return ray.data.read_parquet([str(src)])

        summary = run_resumable(
            [str(src)], "out", build, files_per_partition=1,
            lineage_fs=dirfs, data_filesystem=sub,
        )
        assert summary["ran"] == 1 and summary["failed"] == 0
        # data landed under the subtree root via the injected filesystem
        part_dir = tmp_path / "out" / "pages" / "part=000000"
        assert part_dir.is_dir() and list(part_dir.glob("*.parquet"))
        assert (tmp_path / "out" / "_lineage" / "000000.json").exists()


class TestResumeOutputVerification:
    def test_deleted_output_reruns_despite_manifest(self, ray_session, tmp_path):
        """ADVICE r1: a 'complete' manifest whose output directory is gone
        must rerun the partition, not silently skip it."""
        import ray.data

        from redactifai_ray.state.lineage import run_resumable

        src = tmp_path / "in.parquet"
        pq.write_table(pa.table({"url": ["a", "b"], "val": [1, 2]}), str(src))
        out_root = str(tmp_path / "out")

        def build(files):
            return ray.data.read_parquet([str(src)])

        s1 = run_resumable([str(src)], out_root, build, files_per_partition=1)
        assert s1["ran"] == 1
        shutil.rmtree(os.path.join(out_root, "pages", "part=000000"))
        s2 = run_resumable([str(src)], out_root, build, files_per_partition=1)
        assert s2["ran"] == 1 and s2["skipped"] == 0
        assert os.path.isdir(os.path.join(out_root, "pages", "part=000000"))


class TestGlobalDedupAcrossPartitions:
    def test_cli_winner_map_spans_partitions(self, ray_session, tmp_path):
        """ADVICE r1: a url duplicated ACROSS partition files keeps only
        the newest crawl when the winner map is computed globally."""
        import pandas as pd

        from redactifai_ray.fixtures import page_record
        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            compute_dup_winners,
            finalize_output,
        )

        rec_old = page_record(0, 42)
        # build two files: same url, different warc_ts (newer in file b)
        import pyarrow as pa_

        ts_old = pd.Timestamp("2024-01-01")
        ts_new = pd.Timestamp("2024-06-01")
        for name, ts in (("a.parquet", ts_old), ("b.parquet", ts_new)):
            t = pa_.table(
                {
                    "url": [rec_old["url"]],
                    "warc_ts": pa_.array([ts], pa_.timestamp("us")),
                    "html": [rec_old["html"]],
                    "text": [None],
                    "lang": ["en"],
                }
            )
            pq.write_table(t, str(tmp_path / name))
        files = [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")]
        winners = compute_dup_winners(files)
        assert len(winners) == 1  # the cross-file duplicate was seen

        # per-partition pipelines with the GLOBAL winner map: partition a
        # (stale copy only) drops its row; partition b keeps the newest
        out_a = finalize_output(
            build_deidentify_pipeline([files[0]], dup_winners=winners)
        ).to_pandas()
        out_b = finalize_output(
            build_deidentify_pipeline([files[1]], dup_winners=winners)
        ).to_pandas()
        assert len(out_a) == 0
        assert len(out_b) == 1
