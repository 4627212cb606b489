"""Data-layout maintenance trio: cluster_by (range-sort layout),
build_zonemap (footer-only manifests), pruned_read (zone-map skipping).
Pins: layout disjointness, stats fidelity vs a real data read, pruned
scan ≡ full-scan filter, and that pruning actually skips files."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from redactifai_ray.pipelines.maintenance import (
    build_zonemap,
    cluster_by,
    pruned_read,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clustered(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clustered"))
    summary = cluster_by(f"{SF}/documents.parquet", out, col="n_chars")
    return out, summary


class TestClusterBy:
    def test_content_preserved(self, clustered):
        out, _ = clustered
        src = pd.read_parquet(f"{SF}/documents.parquet")
        dst = pd.read_parquet(out)
        assert sorted(dst["doc_id"]) == sorted(src["doc_id"])
        assert dst["n_chars"].sum() == src["n_chars"].sum()

    def test_files_cover_near_disjoint_ranges(self, clustered, ray_session):
        out, summary = clustered
        zm = build_zonemap(out, "n_chars").to_pandas()
        assert len(zm) == summary["files_out"]
        zm = zm.sort_values("vmin").reset_index(drop=True)
        # range-partitioned layout: each file's min >= previous file's
        # min, and overlap is at most the boundary value (sample-based
        # boundaries put equal keys in one partition)
        assert (zm["vmin"].to_numpy()[1:] >= zm["vmax"].to_numpy()[:-1]).all()

    def test_within_file_sorted(self, clustered):
        out, _ = clustered
        import glob

        for f in glob.glob(f"{out}/*.parquet"):
            vals = pq.read_table(f, columns=["n_chars"])["n_chars"]
            arr = vals.to_numpy()
            assert (np.diff(arr) >= 0).all(), f


class TestZonemap:
    def test_stats_match_data(self, ray_session, clustered):
        out, _ = clustered
        zm = build_zonemap(out, "n_chars").to_pandas()
        for _, r in zm.iterrows():
            col = pq.read_table(r["path"], columns=["n_chars"])["n_chars"]
            assert r["n_rows"] == len(col)
            assert r["vmin"] == pa.compute.min(col).as_py()
            assert r["vmax"] == pa.compute.max(col).as_py()

    def test_footer_only_on_source_table(self, ray_session):
        zm = build_zonemap(f"{SF}/documents.parquet", "doc_id").to_pandas()
        assert len(zm) == 1
        assert zm.iloc[0]["vmin"] == 0
        assert zm.iloc[0]["n_rows"] == 500


class TestPrunedRead:
    def test_equals_full_scan_filter(self, ray_session, clustered):
        out, _ = clustered
        full = pd.read_parquet(out)
        lo, hi = 250, 400
        want = full[(full["n_chars"] >= lo) & (full["n_chars"] <= hi)]
        ds, stats = pruned_read(out, "n_chars", lo, hi)
        got = ds.to_pandas()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        assert stats["files_read"] <= stats["files_total"]

    def test_narrow_range_skips_files(self, ray_session, clustered):
        out, summary = clustered
        if summary["files_out"] < 2:
            pytest.skip("single output file — nothing to skip")
        zm = build_zonemap(out, "n_chars").to_pandas().sort_values("vmin")
        lo = int(zm.iloc[0]["vmin"])
        hi = int(zm.iloc[0]["vmax"])
        ds, stats = pruned_read(out, "n_chars", lo, hi)
        assert stats["files_read"] < stats["files_total"]
        got = ds.to_pandas()
        assert ((got["n_chars"] >= lo) & (got["n_chars"] <= hi)).all()

    def test_empty_range(self, ray_session, clustered):
        out, _ = clustered
        ds, stats = pruned_read(out, "n_chars", 10**9, 2 * 10**9)
        assert stats["files_read"] == 0
        assert ds.count() == 0

    def test_inverted_range_is_empty(self, ray_session, clustered):
        # lo > hi selects nothing (round-4 ADVICE: the old filter-all
        # expression inverted into a BETWEEN and returned rows)
        out, _ = clustered
        ds, stats = pruned_read(out, "n_chars", 400, 250)
        assert stats["files_read"] == 0
        df = ds.to_pandas()
        assert len(df) == 0

    def test_empty_dir_raises(self, ray_session, tmp_path):
        with pytest.raises((ValueError, FileNotFoundError, OSError)):
            pruned_read(str(tmp_path), "n_chars", 0, 10)


class TestMaintainCli:
    def test_cluster_zonemap_prune_roundtrip(self, ray_session, tmp_path):
        import json
        from contextlib import redirect_stdout
        import io

        from redactifai_ray.maintain_cli import main

        out = str(tmp_path / "clustered")

        def run(argv):
            buf = io.StringIO()
            with redirect_stdout(buf):
                rc = main(argv)
            assert rc == 0
            return json.loads(buf.getvalue().strip().splitlines()[-1])

        r1 = run(["cluster", "--input", f"{SF}/documents.parquet",
                  "--output", out, "--by", "n_chars"])
        assert r1["files_out"] >= 1
        r2 = run(["zonemap", "--input", out, "--by", "n_chars"])
        assert r2 == {"files": r1["files_out"], "rows": 500}
        r3 = run(["prune-count", "--input", out, "--by", "n_chars",
                  "--lo", "250", "--hi", "400"])
        full = pd.read_parquet(f"{SF}/documents.parquet")
        want = int(((full["n_chars"] >= 250) & (full["n_chars"] <= 400)).sum())
        assert r3["rows_matched"] == want
        assert r3["files_read"] <= r3["files_total"]
        comp = str(tmp_path / "compacted")
        r4 = run(["compact", "--input", out, "--output", comp,
                  "--target-mb", "64"])
        assert r4["rows"] == 500
        assert len(pd.read_parquet(comp)) == 500


class TestZorderCluster:
    def test_prunes_on_both_dims(self, ray_session, tmp_path):
        from redactifai_ray.pipelines.maintenance import cluster_by_zorder

        out = str(tmp_path / "zclustered")
        # pin the file count: pruning resolution is file granularity,
        # and the default block count varies with session parallelism
        summary = cluster_by_zorder(
            f"{SF}/documents.parquet", out, cols=["n_chars", "doc_id"],
            n_partitions=32,
        )
        dst = pd.read_parquet(out)
        src = pd.read_parquet(f"{SF}/documents.parquet")
        assert sorted(dst["doc_id"]) == sorted(src["doc_id"])
        assert "zval" not in dst.columns
        assert summary["files_out"] >= 16  # n_partitions pinned it
        # a narrow predicate on EITHER z-ordered dimension skips files
        for col, lo, hi in (("n_chars", 250, 300), ("doc_id", 0, 60)):
            ds, stats = pruned_read(out, col, lo, hi)
            got = ds.to_pandas()
            want = src[(src[col] >= lo) & (src[col] <= hi)]
            assert sorted(got["doc_id"]) == sorted(want["doc_id"]), col
            assert stats["files_read"] < stats["files_total"], col


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def bucketed(self, ray_session, tmp_path_factory):
        from redactifai_ray.pipelines.maintenance import bucketize_write

        root = tmp_path_factory.mktemp("buckets")
        da, db = str(root / "orders"), str(root / "customer")
        bucketize_write(
            f"{SF}/orders.parquet", da, key="o_custkey", n_buckets=8,
            columns=["o_orderkey", "o_totalprice"],
        )
        import shutil, pyarrow.parquet as pq, pyarrow as pa

        # customer side: rename key to match (bucket_join joins on one key)
        cust = pq.read_table(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
        ).rename_columns(["o_custkey", "c_name"])
        src = str(root / "cust_src.parquet")
        pq.write_table(cust, src)
        bucketize_write(src, db, key="o_custkey", n_buckets=8)
        return da, db

    def test_equals_reference_merge(self, ray_session, bucketed):
        from redactifai_ray.pipelines.maintenance import bucket_join

        da, db = bucketed
        got = (
            bucket_join(da, db, key="o_custkey", n_buckets=8)
            .to_pandas()
            .sort_values(["o_orderkey"])
            .reset_index(drop=True)
        )
        orders = pd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_custkey"],
        )
        cust = pd.read_parquet(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
        ).rename(columns={"c_custkey": "o_custkey"})
        ref = orders.merge(cust, on="o_custkey", how="inner").sort_values(
            ["o_orderkey"]
        ).reset_index(drop=True)
        assert len(got) == len(ref)
        assert (got["o_orderkey"].to_numpy() == ref["o_orderkey"].to_numpy()).all()
        assert (got["c_name"].to_numpy() == ref["c_name"].to_numpy()).all()

    def test_left_join_and_empty_buckets(self, ray_session, tmp_path):
        from redactifai_ray.pipelines.maintenance import (
            bucket_join, bucketize_write,
        )
        import pyarrow as pa
        import pyarrow.parquet as pq

        a = str(tmp_path / "a.parquet")
        b = str(tmp_path / "b.parquet")
        pq.write_table(
            pa.table({"k": pa.array([1, 2, 33], pa.int64()),
                      "x": pa.array([10, 20, 30], pa.int64())}), a)
        pq.write_table(
            pa.table({"k": pa.array([2], pa.int64()),
                      "y": pa.array([200], pa.int64())}), b)
        da, db = str(tmp_path / "da"), str(tmp_path / "db")
        bucketize_write(a, da, key="k", n_buckets=16)
        bucketize_write(b, db, key="k", n_buckets=16)
        out = (
            bucket_join(da, db, key="k", n_buckets=16, how="left")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(out["k"]) == [1, 2, 33]
        assert out.loc[out["k"] == 2, "y"].iloc[0] == 200
        assert out.loc[out["k"] == 1, "y"].isna().all()


class TestBucketJoinScaleGuards:
    def _write_skewed(self, tmp_path, n=4000):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from redactifai_ray.pipelines.maintenance import bucketize_write

        # every row carries the SAME key -> one hot bucket
        a = str(tmp_path / "a.parquet")
        b = str(tmp_path / "b.parquet")
        import hashlib

        pads = [
            hashlib.sha256(str(i).encode()).hexdigest() * 4
            for i in range(n)
        ]  # incompressible ~256 B/row so on-disk bytes exceed the cap
        pq.write_table(
            pa.table({"k": pa.array([7] * n, pa.int64()),
                      "x": pa.array(range(n), pa.int64()),
                      "pad": pa.array(pads, pa.string())}), a)
        pq.write_table(
            pa.table({"k": pa.array([7, 8], pa.int64()),
                      "y": pa.array([70, 80], pa.int64())}), b)
        da, db = str(tmp_path / "da"), str(tmp_path / "db")
        # many small files on the hot side so the planner CAN split
        import ray.data
        ray.data.read_parquet(a).repartition(8).map_batches(
            lambda t: t.append_column(
                "bucket", pa.array([7 % 4] * t.num_rows, pa.int64())),
            batch_format="pyarrow",
        ).write_parquet(da, partition_cols=["bucket"])
        bucketize_write(b, db, key="k", n_buckets=4)
        return da, db, n

    def test_hot_bucket_splits_and_stays_exact(self, ray_session, tmp_path):
        from redactifai_ray.pipelines.maintenance import (
            _plan_bucket_tasks, bucket_join,
        )

        da, db, n = self._write_skewed(tmp_path)
        tasks = _plan_bucket_tasks(da, db, 4, "inner", max_task_bytes=40_000)
        hot = [t for t in tasks if t["bucket_id"] == 3]
        assert len(hot) > 1  # the hot bucket split into sub-tasks
        out = bucket_join(
            da, db, key="k", n_buckets=4, max_task_bytes=40_000
        ).to_pandas()
        assert len(out) == n
        assert (out["y"] == 70).all()
        assert sorted(out["x"]) == list(range(n))

    def test_outer_join_raises_above_cap_with_remedy(self, ray_session, tmp_path):
        import pytest as _pytest

        from redactifai_ray.pipelines.maintenance import bucket_join

        da, db, _ = self._write_skewed(tmp_path)
        with _pytest.raises(ValueError, match="bucketize_write"):
            bucket_join(
                da, db, key="k", n_buckets=4, how="outer",
                max_task_bytes=40_000,
            ).materialize()

    def test_column_pruning(self, ray_session, tmp_path):
        from redactifai_ray.pipelines.maintenance import (
            bucket_join, bucketize_write,
        )
        import pyarrow as pa
        import pyarrow.parquet as pq

        a = str(tmp_path / "pa.parquet")
        b = str(tmp_path / "pb.parquet")
        pq.write_table(
            pa.table({"k": pa.array([1, 2], pa.int64()),
                      "x": pa.array([10, 20], pa.int64()),
                      "junk_a": pa.array(["a", "b"], pa.string())}), a)
        pq.write_table(
            pa.table({"k": pa.array([1, 2], pa.int64()),
                      "y": pa.array([100, 200], pa.int64()),
                      "junk_b": pa.array(["c", "d"], pa.string())}), b)
        da, db = str(tmp_path / "pda"), str(tmp_path / "pdb")
        bucketize_write(a, da, key="k", n_buckets=2)
        bucketize_write(b, db, key="k", n_buckets=2)
        out = bucket_join(
            da, db, key="k", n_buckets=2,
            columns_a=["x"], columns_b=["y"],
        ).to_pandas()
        assert sorted(out.columns) == ["k", "x", "y"]
        assert sorted(out["x"]) == [10, 20]


class TestQueryLayoutComposition:
    """Round-4 VERDICT #6: the zone-map file skip composed with a REAL
    query — q_tpch_q6 over a cluster_by(l_shipdate) layout must equal
    the plain pushed-down scan bit-for-bit AND actually skip files."""

    def test_tpch_q6_pruned_equals_unpruned(self, ray_session, tmp_path):
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_tpch_q6

        layout = str(tmp_path / "li_by_shipdate")
        cluster_by(f"{SF}/lineitem.parquet", layout, col="l_shipdate")

        plain = q_tpch_q6(SF)
        pruned = q_tpch_q6(SF, layout_dir=layout)
        pd.testing.assert_frame_equal(plain, pruned)

        # the window (1996) covers ~1/7 of the shipdate range, so a
        # shipdate-clustered layout with >1 file must skip at least one
        lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
        _, stats = pruned_read(layout, "l_shipdate", lo, hi)
        assert stats["files_total"] > 1, "layout produced a single file"
        assert stats["files_read"] < stats["files_total"]
