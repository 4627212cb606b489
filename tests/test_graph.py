"""Host-graph operators: outlink extraction + distributed PageRank
(stages/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_items(
        [{"src_host": s, "dst_host": d} for s, d in pairs]
    )


def _dense_pagerank(pairs, n_iters=10, damping=0.85):
    """Reference dense power iteration, same formulation as the op."""
    hosts = sorted({h for p in pairs for h in p})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in pairs:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        contrib = np.zeros(n)
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / outdeg[idx[s]]
        dangling = r[outdeg == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(hosts, r))


class TestExtractOutlinks:
    def test_absolute_relative_self_dup(self, ray_session):
        import ray.data

        from redactifai_ray.stages.graph import extract_outlinks

        html = (
            b'<html><body>'
            b'<a href="/relative">nav</a>'
            b'<a href="https://other.example/page">x</a>'
            b'<a href="https://other.example/second">dup host</a>'
            b'<a href="http://www.third.example/a">y</a>'
            b'<a href="https://me.example/self">self</a>'
            b"</body></html>"
        )
        pages = ray.data.from_items(
            [{"url": "https://me.example/p1", "html": html}]
        )
        out = (
            extract_outlinks(pages)
            .to_pandas()
            .sort_values("dst_host")
            .reset_index(drop=True)
        )
        # relative + self dropped; duplicate dst collapsed; www. stripped
        assert list(out["src_host"]) == ["me.example", "me.example"]
        assert list(out["dst_host"]) == ["other.example", "third.example"]

    def test_hostile_bytes_fail_soft(self, ray_session):
        import ray.data

        from redactifai_ray.stages.graph import extract_outlinks

        pages = ray.data.from_items(
            [
                {"url": "https://a.example/", "html": b"\xff\xfe\x00junk"},
                {"url": None, "html": b'<a href="https://b.example/">'},
                {"url": "https://c.example/", "html": None},
                {
                    "url": "https://d.example/",
                    "html": b'\xff<a href="https://e.example/x">ok</a>\xff',
                },
            ]
        )
        out = extract_outlinks(pages).to_pandas()
        assert list(out["src_host"]) == ["d.example"]
        assert list(out["dst_host"]) == ["e.example"]


class TestPagerank:
    def _random_pairs(self, n_hosts=12, n_edges=60, seed=5):
        rng = np.random.default_rng(seed)
        pairs = set()
        while len(pairs) < n_edges:
            s, d = rng.integers(0, n_hosts, 2)
            if s != d:
                pairs.add((f"h{s}", f"h{d}"))
        return sorted(pairs)

    def test_matches_dense_power_iteration(self, ray_session):
        from redactifai_ray.stages.graph import pagerank

        pairs = self._random_pairs()
        want = _dense_pagerank(pairs)
        got = pagerank(_edges_ds(pairs)).set_index("host")["rank"]
        assert abs(got.sum() - 1.0) < 1e-9
        for h, w in want.items():
            assert abs(got[h] - w) < 1e-9, h

    def test_dangling_sink(self, ray_session):
        from redactifai_ray.stages.graph import pagerank

        # 'sink' has no outlinks: its mass must redistribute, not vanish
        pairs = [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")]
        got = pagerank(_edges_ds(pairs)).set_index("host")["rank"]
        want = _dense_pagerank(pairs)
        assert abs(got.sum() - 1.0) < 1e-9
        for h, w in want.items():
            assert abs(got[h] - w) < 1e-9
        assert got["sink"] == got.max()

    def test_partitioning_invariant(self, ray_session):
        from redactifai_ray.stages.graph import pagerank

        pairs = self._random_pairs(n_hosts=20, n_edges=120, seed=9)
        a = pagerank(_edges_ds(pairs).repartition(2)).set_index("host")
        b = pagerank(_edges_ds(pairs).repartition(16)).set_index("host")
        assert np.allclose(
            a["rank"].sort_index(), b["rank"].sort_index(), atol=1e-12
        )

    def test_max_hosts_cap(self, ray_session):
        from redactifai_ray.stages.graph import pagerank

        with pytest.raises(ValueError, match="shard the graph"):
            pagerank(_edges_ds([("a", "b")]), max_hosts=1)

    def test_empty(self, ray_session):
        import ray.data

        from redactifai_ray.stages.graph import pagerank

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "src_host": pa.array([], pa.string()),
                    "dst_host": pa.array([], pa.string()),
                }
            )
        )
        out = pagerank(empty)
        assert len(out) == 0


class TestTriangleCount:
    def test_matches_brute_force(self, ray_session):
        import numpy as np
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_triangle_count

        sf = "/root/testdata/sf0.001"
        got = int(q_triangle_count(sf)["n_triangles"].iloc[0])

        ids = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy(np.int64)
        src = ids % 200
        dst = (src + 4 * (1 + ids % 47)) % 200
        edges = {
            (min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())
        }
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = 0
        for a, b in edges:
            # count common neighbors strictly above both endpoints so
            # each triangle {a<b<c} is counted once via its (a,b) edge
            want += sum(
                1 for c in (adj[a] & adj[b]) if c > max(a, b)
            )
        assert got == want and got > 0


class TestKCore:
    @staticmethod
    def _brute(edges, k):
        es = set(edges)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return deg
            es = {(a, b) for a, b in es if a not in drop and b not in drop}

    def test_query_matches_brute_force(self, ray_session):
        import numpy as np
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_kcore

        sf = "/root/testdata/sf0.001"
        got = q_kcore(sf, k=4)
        ids = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy(np.int64)
        src = ids % 200
        dst = (src + 4 * (1 + ids % 47)) % 200
        edges = {
            (min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())
        }
        want = self._brute(edges, 4)
        assert dict(zip(got["node"], got["degree"])) == want
        assert 0 < len(got) < 200  # proper nontrivial core

    def test_cascade_peel(self, ray_session):
        # path graph: 2-core is empty, every removal cascades
        import ray.data

        from redactifai_ray.stages.graph import kcore

        path = [{"id_a": i, "id_b": i + 1} for i in range(30)]
        out = kcore(ray.data.from_items(path).repartition(4), k=2)
        assert len(out) == 0

    def test_clique_survives(self, ray_session):
        import itertools

        import ray.data

        from redactifai_ray.stages.graph import kcore

        clique = [
            {"id_a": a, "id_b": b}
            for a, b in itertools.combinations(range(6), 2)
        ]
        pendant = [{"id_a": 0, "id_b": 99}]
        out = kcore(
            ray.data.from_items(clique + pendant).repartition(3), k=5
        )
        assert set(out["node"]) == set(range(6))
        assert (out["degree"] == 5).all()


class TestKcoreIterationBound:
    def test_long_peel_cascade_completes_without_fixed_cap(self, ray_session):
        # a path graph peels one end pair per round — the cascade length
        # grows with |V|, which is exactly what broke a fixed max_iters
        # (round-4 ADVICE); the default bound is now the observed node
        # count, so this terminates (with an empty 2-core) regardless
        import ray.data

        from redactifai_ray.stages.graph import kcore

        n = 30
        path = [{"id_a": i, "id_b": i + 1} for i in range(n - 1)]
        out = kcore(ray.data.from_items(path).repartition(3), k=2)
        assert out.empty
