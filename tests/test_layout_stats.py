"""Property pins for the round-4 layout / robust-stat query family:
the skyline partial fold, Morton keys, discrete-quantile selection,
SCD-2 islands, transition counts and the exact-integer outlier cutoffs
are each checked against an independent brute-force reference — the
oracle-SQL gate checks end-to-end parity; these pin the fold algebra."""

import math

import numpy as np
import pandas as pd
import pytest

from redactifai_ray.pipelines.queries import (
    _disc_quantile,
    _skyline_fold,
    q_event_transitions,
    q_grouped_outliers,
    q_resample_events,
    q_scd2_intervals,
    q_zorder_layout,
    _DAY_US,
)

SF = "/root/testdata/sf0.001"


def _brute_skyline(df: pd.DataFrame) -> set:
    pts = list(zip(df["cents"], df["size"], df["p_partkey"]))
    keep = set()
    for c, s, k in pts:
        dominated = any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s)) for c2, s2, _ in pts
        )
        if not dominated:
            keep.add(k)
    return keep


def _rand_points(rng, n):
    return pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "cents": rng.integers(0, 40, n).astype(np.int64),
            "size": rng.integers(0, 40, n).astype(np.int64),
        }
    )


class TestSkylineFold:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            df = _rand_points(rng, 60)
            got = set(_skyline_fold(df)["p_partkey"])
            assert got == _brute_skyline(df), f"trial {trial}"

    def test_partial_fold_is_lossless(self):
        # skyline(skyline(A) ∪ skyline(B)) == skyline(A ∪ B) for every split
        rng = np.random.default_rng(11)
        df = _rand_points(rng, 120)
        full = set(_skyline_fold(df)["p_partkey"])
        for cut in (1, 13, 60, 119):
            a, b = df.iloc[:cut], df.iloc[cut:]
            folded = _skyline_fold(
                pd.concat([_skyline_fold(a), _skyline_fold(b)])
            )
            assert set(folded["p_partkey"]) == full, f"cut {cut}"

    def test_exact_ties_all_survive(self):
        # identical points do not dominate each other
        df = pd.DataFrame(
            {
                "p_partkey": np.array([1, 2, 3], dtype=np.int64),
                "cents": np.array([5, 5, 9], dtype=np.int64),
                "size": np.array([7, 7, 2], dtype=np.int64),
            }
        )
        assert set(_skyline_fold(df)["p_partkey"]) == {1, 2}


class TestDiscQuantile:
    def test_matches_sorted_expansion(self):
        rng = np.random.default_rng(3)
        for _ in range(25):
            vals = rng.integers(-50, 50, 12).astype(np.int64)
            vals = np.unique(vals)
            cnts = rng.integers(1, 5, len(vals)).astype(np.int64)
            expanded = np.sort(np.repeat(vals, cnts))
            for q in (0.1, 0.5, 0.9, 1.0):
                rank = max(0, int(np.ceil(q * len(expanded))) - 1)
                assert _disc_quantile(vals, cnts, q) == expanded[rank]

    def test_unsorted_histogram_input(self):
        vals = np.array([9, 1, 5], dtype=np.int64)
        cnts = np.array([1, 2, 1], dtype=np.int64)
        assert _disc_quantile(vals, cnts, 0.5) == 1


@pytest.fixture(scope="module")
def events_df(ray_session):
    return pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )


class TestEventStreamOps:
    def test_scd2_matches_pandas_reference(self, ray_session, events_df):
        got = (
            q_scd2_intervals(SF)
            .to_pandas()
            .sort_values(["user_id", "valid_from_us"])
            .reset_index(drop=True)
        )
        df = events_df.copy()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        rows = []
        for uid, g in df.groupby("user_id", sort=True):
            typ = g["event_type"].to_numpy()
            ts = g["ts_us"].to_numpy()
            change = np.r_[True, typ[1:] != typ[:-1]]
            cts, ct = ts[change], typ[change]
            nxt = np.r_[cts[1:], -1]
            for t0, tp, t1 in zip(cts, ct, nxt):
                rows.append((int(uid), tp, int(t0), int(t1)))
        ref = pd.DataFrame(
            rows,
            columns=["user_id", "event_type", "valid_from_us", "valid_to_us"],
        ).sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"user_id": "int64"}), ref, check_dtype=False
        )

    def test_transitions_match_pandas_reference(self, ray_session, events_df):
        got = q_event_transitions(SF)
        df = events_df.copy()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        typ = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        ref = (
            pd.DataFrame(
                {"prev_type": typ[:-1][same], "event_type": typ[1:][same]}
            )
            .groupby(["prev_type", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["prev_type", "event_type"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)

    def test_resample_grid_is_complete_and_count_preserving(
        self, ray_session, events_df
    ):
        got = q_resample_events(SF)
        assert got["n"].sum() == len(events_df)
        days = np.sort(got["day_us"].unique())
        assert (np.diff(days) == _DAY_US).all()  # no calendar holes
        # every (type, day) cell present exactly once
        n_types = got["event_type"].nunique()
        assert len(got) == n_types * len(days)
        assert not got.duplicated(["event_type", "day_us"]).any()


class TestGroupedOutliers:
    def test_matches_exact_integer_predicate(self, ray_session):
        docs = pd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        got = set(q_grouped_outliers(SF)["doc_id"])
        ref = set()
        for lang, g in docs.groupby("lang"):
            xs = [int(v) for v in g["n_chars"]]
            cnt, sm = len(xs), sum(xs)
            sq = sum(v * v for v in xs)
            kk = 4 * (cnt * sq - sm * sm)
            for did, x in zip(g["doc_id"], xs):
                lhs = x * cnt - sm
                if lhs * lhs > kk:  # exact Python-int compare
                    ref.add(int(did))
        assert got == ref

    def test_isqrt_cutoffs_are_tight(self):
        # x*cnt >= sm + isqrt(K) + 1  <=>  (x*cnt - sm)^2 > K for lhs >= 0
        for kk in [0, 1, 2, 3, 4, 99, 100, 101, 10**12, 10**12 + 1]:
            r = math.isqrt(kk)
            assert r * r <= kk < (r + 1) * (r + 1)
            assert (r + 1) ** 2 > kk  # first integer whose square exceeds K
            if r > 0:
                assert r * r <= kk  # last integer whose square does not


class TestZorder:
    def test_matches_python_morton(self, ray_session):
        parts = pd.read_parquet(
            f"{SF}/part.parquet", columns=["p_partkey", "p_size"]
        )

        def morton(x: int, y: int) -> int:
            z = 0
            for i in range(16):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        parts["zval"] = [
            morton(int(s), int(k) & 0xFFFF)
            for s, k in zip(parts["p_size"], parts["p_partkey"])
        ]
        ref = (
            parts.sort_values(["zval", "p_partkey"], kind="mergesort")
            .head(200)[["p_partkey", "zval"]]
            .reset_index(drop=True)
        )
        got = q_zorder_layout(SF)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)

    def test_zorder_locality_beats_single_key(self, ray_session):
        # neighbor distance in the NON-sort dimension should be bounded
        # under z-order vs a plain p_partkey sort: z-sorted neighbors are
        # close in p_size too. Sanity: both dims' values interleave.
        got = q_zorder_layout(SF)
        z = got["zval"].to_numpy()
        assert (np.diff(z) >= 0).all()


class TestWindowJoin:
    def test_matches_pandas_reference(self, ray_session, events_df):
        from redactifai_ray.pipelines.queries import q_window_join

        got = (
            q_window_join(SF)
            .to_pandas()
            .sort_values(["user_id", "click_id", "purchase_id"])
            .reset_index(drop=True)
        )
        df = events_df.copy()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        c = df[df["event_type"] == "click"]
        p = df[df["event_type"] == "purchase"]
        m = c.merge(p, on="user_id", suffixes=("_c", "_p"))
        gap = m["ts_us_p"] - m["ts_us_c"]
        m = m[(gap >= 0) & (gap <= 30 * 60 * 1_000_000)]
        ref = (
            pd.DataFrame(
                {
                    "user_id": m["user_id"].astype("int64"),
                    "click_id": m["event_id_c"].astype("int64"),
                    "purchase_id": m["event_id_p"].astype("int64"),
                    "gap_us": (m["ts_us_p"] - m["ts_us_c"]).astype("int64"),
                }
            )
            .sort_values(["user_id", "click_id", "purchase_id"])
            .reset_index(drop=True)
        )
        assert len(got) > 0  # fixture actually exercises the window
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
