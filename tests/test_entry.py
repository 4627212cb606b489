"""Driver-contract tests: entry() smoke + a fast subset of the
queries()/oracle_sql() gate at sf0.001 (the full gate runs via
scripts/check_oracles.py at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

FAST_ORACLED = [
    "regex_counts",
    "mask_words",
    "dedup_exact",
    "token_stats",
    "quality",
    "tpch_q1",
    "tpch_q3",
    "tpch_q17",
    "sessionize",
    "orders_per_nation",
    "events_window",
    "knn",
    # round-3 additions (fast at sf0.001)
    "para_dedup",
    "token_shards",
    "inverted_index",
    "winsorize",
    "user_rolling_mean",
    "rollup_orders",
    "grouped_quantiles",
    # round-4 additions (fast at sf0.001)
    "tpch_q6",
    "tpch_q10r",
    "tpch_q18r",
    "lineitem_moments",
    "events_gaps",
    "top_event_type",
    "weighted_sample",
    "dup_cluster_sizes",
    "fk_orphans",
    "pack_sequences",
    "rank_in_lang",
    "source_budget",
    "dedup_lines",
    "cms_lang_counts",
    "temperature_mixture",
    "cume_dist_in_lang",
    "tpch_q13r",
    "tpch_q15r",
    "tpch_q22r",
    # round-4 layout / robust-stat family
    "skyline_parts",
    "zorder_layout",
    "resample_events",
    "scd2_intervals",
    "grouped_outliers",
    "mad_chars",
    "event_transitions",
    "window_join",
    "embedding_dim_stats",
    "user_rolling_median",
    "lang_share_bp",
    "rfm_segments",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(entrymod):
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert {"doc_id", "masked_text", "span_count"} <= set(out.columns)


def test_queries_have_oracles_or_are_documented(entrymod):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 12


@pytest.mark.parametrize("name", FAST_ORACLED)
def test_query_matches_oracle(entrymod, oracle_con, name):
    mine = _canon(_to_pandas(entrymod.queries()[name](SF)))
    oracle = _canon(oracle_con.sql(entrymod.oracle_sql()[name]).df())
    assert len(mine) == len(oracle)
    assert list(mine.columns) == list(oracle.columns)
    for c in mine.columns:
        if np.issubdtype(mine[c].dtype, np.floating):
            assert np.allclose(mine[c], oracle[c], rtol=0, atol=0), c
        else:
            assert (mine[c].to_numpy() == oracle[c].to_numpy()).all(), c
