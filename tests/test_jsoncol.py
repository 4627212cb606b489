"""DuckDB-parity tests for the vectorized JSON field extractor
(`functions/jsoncol.py`)."""

import json
import random

import pyarrow as pa

from redactifai_ray.functions.jsoncol import add_json_field, json_get_string


def _duckdb_want(rows, key):
    import duckdb

    con = duckdb.connect()
    out = []
    for s in rows:
        if s is None:
            out.append(None)
            continue
        out.append(
            con.sql(
                f"select case when json_valid(?::VARCHAR) "
                f"then ?::VARCHAR->>'{key}' end",
                params=[s, s],
            ).fetchone()[0]
        )
    return out


EDGE_ROWS = [
    '{"k": 87}',
    '{"k": 0, "m": "x"}',
    '{"m": 1}',
    '{"k": "hi"}',
    '{"k": null}',
    None,
    "not json",
    '{"k": {"nested": 1}}',
    '{"k": "a\\"b"}',
    '{"k": [1,2]}',
    '  {"k": -3.5e2} ',
    '{"k": true}',
    '{"k": "}"}',
    '{"k": -42}',
    '{"kk": 1, "k": 2}',
    '{ "k" : 5 }',
    '{"a": "k", "k": 9}',
    '{"k:b": 1}',
    "{}",
    "",
    "[1,2,3]",
    '"just a string"',
    # invalid-but-brace-flat rows (round-4 ADVICE): must route to the
    # loads fallback and come back NULL, never a regex-extracted token
    '{"k": 1, junk}',
    '{junk, "k": 2}',
    '{"k" 3}',
    '{"k": 4,}',
    '{,}',
]


class TestJsonGetString:
    def test_edge_rows_match_duckdb(self):
        got = json_get_string(pa.array(EDGE_ROWS, pa.string()), "k").to_pylist()
        assert got == _duckdb_want(EDGE_ROWS, "k")

    def test_random_flat_objects_match_duckdb(self):
        rng = random.Random(42)
        keys = ["k", "key2", "x"]
        rows = []
        for _ in range(300):
            obj = {}
            for kk in keys:
                if rng.random() < 0.7:
                    pick = rng.random()
                    if pick < 0.4:
                        obj[kk] = rng.randint(-1000, 1000)
                    elif pick < 0.7:
                        obj[kk] = "".join(
                            rng.choice("abc {}:,")
                            for _ in range(rng.randint(0, 6))
                        )
                    elif pick < 0.8:
                        obj[kk] = rng.choice([True, False, None])
                    elif pick < 0.9:
                        obj[kk] = rng.random() * 100
                    else:
                        obj[kk] = [rng.randint(0, 9)]
            rows.append(json.dumps(obj))
        for key in keys:
            got = json_get_string(pa.array(rows, pa.string()), key).to_pylist()
            assert got == _duckdb_want(rows, key), f"key={key}"

    def test_chunked_array(self):
        ca = pa.chunked_array([['{"k": 1}'], ['{"k": 2}', None]])
        assert json_get_string(ca, "k").to_pylist() == ["1", "2", None]

    def test_all_hard_rows(self):
        rows = ['{"k": {"a": 1}}', '{"k": 0.5}']
        got = json_get_string(pa.array(rows, pa.string()), "k").to_pylist()
        assert got == _duckdb_want(rows, "k")


class TestAddJsonField:
    def test_dataset_stage_with_cast(self, ray_session):
        import ray.data

        ds = ray.data.from_items(
            [{"id": i, "props": json.dumps({"k": i * 3})} for i in range(20)]
        ).repartition(4)
        out = (
            add_json_field(ds, "props", "k", "kv", cast=pa.int64())
            .to_pandas()
            .sort_values("id")
        )
        assert list(out["kv"]) == [i * 3 for i in range(20)]
