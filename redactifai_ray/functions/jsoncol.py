"""JSON column field extraction — vectorized fast path + exact fallback.

The event-log shape: a ``props`` string column holding one JSON object
per row, from which pipelines pull scalar fields (the reference keeps
its job metadata as JSON blobs in Postgres — ``src/db/models.py`` —
and reads fields out in Python; here extraction is a batch operator).

Scale design: a single ``pc.extract_regex`` pass handles every row that
is provably a FLAT object (no nesting, no escapes — checked by one
vectorized ``match_substring_regex``); only rows that fail that proof
fall back to per-row ``json.loads``, so the Python loop runs on the
hard minority, not the corpus. Extraction semantics match DuckDB's
``->>'key'`` (string form of the scalar; NULL when the key is absent
or the JSON is invalid; non-integer numbers canonicalized; containers
re-serialized compactly) — verified value-by-value in the tests.
Known contract edge: an object with DUPLICATE keys resolves first-wins
on the vectorized path (as DuckDB does) but last-wins when the row
falls back to ``json.loads`` (nested/escaped/float rows) — duplicate
keys inside one object are degenerate input, not supported.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

# a flat JSON object, proven by a STRICT grammar: zero or more
# `"key": value` pairs where keys are escape-free strings and values
# are escape-free strings or bare scalar tokens — not merely "no
# braces/escapes anywhere" (round-4 ADVICE: '{"k": 1, junk}' passed
# the loose test and the fast path returned '1' where ->> yields
# NULL). Rows failing the grammar re-parse exactly via json.loads.
_STR = r'"[^"\\{}\[\]]*"'
_VAL = _STR + r"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null"
_PAIR = _STR + r"\s*:\s*(?:" + _VAL + r")"
# DuckDB's yyjson parser accepts a trailing comma after the last pair
# ('{"k": 4,}' ->> 'k' yields '4'), so the flat grammar does too
_FLAT_RE = (
    r"^\s*\{\s*(?:"
    + _PAIR
    + r"(?:\s*,\s*"
    + _PAIR
    + r")*\s*,?\s*)?\}\s*$"
)


def _quoted_re(key: str) -> str:
    return r'[{,]\s*"' + re.escape(key) + r'"\s*:\s*"(?P<v>[^"]*)"'


def _raw_re(key: str) -> str:
    # raw (unquoted) scalar token; excludes '"' so it never half-matches
    # a string value (two separate passes because RE2-via-Arrow fills
    # NON-PARTICIPATING alternation groups with "" rather than null)
    return r'[{,]\s*"' + re.escape(key) + r'"\s*:\s*(?P<v>[^,}\s"]+)'


def _loads_get(s, key: str):
    try:
        obj = json.loads(s)
    except (TypeError, ValueError):
        return None
    if not isinstance(obj, dict) or key not in obj:
        return None
    v = obj[key]
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    # compact separators: DuckDB ->> re-serializes containers compactly
    return json.dumps(v, separators=(",", ":"))


def json_get_string(arr, key: str) -> pa.Array:
    """Extract ``key`` from a JSON-object string column as strings
    (DuckDB ``->>`` semantics). ``arr``: pa.Array/ChunkedArray of
    strings; returns a pa.Array of strings aligned with ``arr``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    is_flat = pc.fill_null(pc.match_substring_regex(arr, _FLAT_RE), False)
    quoted = pc.struct_field(pc.extract_regex(arr, _quoted_re(key)), "v")
    raw = pc.struct_field(pc.extract_regex(arr, _raw_re(key)), "v")
    fast = pc.coalesce(quoted, raw)
    # unquoted JSON null literal on the fast path → NULL (a null
    # comparison condition also yields null, which is the right answer
    # for absent keys — extract_regex already left those null)
    out = pc.if_else(
        pc.equal(fast, pa.scalar("null", pa.string())),
        pa.scalar(None, pa.string()),
        fast,
    )
    # rows that fail the flat proof (nested/escaped/invalid/null JSON)
    # re-parse exactly — the Python loop touches only that minority.
    # Non-integer raw numbers also re-parse: DuckDB's ->> canonicalizes
    # them ('-3.5e2' → '-350.0'), and the loads path matches that; the
    # overwhelmingly common int/bool/string/absent cases stay vectorized
    unsafe_raw = pc.and_kleene(
        pc.is_valid(raw),
        pc.invert(
            pc.match_substring_regex(raw, r"^(-?\d+|true|false|null)$")
        ),
    )
    hard = pc.or_kleene(
        pc.invert(is_flat), pc.fill_null(unsafe_raw, False)
    )
    if pc.any(hard).as_py():
        repl = pa.array(
            [_loads_get(s, key) for s in arr.filter(hard).to_pylist()],
            pa.string(),
        )
        out = pc.replace_with_mask(out, hard, repl)
    return out


def add_json_field(
    ds,
    col: str,
    key: str,
    out_col: str,
    cast: pa.DataType | None = None,
):
    """Dataset stage: append ``out_col`` = JSON field ``key`` extracted
    from string column ``col``; optional arrow ``cast`` (e.g.
    ``pa.int64()``) applied to the string values."""

    def fn(t: pa.Table) -> pa.Table:
        v = json_get_string(t.column(col), key)
        if cast is not None:
            v = v.cast(cast)
        return t.append_column(out_col, v)

    return ds.map_batches(fn, batch_format="pyarrow")
