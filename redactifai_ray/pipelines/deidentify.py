"""The flagship pipeline: pages → extract → dedup → detect → merge+mask.

One driver-side builder replaces the reference's whole service
constellation (API + Redis queue + Celery workers + Postgres job table +
S3 buckets — SURVEY §3.1): the streaming executor schedules the stages
with backpressure, the object store carries blocks between them, outputs
are Parquet.

Stage layout (and why):
  * extract    — stateless ``map_batches`` tasks over zero-copy Arrow,
                 batch_size=None so the stage FUSES with the parquet read
                 (an explicit batch size breaks fusion and round-trips
                 every html byte through the object store — measured 29%
                 slower); the oversize guard bounds per-row memory; drops
                 ``html`` immediately so downstream blocks are slim;
  * dedup(url) — the one wide shuffle; runs AFTER extraction so the
                 exchange moves slim text rows, not raw html (extraction
                 is deterministic per byte, so duplicates extract
                 identically and the choice of kept row only affects
                 ``warc_ts``); keeps the newest crawl per url;
  * size bucket— ``n_chars``-derived bucket column; huge pages already
                 chunk inside the detector (20k-char windows, W1), the
                 bucket key additionally lets callers
                 ``repartition``/group so giant rows don't ride in the
                 same blocks as thousands of small ones (skew lever,
                 SURVEY §4);
  * detect     — actor-pool stage (warm compiled patterns, ST2 analog);
  * merge+mask — stateless tasks (pure span algebra + substitution).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..cluster import default_partitions, default_pool
from ..policy import MaskingLevel
from ..sources.pages import read_pages
from ..stages.detect import SpanDetector, make_detect_batch
from ..stages.extract import make_extract_batch
from ..stages.mask import make_explode_spans, make_mask_batch

# size-bucket boundaries over n_chars (SURVEY §7.4: skew mitigation key)
SIZE_BUCKET_BOUNDS = (2_000, 20_000, 100_000)


def add_size_bucket(batch: pa.Table) -> pa.Table:
    n = batch["n_chars"]
    bucket = pc.add(
        pc.add(
            pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[0]), pa.int32()),
            pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[1]), pa.int32()),
        ),
        pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[2]), pa.int32()),
    )
    return batch.append_column("size_bucket", bucket)


def dedup_latest(
    ds: ray.data.Dataset,
    key: str = "url",
    order_col: str = "warc_ts",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Exact key dedup keeping the newest row per key (hash shuffle on
    ``key``; reference analog: repeated crawl URLs, SURVEY §2.5/§2.7).

    This is the full-shuffle path — correct at any key cardinality and
    deterministic on exact (key, order) ties (group sort). The flagship
    pipeline prefers ``compute_dup_winners`` + a broadcast filter, which
    avoids shuffling the 98% of rows whose key is unique; use this one
    when the duplicate-key set cannot fit in driver/object-store memory."""

    def keep_newest(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(order_col, "descending"), (key, "ascending")]
        )
        return group.take(idx[:1])

    if num_partitions is None:
        num_partitions = default_partitions()
    return ds.groupby(key, num_partitions=num_partitions).map_groups(
        keep_newest, batch_format="pyarrow"
    )


def compute_dup_winners(
    input_path: Union[str, Sequence[str]],
    key: str = "url",
    order_col: str = "warc_ts",
    max_dup_keys: int = 5_000_000,
    key_fn=None,
) -> Optional[dict]:
    """Scan ONLY (key, order) columns of the input (Parquet column pruning
    → a few bytes/row even when rows carry megabyte html blobs) and return
    ``{key: max_order}`` for keys appearing more than once.

    This is the broadcast side of the shuffle-free dedup: the main pass
    keeps a row iff its key is absent from this map or its order equals
    the max. Returns None when the duplicate-key set exceeds
    ``max_dup_keys`` — the caller then falls back to the full-shuffle
    ``dedup_latest`` (at 10^12-doc scale with percent-level dup rates the
    winner map stops fitting; the slim pre-scan stays cheap either way).

    Tie caveat: two rows with identical (key, order) both survive —
    crawl-identical rows by construction; the full-shuffle path breaks
    such ties deterministically instead."""
    from ray.data.aggregate import Count, Max

    from ..cluster import cluster_cpus

    # coalesce the slim read into ~2 blocks/CPU: per-file read tasks on a
    # many-small-files layout cost more than the 2-column scan itself.
    # (At 100 TB the slim projection is ~0.1% of input — size blocks so
    # each stays well under worker heap, e.g. bytes-derived count.)
    slim = ray.data.read_parquet(
        input_path, columns=[key, order_col],
        override_num_blocks=cluster_cpus() * 2,
    )
    if key_fn is not None:
        # key under a canonical form (e.g. functions.urls.canonical_url):
        # the transform runs on the SLIM 2-column pre-scan only; the main
        # pass re-derives it just for rows flagged as duplicates
        def canon_keys(batch: pa.Table) -> pa.Table:
            vals = [key_fn(v) for v in batch[key].to_pylist()]
            return batch.set_column(
                batch.column_names.index(key), key, pa.array(vals, pa.string())
            )

        slim = slim.map_batches(canon_keys, batch_format="pyarrow")

    def partial_agg(batch: pa.Table) -> pa.Table:
        # vectorized C++ combine per block (pyarrow group_by)
        g = batch.group_by(key).aggregate([(order_col, "max"), (key, "count")])
        return g.rename_columns([key, "max_order", "n"])

    # row count from parquet footers only (pyarrow dataset metadata) — a
    # Dataset.count() here would spin a second streaming execution per
    # pipeline build, ~2-3 s of pure orchestration latency (measured)
    try:
        import pyarrow.dataset as pads

        n_rows = pads.dataset(input_path).count_rows()
    except Exception:
        n_rows = slim.count()  # non-parquet-listable inputs
    if n_rows <= 50_000_000:
        # tree combine: per-block partials → one vectorized final combine.
        # The final task sees <= one row per distinct key — fine up to
        # ~50M keys; beyond that fall through to the distributed groupby.
        partials = slim.map_batches(partial_agg, batch_format="pyarrow")

        def final_combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by(key).aggregate([("max_order", "max"), ("n", "sum")])
            g = g.rename_columns([key, "max_order", "n"])
            return g.filter(pc.greater(g["n"], 1))

        dups = partials.repartition(1).map_batches(
            final_combine, batch_format="pyarrow", batch_size=None
        )
    else:
        agg = slim.groupby(key, num_partitions=cluster_cpus() * 4).aggregate(
            Count(alias_name="n"), Max(order_col, alias_name="max_order")
        )
        dups = agg.map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
        )
    from ..collect import collect_capped

    tbl = collect_capped(dups, max_dup_keys)
    if tbl is None:
        return None
    if key not in tbl.column_names or tbl.num_rows == 0:
        return {}
    return dict(
        zip(tbl.column(key).to_pylist(), tbl.column("max_order").to_pylist())
    )


def make_winner_filter(winners_ref, key: str = "url", order_col: str = "warc_ts",
                       key_fn=None):
    """Batch filter keeping non-duplicate rows and duplicate winners.

    Hot path of the flagship: the ~98%+ of rows whose key is unique are
    cleared by one vectorized ``pc.is_in`` membership test (the winner
    key-set is built once per worker process, not per batch); the Python
    dict lookup runs only on the rare duplicate hits.

    ``key_fn`` (paired with the same arg on ``compute_dup_winners``)
    compares under a canonical key form — it adds one Python map over the
    key column per batch, so it is opt-in (``--canonical-urls``)."""
    state: dict = {}  # per-worker-process cache (same pattern as _DETECTOR_CACHE)

    def keep_winners(batch: pa.Table) -> pa.Table:
        if "keys" not in state:
            winners = ray.get(winners_ref)
            state["winners"] = winners
            state["keys"] = pa.array(list(winners.keys()))
        key_arr = batch[key]
        if key_fn is not None:
            key_arr = pa.array(
                [key_fn(v) for v in key_arr.to_pylist()], pa.string()
            )
        # null keys: is_in yields null, which breaks the numpy bool
        # conversion below — a null key is never a duplicate (ADVICE r2)
        is_dup = pc.fill_null(pc.is_in(key_arr, value_set=state["keys"]), False)
        if not pc.any(is_dup).as_py():
            return batch
        import numpy as np

        winners = state["winners"]
        dup_idx = np.flatnonzero(is_dup.to_numpy(zero_copy_only=False))
        take = pa.array(dup_idx, pa.int64())
        dup_keys = key_arr.take(take).to_pylist()
        dup_orders = batch[order_col].take(take).to_pylist()
        mask = np.ones(batch.num_rows, dtype=bool)
        losers = [o != winners[k] for k, o in zip(dup_keys, dup_orders)]
        mask[dup_idx[np.asarray(losers, dtype=bool)]] = False
        return batch.filter(pa.array(mask))

    return keep_winners


def compute_host_cap_losers(
    input_path: Union[str, Sequence[str]],
    k: int,
    key: str = "url",
    order_col: str = "warc_ts",
    host_fn=None,
    max_loser_keys: int = 5_000_000,
) -> Optional[set]:
    """Per-host page cap (crawl curation: at most ``k`` distinct pages
    per host, RefinedWeb/C4-style politeness + anti-SEO-farm lever):
    scan ONLY (key, order) columns and return the set of keys to DROP so
    each host keeps its ``k`` newest distinct URLs (per-URL newest
    ``order_col``; ties break key-ascending — fully deterministic).

    Distributed shape: the pre-scan is the ``compute_dup_winners`` slim
    read (bytes/row even under megabyte html); per-batch pandas partials
    fold repeat crawls to one (host, key, max_order) row per URL per
    block, then ONE host-keyed hash-partition groupby ranks in-group and
    emits ONLY the beyond-cap keys — the driver gather is bounded by the
    cap-overflow volume, not the corpus. Returns None above
    ``max_loser_keys`` (pathological overflow); callers fall back to the
    full-shuffle in-group cut (``cap_per_host``). Unparseable/None hosts
    are never dropped. Pathological single hosts (a 100M-page domain)
    bound the in-group sort — shard such hosts upstream or lower block
    size; group payload is 3 slim columns either way."""
    from ..cluster import cluster_cpus, default_partitions

    if host_fn is None:
        from ..functions.urls import host_of

        host_fn = host_of
    P = default_partitions()

    slim = ray.data.read_parquet(
        input_path, columns=[key, order_col],
        override_num_blocks=cluster_cpus() * 2,
    )

    def partial(df):
        import numpy as np
        import pandas as pd

        hosts = df[key].map(host_fn)
        out = pd.DataFrame(
            {
                "host": hosts,
                "k_": df[key],
                "ord_us": pd.to_datetime(df[order_col]).astype("int64"),
            }
        )
        out = out[out["host"].notna()]
        if out.empty:
            return pd.DataFrame(
                {
                    "host": pd.Series(dtype="object"),
                    "k_": pd.Series(dtype="object"),
                    "ord_us": pd.Series(dtype="int64"),
                }
            )
        return out.groupby(["host", "k_"], as_index=False)["ord_us"].max()

    def add_pkey(df):
        import pandas as pd

        from ..stages.analyze import _term_pkey

        df = df.copy()
        if len(df) == 0:
            df["pkey"] = pd.Series(dtype="int64")
            return df
        df["pkey"] = _term_pkey(df["host"].to_numpy(dtype=object), P)
        return df

    def losers_in_partition(g):
        # ONE vectorized pass over ALL hosts co-located in this hash
        # partition (a per-host map_groups would invoke pandas once per
        # host — measured 18 s vs <1 s at sf0.01)
        import pandas as pd

        if "k_" not in g.columns:
            return pd.DataFrame({"k_": pd.Series(dtype="object")})
        u = g.groupby(["host", "k_"], as_index=False)["ord_us"].max()
        u = u.sort_values(
            ["host", "ord_us", "k_"], ascending=[True, False, True]
        )
        rank = u.groupby("host").cumcount()
        return u.loc[rank >= int(k), ["k_"]]

    losers = (
        slim.map_batches(partial, batch_format="pandas")
        .map_batches(add_pkey, batch_format="pandas")
        .groupby("pkey", num_partitions=P)
        .map_groups(losers_in_partition, batch_format="pandas")
        .materialize()  # loser-scale; count + gather reuse blocks
    )
    # count-then-columnar-gather: a row-based take(max+1) materializes
    # Python dicts per row (measured 100×the pipeline wall at 400k
    # losers); the over-budget probe must not pay that
    if losers.count() > max_loser_keys:
        return None
    df = losers.to_pandas()
    if len(df) == 0 or "k_" not in df.columns:
        return set()
    return set(df["k_"])


def make_loser_filter(losers_ref, key: str = "url"):
    """Batch filter dropping rows whose ``key`` is in the broadcast loser
    set — the apply side of ``compute_host_cap_losers`` (one vectorized
    ``pc.is_in`` per batch; the value-set array builds once per worker
    process, the ``make_winner_filter`` pattern)."""
    state: dict = {}

    def drop_losers(batch: pa.Table) -> pa.Table:
        if "keys" not in state:
            state["keys"] = pa.array(
                sorted(ray.get(losers_ref)), pa.string()
            )
        if len(state["keys"]) == 0:
            return batch
        bad = pc.fill_null(
            pc.is_in(batch[key], value_set=state["keys"]), False
        )
        if not pc.any(bad).as_py():
            return batch
        return batch.filter(pc.invert(bad))

    return drop_losers


def cap_per_host(
    input_path: Union[str, Sequence[str], ray.data.Dataset],
    k: int,
    *,
    key: str = "url",
    order_col: str = "warc_ts",
    host_fn=None,
    max_loser_keys: int = 5_000_000,
    include_text: bool = True,
) -> ray.data.Dataset:
    """Keep at most ``k`` distinct pages per host (newest first,
    key-ascending ties). Fast path: the slim loser pre-scan + broadcast
    anti-filter — content rows never shuffle. Above ``max_loser_keys``
    (or for an opaque Dataset input) the full rows route through ONE
    host-keyed groupby with the identical in-group cut — same result,
    one content shuffle (the ``compute_dup_winners``/``dedup_latest``
    degradation contract)."""
    if host_fn is None:
        from ..functions.urls import host_of

        host_fn = host_of

    opaque = isinstance(input_path, ray.data.Dataset)
    losers = None
    if not opaque:
        losers = compute_host_cap_losers(
            input_path, k, key=key, order_col=order_col,
            host_fn=host_fn, max_loser_keys=max_loser_keys,
        )

    if opaque:
        ds = input_path
    else:
        ds = read_pages(input_path, include_text=include_text)

    if losers is not None:
        if not losers:
            return ds
        return ds.map_batches(
            make_loser_filter(ray.put(losers), key=key),
            batch_format="pyarrow",
        )

    # full-shuffle fallback: hash-partition full rows by host, ONE
    # vectorized in-partition cut per partition (per-URL-newest rank,
    # keep all rows of each host's top-k URLs; None hosts always
    # survive). The same one-pass pandas shape as the loser pre-scan —
    # a per-host map_groups would call pandas once per host.
    from ..cluster import default_partitions
    from ..stages.analyze import _term_pkey

    P = default_partitions()

    def add_host(df):
        import pandas as pd

        df = df.copy()
        df["__host"] = df[key].map(lambda u: host_fn(u) or "\x00none")
        if len(df) == 0:
            df["__pkey"] = pd.Series(dtype="int64")
            return df
        df["__pkey"] = _term_pkey(df["__host"].to_numpy(dtype=object), P)
        return df

    def cut(g):
        if key not in g.columns:
            return g
        capped = g[g["__host"] != "\x00none"]
        passthru = g[g["__host"] == "\x00none"]
        if not capped.empty:
            u = (
                capped.assign(__ord=capped[order_col].astype("int64"))
                .groupby(["__host", key], as_index=False)["__ord"]
                .max()
                .sort_values(
                    ["__host", "__ord", key],
                    ascending=[True, False, True],
                )
            )
            u = u[u.groupby("__host").cumcount() < int(k)]
            keep = set(u[key])
            capped = capped[capped[key].isin(keep)]
        import pandas as pd

        return pd.concat([capped, passthru]).drop(
            columns=["__host", "__pkey"]
        )

    return (
        ds.map_batches(add_host, batch_format="pandas")
        .groupby("__pkey", num_partitions=P)
        .map_groups(cut, batch_format="pandas")
    )


def build_deidentify_pipeline(
    input_path: Union[str, Sequence[str], ray.data.Dataset],
    *,
    masking_level: MaskingLevel | str = MaskingLevel.SAFE_HARBOR,
    custom_categories: Optional[Sequence[str]] = None,
    confidence_threshold: float = 0.0,
    mask_style: str = "token",
    dedup: bool = True,
    size_bucket_shuffle: bool = False,
    emit_blocks: bool = False,
    extract_batch_size=None,
    detect_batch_size=None,
    detect_concurrency=None,
    detector_mode: str = "tasks",
    detect_on: str = "extracted",
    extra_patterns: Optional[dict] = None,
    extractor: str = "dom-density",
    detector: str = "regex-ner",
    detector_init: Optional[dict] = None,
    dup_winners: Optional[dict] = None,
    boilerplate_hot=None,
    url_key_fn=None,
    host_cap_losers: Optional[set] = None,
) -> ray.data.Dataset:
    """Build (lazily) the flagship Dataset. Consume with write_parquet /
    iter_batches; nothing materializes here.

    ``detector_mode``: "tasks" (default) runs detection as elastic tasks
    with per-worker-process cached regex state — fastest for the built-in
    cheap-state detector; "actors" runs the SpanDetector as an
    autoscaling actor pool — required when the detector carries heavy
    state (NER model / gazetteer; SURVEY §2.3 ST2).

    ``detector``: registry name (registry.DETECTORS). Any non-default
    detector routes through the actor pool regardless of
    ``detector_mode`` — the registry's alternatives exist precisely
    because their state is expensive (e.g. "trained-ner"'s
    gazetteer + trigram model; pass ``detector_init={"model_ref":
    ray.put(model)}`` so the model ships once per node, not per task).

    ``detect_on``: "extracted" (default) detects over the extractor's
    canonical text — offsets are constructive, no alignment needed;
    "text" detects over the crawl-provided ``text`` column and re-locates
    spans onto ``extracted_text`` with the fuzzy SpanMatcher (the
    reference EntityMatcher path; rows with null ``text`` fall back to
    direct detection)."""
    if detect_concurrency is None:
        # pool floor at half the cluster so a short job ramps fast; cap at
        # cluster CPUs (only used in detector_mode="actors")
        lo, hi = default_pool(min_actors=2)
        detect_concurrency = (max(2, hi // 2), hi)

    # dedup strategy: "broadcast" pre-scans (url, warc_ts) and filters
    # stale duplicates BEFORE extraction — no shuffle of content rows and
    # no wasted extraction of losers; falls back to the full-shuffle path
    # when the winner map would not fit or the input is an opaque Dataset.
    # ``dup_winners``: a caller-supplied winner map — the CLI computes it
    # ONCE over the whole input file list so url dedup is global even when
    # the run is split into resumable partitions (ADVICE r1: per-partition
    # scoping let cross-partition duplicate urls survive).
    winners = None
    shuffle_dedup = False
    if dedup:
        if dup_winners is not None:
            winners = dup_winners
        elif isinstance(input_path, ray.data.Dataset) or dedup == "shuffle":
            shuffle_dedup = True
        else:
            winners = compute_dup_winners(input_path, key_fn=url_key_fn)
            if winners is None:
                shuffle_dedup = True

    if isinstance(input_path, ray.data.Dataset):
        ds = input_path
    else:
        ds = read_pages(input_path, include_text=(detect_on == "text"))

    if host_cap_losers:  # per-host cap: drop beyond-cap urls pre-extract
        ds = ds.map_batches(
            make_loser_filter(ray.put(host_cap_losers)),
            batch_format="pyarrow",
        )
    if winners:  # empty map (no duplicate keys) needs no filter stage
        ds = ds.map_batches(
            make_winner_filter(ray.put(winners), key_fn=url_key_fn),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(
        make_extract_batch(emit_blocks=emit_blocks, extractor=extractor),
        batch_format="pyarrow",
        batch_size=extract_batch_size,
    )
    if shuffle_dedup:
        ds = dedup_latest(ds)
    if boilerplate_hot is not None and len(boilerplate_hot):
        # CCNet-style cross-document boilerplate removal: the hot-line
        # vocabulary is computed ONCE over the full input (CLI
        # --boilerplate-min-docs does the stats pass) and applied here as
        # bounded broadcast anti-filter stages before detection, so nav
        # bars / cookie banners / footers never reach the detector or the
        # output. Chunked exactly like remove_boilerplate_lines — one
        # stage per 20M hashes — so worker sets stay bounded at any hot
        # vocabulary size (the driver holds 8 B/line transiently).
        from ..stages.curate import drop_hot_lines

        _BP_CHUNK = 20_000_000
        for i in range(0, len(boilerplate_hot), _BP_CHUNK):
            ds = drop_hot_lines(
                ds,
                boilerplate_hot[i : i + _BP_CHUNK],
                text_col="extracted_text",
            )
    ds = ds.map_batches(add_size_bucket, batch_format="pyarrow")
    if size_bucket_shuffle:
        # co-locate similar-size rows so giant pages don't straggle inside
        # mixed blocks; at cluster scale use this before the actor stage.
        ds = ds.repartition(default_partitions(mult=4), shuffle=True)
    detector_kwargs = {
        "masking_level": masking_level,
        "custom_categories": custom_categories,
        "extra_patterns": extra_patterns,
    }
    if detect_on == "text":
        # detect over crawl text (null → canonical text), then re-locate
        detector_kwargs["text_col"] = "detect_src"

        def add_detect_src(batch: pa.Table) -> pa.Table:
            src = pc.coalesce(batch["text"], batch["extracted_text"])
            return batch.append_column("detect_src", src)

        ds = ds.map_batches(add_detect_src, batch_format="pyarrow")

    if detector_init:
        detector_kwargs.update(detector_init)
    if detector_mode == "tasks" and detector == "regex-ner":
        ds = ds.map_batches(
            make_detect_batch(**detector_kwargs),
            batch_format="pyarrow",
            batch_size=detect_batch_size,
        )
    else:
        from ..registry import get_detector

        ds = ds.map_batches(
            get_detector(detector),
            fn_constructor_kwargs=detector_kwargs,
            batch_format="pyarrow",
            batch_size=detect_batch_size,
            concurrency=detect_concurrency,
            num_cpus=1,
        )
    if detect_on == "text":
        from ..stages.relocate import make_relocate_batch

        ds = ds.map_batches(
            make_relocate_batch(source_col="text", target_col="extracted_text"),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.drop_columns(["detect_src"]), batch_format="pyarrow"
        )
    ds = ds.map_batches(
        make_mask_batch(confidence_threshold=confidence_threshold, style=mask_style),
        batch_format="pyarrow",
    )
    return ds


def spans_table(out_ds: ray.data.Dataset, include_text: bool = False) -> ray.data.Dataset:
    """Exploded per-span audit table (reference: per-entity DB rows,
    src/tasks.py:147-187; ``include_text`` privacy default False,
    src/api/main.py:344-407)."""
    return out_ds.select_columns(["url", "spans"]).map_batches(
        make_explode_spans(include_text=include_text), batch_format="pyarrow"
    )


OUTPUT_COLUMNS = [
    "url", "warc_ts", "lang", "content_type", "extracted_text", "masked_text",
    "span_count", "size_bucket", "status", "error", "processing_ms",
    "extractor_version",
]


def finalize_output(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Project the flagship output row schema (FIXTURES.md §4)."""
    return out_ds.select_columns(OUTPUT_COLUMNS)
