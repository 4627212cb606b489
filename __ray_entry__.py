"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in redactifai_ray library code) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline smoke: PII detect→merge→mask over the sf0.001
    documents table (the engine's detect/mask chain on driver data), plus
    schema-stable output."""
    import pyarrow as pa
    import ray.data

    from redactifai_ray.functions.mask import mask_text
    from redactifai_ray.stages.detect import SpanDetector

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    class Deidentify:
        def __init__(self):
            self.det = SpanDetector()

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            masked, counts = [], []
            for t in texts:
                m, merged = mask_text(t or "", self.det.detect(t or ""))
                masked.append(m)
                counts.append(len(merged))
            out = batch.append_column("masked_text", pa.array(masked, pa.string()))
            return out.append_column("span_count", pa.array(counts, pa.int32()))

    return docs.map_batches(
        Deidentify, batch_format="pyarrow", concurrency=2, num_cpus=1
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from redactifai_ray.pipelines import queries as q

    return {
        # detection / masking / dedup / analysis over documents
        "regex_counts": q.q_regex_counts,
        "mask_words": q.q_mask_words,
        "dedup_exact": q.q_dedup_exact,
        "lang_counts": q.q_lang_counts,
        "token_stats": q.q_token_stats,
        "quality": q.q_quality,
        "docs_top_longest": q.q_docs_top_longest,
        "quantiles": q.q_quantiles,
        "fingerprints": q.q_fingerprints,
        "bpe_token_counts": q.q_bpe_token_counts,
        "lang_pred_counts": q.q_lang_pred_counts,
        # near-dup families
        "jaccard_dups": q.q_jaccard_dups,
        "hll_distinct": q.q_hll_distinct,
        "minhash_pairs": q.q_minhash_pairs,
        "simhash_pairs": q.q_simhash_pairs,
        "embedding_near_dup": q.q_embedding_near_dup,
        "near_dedup": q.q_near_dedup,
        # similarity search
        "knn": q.q_knn,
        # round-4: PQ/ADC compressed ANN (rows-only: trained quantizer;
        # recall + codes-path equivalence test-pinned)
        "pq_knn": q.q_pq_knn,
        # relational / streaming-shaped
        "tpch_q1": q.q_tpch_q1,
        "tpch_q3": q.q_tpch_q3,
        "tpch_q17": q.q_tpch_q17,
        "sessionize": q.q_sessionize,
        "join_priority_revenue": q.q_join_priority_revenue,
        "user_running": q.q_user_running,
        "orders_by_status": q.q_orders_by_status,
        "top_orders": q.q_top_orders,
        "orders_per_nation": q.q_orders_per_nation,
        "events_window": q.q_events_window,
        "events_type_counts": q.q_events_type_counts,
        "asof_purchase": q.q_asof_purchase,
        "quantity_bands": q.q_quantity_bands,
        "events_sliding": q.q_events_sliding,
        "top_events_per_user": q.q_top_events_per_user,
        "distinct_users_per_type": q.q_distinct_users_per_type,
        "distinct_langs": q.q_distinct_langs,
        "union_sources": q.q_union_sources,
        # webtext flagship (synthetic pages; golden-pinned in tests)
        "extract_pages": q.q_extract_pages,
        "deidentify_pages": q.q_deidentify_pages,
        # corpus-trained gazetteer+trigram NER as an actor pool
        # (rows-only: trained model, non-SQL-expressible)
        "ner_trained": q.q_ner_trained,
        # training-data curation (split / mixture / decontamination /
        # repetition / heavy hitters)
        "split_counts": q.q_split_counts,
        "mixture_sample": q.q_mixture_sample,
        "decontaminate": q.q_decontaminate,
        "repetition": q.q_repetition,
        "top_tokens": q.q_top_tokens,
        "top_bigrams": q.q_top_bigrams,
        # Misra-Gries sketch (rows-only: approximate by design;
        # error bound + hitter presence test-pinned)
        "top_tokens_sketch": q.q_top_tokens_sketch,
        # KLL quantile sketch (rows-only: approximate by design;
        # rank-error bound test-pinned vs the exact `quantiles` path)
        "kll_quantiles": q.q_kll_quantiles,
        "stratified_sample": q.q_stratified_sample,
        # CCNet-style LM-perplexity quality scoring (rows-only: trained
        # bigram LM, non-SQL-expressible; determinism + ordering
        # test-pinned)
        "perplexity": q.q_perplexity,
        "gopher_filter": q.q_gopher_filter,
        "tfidf_top_terms": q.q_tfidf_top_terms,
        # chunk-level first-wins dedup / prefix-sum shard packing /
        # inverted-index build
        "para_dedup": q.q_para_dedup,
        "token_shards": q.q_token_shards,
        "inverted_index": q.q_inverted_index,
        # canonicalization / collocations / semantic clustering
        "normalize_text": q.q_normalize_text,
        "pmi_bigrams": q.q_pmi_bigrams,
        # kmeans_clusters is rows-only (trained centroids; determinism
        # test-pinned)
        "kmeans_clusters": q.q_kmeans_clusters,
        # outlier clipping / semantic dedup / cross-run incremental dedup
        "winsorize": q.q_winsorize,
        "semdedup": q.q_semdedup,
        "incremental_dedup": q.q_incremental_dedup,
        # anti-join / ordered rolling window
        "customers_no_orders": q.q_customers_no_orders,
        "user_rolling_mean": q.q_user_rolling_mean,
        # model-free semantic dedup over text (hash embeddings → SemDeDup;
        # rows-only, determinism + keep/drop test-pinned)
        "text_semdedup": q.q_text_semdedup,
        # grouped exact quantiles / ROLLUP hierarchy / PIVOT
        "grouped_quantiles": q.q_grouped_quantiles,
        "rollup_orders": q.q_rollup_orders,
        "pivot_events": q.q_pivot_events,
        # cross-run incremental NEAR dedup (rows-only: MinHash store;
        # three-increment chain test-pinned)
        "incremental_near_dedup": q.q_incremental_near_dedup,
        # crawl snapshot diff (added/removed/changed/unchanged)
        "snapshot_diff": q.q_snapshot_diff,
        # round-4: the scale-fallback paths run under the same oracle
        # gate as their broadcast twins (caps forced to 0) — the
        # distributed shard-by-term / semi-join / anti-join codepaths
        # are value-oracled, not just equivalence-test-pinned
        # ExactSubstr repeated-substring signal (Lee et al. 2022 shape)
        "repeated_substrings": q.q_repeated_substrings,
        "pmi_sharded": q.q_pmi_sharded,
        "tfidf_sharded": q.q_tfidf_sharded,
        "tpch_q3_semijoin": q.q_tpch_q3_semijoin,
        "customers_no_orders_anti": q.q_customers_no_orders_anti,
        # round-4: six-table star join (Q5) + EXISTS semi-join (Q4-style)
        "tpch_q5": q.q_tpch_q5,
        "tpch_q4r": q.q_tpch_q4r,
        # round-4: true interval join (overlapping campaign windows) +
        # fact×fact conditional-count join (Q12) + dimension-broadcast
        # revenue ratio (Q14)
        "range_join": q.q_range_join,
        "tpch_q12r": q.q_tpch_q12r,
        "tpch_q14r": q.q_tpch_q14r,
        # round-4: BM25 ranked retrieval (exact fixed-point scores)
        "bm25": q.q_bm25,
        # round-4: per-column data-quality profile (nulls/distinct/min/max)
        "profile_docs": q.q_profile_docs,
        # round-4: grouped HLL distinct (rows-only: approximate by
        # design; ±1.6% bound vs the exact path test-pinned)
        "hll_users_per_type": q.q_hll_users_per_type,
        # round-4: Bloom-filter decontamination (rows-only: flagged set
        # is a deterministic superset of the exact one — FP over-flagging
        # is the documented contract; superset + FPR bound test-pinned)
        "decontaminate_bloom": q.q_decontaminate_bloom,
        # round-4: Q6 pushed-down filter-sum, Q10 returned-item top-20,
        # Q18 large-volume customers (HAVING over a fact groupby)
        "tpch_q6": q.q_tpch_q6,
        "tpch_q10r": q.q_tpch_q10r,
        "tpch_q18r": q.q_tpch_q18r,
        # round-4: grouped statistical sufficient statistics (exact int64
        # moments for mean/var/corr), LAG-shaped inter-arrival gaps,
        # grouped mode/argmax
        "lineitem_moments": q.q_lineitem_moments,
        "events_gaps": q.q_events_gaps,
        "top_event_type": q.q_top_event_type,
        # round-4: integer-arithmetic weighted priority sample (A-ES
        # hash-race), dedup cluster-size histogram, FK-orphan validation
        "weighted_sample": q.q_weighted_sample,
        "dup_cluster_sizes": q.q_dup_cluster_sizes,
        "fk_orphans": q.q_fk_orphans,
        # round-4: fixed-length sequence packing (prefix-sum scan),
        # windowed RANK, mixture-planning token budget
        "pack_sequences": q.q_pack_sequences,
        "rank_in_lang": q.q_rank_in_lang,
        # round-4: windowed CUME_DIST via the same histogram fold,
        # float-free (n_le / n_lang int64 pair)
        "cume_dist_in_lang": q.q_cume_dist_in_lang,
        "source_budget": q.q_source_budget,
        # round-4: grouped KLL quantiles (rows-only: approximate by
        # design; rank-error bound vs the exact grouped path test-pinned)
        "kll_grouped": q.q_kll_grouped,
        # round-4: host PageRank (rows-only: iterative float algorithm;
        # dense-power-iteration equivalence + dangling + partitioning
        # invariance test-pinned in tests/test_graph.py)
        "pagerank": q.q_pagerank,
        # round-4: intra-document line dedup (stateless, zero-shuffle)
        "dedup_lines": q.q_dedup_lines,
        # round-4: hashed-feature Naive Bayes classifier (rows-only:
        # trained model; distributed≡serial training test-pinned)
        "nb_lang_classifier": q.q_nb_lang_classifier,
        # round-4: XLM-R-style temperature mixture resampling (α=0.5)
        "temperature_mixture": q.q_temperature_mixture,
        # round-4: Count-Min frequency sketch fold (exact in this
        # regime — see q_cms_lang_counts docstring)
        "cms_lang_counts": q.q_cms_lang_counts,
        # round-4: LEFT-OUTER-JOIN count distribution (TPC-H Q13 shape)
        "tpch_q13r": q.q_tpch_q13r,
        # round-4: aggregate-then-argmax-vs-self, tie-safe (Q15 shape)
        "tpch_q15r": q.q_tpch_q15r,
        # round-4: global scalar subquery + distributed anti-join (Q22)
        "tpch_q22r": q.q_tpch_q22r,
        # round-4: zlib compressibility quality signal (rows-only: SQL
        # has no zlib; exact-int contract test-pinned)
        "compress_ratio": q.q_compress_ratio,
        # round-4: INTERSECT/EXCEPT via one value-keyed flag fold
        "source_setops": q.q_source_setops,
        # round-4: windowed NTILE via histogram fold + tie-bucket groupby
        "ntile_chars": q.q_ntile_chars,
        # round-4: Q7 cross-nation volume — two capped-broadcast lookups
        # + one join-free orderkey merge; _joinfree variant pins the
        # above-cap _lookup_on_key path against the same oracle
        "tpch_q7r": q.q_tpch_q7r,
        "tpch_q7r_joinfree": q.q_tpch_q7r_joinfree,
        # round-4: order-sensitive STRING_AGG funnel paths
        "user_event_path": q.q_user_event_path,
        # round-4: per-key ARGMAX with pre-folded partials
        "latest_event_per_user": q.q_latest_event_per_user,
        # round-4: market-basket co-occurrence (self-join, join-free)
        "event_cooccurrence": q.q_event_cooccurrence,
        # round-4: Q8 market share as an exact int64 numerator/denominator
        "tpch_q8r": q.q_tpch_q8r,
        # round-4: Q8 with caps forced to 0 — semi-join numerator +
        # _lookup_on_key customer path pinned against the same oracle
        "tpch_q8r_joinfree": q.q_tpch_q8r_joinfree,
        # round-4: cohort retention (ARGMIN fold + _lookup_on_key attach)
        "cohort_retention": q.q_cohort_retention,
        # round-4: GROUP BY CUBE from one finest-set pass
        "cube_orders": q.q_cube_orders,
        # round-4: overlapping token-window training-chunk plan
        "chunk_windows": q.q_chunk_windows,
        # round-4: de-id detector as a curation gate (density bp)
        "pii_density": q.q_pii_density,
        # round-4: ordered funnel conversion (ARGMIN chain per user)
        "funnel_conversion": q.q_funnel_conversion,
        # round-4: grouped heavy hitters (exact top-k per key with a
        # provably lossless per-block cut after the global fold)
        "top_tokens_per_lang": q.q_top_tokens_per_lang,
        # round-4: grouped MG sketch (rows-only: approximate by design;
        # per-key bound + wide-regime≡exact test-pinned)
        "top_tokens_per_lang_sketch": q.q_top_tokens_per_lang_sketch,
        # round-4: sentence segmentation (row-expanding flat map)
        "sentences": q.q_sentences,
        # round-4: HLL set algebra (rows-only: approximate by design;
        # tolerance vs exact + merge invariance test-pinned)
        "hll_user_overlap": q.q_hll_user_overlap,
        # round-4: Q19 disjunctive OR-of-ANDs predicate join (zero-shuffle
        # broadcast-mask fast path, _lookup_on_key fallback)
        "tpch_q19r": q.q_tpch_q19r,
        # round-4: Q21 sole-late-supplier EXISTS/NOT-EXISTS pair through
        # ONE orderkey hash-partition merge
        "tpch_q21r": q.q_tpch_q21r,
        # round-4: Q16 COUNT DISTINCT suppliers per part-attr combo via a
        # packed-pair dedup shuffle (no per-group set on the driver)
        "tpch_q16r": q.q_tpch_q16r,
        # round-4: Q9 profit rollup — part filter + supplier→nation
        # broadcast, order-year attach through one orderkey merge
        "tpch_q9r": q.q_tpch_q9r,
        # round-4: per-host page cap (rows-only: pages isn't
        # SQL-registered; brute-force + broadcast≡shuffle test-pinned)
        "host_cap": q.q_host_cap,
        # round-4: Q2 best-supplier-per-part ARGMAX join (completes the
        # 22-query TPC-H shape family together with q11r/q20r below)
        "tpch_q2r": q.q_tpch_q2r,
        # round-4: Q11 fraction-of-global-aggregate HAVING (integer
        # cross-multiply, output pigeonhole-bounded at 999 rows)
        "tpch_q11r": q.q_tpch_q11r,
        # round-4: Q20 nested-aggregate semi-join supplier list
        "tpch_q20r": q.q_tpch_q20r,
        # round-4: COUNT(DISTINCT) over a sliding window — the
        # non-decomposable window shape via pair-dedup shuffles
        "sliding_distinct": q.q_sliding_distinct,
        # round-4: Flesch-style readability features, exact int contract
        "readability": q.q_readability,
        # round-4: connected components vs a recursive-CTE closure twin
        "host_components": q.q_host_components,
        # round-4: PERCENT_RANK in exact floor basis points (completes
        # the window family: RANK/NTILE/CUME_DIST/PERCENT_RANK)
        "percent_rank_in_lang": q.q_percent_rank_in_lang,
        # round-4: UNPIVOT / melt (inverse of the PIVOT op)
        "unpivot_measures": q.q_unpivot_measures,
        # round-4: BPE tokenize-to-ids (rows-only: trained model
        # artifact; roundtrip/determinism/distributed≡serial test-pinned)
        "bpe_ids": q.q_bpe_ids,
        # round-4: exact fuzzy self-join (symmetric-deletion blocking)
        "fuzzy_name_pairs": q.q_fuzzy_name_pairs,
        # round-4: fuzzy join → min-label entity-resolution clustering
        "fuzzy_dedup": q.q_fuzzy_dedup,
        # round-4: deterministic k-per-group sample (reservoir-k analog)
        "grouped_sample_k": q.q_grouped_sample_k,
        # round-4: JSON field extraction (vectorized ->> analog)
        "json_props_stats": q.q_json_props_stats,
        # round-4: exact Jaccard-threshold join (prefix filtering)
        "exact_jaccard_join": q.q_exact_jaccard_join,
        # round-4: exact triangle count (node-iterator + semi-join)
        "triangle_count": q.q_triangle_count,
        # round-4: k-core peeling (rows-only: iterative fixpoint;
        # pinned against a pure-python peel in tests/test_graph.py)
        "kcore": q.q_kcore,
        # round-4: distributed Pareto frontier (local-skyline partial fold)
        "skyline_parts": q.q_skyline_parts,
        # round-4: Z-order/Morton layout key (lakehouse OPTIMIZE ZORDER)
        "zorder_layout": q.q_zorder_layout,
        # round-4: daily resample with zero-filled calendar gaps
        "resample_events": q.q_resample_events,
        # round-4: SCD-2 gaps-and-islands validity intervals
        "scd2_intervals": q.q_scd2_intervals,
        # round-4: exact-integer grouped z-score outlier filter
        "grouped_outliers": q.q_grouped_outliers,
        # round-4: grouped median absolute deviation (two histogram folds)
        "mad_chars": q.q_mad_chars,
        # round-4: Markov transition-count matrix over user streams
        "event_transitions": q.q_event_transitions,
        # round-4: stream-stream interval join (all pairs in window)
        "window_join": q.q_window_join,
        # round-4: per-dimension embedding QA scan (columnar explode)
        "embedding_dim_stats": q.q_embedding_dim_stats,
        # round-4: order-statistic sliding window (rolling median of 3)
        "user_rolling_median": q.q_user_rolling_median,
        # round-4: ratio-to-report in exact integer basis points
        "lang_share_bp": q.q_lang_share_bp,
        # round-4: RFM user segmentation (one-pass fold + band + rollup)
        "rfm_segments": q.q_rfm_segments,
        # round-5: zero-exchange co-located join over hash-bucketed
        # layouts, oracled against the plain DuckDB join
        "bucket_join_counts": q.q_bucket_join_counts,
    }


def oracle_sql() -> dict[str, str]:
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    stop_en = (
        "the of and to in a is that for it as with on be are this by from or "
        "an have not at but they you we his her its was were been has had"
    ).split()
    stop_list = ", ".join(f"'{w}'" for w in stop_en)
    sql = {
        "regex_counts": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{email}', 0, 'i'))::BIGINT AS n_email,
                   len(regexp_extract_all(text, '\\d{{3}}-\\d{{3}}-\\d{{4}}'))::BIGINT AS n_phone,
                   len(regexp_extract_all(text, '\\btable\\b'))::BIGINT AS n_table,
                   len(regexp_extract_all(text, '\\bkey\\b'))::BIGINT AS n_key
            FROM documents
        """,
        "mask_words": """
            -- 'i' flag matches SpanDetector's default IGNORECASE compile,
            -- so implementation and oracle agree by construction on
            -- mixed-case corpora (ADVICE r1)
            SELECT doc_id,
                   regexp_replace(text, '\\btable\\b', '[TABLE]', 'gi') AS masked_text
            FROM documents
        """,
        "dedup_exact": """
            SELECT doc_id, md5(text) AS text_md5
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        """,
        "lang_counts": """
            SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
        """,
        "token_stats": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe_tokens,
                   len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))::BIGINT AS n_punct,
                   len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n_words
            FROM documents
        """,
        "quality": f"""
            WITH feats AS (
                SELECT doc_id,
                       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                       w -> list_contains([{stop_list}], w)))::BIGINT AS n_stopwords,
                       len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n_words,
                       len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))::BIGINT AS n_punct,
                       len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
                       length(text)::BIGINT AS n_chars
                FROM documents
            )
            SELECT doc_id, n_stopwords,
                   0.4 * (CASE WHEN n_words > 0 THEN n_stopwords::DOUBLE / n_words ELSE 0.0 END)
                 + 0.3 * least(1.0, n_tokens::DOUBLE / 100.0)
                 + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END)
                   AS quality_score
            FROM feats
        """,
        "docs_top_longest": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20
        """,
        "quantiles": """
            SELECT 'p50' AS q, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS n_chars_q FROM documents
            UNION ALL
            SELECT 'p90', CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
            UNION ALL
            SELECT 'p99', CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents
        """,
        "knn": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            scored AS (
                SELECT q.qid AS query_id, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id ASC
                       ) AS rank
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.qid
            )
            SELECT query_id, vec_id, rank FROM scored WHERE rank <= 5
        """,
        "tpch_q1": """
            -- money sums via exact fixed-point int64 so the result is
            -- independent of accumulation order (see q_tpch_q1 docstring)
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
                   sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS sum_disc_price,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT l.l_orderkey,
                   sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
                   o.o_orderdate
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1995-03-15'
              AND l.l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue DESC, l.l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q5": """
            -- money sum via exact fixed-point int64 (q_tpch_q5 docstring)
            SELECT n_name,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                                  + 0.5) AS BIGINT)) AS revenue_c
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY revenue_c DESC, n_name
        """,
        "tpch_q4r": """
            -- Q4-style EXISTS adapted to this schema (no commit/receipt
            -- dates): orders with at least one returned lineitem
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "profile_docs": """
            -- per-column profile; min/max cast to VARCHAR to mirror the
            -- Ray side's uniform string output schema (int columns
            -- compare zero-padded there, so order stays numeric)
            SELECT 'lang' AS col_name, count(*)::BIGINT AS n_rows,
                   (count(*) - count(lang))::BIGINT AS n_nulls,
                   count(DISTINCT lang)::BIGINT AS n_distinct,
                   min(lang) AS min_v, max(lang) AS max_v
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*)::BIGINT,
                   (count(*) - count(n_chars))::BIGINT,
                   count(DISTINCT n_chars)::BIGINT,
                   CAST(min(n_chars) AS VARCHAR),
                   CAST(max(n_chars) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', count(*)::BIGINT,
                   (count(*) - count(source))::BIGINT,
                   count(DISTINCT source)::BIGINT,
                   min(source), max(source)
            FROM documents
            ORDER BY col_name
        """,
        "bm25": """
            -- Okapi BM25, same tokenization as the tf-idf family
            -- (lowercase \\S+ split). Each (doc, term) contribution
            -- rounds to int64 micro-units with the same IEEE expression
            -- as the Ray side BEFORE the per-doc sum, so the comparison
            -- is exact: ints only, no order-dependent float accumulation.
            WITH ws AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            ),
            stats AS (
                SELECT count(*)::BIGINT AS n_docs,
                       sum(len(w))::BIGINT AS total_tokens
                FROM ws
            ),
            terms(term) AS (
                VALUES ('hash'), ('join'), ('merge'), ('table')
            ),
            df AS (
                SELECT term, count(*)::BIGINT AS df
                FROM ws, terms
                WHERE list_contains(w, term)
                GROUP BY term
            ),
            tf AS (
                SELECT doc_id, term,
                       len(list_filter(w, x -> x = term))::BIGINT AS tf,
                       len(w)::BIGINT AS dl
                FROM ws, terms
                WHERE len(w) > 0
            ),
            scored AS (
                SELECT tf.doc_id,
                       sum(CAST(floor(
                           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * (tf.tf * (1.2 + 1.0))
                           / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * tf.dl
                                   / (s.total_tokens * 1.0 / s.n_docs)))
                           * 1000000.0 + 0.5) AS BIGINT)) AS bm25_u
                FROM tf
                JOIN df USING (term)
                CROSS JOIN stats s
                WHERE tf.tf > 0
                GROUP BY tf.doc_id
            )
            SELECT doc_id, bm25_u FROM scored
            WHERE bm25_u > 0
            ORDER BY bm25_u DESC, doc_id ASC
            LIMIT 20
        """,
        "range_join": """
            -- true interval join: campaigns overlap (y2k ∩ y2k_extend),
            -- so one order can contribute to several rows. LEFT JOIN from
            -- the interval side mirrors the Ray plan's always-emit-k
            -- partials (a campaign with zero orders still appears, 0/0).
            WITH campaigns(campaign, lo, hi) AS (
                VALUES
                    ('holiday95', TIMESTAMP '1995-11-01', TIMESTAMP '1996-01-15'),
                    ('summer98',  TIMESTAMP '1998-06-01', TIMESTAMP '1998-09-01'),
                    ('y2k',       TIMESTAMP '1999-06-01', TIMESTAMP '2000-03-01'),
                    ('y2k_extend',TIMESTAMP '1999-12-01', TIMESTAMP '2000-06-30')
            )
            SELECT c.campaign,
                   count(o.o_orderdate)::BIGINT AS n_orders,
                   coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                     AS BIGINT)), 0)::BIGINT AS rev_c
            FROM campaigns c
            LEFT JOIN orders o
                   ON o.o_orderdate >= c.lo AND o.o_orderdate < c.hi
            GROUP BY c.campaign
            ORDER BY c.campaign
        """,
        "tpch_q12r": """
            -- Q12 adapted: l_linestatus stands in for shipmode (absent
            -- from the testdata schema); CASE counts per Q12
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "tpch_q14r": """
            -- Q14 adapted (p_type is exactly 'PROMO', no LIKE needed);
            -- per-lineitem revenue fixes to int64 cents BEFORE the sum on
            -- both sides, so the comparison is exact. total_rev_c is
            -- join-independent by construction (scalar subquery without
            -- part), mirroring the Ray single-pass plan.
            SELECT
                (SELECT coalesce(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                            * 10000 + 0.5) AS BIGINT)
                            ELSE 0 END), 0)::BIGINT
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                   AND l_shipdate < TIMESTAMP '1997-10-01') AS promo_rev_c,
                (SELECT coalesce(sum(CAST(floor(l_extendedprice
                            * (1 - l_discount) * 10000 + 0.5) AS BIGINT)),
                            0)::BIGINT
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                   AND l_shipdate < TIMESTAMP '1997-10-01') AS total_rev_c
        """,
        "tpch_q17": """
            -- correlated scalar subquery written as aggregate-then-rejoin;
            -- money sum via exact fixed-point int64 (q_tpch_q17 docstring)
            WITH avgq AS (
                SELECT l.l_partkey, 0.2 * AVG(l.l_quantity) AS thr
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = 'Brand#23'
                GROUP BY l.l_partkey
            )
            SELECT sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 / 7.0
                       AS avg_yearly,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN avgq a ON l.l_partkey = a.l_partkey
            WHERE l.l_quantity < a.thr
        """,
        "sessionize": """
            WITH gaps AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            tagged AS (
                SELECT user_id, ts, event_id,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       )::BIGINT AS session_id
                FROM gaps
            )
            SELECT user_id, session_id,
                   count(*)::BIGINT AS n_events,
                   min(ts) AS session_start,
                   max(ts) AS session_end
            FROM tagged
            GROUP BY user_id, session_id
        """,
        "join_priority_revenue": """
            SELECT o.o_orderpriority,
                   sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
                   count(*)::BIGINT AS n_lineitems
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "user_running": """
            SELECT user_id, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )::BIGINT AS event_idx
            FROM events
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*)::BIGINT AS n,
                   max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
            FROM orders GROUP BY o_orderstatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "orders_per_nation": """
            SELECT n.n_name, count(*)::BIGINT AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "events_window": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*)::BIGINT AS n_events,
                   max(value) AS max_value, min(value) AS min_value
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "events_type_counts": """
            SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY event_type
        """,
        "asof_purchase": """
            -- as-of join: each click picks up the most recent prior-or-
            -- equal purchase by the same user; the purchase side pre-
            -- aggregates to unique (user, ts) so exact-ts ties break
            -- identically in both engines
            WITH clicks AS (
                SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
            ),
            purch AS (
                SELECT user_id, ts,
                       max(value) AS purchase_value,
                       max(event_id) AS purchase_event_id
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts
            )
            SELECT c.user_id, c.event_id, p.purchase_event_id, p.purchase_value
            FROM clicks c ASOF JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "events_sliding": """
            -- sliding window: 2h window, 1h slide → every event in
            -- exactly two windows (starts at trunc(ts) and trunc(ts)-1h)
            SELECT date_trunc('hour', ts) - to_hours(k) AS window_start,
                   count(*)::BIGINT AS n_events,
                   max(value) AS max_value, min(value) AS min_value
            FROM events, (VALUES (0), (1)) AS s(k)
            GROUP BY 1
        """,
        "top_events_per_user": """
            SELECT user_id, event_id, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id ASC
            ) <= 3
        """,
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "quantity_bands": """
            -- banded range join against a small interval table
            WITH bands(band, lo, hi) AS (VALUES
                ('b00_10', 0.0, 10.0), ('b10_20', 10.0, 20.0),
                ('b20_30', 20.0, 30.0), ('b30_40', 30.0, 40.0),
                ('b40_60', 40.0, 60.0))
            SELECT b.band, count(*)::BIGINT AS n_items,
                   sum(CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_qty
            FROM lineitem l JOIN bands b
              ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
            GROUP BY b.band
        """,
        "jaccard_dups": """
            -- exact word-trigram Jaccard >= 0.8 over distinct gram sets;
            -- docs with < 3 words contribute their whole text as one gram
            -- (mirrors shingle_hashes' short-text fallback)
            WITH words AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 3 THEN
                           list_distinct(list_transform(
                               generate_series(1, len(ws) - 2),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                       WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
                       ELSE [] END AS gs
                FROM words
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.gs, b.gs))::DOUBLE
                       / len(list_distinct(list_concat(a.gs, b.gs))) AS jaccard
            FROM grams a JOIN grams b ON a.doc_id < b.doc_id
            WHERE len(list_distinct(list_concat(a.gs, b.gs))) > 0
              AND len(list_intersect(a.gs, b.gs))::DOUBLE
                      / len(list_distinct(list_concat(a.gs, b.gs))) >= 0.8
        """,
        "distinct_langs": """
            SELECT DISTINCT lang FROM documents ORDER BY lang
        """,
        "union_sources": """
            SELECT source, count(*)::BIGINT AS n FROM (
                SELECT doc_id, source FROM documents WHERE n_chars < 200
                UNION ALL
                SELECT doc_id, source FROM documents WHERE n_chars >= 400
            ) GROUP BY source
        """,
        "split_counts": """
            WITH b AS (
                SELECT doc_id, n_chars,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                           % 100 AS bk
                FROM documents
            )
            SELECT CASE WHEN bk < 80 THEN 'train'
                        WHEN bk < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*)::BIGINT AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM b GROUP BY 1 ORDER BY split
        """,
        "mixture_sample": """
            WITH b AS (
                SELECT source,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                           % 10000 AS bk,
                       (CAST(substr(source, 4) AS INT) % 4 + 1) / 4.0 AS w
                FROM documents
            )
            SELECT source, count(*)::BIGINT AS n_kept
            FROM b WHERE bk < floor(w * 10000)
            GROUP BY source ORDER BY source
        """,
        "decontaminate": """
            WITH ws AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            ),
            g AS (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(w) - 12), i ->
                    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '
                    ||w[i+5]||' '||w[i+6]||' '||w[i+7]||' '||w[i+8]||' '||w[i+9]
                    ||' '||w[i+10]||' '||w[i+11]||' '||w[i+12])) AS g13
                FROM ws
            )
            SELECT DISTINCT a.doc_id
            FROM g a JOIN g b ON a.g13 = b.g13
            WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
            ORDER BY a.doc_id
        """,
        "repetition": """
            WITH ws AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            ),
            bg AS (
                SELECT doc_id, w, list_transform(
                    generate_series(1, len(w) - 1), i -> w[i]||' '||w[i+1]) AS g
                FROM ws
            ),
            mw AS (
                SELECT doc_id, max(c) AS mx FROM (
                    SELECT doc_id, word, count(*) AS c
                    FROM (SELECT doc_id, unnest(w) AS word FROM ws)
                    GROUP BY doc_id, word
                ) GROUP BY doc_id
            )
            SELECT b.doc_id,
                   len(b.w)::BIGINT AS n_words,
                   CASE WHEN len(b.w) = 0 THEN 0.0
                        ELSE 1.0 - len(list_distinct(b.w)) * 1.0 / len(b.w)
                   END AS dup_word_frac,
                   CASE WHEN len(b.g) = 0 THEN 0.0
                        ELSE 1.0 - len(list_distinct(b.g)) * 1.0 / len(b.g)
                   END AS dup_2gram_frac,
                   CASE WHEN len(b.w) = 0 THEN 0.0
                        ELSE mw.mx * 1.0 / len(b.w)
                   END AS top_word_frac
            FROM bg b LEFT JOIN mw USING (doc_id)
            ORDER BY b.doc_id
        """,
        "gopher_filter": """
            WITH ws AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            ),
            mw AS (
                SELECT doc_id, max(c) AS mx FROM (
                    SELECT doc_id, word, count(*) AS c
                    FROM (SELECT doc_id, unnest(w) AS word FROM ws)
                    GROUP BY doc_id, word
                ) GROUP BY doc_id
            ),
            f AS (
                SELECT ws.doc_id,
                       len(ws.w)::BIGINT AS n_words,
                       CASE WHEN len(ws.w) = 0 THEN 0.0
                            ELSE 1.0 - len(list_distinct(ws.w)) * 1.0 / len(ws.w)
                       END AS dup_word_frac,
                       CASE WHEN len(ws.w) = 0 THEN 0.0
                            ELSE mw.mx * 1.0 / len(ws.w)
                       END AS top_word_frac,
                       CASE WHEN len(ws.w) = 0 THEN 0.0
                            ELSE list_sum(list_transform(ws.w, x -> length(x))) * 1.0 / len(ws.w)
                       END AS mean_word_len
                FROM ws LEFT JOIN mw USING (doc_id)
            )
            SELECT doc_id, n_words, dup_word_frac, top_word_frac, mean_word_len,
                   (n_words BETWEEN 30 AND 100000
                    AND dup_word_frac <= 0.55
                    AND top_word_frac <= 0.20
                    AND mean_word_len BETWEEN 3.0 AND 10.0) AS keep
            FROM f ORDER BY doc_id
        """,
        "tfidf_top_terms": """
            WITH ws AS (
                SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            ),
            tf AS (
                SELECT doc_id, word AS term, count(*)::BIGINT AS tf
                FROM (SELECT doc_id, unnest(w) AS word FROM ws)
                GROUP BY doc_id, word
            ),
            df AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term
            ),
            n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, df, tfidf FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) <= 3
            ORDER BY doc_id, term
        """,
        "top_tokens": """
            SELECT w AS token, count(*)::BIGINT AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w
                  FROM documents)
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 50
        """,
        "stratified_sample": """
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                        % 1000000,
                                    doc_id) AS rn
                FROM documents
            ) WHERE rn <= 3
            ORDER BY source, doc_id
        """,
        "top_bigrams": """
            WITH ws AS (
                SELECT regexp_extract_all(lower(text), '\\S+') AS w
                FROM documents
            )
            SELECT g AS bigram, count(*)::BIGINT AS n
            FROM (SELECT unnest(list_transform(
                      generate_series(1, len(w) - 1), i -> w[i]||' '||w[i+1])) AS g
                  FROM ws)
            GROUP BY bigram
            ORDER BY n DESC, bigram ASC
            LIMIT 50
        """,
        "para_dedup": """
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ),
            c AS (
                SELECT doc_id, i AS chunk_idx,
                       array_to_string(toks[(i*10+1):((i+1)*10)], ' ') AS chunk
                FROM d, UNNEST(range(0, cast(ceil(len(toks)/10.0) AS int))) AS t(i)
            ),
            kept AS (
                SELECT doc_id, chunk_idx, chunk,
                       row_number() OVER (
                           PARTITION BY chunk ORDER BY doc_id, chunk_idx
                       ) = 1 AS keep
                FROM c
            )
            SELECT d2.doc_id,
                   coalesce(string_agg(CASE WHEN kept.keep THEN kept.chunk END,
                                       ' ' ORDER BY kept.chunk_idx), '') AS dedup_text,
                   count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN kept.keep THEN 1 ELSE 0 END)::BIGINT AS n_chunks_kept
            FROM (SELECT doc_id FROM documents) d2
            LEFT JOIN kept USING (doc_id)
            GROUP BY d2.doc_id
            ORDER BY d2.doc_id
        """,
        "token_shards": """
            WITH c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+'))::BIGINT AS n
                FROM documents
            ),
            s AS (
                SELECT doc_id, n,
                       coalesce(sum(n) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS cum_before
                FROM c
            )
            SELECT (cum_before // 10000)::BIGINT AS shard_id,
                   count(*)::BIGINT AS n_docs,
                   sum(n)::BIGINT AS sum_tokens
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "inverted_index": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            d AS (
                SELECT term, doc_id, count(*)::BIGINT AS tf
                FROM tok GROUP BY 1, 2
            ),
            r AS (
                SELECT term, doc_id, tf,
                       row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
                FROM d
            )
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total,
                   string_agg(CASE WHEN rn <= 5 THEN cast(doc_id AS varchar) END,
                              ',' ORDER BY doc_id) AS posting_head
            FROM r GROUP BY term ORDER BY term
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(nfc_normalize(lower(text)),
                                       '\\s+', ' ', 'g')) AS norm_text
            FROM documents ORDER BY doc_id
        """,
        "pmi_bigrams": """
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            uni AS (
                SELECT w, count(*)::BIGINT AS c
                FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w
            ),
            bi AS (
                SELECT bg, count(*)::BIGINT AS c_xy
                FROM (SELECT unnest(list_transform(range(1, len(ws)),
                                   j -> ws[j] || ' ' || ws[j+1])) AS bg
                      FROM d)
                GROUP BY bg
            ),
            tot AS (
                SELECT (SELECT sum(c) FROM uni)::BIGINT AS n_uni,
                       (SELECT sum(c_xy) FROM bi)::BIGINT AS n_bi
            )
            SELECT split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2,
                   c_xy AS n_xy,
                   ln((c_xy * 1.0 * n_uni * n_uni) /
                      (n_bi * 1.0 * u1.c * u2.c)) AS pmi
            FROM bi CROSS JOIN tot
            JOIN uni u1 ON u1.w = split_part(bg, ' ', 1)
            JOIN uni u2 ON u2.w = split_part(bg, ' ', 2)
            WHERE c_xy >= 5
            ORDER BY w1, w2
        """,
        "winsorize": """
            WITH cuts AS (
                SELECT quantile_disc(n_chars, 0.05) AS lo,
                       quantile_disc(n_chars, 0.95) AS hi
                FROM documents
            )
            SELECT doc_id, n_chars,
                   least(greatest(n_chars, lo), hi)::BIGINT AS n_chars_winsor
            FROM documents CROSS JOIN cuts
            ORDER BY doc_id
        """,
        "incremental_dedup": """
            WITH evens AS (
                SELECT DISTINCT md5(text) AS h FROM documents
                WHERE doc_id % 2 = 0
            ),
            odd AS (
                SELECT doc_id, md5(text) AS h FROM documents
                WHERE doc_id % 2 = 1
            )
            SELECT doc_id FROM odd
            WHERE h NOT IN (SELECT h FROM evens)
            QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
            ORDER BY doc_id
        """,
        "customers_no_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
            )
            ORDER BY c_custkey
        """,
        "user_rolling_mean": """
            SELECT user_id, event_id,
                   avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS rolling_mean
            FROM events
            ORDER BY user_id, event_id
        """,
        "grouped_quantiles": """
            SELECT o_orderstatus,
                   quantile_disc(cast(round(o_totalprice*100) AS BIGINT), 0.5)
                       / 100.0 AS p50,
                   quantile_disc(cast(round(o_totalprice*100) AS BIGINT), 0.9)
                       / 100.0 AS p90
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "rollup_orders": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*)::BIGINT AS n
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus, o_orderpriority
        """,
        "pivot_events": """
            SELECT user_id,
                   sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)::BIGINT AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "snapshot_diff": """
            WITH hi AS (SELECT max(doc_id) + 1 AS m FROM documents),
            a AS (
                SELECT doc_id, md5(text) AS h FROM documents, hi
                WHERE doc_id < (m * 3) // 5
            ),
            b AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
                                ELSE text END) AS h
                FROM documents, hi
                WHERE doc_id >= (m * 2) // 5
            )
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.h = b.h THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            ORDER BY doc_id
        """,
        # lang_pred_counts / fingerprints / minhash_pairs / simhash_pairs /
        # embedding_near_dup / extract_pages / deidentify_pages /
        # kmeans_clusters: non-SQL-expressible (stateful sketches, custom
        # hashing, HTML DOM walk, trained centroids) → rows-only driver
        # checks; correctness pinned in tests/.
    }
    sql["repeated_substrings"] = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        pos AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 7)) AS i
            FROM toks WHERE len(t) >= 8
        ),
        wins AS (
            SELECT doc_id, array_to_string(t[i:i+7], ' ') AS w FROM pos
        ),
        dup AS (
            SELECT w FROM wins GROUP BY w
            HAVING count(DISTINCT doc_id) > 1
        )
        SELECT doc_id, count(*)::BIGINT AS n_dup_windows
        FROM wins WHERE w IN (SELECT w FROM dup)
        GROUP BY doc_id ORDER BY doc_id
    """
    # round-4 scale-fallback registrations: identical results, identical
    # oracles — the queries only force the distributed codepaths (cap=0)
    sql["pmi_sharded"] = sql["pmi_bigrams"]
    sql["tfidf_sharded"] = sql["tfidf_top_terms"]
    sql["tpch_q3_semijoin"] = sql["tpch_q3"]
    sql["customers_no_orders_anti"] = sql["customers_no_orders"]
    sql["tpch_q6"] = """
        -- Q6 forecasting revenue change; per-lineitem revenue fixes to
        -- int64 fixed-point BEFORE summation on both sides (exact)
        SELECT coalesce(sum(CAST(floor(l_extendedprice * l_discount
                                       * 10000 + 0.5) AS BIGINT)), 0)::BIGINT
                   AS revenue_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """
    sql["tpch_q10r"] = """
        -- Q10 returned-item report: top-20 customers by exact-cents
        -- revenue, ties broken by custkey so the row-set is deterministic
        SELECT c_custkey, c_name, n_name, rev_c FROM (
            SELECT c.c_custkey, c.c_name, n.n_name,
                   sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000 + 0.5) AS BIGINT))::BIGINT AS rev_c
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1996-04-01'
              AND l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, n.n_name
        ) ORDER BY rev_c DESC, c_custkey ASC LIMIT 20
    """
    sql["tpch_q18r"] = """
        -- Q18 large-volume customers: quantities are integral doubles in
        -- the data, so the HAVING sum is exact int64 on both sides
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS totalprice_c,
               t.sum_qty
        FROM (
            SELECT l_orderkey,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        ) t
        JOIN orders o   ON o.o_orderkey = t.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """
    sql["lineitem_moments"] = """
        -- grouped sufficient statistics, all exact int64 (discount fixed
        -- to basis points with the same floor(x*100+0.5) as the Ray side)
        SELECT l_returnflag,
               count(*)::BIGINT AS n_rows,
               sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_q,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT))::BIGINT AS sum_q2,
               sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))::BIGINT
                   AS sum_d,
               sum(CAST(l_quantity AS BIGINT)
                   * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))::BIGINT
                   AS sum_qd
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """
    sql["events_gaps"] = """
        -- LAG window shape; gaps in exact epoch microseconds (diffs of a
        -- sorted multiset are tie-order-independent)
        SELECT user_id,
               sum(CASE WHEN gap_us > 300000000 THEN 1 ELSE 0 END)::BIGINT
                   AS n_long_gaps,
               max(gap_us)::BIGINT AS max_gap_us
        FROM (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap_us
            FROM events
        ) WHERE gap_us IS NOT NULL
        GROUP BY user_id
    """
    sql["top_event_type"] = """
        -- grouped mode/argmax; ties broken by event_type ASC on both sides
        SELECT user_id, event_type AS top_type, n FROM (
            SELECT user_id, event_type, count(*)::BIGINT AS n,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type ASC) AS rk
            FROM events GROUP BY user_id, event_type
        ) WHERE rk = 1
    """
    sql["weighted_sample"] = """
        -- A-ES hash-race weighted sample: integer key u32 // weight (the
        -- same md5-hex-prefix uniform as the split/mixture ops), global
        -- 100 smallest under the strict (key, doc_id) order
        SELECT doc_id, source, weight, race_key FROM (
            SELECT doc_id, source,
                   (CAST(substr(source, 4) AS BIGINT) % 4 + 1)::BIGINT
                       AS weight,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       // (CAST(substr(source, 4) AS BIGINT) % 4 + 1)
                       AS race_key
            FROM documents
        ) ORDER BY race_key ASC, doc_id ASC LIMIT 100
    """
    sql["dup_cluster_sizes"] = """
        SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM (
            SELECT md5(coalesce(text, '')) AS h, count(*)::BIGINT AS cluster_size
            FROM documents GROUP BY h
        ) GROUP BY cluster_size ORDER BY cluster_size
    """
    sql["pack_sequences"] = """
        -- fixed-length (512-token) sequence packing plan: exclusive
        -- prefix sum over the id-ordered whitespace-token stream; empty
        -- docs park in their cursor's sequence (greatest(n,1))
        WITH c AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n
            FROM documents
        ),
        s AS (
            SELECT doc_id, n,
                   coalesce(sum(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS start_pos
            FROM c
        )
        SELECT doc_id, n AS n_tokens, start_pos,
               (start_pos // 512)::BIGINT AS first_seq,
               ((start_pos + greatest(n, 1) - 1) // 512)::BIGINT AS last_seq,
               (start_pos % 512)::BIGINT AS offset_in_first
        FROM s
    """
    sql["rank_in_lang"] = """
        SELECT doc_id, lang,
               rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)::BIGINT
                   AS rnk
        FROM documents
    """
    sql["cume_dist_in_lang"] = """
        -- CUME_DIST kept float-free as (inclusive ties-count, total):
        -- the default RANGE frame includes current-row ties exactly
        SELECT doc_id, lang,
               count(*) OVER (PARTITION BY lang
                              ORDER BY n_chars)::BIGINT AS n_le,
               count(*) OVER (PARTITION BY lang)::BIGINT AS n_lang
        FROM documents
    """
    sql["source_budget"] = """
        WITH c AS (
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(len(regexp_extract_all(text, '\\S+')))::BIGINT
                       AS sum_tokens
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, sum_tokens,
               (sum_tokens * 10000 // greatest(
                   (SELECT sum(sum_tokens) FROM c), 1))::BIGINT AS share_bp
        FROM c ORDER BY source
    """
    sql["dedup_lines"] = """
        -- intra-doc first-wins line dedup; empty lines are structural
        -- (kept unconditionally); rebuilt with ORDER BY position
        WITH ls AS (
            SELECT doc_id, string_split(text, chr(10)) AS a FROM documents
        ),
        pos AS (
            SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i
            FROM ls
        ),
        lines AS (SELECT doc_id, a[i] AS l, i FROM pos),
        keep AS (
            SELECT doc_id, l, i,
                   CASE WHEN l = '' THEN true
                        ELSE row_number() OVER (
                            PARTITION BY doc_id, l ORDER BY i) = 1
                   END AS k
            FROM lines
        )
        SELECT doc_id,
               coalesce(string_agg(l, chr(10) ORDER BY i)
                            FILTER (WHERE k), '') AS text_dedup,
               count(*)::BIGINT AS n_lines,
               sum(CASE WHEN k THEN 1 ELSE 0 END)::BIGINT AS n_lines_kept
        FROM keep GROUP BY doc_id
    """
    sql["temperature_mixture"] = """
        -- α=0.5 temperature resampling: keep rate per language is
        -- sqrt(n_min/n) (downsampling-only, rarest keeps all); the
        -- division, sqrt and ×10000 are all correctly-rounded double
        -- ops, so the floor threshold is bit-identical to the engine's
        WITH c AS (
            SELECT lang, count(*)::BIGINT AS n
            FROM documents GROUP BY lang
        ),
        m AS (SELECT min(n) AS n_min FROM c),
        b AS (
            SELECT d.lang,
                   ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                   1, 8))::BIGINT % 10000 AS bk,
                   floor(sqrt(CAST(m.n_min AS DOUBLE) / c.n)
                         * 10000) AS thr
            FROM documents d, c, m WHERE d.lang = c.lang
        )
        SELECT lang, count(*)::BIGINT AS n_kept
        FROM b WHERE bk < thr GROUP BY lang ORDER BY lang
    """
    sql["cms_lang_counts"] = """
        -- Count-Min point estimates are exactly the counts here (5
        -- distinct values, width 2048, depth-5 min; deterministic hash)
        SELECT lang, count(*)::BIGINT AS n_docs
        FROM documents GROUP BY lang ORDER BY lang
    """
    sql["tpch_q13r"] = """
        -- Q13 shape: order-count distribution per customer, zero-order
        -- customers included (LEFT OUTER JOIN); priority filter stands
        -- in for Q13's comment NOT LIKE (no comment column in testdata)
        WITH c_orders AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count::BIGINT AS c_count,
               count(*)::BIGINT AS custdist
        FROM c_orders GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """
    sql["tpch_q15r"] = """
        -- Q15 shape: top supplier(s) by quarter revenue, tie-safe;
        -- revenue fixes to int64 1/10000-dollar units BEFORE summation
        -- on both sides (exact)
        WITH revenue AS (
            SELECT l_suppkey AS s_suppkey,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT))::BIGINT
                       AS total_revenue_c
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue_c
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.s_suppkey
        WHERE r.total_revenue_c = (SELECT max(total_revenue_c)
                                   FROM revenue)
        ORDER BY s.s_suppkey
    """
    sql["tpch_q22r"] = """
        -- Q22 shape: above-average positive balance + NOT EXISTS
        -- orders, by nation; the above-average predicate is the exact
        -- integer cross-multiply bal_c * n > total_c (no float avg)
        WITH c AS (
            SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
            FROM customer
        ),
        s AS (
            SELECT sum(bal_c)::BIGINT AS total_c,
                   count(*)::BIGINT AS n
            FROM c WHERE bal_c > 0
        )
        SELECT c.c_nationkey,
               count(*)::BIGINT AS numcust,
               sum(c.bal_c)::BIGINT AS totacctbal_c
        FROM c, s
        WHERE c.bal_c * s.n > s.total_c
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """
    sql["fk_orphans"] = """
        SELECT 'lineitem_orders' AS relation,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))::BIGINT
                   AS n_orphans
        UNION ALL
        SELECT 'orders_customer' AS relation,
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))::BIGINT
                   AS n_orphans
    """
    sql["source_setops"] = """
        -- INTERSECT / EXCEPT over two sources' distinct length sets
        WITH a AS (SELECT DISTINCT n_chars FROM documents WHERE source = 'src0'),
             b AS (SELECT DISTINCT n_chars FROM documents WHERE source = 'src1')
        SELECT 'except' AS op, n_chars::BIGINT AS n_chars
        FROM (SELECT n_chars FROM a EXCEPT SELECT n_chars FROM b)
        UNION ALL
        SELECT 'intersect' AS op, n_chars::BIGINT AS n_chars
        FROM (SELECT n_chars FROM a INTERSECT SELECT n_chars FROM b)
        ORDER BY op, n_chars
    """
    sql["ntile_chars"] = """
        -- deterministic NTILE: ties broken by doc_id on BOTH sides
        SELECT doc_id, lang,
               NTILE(4) OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id)::BIGINT AS tile
        FROM documents ORDER BY doc_id
    """
    sql["tpch_q7r"] = """
        -- Q7 shape: cross-nation volume between an unordered nation
        -- pair, ship years 1996-1997; revenue in exact int64
        -- 1/10000-dollar units on both sides
        WITH pair AS (
            SELECT n_nationkey, n_name FROM nation
            WHERE n_name IN ('NATION_3', 'NATION_8')
        )
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 10000 + 0.5) AS BIGINT))::BIGINT AS revenue_c
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN pair sn    ON sn.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN pair cn    ON cn.n_nationkey = c.c_nationkey
        WHERE sn.n_name <> cn.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """
    sql["tpch_q7r_joinfree"] = sql["tpch_q7r"]
    sql["user_event_path"] = """
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS path,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY user_id ORDER BY user_id
    """
    sql["latest_event_per_user"] = """
        SELECT user_id, event_id, event_type,
               epoch_us(ts)::BIGINT AS ts_us
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id
    """
    sql["event_cooccurrence"] = """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*)::BIGINT AS n_users
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    sql["tpch_q8r"] = """
        -- Q8 shape: market share of one supplier nation within one
        -- region's customer revenue, per ship year, as an exact int64
        -- numerator/denominator pair. The numerator membership test is
        -- a semi-join (IN), matching the Ray searchsorted tag — no
        -- supplier inner join on the denominator.
        WITH focus AS (
            SELECT s_suppkey FROM supplier
            WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                                  WHERE n_name = 'NATION_3')
        ),
        ro AS (
            SELECT o.o_orderkey FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_nationkey IN (
                SELECT n.n_nationkey FROM nation n
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = 'ASIA'
            )
        )
        SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               sum(CASE WHEN l.l_suppkey IN (SELECT s_suppkey FROM focus)
                        THEN CAST(floor(l.l_extendedprice
                                        * (1 - l.l_discount)
                                        * 10000 + 0.5) AS BIGINT)
                        ELSE 0 END)::BIGINT AS nation_rev_c,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 10000 + 0.5) AS BIGINT))::BIGINT
                   AS total_rev_c
        FROM lineitem l
        JOIN ro ON ro.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1
    """
    sql["tpch_q8r_joinfree"] = sql["tpch_q8r"]
    sql["cohort_retention"] = """
        -- weeks as exact int64 epoch-µs floor-div (no tz/locale traps)
        WITH act AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS week
            FROM events
        ),
        coh AS (
            SELECT user_id, min(week) AS cohort_week
            FROM act GROUP BY user_id
        )
        SELECT c.cohort_week::BIGINT AS cohort_week,
               a.week::BIGINT AS active_week,
               count(*)::BIGINT AS n_users
        FROM act a JOIN coh c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    sql["cube_orders"] = """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               count(*)::BIGINT AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY 1, 2
    """
    sql["chunk_windows"] = """
        -- W=128 S=96 overlapping token windows; window count is exact
        -- int math: 1 + ceil((n-128)/96) for n>128, 1 for 0<n<=128
        WITH d AS (
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT
                       AS n_tok
            FROM documents
        ),
        w AS (
            SELECT doc_id, n_tok,
                   CASE WHEN n_tok = 0 THEN 0
                        WHEN n_tok <= 128 THEN 1
                        ELSE 1 + (n_tok - 128 + 95) // 96 END AS n_win
            FROM d
        )
        SELECT doc_id,
               g::BIGINT AS chunk_id,
               (g * 96)::BIGINT AS tok_start,
               least(g * 96 + 128, n_tok)::BIGINT AS tok_end
        FROM (
            SELECT doc_id, n_tok, unnest(range(0, n_win)) AS g
            FROM w WHERE n_win > 0
        )
        ORDER BY doc_id, chunk_id
    """
    sql["sentences"] = """
        WITH p AS (
            SELECT doc_id,
                   string_split_regex(coalesce(text, ''),
                                      '[.!?]+\\s+') AS parts
            FROM documents
        )
        SELECT doc_id,
               sent_idx::BIGINT AS sent_idx,
               length(parts[sent_idx + 1])::BIGINT AS sent_chars
        FROM (
            SELECT doc_id, parts,
                   unnest(range(0, len(parts))) AS sent_idx
            FROM p
        )
        ORDER BY doc_id, sent_idx
    """
    sql["top_tokens_per_lang"] = """
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_extract_all(lower(text), '\\S+')) AS token
            FROM documents
        )
        SELECT lang, token, n FROM (
            SELECT lang, token, count(*)::BIGINT AS n,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY count(*) DESC, token ASC)
                       AS rn
            FROM tok GROUP BY lang, token
        ) WHERE rn <= 5
        ORDER BY lang, n DESC, token
    """
    sql["funnel_conversion"] = """
        -- strict-order funnel: first view < first click < first purchase
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN epoch_us(ts) END) AS t_view,
                   min(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) END) AS t_click,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS t_purchase
            FROM events GROUP BY user_id
        ),
        depth AS (
            SELECT CASE WHEN t_view IS NULL THEN 0
                        WHEN t_click IS NULL OR t_click <= t_view THEN 1
                        WHEN t_purchase IS NULL OR t_purchase <= t_click
                            THEN 2
                        ELSE 3 END AS d
            FROM firsts
        )
        SELECT 'view' AS step, count(*) FILTER (d >= 1)::BIGINT AS n_users
        FROM depth
        UNION ALL
        SELECT 'click', count(*) FILTER (d >= 2)::BIGINT FROM depth
        UNION ALL
        SELECT 'purchase', count(*) FILTER (d >= 3)::BIGINT FROM depth
        ORDER BY step
    """
    sql["pii_density"] = f"""
        -- raw (pre-merge) case-insensitive matches, same convention as
        -- regex_counts; density = floor(spans * 10000 / chars)
        WITH c AS (
            SELECT doc_id,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   (len(regexp_extract_all(coalesce(text, ''),
                         '\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}\\b',
                         0, 'i'))
                    + len(regexp_extract_all(coalesce(text, ''),
                          '\\(\\d{{3}}\\)\\s*\\d{{3}}-\\d{{4}}', 0, 'i'))
                    + len(regexp_extract_all(coalesce(text, ''),
                          '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', 0, 'i'))
                    + len(regexp_extract_all(coalesce(text, ''),
                          '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', 0, 'i')))::BIGINT
                       AS n_spans
            FROM documents
        )
        SELECT doc_id, n_spans, n_chars,
               (CASE WHEN n_chars > 0
                     THEN (n_spans * 10000) // n_chars
                     ELSE 0 END)::BIGINT AS density_bp,
               (CASE WHEN n_chars > 0
                     THEN ((n_spans * 10000) // n_chars) <= 100
                     ELSE TRUE END)::BIGINT AS keep
        FROM c ORDER BY doc_id
    """
    sql["tpch_q19r"] = """
        -- Q19 adapted: brand+size stand in for brand+container (the
        -- testdata part has no container / lineitem no shipmode);
        -- per-row revenue fixes to int64 1/10000-dollar before the sum
        SELECT coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT)),
                        0)::BIGINT AS revenue_c
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """
    sql["tpch_q21r"] = """
        -- Q21 adapted: "late" = shipped > 90 days after order date (no
        -- commitdate/receiptdate in the testdata); the EXISTS /
        -- NOT-EXISTS pair folds to per-order distinct-supplier counts
        WITH f AS (
            SELECT o_orderkey, o_orderdate FROM orders
            WHERE o_orderstatus = 'F'
        ),
        j AS (
            SELECT l_orderkey AS k, l_suppkey AS s,
                   (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
            FROM lineitem JOIN f ON l_orderkey = o_orderkey
        ),
        per AS (
            SELECT k,
                   count(DISTINCT s) AS ns,
                   count(DISTINCT CASE WHEN late THEN s END) AS nl,
                   max(CASE WHEN late THEN s END) AS sole
            FROM j GROUP BY k
        )
        SELECT s_name, count(*)::BIGINT AS numwait
        FROM per JOIN supplier ON s_suppkey = sole
        WHERE ns >= 2 AND nl = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """
    sql["tpch_q16r"] = """
        -- Q16 adapted: the (partkey, suppkey) relationship is evidenced
        -- from lineitem (no partsupp) and negative acctbal stands in
        -- for complaint suppliers (no s_comment)
        SELECT p_brand, p_type, p_size::BIGINT AS p_size,
               count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#12'
          AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """
    sql["tpch_q9r"] = """
        -- Q9 adapted: profit = discounted revenue (no partsupp
        -- supplycost in the testdata); part filter is substring 'red'
        SELECT n_name AS nation,
               year(o_orderdate)::BIGINT AS o_year,
               sum(CAST(floor(l_extendedprice * (1 - l_discount)
                              * 10000 + 0.5) AS BIGINT))::BIGINT
                   AS profit_c
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE contains(p_name, 'red')
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """
    sql["tpch_q2r"] = """
        -- Q2 adapted: max-acctbal region supplier stands in for min
        -- supplycost (no partsupp); the relationship is lineitem-
        -- evidenced; ties break on the smaller suppkey
        WITH pt AS (
            SELECT p_partkey FROM part
            WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
        ),
        es AS (
            SELECT s_suppkey, s_name, n_name,
                   CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
            FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey
            FROM lineitem JOIN pt ON p_partkey = l_partkey
        ),
        ranked AS (
            SELECT l_partkey, s_name, n_name, bal_c,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY bal_c DESC, l_suppkey
                   ) AS rn
            FROM pairs JOIN es ON s_suppkey = l_suppkey
        )
        SELECT bal_c AS s_acctbal_c, s_name, n_name AS nation,
               l_partkey AS p_partkey
        FROM ranked WHERE rn = 1
        ORDER BY s_acctbal_c DESC, nation, s_name, p_partkey
        LIMIT 100
    """
    sql["tpch_q11r"] = """
        -- Q11 adapted: lineitem revenue from region suppliers stands in
        -- for supplycost*availqty; threshold = 1/1000 of the regional
        -- total via integer cross-multiplication (no float division)
        WITH es AS (
            SELECT s_suppkey FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        v AS (
            SELECT l_partkey,
                   sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT))::BIGINT
                       AS value_c
            FROM lineitem JOIN es ON s_suppkey = l_suppkey
            GROUP BY l_partkey
        )
        SELECT l_partkey, value_c FROM v
        WHERE value_c * 1000 > (SELECT sum(value_c) FROM v)
        ORDER BY value_c DESC, l_partkey
    """
    sql["tpch_q20r"] = """
        -- Q20 adapted: absolute 1997 shipped-quantity threshold stands
        -- in for the half-of-availqty predicate (no partsupp);
        -- quantities are integral by data contract → exact int64
        WITH q AS (
            SELECT l_suppkey,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE contains(p_name, 'red')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > 50
        )
        SELECT s_name, qty
        FROM q
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
        ORDER BY s_name
    """
    sql["sliding_distinct"] = """
        -- distinct users per 2h/1h sliding window: every event lands in
        -- exactly two windows; DISTINCT inside the count mirrors the Ray
        -- pair-dedup shuffle
        SELECT window_start, count(DISTINCT user_id)::BIGINT AS n_users
        FROM (
            SELECT date_trunc('hour', ts) AS window_start, user_id
            FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, user_id
            FROM events
        )
        GROUP BY window_start ORDER BY window_start
    """
    sql["readability"] = """
        -- exact integer readability features; ratios are floor basis
        -- points with zero denominators clamped to 1
        SELECT doc_id, n_words, n_sentences, n_syllables,
               ((n_words * 10000) // greatest(n_sentences, 1))::BIGINT
                   AS wps_bp,
               ((n_syllables * 10000) // greatest(n_words, 1))::BIGINT
                   AS spw_bp
        FROM (
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text, ''),
                       '\\S+'))::BIGINT AS n_words,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[.!?]+'))::BIGINT AS n_sentences,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '[aeiouy]+'))::BIGINT AS n_syllables
            FROM documents
        )
        ORDER BY doc_id
    """
    sql["host_components"] = """
        -- connected components of the deterministic 200-host graph via
        -- a recursive-CTE transitive closure (UNION dedup terminates
        -- cycles); component = min reachable host id, matching the Ray
        -- min-label propagation exactly
        WITH RECURSIVE
        e0 AS (
            SELECT (doc_id % 200) AS a,
                   ((doc_id % 200) + 4 * (1 + doc_id % 47)) % 200 AS b
            FROM documents
        ),
        e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT a AS n FROM e),
        reach(a, b) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
        )
        SELECT a::BIGINT AS host, min(b)::BIGINT AS component
        FROM reach GROUP BY a ORDER BY host
    """
    sql["percent_rank_in_lang"] = """
        -- PERCENT_RANK as exact floor basis points: (rank-1)*10000 //
        -- max(n_partition-1, 1) — no float division on either side
        SELECT doc_id, lang,
               (((rnk - 1) * 10000)
                   // greatest(n_part - 1, 1))::BIGINT AS pr_bp
        FROM (
            SELECT doc_id, lang,
                   rank() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC) AS rnk,
                   count(*) OVER (PARTITION BY lang) AS n_part
            FROM documents
        )
        ORDER BY doc_id
    """
    sql["unpivot_measures"] = """
        -- UNPIVOT: four lineitem measures to long rows, each fixed to
        -- int64 1/10000 units (quantities are integral so qty*10000 is
        -- exact)
        SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
               measure, value_c
        FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                   CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)
                       AS value_c FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'extendedprice',
                   CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)
                FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount',
                   CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
                FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'tax',
                   CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)
                FROM lineitem
        )
        ORDER BY l_orderkey, l_linenumber, measure
    """
    sql["fuzzy_name_pairs"] = """
        -- exact edit-distance<=1 similarity self-join; the engine uses
        -- symmetric-deletion blocking, the oracle brute-forces the
        -- cross join with DuckDB's built-in levenshtein
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               levenshtein(a.c_name, b.c_name)::BIGINT AS dist
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY id_a, id_b
    """
    sql["fuzzy_dedup"] = """
        -- entity-resolution clustering: connected components over the
        -- brute-force levenshtein<=1 pair graph via a recursive-CTE
        -- transitive closure; component = min reachable custkey,
        -- matching the Ray min-label propagation exactly (singletons
        -- label themselves via the seed row)
        WITH RECURSIVE
        p AS (
            SELECT a.c_custkey AS x, b.c_custkey AS y
            FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        ),
        e AS (SELECT x AS a, y AS b FROM p UNION SELECT y, x FROM p),
        reach(a, b) AS (
            SELECT c_custkey, c_custkey FROM customer
            UNION
            SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
        )
        SELECT a::BIGINT AS c_custkey, min(b)::BIGINT AS component
        FROM reach GROUP BY a ORDER BY c_custkey
    """
    sql["grouped_sample_k"] = """
        -- deterministic k-per-group sample: smallest md5(doc_id) hex
        -- digests win within each lang (doc_id tiebreak), matching the
        -- engine's distributed partial-top-k fold bit-exactly
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 20
        ORDER BY lang, doc_id
    """
    sql["json_props_stats"] = """
        -- JSON scalar extraction + aggregate; the engine's vectorized
        -- extractor matches ->> semantics value-for-value
        SELECT event_type,
               count(props->>'k')::BIGINT AS n,
               sum(CAST(props->>'k' AS BIGINT))::BIGINT AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """
    sql["exact_jaccard_join"] = """
        -- exact Jaccard>=1/2 set-similarity self-join over 5-word
        -- shingles, brute-forced: the engine's prefix-filter join must
        -- find exactly these pairs with these intersection sizes.
        -- string_split(text,' ') mirrors the engine's explicit
        -- single-space tokenization; the threshold is cross-multiplied
        -- (2c >= na+nb-c) so no floats appear on either side
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' '
                          || w[i+4] || ' ' || w[i+5] AS s
            FROM docs, unnest(range(0, greatest(len(w) - 4, 0))) AS t(i)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT ia AS id_a, ib AS id_b, c::BIGINT AS n_shared
        FROM inter
        JOIN sz sa ON sa.doc_id = ia
        JOIN sz sb ON sb.doc_id = ib
        WHERE 2 * c >= (sa.n + sb.n - c)
        ORDER BY id_a, id_b
    """
    sql["triangle_count"] = """
        -- exact triangles of the deterministic 200-host graph via the
        -- brute-force 3-way self-join over canonical (a<b) distinct
        -- edges; each triangle {a<b<c} counted once
        WITH e0 AS (
            SELECT DISTINCT
                least(doc_id % 200,
                      (doc_id % 200 + 4 * (1 + doc_id % 47)) % 200) AS a,
                greatest(doc_id % 200,
                         (doc_id % 200 + 4 * (1 + doc_id % 47)) % 200) AS b
            FROM documents
        )
        SELECT count(*)::BIGINT AS n_triangles
        FROM e0 x
        JOIN e0 y ON y.a = x.a AND y.b > x.b
        JOIN e0 z ON z.a = x.b AND z.b = y.b
    """
    sql["skyline_parts"] = """
        -- Pareto frontier (minimize price, maximize size); identical
        -- points do not dominate each other, so exact-tie rows survive
        SELECT p_partkey, p_size::BIGINT AS p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size))
    """
    zterms = " + ".join(
        f"((((p_size::BIGINT >> {i}) & 1) << {2 * i})"
        f" + ((((p_partkey::BIGINT & 65535) >> {i}) & 1) << {2 * i + 1}))"
        for i in range(16)
    )
    sql["zorder_layout"] = f"""
        -- 16-bit Morton interleave of (p_size, p_partkey & 0xFFFF),
        -- spelled out as the 32-term bit sum
        SELECT p_partkey, ({zterms})::BIGINT AS zval
        FROM part
        ORDER BY zval, p_partkey
        LIMIT 200
    """
    sql["resample_events"] = """
        WITH c AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ),
        b AS (SELECT min(date_trunc('day', ts)) AS lo,
                     max(date_trunc('day', ts)) AS hi FROM events),
        days AS (
            SELECT unnest(generate_series((SELECT lo FROM b),
                                          (SELECT hi FROM b),
                                          INTERVAL 1 DAY)) AS day
        ),
        t AS (SELECT DISTINCT event_type FROM events)
        SELECT t.event_type, epoch_us(days.day)::BIGINT AS day_us,
               coalesce(c.n, 0)::BIGINT AS n
        FROM t CROSS JOIN days
        LEFT JOIN c ON c.event_type = t.event_type AND c.day = days.day
    """
    sql["scd2_intervals"] = """
        -- gaps-and-islands: one row per run of consecutive identical
        -- event_types per user; open last interval -> sentinel -1
        WITH o AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        ch AS (
            SELECT user_id, event_type, ts, event_id FROM o
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type,
               epoch_us(ts)::BIGINT AS valid_from_us,
               coalesce(epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ))::BIGINT, -1) AS valid_to_us
        FROM ch
    """
    sql["grouped_outliers"] = """
        -- |x - mean| > 2*sigma (population), exact via the squared
        -- integer predicate in HUGEINT — no float compare anywhere
        WITH s AS (
            SELECT lang, count(*)::HUGEINT AS cnt,
                   sum(n_chars)::HUGEINT AS sm,
                   sum(n_chars::HUGEINT * n_chars)::HUGEINT AS sq
            FROM documents GROUP BY lang
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d JOIN s USING (lang)
        WHERE (d.n_chars::HUGEINT * cnt - sm)
              * (d.n_chars::HUGEINT * cnt - sm)
              > 4 * (cnt * sq - sm * sm)
    """
    sql["mad_chars"] = """
        WITH m AS (
            SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
            FROM documents GROUP BY lang
        )
        SELECT d.lang, m.med,
               CAST(quantile_disc(abs(d.n_chars - m.med), 0.5) AS BIGINT)
                   AS mad
        FROM documents d JOIN m USING (lang)
        GROUP BY d.lang, m.med
    """
    sql["event_transitions"] = """
        WITH o AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type, count(*)::BIGINT AS n
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """
    sql["window_join"] = """
        -- stream-stream interval join: ALL same-user (click, purchase)
        -- pairs with 0 <= gap <= 30 min (not the as-of single match)
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
               (epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS gap_us
        FROM events c JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """
    sql["embedding_dim_stats"] = """
        -- per-dimension min/max/count; picked values promote
        -- float32 -> float64 exactly on both sides
        SELECT i::BIGINT AS dim,
               min(embedding[i + 1])::DOUBLE AS vmin,
               max(embedding[i + 1])::DOUBLE AS vmax,
               count(*)::BIGINT AS n
        FROM embeddings, unnest(range(0, 64)) AS t(i)
        GROUP BY 1
    """
    sql["user_rolling_median"] = """
        -- full windows only: median of 3 is a picked value, bit-exact
        SELECT user_id, event_id,
               median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med3
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts, event_id) >= 3
    """
    sql["lang_share_bp"] = """
        -- share-of-total as floor basis points in HUGEINT — no floats
        SELECT lang, sum(n_chars)::BIGINT AS chars,
               ((10000 * sum(n_chars)::HUGEINT)
                // (SELECT sum(n_chars)::HUGEINT FROM documents))::BIGINT
                   AS share_bp
        FROM documents GROUP BY lang
    """
    sql["rfm_segments"] = """
        -- exact-integer RFM: recency in µs vs the global max event
        -- time, monetary as floor-cents before summation
        WITH per_user AS (
            SELECT user_id,
                   epoch_us(max(ts))::BIGINT AS last_us,
                   count(*)::BIGINT AS n,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
                       AS cents
            FROM events GROUP BY user_id
        ),
        banded AS (
            SELECT CASE
                     WHEN (SELECT max(last_us) FROM per_user) - last_us
                          <= 43200000000::BIGINT THEN 2
                     WHEN (SELECT max(last_us) FROM per_user) - last_us
                          <= 86400000000::BIGINT THEN 1
                     ELSE 0 END AS r_band,
                   CASE WHEN n >= 70 THEN 2
                        WHEN n >= 60 THEN 1 ELSE 0 END AS f_band,
                   CASE WHEN cents >= 350000 THEN 2
                        WHEN cents >= 300000 THEN 1 ELSE 0 END AS m_band
            FROM per_user
        )
        SELECT r_band::BIGINT AS r_band, f_band::BIGINT AS f_band,
               m_band::BIGINT AS m_band, count(*)::BIGINT AS n_users
        FROM banded GROUP BY 1, 2, 3
    """
    sql["bucket_join_counts"] = """
        -- witness that the bucket-pairwise union of joins IS the join
        SELECT o_orderpriority,
               count(*)::BIGINT AS n_items,
               sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))::BIGINT
                   AS sum_qty_c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """
    return sql
