"""Hashing utility tests: stability across processes, MinHash accuracy,
SimHash locality."""

import subprocess
import sys
import pytest

import numpy as np

from redactifai_ray.functions.hashing import (
    hamming64,
    md5_hex,
    minhash_permutations,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
    stable_hash64,
)


class TestStability:
    def test_stable_across_processes(self):
        # would fail with builtin hash() (per-process salt)
        code = (
            "from redactifai_ray.functions.hashing import stable_hash64;"
            "print(stable_hash64('the quick brown fox', 7))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True,
            cwd="/root/repo",
        ).stdout.strip()
        assert int(out) == stable_hash64("the quick brown fox", 7)

    def test_seed_changes_hash(self):
        assert stable_hash64("x", 0) != stable_hash64("x", 1)

    def test_md5_matches_duckdb(self):
        import duckdb

        assert md5_hex("abc") == duckdb.sql("select md5('abc')").fetchone()[0]


class TestMinHash:
    def test_jaccard_estimate(self):
        a_words = [f"w{i}" for i in range(100)]
        b_words = [f"w{i}" for i in range(50)] + [f"v{i}" for i in range(50)]
        text_a = " ".join(a_words)
        text_b = " ".join(b_words)
        perms = minhash_permutations(256)
        sa = minhash_signature(shingle_hashes(text_a, k=1), *perms)
        sb = minhash_signature(shingle_hashes(text_b, k=1), *perms)
        est = (sa == sb).mean()
        # true Jaccard = 50/150 ≈ 0.333
        assert abs(est - 1 / 3) < 0.12

    def test_identical_texts_identical_signature(self):
        perms = minhash_permutations(64)
        t = "some repeated document text with several words in it"
        sa = minhash_signature(shingle_hashes(t), *perms)
        sb = minhash_signature(shingle_hashes(t), *perms)
        assert np.array_equal(sa, sb)

    def test_empty_text_sentinel(self):
        perms = minhash_permutations(8)
        sig = minhash_signature(shingle_hashes(""), *perms)
        assert (sig == np.iinfo(np.uint64).max).all()


class TestSimHash:
    def test_near_duplicates_close(self):
        base = " ".join(f"word{i}" for i in range(200))
        edited = base.replace("word100", "edited100")
        different = " ".join(f"other{i}" for i in range(200))
        d_near = hamming64(simhash64(base), simhash64(edited))
        d_far = hamming64(simhash64(base), simhash64(different))
        assert d_near < 8
        assert d_far > 20

    def test_empty(self):
        assert simhash64("") == 0


class TestFingerprint:
    def test_deterministic_hex(self):
        t = "a document with enough words to form shingles of length five here"
        assert rolling_fingerprint(t) == rolling_fingerprint(t)
        assert len(rolling_fingerprint(t)) == 16

    def test_sensitive_to_edits_insensitive_to_padding(self):
        t = "one two three four five six seven eight nine ten"
        assert rolling_fingerprint(t) != rolling_fingerprint(t.replace("five", "5"))


class TestBloom:
    def test_no_false_negatives(self):
        from redactifai_ray.functions.bloom import BloomFilter

        bf = BloomFilter(1000, fpr=0.01)
        keys = [f"key-{i}" for i in range(1000)]
        bf.update(keys)
        assert all(k in bf for k in keys)

    def test_false_positive_rate_bounded(self):
        from redactifai_ray.functions.bloom import BloomFilter

        bf = BloomFilter(1000, fpr=0.01)
        bf.update(f"key-{i}" for i in range(1000))
        fp = sum(1 for i in range(10000) if f"other-{i}" in bf)
        assert fp / 10000 < 0.03  # ~3x slack on the 1% target

    def test_deterministic_across_builds(self):
        from redactifai_ray.functions.bloom import BloomFilter
        import numpy as np

        a = BloomFilter(100, 0.01); a.update(["x", "y", "z"])
        b = BloomFilter(100, 0.01); b.update(["x", "y", "z"])
        assert np.array_equal(a.bits, b.bits)

    def test_anti_join_batch_filter(self, ray_session):
        import ray
        import ray.data

        from redactifai_ray.functions.bloom import (
            bloom_semi_join_filter,
            make_bloom_filter_batch,
        )

        bf = bloom_semi_join_filter([f"u{i}" for i in range(0, 100, 2)])
        ref = ray.put(bf)
        ds = ray.data.from_items([{"url": f"u{i}", "v": i} for i in range(100)])
        # anti-join: keep keys NOT in the filter — exact (no false negatives
        # means nothing in the filter survives)
        out = ds.map_batches(
            make_bloom_filter_batch(ref, "url", keep_members=False),
            batch_format="pyarrow",
        ).to_pandas()
        assert set(out["v"]) <= set(range(1, 100, 2))
        # semi-join keeps all true members (+ maybe false positives)
        out2 = ds.map_batches(
            make_bloom_filter_batch(ref, "url", keep_members=True),
            batch_format="pyarrow",
        ).to_pandas()
        assert set(range(0, 100, 2)) <= set(out2["v"])


class TestHyperLogLog:
    def test_accuracy_and_merge(self):
        import numpy as np

        from redactifai_ray.functions.sketch import HyperLogLog

        n = 50_000
        a = HyperLogLog(12)
        b = HyperLogLog(12)
        a.update(f"key-{i}" for i in range(0, n, 2))
        b.update(f"key-{i}" for i in range(1, n, 2))
        # overlap: b also sees half of a's keys (dedup across sketches)
        b.update(f"key-{i}" for i in range(0, n // 2, 2))
        a.merge(b)
        est = a.count()
        assert abs(est - n) / n < 0.05  # 1.6% expected at p=12

    def test_small_range_exactish(self):
        from redactifai_ray.functions.sketch import HyperLogLog

        h = HyperLogLog(12)
        h.update(f"v{i}" for i in range(100))
        assert abs(h.count() - 100) < 5  # linear counting regime

    def test_deterministic_and_serializable(self):
        from redactifai_ray.functions.sketch import HyperLogLog

        x = HyperLogLog(10)
        y = HyperLogLog(10)
        x.update(["a", "b", "c"])
        y.update(["c", "b", "a"])  # order-independent
        assert x.to_bytes() == y.to_bytes()
        z = HyperLogLog.from_bytes(x.to_bytes(), 10)
        assert z.count() == x.count()

    def test_distributed_fold(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import hll_distinct

        ds = ray.data.from_items(
            [{"k": f"user-{i % 1000}"} for i in range(20_000)]
        )
        est = hll_distinct(ds, "k", p=12)
        assert abs(est - 1000) / 1000 < 0.05

    def test_tree_merge_matches_direct_fold(self, ray_session):
        """Register-max is associative/exact, so a forced deep tree
        (fanin=2 over many blocks) must produce the identical estimate
        as a flat driver fold."""
        import ray.data

        from redactifai_ray.functions.sketch import hll_distinct

        items = [{"k": f"user-{i % 700}"} for i in range(8_000)]
        ds = ray.data.from_items(items).repartition(16)
        deep = hll_distinct(ds, "k", p=12, merge_fanin=2)
        flat = hll_distinct(ds, "k", p=12, merge_fanin=1_000_000)
        assert deep == flat
        assert abs(deep - 700) / 700 < 0.05


class TestBpe:
    def test_train_deterministic_and_merges_learned(self):
        from redactifai_ray.functions.bpe import BpeTokenizer, train_bpe

        freqs = {"lower": 5, "low": 7, "newest": 6, "widest": 3}
        m1 = train_bpe(freqs, n_merges=10)
        m2 = train_bpe(freqs, n_merges=10)
        assert m1 == m2 and len(m1) > 0
        tok = BpeTokenizer(m1)
        # frequent substrings compress into fewer symbols than chars
        assert len(tok.encode_word("lowest")) < len("lowest") + 1

    def test_encoder_roundtrip_surface(self):
        from redactifai_ray.functions.bpe import END, BpeTokenizer, train_bpe

        freqs = {"aaaa": 10, "aaab": 5}
        tok = BpeTokenizer(train_bpe(freqs, n_merges=5))
        toks = tok.encode("aaaa aaab")
        # concatenation restores the text (with end-of-word sentinels)
        joined = "".join(toks).replace(END, " ").strip()
        assert joined == "aaaa aaab"

    def test_unsampled_fold_matches_sampled(self, ray_session):
        """sample_rows=None routes through the shuffle-reduce before the
        driver gather (round-4 VERDICT #5) — counts must be identical to
        the sampled path when the sample covers the whole input."""
        import ray.data

        from redactifai_ray.functions.bpe import word_frequencies
        from redactifai_ray.functions.lm import ngram_counts
        from redactifai_ray.stages.ner import collect_token_stats

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        ).limit(120)
        assert word_frequencies(docs, sample_rows=None) == word_frequencies(
            docs, sample_rows=1_000_000
        )
        u1, b1 = ngram_counts(docs, sample_rows=None)
        u2, b2 = ngram_counts(docs, sample_rows=1_000_000)
        assert u1 == u2 and b1 == b2
        assert collect_token_stats(docs, sample_rows=None) == (
            collect_token_stats(docs, sample_rows=1_000_000)
        )

    def test_distributed_train_and_count(self, ray_session):
        import ray.data

        from redactifai_ray.functions.bpe import (
            add_bpe_count,
            train_bpe,
            word_frequencies,
        )

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )
        freqs = word_frequencies(docs, sample_rows=200)
        merges = train_bpe(freqs, n_merges=100)
        assert len(merges) > 50
        out = add_bpe_count(docs.limit(50), merges).to_pandas()
        assert (out["n_bpe_trained"] > 0).all()
        # trained BPE compresses the corpus it was trained on: fewer
        # tokens than characters, more than whitespace words
        n_words = out["text"].str.split().str.len()
        n_chars = out["text"].str.len()
        assert (out["n_bpe_trained"] >= n_words).all()
        assert (out["n_bpe_trained"] < n_chars).all()


class TestMisraGries:
    def test_error_bound_and_presence(self):
        """MG guarantees: est <= true <= est + N/(k+1); any item with
        true count > N/(k+1) is stored."""
        import random

        from collections import Counter

        from redactifai_ray.functions.sketch import MisraGries

        rng = random.Random(7)
        # skewed stream: few heavy hitters over a wide tail
        stream = (
            ["hot-a"] * 500 + ["hot-b"] * 300 + ["hot-c"] * 200
            + [f"tail-{rng.randrange(400)}" for _ in range(1000)]
        )
        rng.shuffle(stream)
        true = Counter(stream)
        n = len(stream)
        k = 50
        mg = MisraGries(k)
        # feed in chunks (as blocks would)
        for i in range(0, n, 100):
            mg.add_counts(Counter(stream[i : i + 100]))
        err = n / (k + 1)
        for t, est in mg.counts.items():
            assert est <= true[t] <= est + err
        for t, c in true.items():
            if c > err:
                assert t in mg.counts

    def test_merge_matches_sequential(self):
        from collections import Counter

        from redactifai_ray.functions.sketch import MisraGries

        a_items = Counter({"x": 50, "y": 30, "z": 5, "w": 3})
        b_items = Counter({"x": 20, "q": 40, "z": 9})
        m1 = MisraGries(3).add_counts(a_items)
        m2 = MisraGries(3).add_counts(b_items)
        merged = m1.merge(m2)
        n = sum(a_items.values()) + sum(b_items.values())
        true = a_items + b_items
        for t, est in merged.counts.items():
            assert est <= true[t] <= est + n / 4 + n / 4  # two compress rounds

    def test_distributed_top_tokens(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import mg_top_tokens

        rows = (
            [{"text": "alpha alpha alpha beta"}] * 50
            + [{"text": f"tail{i} filler{i}"} for i in range(200)]
        )
        out = mg_top_tokens(ray.data.from_items(rows), "text", k=2, capacity=100)
        assert list(out["token"]) == ["alpha", "beta"]
        # est <= true for the top hitter
        assert out["est"].iloc[0] <= 150


class TestKll:
    def test_rank_error_uniform(self):
        import numpy as np

        from redactifai_ray.functions.sketch import KllSketch

        rng = np.random.default_rng(11)
        data = rng.permutation(100_000).astype(np.float64)
        s = KllSketch(256)
        for i in range(0, data.size, 5_000):  # block-wise feed
            s.add_values(data[i : i + 5_000])
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = s.quantile(q)
            assert abs(est / 100_000 - q) < 0.02  # ≤2% rank error

    def test_merge_accuracy(self):
        import numpy as np

        from redactifai_ray.functions.sketch import KllSketch

        rng = np.random.default_rng(12)
        data = rng.permutation(80_000).astype(np.float64)
        parts = np.array_split(data, 16)
        merged = KllSketch(256)
        for p in parts:
            merged.merge(KllSketch(256).add_values(p))
        assert abs(merged.quantile(0.5) / 80_000 - 0.5) < 0.02

    def test_distributed_vs_exact(self, ray_session):
        import numpy as np
        import ray.data

        from redactifai_ray.functions.sketch import kll_quantiles

        vals = np.random.default_rng(13).permutation(20_000).astype(float)
        ds = ray.data.from_items([{"v": float(x)} for x in vals]).repartition(8)
        est = kll_quantiles(ds, "v", qs=(0.25, 0.5, 0.75))
        for q, e in est.items():
            assert abs(e / 20_000 - q) < 0.03

    def test_empty_and_nan(self, ray_session):
        import math

        import ray.data

        from redactifai_ray.functions.sketch import KllSketch, kll_quantiles

        assert math.isnan(KllSketch(64).quantile(0.5))
        ds = ray.data.from_items([{"v": float("nan")}, {"v": 5.0}])
        est = kll_quantiles(ds, "v", qs=(0.5,))
        assert est[0.5] == 5.0

    def test_query_tracks_exact_quantiles(self, ray_session):
        """Sketch estimates stay within the observed value range of the
        exact histogram path on the real table."""
        from redactifai_ray.pipelines.queries import q_kll_quantiles, q_quantiles

        sf = "/root/testdata/sf0.01"
        exact = dict(zip(q_quantiles(sf)["q"], q_quantiles(sf)["n_chars_q"]))
        est = dict(
            zip(q_kll_quantiles(sf)["q"], q_kll_quantiles(sf)["n_chars_q_est"])
        )
        # doc lengths span ~[40, 600]; sketch must land within 10% of the
        # exact discrete quantile at this k/N
        for label in ("p50", "p90", "p99"):
            assert abs(est[label] - exact[label]) <= 0.1 * exact[label] + 1


class TestPerplexity:
    def _model(self):
        from collections import Counter

        from redactifai_ray.functions.lm import train_lm

        corpus = [
            "the cat sat on the mat",
            "the dog sat on the rug",
            "the cat ate the fish",
        ]
        uni: Counter = Counter()
        big: Counter = Counter()
        for t in corpus:
            toks = t.split()
            uni.update(toks)
            prev = "<s>"
            for w in toks:
                big[prev + " " + w] += 1
                prev = w
        return train_lm(uni, big, max_vocab=100)

    def test_score_deterministic_and_order_sane(self):
        from redactifai_ray.functions.lm import PerplexityScorer

        sc = PerplexityScorer(model=self._model())
        n, lp, ppl = sc.score("the cat sat on the mat")
        n2, lp2, ppl2 = sc.score("the cat sat on the mat")
        assert (n, lp, ppl) == (n2, lp2, ppl2)
        assert n == 6 and lp < 0 and ppl > 1
        # corpus-like text scores lower perplexity than OOV garbage
        _, _, ppl_garbage = sc.score("zqxv jkwp qqqz vvkx mmzp axqw")
        assert ppl < ppl_garbage
        # bigram structure matters: scrambled word order scores worse
        _, _, ppl_scrambled = sc.score("mat the on sat cat the")
        assert ppl < ppl_scrambled

    def test_oov_and_empty(self):
        import math

        from redactifai_ray.functions.lm import PerplexityScorer

        sc = PerplexityScorer(model=self._model())
        n, lp, ppl = sc.score("")
        assert n == 0 and lp == 0.0 and math.isnan(ppl)
        # all-OOV text still gets a finite positive score (unk smoothing)
        n, lp, ppl = sc.score("zzz yyy xxx")
        assert n == 3 and math.isfinite(ppl) and ppl > 1

    def test_vocab_cap_collapses_to_unk(self):
        from collections import Counter

        from redactifai_ray.functions.lm import UNK, train_lm

        uni = Counter({"a": 100, "b": 50, "rare1": 1, "rare2": 1})
        big = Counter({"<s> a": 50, "a b": 50, "b rare1": 1, "rare1 rare2": 1})
        m = train_lm(uni, big, max_vocab=2)
        assert set(m["vocab"]) == {"a", "b"}
        assert m["uni"][UNK] == 2
        # bigram mass re-keyed through the map, totals conserved
        assert sum(m["big"].values()) == sum(big.values())

    def test_distributed_train_and_score(self, ray_session):
        import ray.data

        from redactifai_ray.functions.lm import (
            score_perplexity,
            train_lm_from_corpus,
        )

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )
        model = train_lm_from_corpus(docs, sample_rows=200, max_vocab=5_000)
        m2 = train_lm_from_corpus(docs, sample_rows=200, max_vocab=5_000)
        assert model["uni"] == m2["uni"] and model["big"] == m2["big"]
        out = score_perplexity(docs.limit(50), model).to_pandas()
        assert len(out) == 50
        assert (out["n_tokens"] > 0).all()
        assert (out["ppl"] > 1).all() and out["ppl"].notna().all()
        # in-domain synthetic text scores far below the smoothed-uniform
        # ceiling (~vocab size)
        assert out["ppl"].median() < model["v_size"]


class TestKllGrouped:
    def test_grouped_tracks_exact(self, ray_session):
        """Grouped sketch quantiles land within 10% of the exact grouped
        value-histogram path on the real table, per group."""
        from redactifai_ray.pipelines.queries import (
            q_grouped_quantiles,
            q_kll_grouped,
        )

        sf = "/root/testdata/sf0.01"
        exact = q_grouped_quantiles(sf).set_index("o_orderstatus")
        est = q_kll_grouped(sf).set_index("o_orderstatus")
        assert set(est.index) == set(exact.index)
        for status in exact.index:
            for ec, sc in (("p50", "q50"), ("p90", "q90")):
                e, s = exact.loc[status, ec], est.loc[status, sc]
                assert abs(s - e) <= 0.1 * e + 1, (status, ec, e, s)

    def test_partitioning_robustness(self, ray_session):
        """Estimates stay in-bound under different block partitionings
        (compaction is deterministic per partitioning, and the error
        bound holds for any)."""
        import numpy as np
        import ray.data

        from redactifai_ray.functions.sketch import kll_quantiles_by

        rng = np.random.default_rng(7)
        rows = [
            {"k": ["a", "b"][i % 2], "v": float(x)}
            for i, x in enumerate(rng.permutation(20_000))
        ]
        for parts in (4, 32):
            ds = ray.data.from_items(rows).repartition(parts)
            out = (
                kll_quantiles_by(ds, "k", "v", qs=(0.5,))
                .to_pandas()
                .set_index("k")
            )
            for k in ("a", "b"):
                assert abs(out.loc[k, "q50"] / 20_000 - 0.5) < 0.03


class TestCountMin:
    def test_never_underestimates_and_bounded(self):
        import numpy as np

        from redactifai_ray.functions.sketch import CountMinSketch

        rng = np.random.default_rng(5)
        # zipf-ish skew: value i appears ~1000/i times
        values, truth = [], {}
        for i in range(1, 200):
            n = max(1, 1000 // i)
            values += [f"v{i}"] * n
            truth[f"v{i}"] = n
        s = CountMinSketch(width=512, depth=5)
        order = rng.permutation(len(values))
        s.update([values[j] for j in order])
        keys = list(truth)
        est = s.estimate(keys)
        true = np.array([truth[k] for k in keys])
        assert (est >= true).all()  # CMS never underestimates
        n_total = len(values)
        # standard guarantee: overshoot ≤ e·N/width (w.h.p.); allow it
        # exactly — deterministic hashing makes this stable
        assert (est - true).max() <= np.e * n_total / 512

    def test_exact_when_wide(self):
        from redactifai_ray.functions.sketch import CountMinSketch

        s = CountMinSketch(width=4096, depth=5)
        s.update(["a"] * 7 + ["b"] * 3 + ["c"])
        assert list(s.estimate(["a", "b", "c"])) == [7, 3, 1]
        assert list(s.estimate(["zzz"])) == [0]

    def test_merge_equals_single_build(self):
        from redactifai_ray.functions.sketch import CountMinSketch

        a, b, whole = (CountMinSketch(256, 4) for _ in range(3))
        xs = [f"x{i % 17}" for i in range(100)]
        a.update(xs[:60])
        b.update(xs[60:])
        whole.update(xs)
        merged = a.merge(b)
        assert merged.to_bytes() == whole.to_bytes()

    def test_geometry_mismatch_raises(self):
        from redactifai_ray.functions.sketch import CountMinSketch

        with pytest.raises(ValueError):
            CountMinSketch(256, 4).merge(CountMinSketch(512, 4))

    def test_roundtrip_bytes(self):
        from redactifai_ray.functions.sketch import CountMinSketch

        s = CountMinSketch(128, 3)
        s.update(["p", "q", "q"])
        r = CountMinSketch.from_bytes(s.to_bytes(), 128, 3)
        assert list(r.estimate(["p", "q"])) == [1, 2]

    def test_distributed_fold_matches_exact(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import cms_token_counts

        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["lang"]
        )
        import duckdb

        exact = dict(
            duckdb.sql(
                "SELECT lang, count(*) FROM "
                "'/root/testdata/sf0.001/documents.parquet' GROUP BY lang"
            ).fetchall()
        )
        out = cms_token_counts(
            ds, "lang", sorted(exact), width=2048, depth=5
        )
        got = dict(zip(out["value"], out["est_count"]))
        # 5 distinct values vs width 2048: no colliding pair survives
        # the depth-5 min ⇒ estimates are exactly the counts
        assert got == {k: int(v) for k, v in exact.items()}


class TestGroupedMisraGries:
    def test_wide_regime_matches_exact(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import mg_top_tokens_by

        rows = []
        for i in range(60):
            lang = ("en", "fr")[i % 2]
            # per-lang skewed vocab, well under capacity → exact counts
            toks = ["hot"] * 5 + [f"w{i % 7}"] * 2 + [f"rare{i}"]
            rows.append({"lang": lang, "text": " ".join(toks)})
        out = mg_top_tokens_by(
            ray.data.from_items(rows).repartition(4),
            "lang", "text", k=3, capacity=10_000,
        )
        for lang in ("en", "fr"):
            g = out[out["lang"] == lang]
            assert g.iloc[0]["token"] == "hot"
            assert g.iloc[0]["est"] == 150  # 30 docs × 5
        # deterministic under repartition
        out2 = mg_top_tokens_by(
            ray.data.from_items(rows).repartition(7),
            "lang", "text", k=3, capacity=10_000,
        )
        assert out.equals(out2)

    def test_per_key_hitter_presence_under_pressure(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import mg_top_tokens_by

        rows = []
        for i in range(40):
            # one dominant hitter per key + long noise tail
            noise = " ".join(f"n{i}_{j}" for j in range(30))
            rows.append({"lang": "en", "text": ("alpha " * 40) + noise})
            rows.append({"lang": "fr", "text": ("beta " * 40) + noise})
        out = mg_top_tokens_by(
            ray.data.from_items(rows).repartition(5),
            "lang", "text", k=1, capacity=50,
        )
        assert (
            out.loc[out["lang"] == "en", "token"].iloc[0] == "alpha"
        )
        assert out.loc[out["lang"] == "fr", "token"].iloc[0] == "beta"
        # MG stored estimate never exceeds the true count
        assert out.loc[out["lang"] == "en", "est"].iloc[0] <= 40 * 40


class TestHllSetAlgebra:
    def test_tolerance_vs_exact_and_partition_invariance(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import hll_set_algebra

        rows = []
        # A = users 0..799, B = users 400..1099 → overlap 400
        for u in range(800):
            rows.append({"k": "a", "v": u})
        for u in range(400, 1100):
            rows.append({"k": "b", "v": u})
        out = hll_set_algebra(
            ray.data.from_items(rows).repartition(6), "k", "v", "a", "b"
        )
        assert abs(out["n_a"][0] - 800) / 800 < 0.05
        assert abs(out["n_b"][0] - 700) / 700 < 0.05
        assert abs(out["n_union"][0] - 1100) / 1100 < 0.05
        # intersection inherits both errors — wider band
        assert abs(out["n_intersection"][0] - 400) / 400 < 0.15
        out2 = hll_set_algebra(
            ray.data.from_items(rows).repartition(13), "k", "v", "a", "b"
        )
        assert out.equals(out2)  # register max-merge is order-invariant


class TestBpeIds:
    CORPUS = [
        "the cat sat on the mat and the cat ran",
        "a dog and a cat met another dog",
        "tables store rows and rows hold values",
    ]

    def _merges(self):
        from redactifai_ray.functions.bpe import train_bpe

        from collections import Counter

        freqs = Counter()
        for t in self.CORPUS:
            freqs.update(t.lower().split())
        return train_bpe(dict(freqs), n_merges=40)

    def test_roundtrip_and_determinism(self, ray_session):
        import ray as _ray

        from redactifai_ray.functions.bpe import BpeIdEncoder, decode_ids

        merges = self._merges()
        ref = _ray.put(merges)
        enc = BpeIdEncoder(ref)
        for text in self.CORPUS + ["unseen WORDS with Zebra42!"]:
            ids = enc._ids(text)
            assert decode_ids(ids, merges) == " ".join(text.lower().split())
            assert enc._ids(text) == ids  # deterministic

    def test_unknown_char_fallback_is_reversible(self, ray_session):
        import ray as _ray

        from redactifai_ray.functions.bpe import (
            BpeIdEncoder,
            build_vocab,
            decode_ids,
        )

        merges = self._merges()
        enc = BpeIdEncoder(_ray.put(merges))
        text = "café 北京 naïve"
        ids = enc._ids(text)
        off = len(build_vocab(merges))
        assert any(i >= off for i in ids)  # fallback ids actually used
        assert decode_ids(ids, merges) == text.lower()

    def test_distributed_matches_serial(self, ray_session):
        import ray as _ray
        import ray.data

        from redactifai_ray.functions.bpe import BpeIdEncoder, add_bpe_ids

        merges = self._merges()
        rows = [
            {"doc_id": i, "text": t} for i, t in enumerate(self.CORPUS * 7)
        ]
        out = (
            add_bpe_ids(ray.data.from_items(rows).repartition(5), merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        enc = BpeIdEncoder(_ray.put(merges))
        for _, r in out.iterrows():
            assert list(r["ids"]) == enc._ids(rows[int(r["doc_id"])]["text"])
            assert r["n_ids"] == len(r["ids"])
