"""Training-data curation ops: split / mixture / decontamination /
repetition / heavy hitters."""

import pandas as pd
import pytest
import ray.data


def _docs(rows):
    return ray.data.from_items(rows)


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike".split()
LONG = " ".join(WORDS)  # exactly 13 words → one 13-gram


class TestAssignSplit:
    def test_deterministic_and_proportional(self, ray_session):
        from redactifai_ray.stages.curate import assign_split

        ds = _docs([{"doc_id": i} for i in range(2000)])
        a = assign_split(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = assign_split(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)  # hash-stable, not order/partition dependent
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.05
        assert abs(frac["val"] - 0.1) < 0.03
        assert abs(frac["test"] - 0.1) < 0.03

    def test_stable_under_repartition(self, ray_session):
        from redactifai_ray.stages.curate import assign_split

        rows = [{"doc_id": i} for i in range(500)]
        a = assign_split(_docs(rows)).to_pandas()
        b = assign_split(_docs(rows).repartition(7)).to_pandas()
        am = dict(zip(a["doc_id"], a["split"]))
        bm = dict(zip(b["doc_id"], b["split"]))
        assert am == bm

    def test_bad_widths_raise(self, ray_session):
        from redactifai_ray.stages.curate import assign_split

        with pytest.raises(ValueError):
            assign_split(_docs([{"doc_id": 1}]), splits=(("a", 50), ("b", 40)))


class TestMixtureSample:
    def test_weight_extremes(self, ray_session):
        from redactifai_ray.stages.curate import mixture_sample

        rows = [{"doc_id": i, "source": "keep" if i % 2 else "drop"} for i in range(400)]
        out = mixture_sample(_docs(rows), {"keep": 1.0, "drop": 0.0}).to_pandas()
        assert set(out["source"]) == {"keep"}
        assert len(out) == 200

    def test_half_weight_and_determinism(self, ray_session):
        from redactifai_ray.stages.curate import mixture_sample

        rows = [{"doc_id": i, "source": "s"} for i in range(2000)]
        a = mixture_sample(_docs(rows), {"s": 0.5}).to_pandas()
        b = mixture_sample(_docs(rows), {"s": 0.5}).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        assert abs(len(a) / 2000 - 0.5) < 0.05
        # sampled set is a SUBSET property: every kept id at w=0.25 is kept at w=0.5
        c = mixture_sample(_docs(rows), {"s": 0.25}).to_pandas()
        assert set(c["doc_id"]) <= set(a["doc_id"])


class TestDecontaminate:
    def _corpus(self):
        filler = [
            {"doc_id": 100 + i, "text": f"unique{i} " + " ".join(f"w{i}_{j}" for j in range(15))}
            for i in range(8)
        ]
        train = [
            {"doc_id": 1, "text": "prefix words " + LONG + " suffix words"},
            {"doc_id": 2, "text": "totally different content here " + " ".join(f"z{j}" for j in range(15))},
            {"doc_id": 3, "text": LONG.upper()},  # case-insensitive match
        ] + filler
        test = [{"doc_id": 900, "text": "lead in " + LONG + " trail out"}]
        return train, test

    def test_broadcast_flags_overlap(self, ray_session):
        from redactifai_ray.stages.curate import find_contaminated

        train, test = self._corpus()
        out = find_contaminated(_docs(train), _docs(test)).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3]

    def test_short_docs_never_flagged(self, ray_session):
        from redactifai_ray.stages.curate import find_contaminated

        short = [{"doc_id": 5, "text": "tiny shared snippet"}]
        test = [{"doc_id": 900, "text": "tiny shared snippet"}]  # < 13 words
        out = find_contaminated(_docs(short), _docs(test)).to_pandas()
        assert len(out) == 0

    def test_distributed_matches_broadcast(self, ray_session):
        from redactifai_ray.stages.curate import find_contaminated

        train, test = self._corpus()
        fast = find_contaminated(_docs(train), _docs(test)).to_pandas()
        slow = find_contaminated(
            _docs(train), _docs(test), max_broadcast_ngrams=0
        ).to_pandas()
        assert sorted(fast["doc_id"]) == sorted(slow["doc_id"]) == [1, 3]

    def test_decontaminate_drops_only_flagged(self, ray_session):
        from redactifai_ray.stages.curate import decontaminate

        train, test = self._corpus()
        kept = decontaminate(_docs(train), _docs(test)).to_pandas()
        assert sorted(kept["doc_id"]) == sorted(
            d["doc_id"] for d in train if d["doc_id"] not in (1, 3)
        )


class TestRepetitionSignals:
    def test_hand_values(self, ray_session):
        from redactifai_ray.stages.curate import repetition_signals

        rows = [
            {"doc_id": 1, "text": "a a b"},
            {"doc_id": 2, "text": "x x x x"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "solo"},
        ]
        out = (
            repetition_signals(_docs(rows))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        r1 = out.loc[1]
        assert r1["n_words"] == 3
        assert r1["dup_word_frac"] == 1.0 - 2.0 / 3
        assert r1["top_word_frac"] == 2.0 / 3
        assert r1["dup_2gram_frac"] == 0.0  # "a a", "a b" distinct
        r2 = out.loc[2]
        assert r2["dup_word_frac"] == 1.0 - 1.0 / 4
        assert r2["dup_2gram_frac"] == 1.0 - 1.0 / 3  # "x x" ×3
        assert r2["top_word_frac"] == 1.0
        r3 = out.loc[3]
        assert r3["n_words"] == 0 and r3["dup_word_frac"] == 0.0
        r4 = out.loc[4]
        assert r4["n_words"] == 1 and r4["dup_2gram_frac"] == 0.0


class TestTopTokens:
    def test_counts_and_tiebreak(self, ray_session):
        from redactifai_ray.stages.analyze import top_tokens

        rows = [
            {"text": "b b b a a c"},
            {"text": "a c d"},
        ]
        out = top_tokens(_docs(rows), k=3)
        # a:3, b:3 tie → token asc puts a first; then c:2
        assert list(out["token"]) == ["a", "b", "c"]
        assert list(out["n"]) == [3, 3, 2]

    def test_k_larger_than_vocab(self, ray_session):
        from redactifai_ray.stages.analyze import top_tokens

        out = top_tokens(_docs([{"text": "x y"}]), k=50)
        assert len(out) == 2


class TestStratifiedSample:
    def test_k_per_group_and_determinism(self, ray_session):
        from redactifai_ray.stages.curate import stratified_sample

        rows = [
            {"doc_id": i, "source": f"s{i % 5}"} for i in range(200)
        ]
        a = stratified_sample(_docs(rows), k=4).to_pandas()
        b = stratified_sample(_docs(rows).repartition(9), k=4).to_pandas()
        assert len(a) == 20  # 5 groups × 4
        assert a.groupby("source").size().eq(4).all()
        # partition-layout independent
        ka = sorted(map(tuple, a[["source", "doc_id"]].to_numpy()))
        kb = sorted(map(tuple, b[["source", "doc_id"]].to_numpy()))
        assert ka == kb

    def test_small_groups_keep_all(self, ray_session):
        from redactifai_ray.stages.curate import stratified_sample

        rows = [{"doc_id": 1, "source": "only"}]
        out = stratified_sample(_docs(rows), k=5).to_pandas()
        assert len(out) == 1


class TestBoilerplateLines:
    FOOTER = "Copyright Example Corp - All Rights Reserved"
    NAV = "Home | About | Contact"

    def _rows(self):
        rows = []
        for i in range(10):
            body = f"unique body line {i} with words\nsecond unique line {i}"
            rows.append(
                {
                    "doc_id": i,
                    "extracted_text": f"{self.NAV}\n\n{body}\n{self.FOOTER}",
                }
            )
        rows.append({"doc_id": 99, "extracted_text": "totally unique document"})
        return rows

    def test_removes_shared_keeps_unique_and_blank(self, ray_session):
        from redactifai_ray.stages.curate import remove_boilerplate_lines

        out = (
            remove_boilerplate_lines(_docs(self._rows()), min_docs=5)
            .to_pandas()
            .set_index("doc_id")
        )
        t0 = out.loc[0, "extracted_text"]
        assert self.FOOTER not in t0 and self.NAV not in t0
        assert "unique body line 0" in t0
        assert t0.startswith("\n")  # blank structural line kept
        assert out.loc[99, "extracted_text"] == "totally unique document"

    def test_chunked_path_equivalent(self, ray_session):
        from redactifai_ray.stages.curate import remove_boilerplate_lines

        one = (
            remove_boilerplate_lines(_docs(self._rows()), min_docs=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # chunk_size=1 → one filter stage per hot line
        many = (
            remove_boilerplate_lines(
                _docs(self._rows()), min_docs=5, chunk_size=1
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert one.equals(many)

    def test_precomputed_hot_and_null_text(self, ray_session):
        from redactifai_ray.stages.curate import (
            hot_line_hashes,
            remove_boilerplate_lines,
        )

        rows = self._rows() + [{"doc_id": 50, "extracted_text": None}]
        ds = _docs(rows)
        hot = hot_line_hashes(ds, min_docs=5)
        out = (
            remove_boilerplate_lines(ds, min_docs=5, hot=hot)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[50, "extracted_text"] is None
        assert self.FOOTER not in out.loc[3, "extracted_text"]


class TestGopherFilter:
    def test_signals_and_verdict(self, ray_session):
        from redactifai_ray.stages.curate import gopher_filter

        good = " ".join(f"word{i}" for i in range(40))  # 40 distinct words
        dup = " ".join(["spam"] * 40)  # all duplicates
        short = "too short"
        rows = [
            {"doc_id": 1, "text": good},
            {"doc_id": 2, "text": dup},
            {"doc_id": 3, "text": short},
            {"doc_id": 4, "text": ""},
        ]
        out = (
            gopher_filter(_docs(rows))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert bool(out.loc[1, "keep"]) is True
        # all-duplicate doc fails dup_word_frac AND top_word_frac
        assert bool(out.loc[2, "keep"]) is False
        assert out.loc[2, "dup_word_frac"] == pytest.approx(1.0 - 1.0 / 40)
        assert out.loc[2, "top_word_frac"] == 1.0
        # short doc fails min_words; empty doc fails everything
        assert bool(out.loc[3, "keep"]) is False
        assert bool(out.loc[4, "keep"]) is False
        assert out.loc[4, "n_words"] == 0 and out.loc[4, "mean_word_len"] == 0.0

    def test_thresholds_parameterize(self, ray_session):
        from redactifai_ray.stages.curate import gopher_filter

        rows = [{"doc_id": 1, "text": "a b c d e"}]
        strict = gopher_filter(_docs(rows)).to_pandas()
        lax = gopher_filter(
            _docs(rows), min_words=1, min_mean_word_len=0.5
        ).to_pandas()
        assert not bool(strict["keep"][0]) and bool(lax["keep"][0])


class TestTfidfTopTerms:
    def test_scores_and_ranking(self, ray_session):
        import math

        from redactifai_ray.stages.analyze import tfidf_top_terms

        rows = [
            {"doc_id": 1, "text": "apple apple banana"},
            {"doc_id": 2, "text": "banana cherry"},
            {"doc_id": 3, "text": "cherry cherry cherry date"},
        ]
        out = (
            tfidf_top_terms(_docs(rows), k=2)
            .to_pandas()
            .sort_values(["doc_id", "tfidf"], ascending=[True, False])
            .reset_index(drop=True)
        )
        # doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5)
        d1 = out[out.doc_id == 1]
        assert list(d1["term"]) == ["apple", "banana"]
        assert d1["tfidf"].iloc[0] == 2 * math.log(3 / 1)
        assert d1["tfidf"].iloc[1] == math.log(3 / 2)
        # doc 3: cherry tf=3 df=2 beats date tf=1 df=1
        d3 = out[out.doc_id == 3]
        assert list(d3["term"]) == ["cherry", "date"]
        # k caps per-doc output
        assert (out.groupby("doc_id").size() <= 2).all()

    def test_ubiquitous_term_scores_zero(self, ray_session):
        from redactifai_ray.stages.analyze import tfidf_top_terms

        rows = [{"doc_id": i, "text": "common rare%d" % i} for i in range(3)]
        out = tfidf_top_terms(_docs(rows), k=2).to_pandas()
        common = out[out.term == "common"]
        assert (common["tfidf"] == 0.0).all() and (common["df"] == 3).all()
        # the rare term wins every doc
        top = out.sort_values("tfidf", ascending=False).groupby("doc_id").head(1)
        assert set(top["term"]) == {"rare0", "rare1", "rare2"}


class TestChunkDedup:
    def _brute_words(self, rows, w):
        # reference first-wins over (doc_id, chunk_idx) order
        seen = set()
        out = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            toks = r["text"].split()
            kept = []
            n_chunks = 0
            for i in range(0, len(toks), w):
                c = " ".join(toks[i : i + w])
                n_chunks += 1
                if c not in seen:
                    seen.add(c)
                    kept.append(c)
            out[r["doc_id"]] = (" ".join(kept), n_chunks, len(kept))
        return out

    def _rows(self):
        dup = "the same ten words repeated exactly here for chunk test"
        return [
            {"doc_id": 0, "text": f"{dup} unique tail zero one two"},
            # cross-doc duplicate chunk + its own unique content
            {"doc_id": 1, "text": f"{dup} completely different ending words here"},
            # within-doc duplicate: same chunk twice in one document
            {"doc_id": 2, "text": f"{dup} {dup}"},
            {"doc_id": 3, "text": "entirely fresh document with no duplicate chunks at all"},
        ]

    def test_words_mode_matches_brute_force(self, ray_session):
        from redactifai_ray.stages.curate import chunk_dedup

        rows = self._rows()
        out = (
            chunk_dedup(_docs(rows), mode="words", chunk_words=10)
            .to_pandas()
            .set_index("doc_id")
        )
        ref = self._brute_words(rows, 10)
        for i, (text, n_chunks, n_kept) in ref.items():
            assert out.loc[i, "text"] == text, i
            assert out.loc[i, "n_chunks"] == n_chunks
            assert out.loc[i, "n_chunks_kept"] == n_kept
        # doc 2's second copy of the dup chunk must be gone entirely
        assert out.loc[2, "text"] == ""
        assert out.loc[2, "n_chunks_kept"] == 0

    def test_chunked_loser_broadcast_equivalent(self, ray_session):
        from redactifai_ray.stages.curate import chunk_dedup

        rows = self._rows()
        one = (
            chunk_dedup(_docs(rows), mode="words", chunk_words=10)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        many = (
            chunk_dedup(
                _docs(rows), mode="words", chunk_words=10, loser_chunk_size=1
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(one, many)

    def test_lines_mode_keeps_blanks_first_wins(self, ray_session):
        from redactifai_ray.stages.curate import chunk_dedup

        rows = [
            {"doc_id": 0, "text": "shared paragraph line\n\nunique zero"},
            {"doc_id": 1, "text": "unique one\nshared paragraph line"},
            {"doc_id": 2, "text": "shared paragraph line"},
        ]
        out = (
            chunk_dedup(_docs(rows), text_col="text", mode="lines")
            .to_pandas()
            .set_index("doc_id")
        )
        # first occurrence (doc 0, idx 0) survives; later copies drop
        assert out.loc[0, "text"] == "shared paragraph line\n\nunique zero"
        assert out.loc[1, "text"] == "unique one"
        assert out.loc[2, "text"] == ""
        # blank line in doc 0 is structural: kept, not counted as a unit
        assert out.loc[0, "n_chunks"] == 2
        assert out.loc[0, "n_chunks_kept"] == 2


class TestTokenShards:
    def test_matches_serial_prefix_sum(self, ray_session):
        from redactifai_ray.stages.curate import token_shards

        rows = [
            {"doc_id": i, "text": " ".join(["w"] * (3 + (i * 7) % 11))}
            for i in range(50)
        ]
        out = (
            token_shards(_docs(rows), budget=20, bucket_width=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        cum = 0
        for i, r in out.iterrows():
            n = 3 + (int(r["doc_id"]) * 7) % 11
            assert r["n_tokens"] == n
            assert r["shard_id"] == cum // 20, r["doc_id"]
            cum += n

    def test_bucket_width_invariant(self, ray_session):
        from redactifai_ray.stages.curate import token_shards

        rows = [
            {"doc_id": i, "text": " ".join(["w"] * (1 + i % 5))}
            for i in range(40)
        ]
        a = (
            token_shards(_docs(rows), budget=13, bucket_width=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            token_shards(_docs(rows), budget=13, bucket_width=1000)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestInvertedIndex:
    def test_matches_brute_force_across_blocks(self, ray_session):
        from collections import Counter

        from redactifai_ray.stages.analyze import inverted_index

        rows = [
            {"doc_id": i, "text": " ".join(WORDS[(i * 3) % 13 : (i * 3) % 13 + 5])}
            for i in range(30)
        ]
        # many small blocks so the min-k posting merge crosses batches,
        # with ids deliberately NOT in block order
        ds = _docs(rows[::-1]).repartition(10)
        out = (
            inverted_index(ds, k_postings=3)
            .to_pandas()
            .set_index("term")
            .sort_index()
        )
        tf: Counter = Counter()
        postings: dict = {}
        for r in rows:
            c = Counter(r["text"].split())
            for t, n in c.items():
                tf[t] += n
                postings.setdefault(t, []).append(r["doc_id"])
        for t, ids in postings.items():
            assert out.loc[t, "df"] == len(ids)
            assert out.loc[t, "tf_total"] == tf[t]
            assert out.loc[t, "posting_head"] == ",".join(
                str(i) for i in sorted(ids)[:3]
            )

    def test_min_df_filters(self, ray_session):
        from redactifai_ray.stages.analyze import inverted_index

        rows = [
            {"doc_id": 0, "text": "rare common"},
            {"doc_id": 1, "text": "common"},
        ]
        out = inverted_index(_docs(rows), min_df=2).to_pandas()
        assert out["term"].tolist() == ["common"]


class TestRepeatedSubstrings:
    """ExactSubstr-style cross-document window dedup (round-4)."""

    def _corpus(self):
        shared = " ".join(f"dup{i}" for i in range(12))  # 12-token passage
        return [
            {"doc_id": 0, "text": f"intro words here {shared} tail zero"},
            {"doc_id": 1, "text": f"other opening {shared} closing one"},
            {"doc_id": 2, "text": "totally unrelated content with enough words"},
            # within-doc repetition only: NOT cross-doc, must not count
            {"doc_id": 3, "text": ("self rep " + " ".join(f"s{i}" for i in range(8)) + " mid " + " ".join(f"s{i}" for i in range(8)))},
        ]

    @staticmethod
    def _brute_counts(rows, k):
        from collections import Counter, defaultdict

        win_docs = defaultdict(set)
        per_doc = defaultdict(Counter)
        for r in rows:
            toks = r["text"].split()
            for i in range(len(toks) - k + 1):
                w = " ".join(toks[i : i + k])
                win_docs[w].add(r["doc_id"])
                per_doc[r["doc_id"]][w] += 1
        out = {}
        for d, c in per_doc.items():
            n = sum(v for w, v in c.items() if len(win_docs[w]) > 1)
            if n:
                out[d] = n
        return out

    def test_counts_match_brute_force(self, ray_session):
        from redactifai_ray.stages.curate import repeated_window_counts

        rows = self._corpus()
        out = repeated_window_counts(_docs(rows), k=8).to_pandas()
        got = dict(zip(out["doc_id"], out["n_dup_windows"]))
        assert got == self._brute_counts(rows, 8)
        # a 12-token shared passage has 5 duplicated 8-token windows
        assert got[0] == 5 and got[1] == 5
        assert 2 not in got and 3 not in got  # unrelated + within-doc only

    def test_winnow_detects_long_shared_runs(self, ray_session):
        """Winnowing guarantee: a shared run of ≥ k + w - 1 tokens must
        surface in winnow mode, and winnow rows are a subset signal."""
        from redactifai_ray.stages.curate import repeated_window_counts

        shared = " ".join(f"x{i}" for i in range(30))  # ≥ 8 + 16 - 1
        rows = [
            {"doc_id": 0, "text": f"aaa {shared} bbb"},
            {"doc_id": 1, "text": f"ccc ddd {shared} eee"},
            {"doc_id": 2, "text": "nothing shared in this one at all"},
        ]
        out = repeated_window_counts(
            _docs(rows), k=8, mode="winnow", winnow_w=16
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["n_dup_windows"]))
        assert 0 in got and 1 in got and 2 not in got
        exact = repeated_window_counts(_docs(rows), k=8).to_pandas()
        ex = dict(zip(exact["doc_id"], exact["n_dup_windows"]))
        assert got[0] <= ex[0] and got[1] <= ex[1]  # sampled subset

    def test_removal_first_doc_wins(self, ray_session):
        from redactifai_ray.stages.curate import remove_repeated_substrings

        rows = self._corpus()
        out = (
            remove_repeated_substrings(_docs(rows), k=8)
            .to_pandas()
            .set_index("doc_id")["text"]
        )
        shared = " ".join(f"dup{i}" for i in range(12))
        # min doc id keeps the passage byte-for-byte
        assert out[0] == rows[0]["text"]
        # the loser loses the WHOLE shared passage (overlap union), the
        # rest of the doc survives
        assert shared not in out[1]
        for tok in ("other", "opening", "closing", "one"):
            assert tok in out[1]
        assert all(f"dup{i}" not in out[1] for i in range(12))
        # untouched docs are byte-identical
        assert out[2] == rows[2]["text"]
        assert out[3] == rows[3]["text"]

    def test_removal_cap_raises(self, ray_session):
        from redactifai_ray.stages.curate import remove_repeated_substrings

        same = " ".join(f"w{i}" for i in range(20))
        rows = [{"doc_id": i, "text": same} for i in range(4)]
        with pytest.raises(ValueError, match="duplicated window"):
            remove_repeated_substrings(
                _docs(rows), k=8, max_broadcast_losers=2
            )


class TestRepeatedSubstringsProperty:
    def test_random_corpora_match_brute_force(self, ray_session):
        """Deterministic pseudo-random corpora over a tiny alphabet (to
        force genuine cross-doc window collisions) must match the
        brute-force duplicated-window counts exactly."""
        import numpy as np

        from redactifai_ray.stages.curate import repeated_window_counts

        rng = np.random.RandomState(7)
        for trial in range(8):
            n_docs = int(rng.randint(2, 7))
            rows = []
            for d in range(n_docs):
                n_tok = int(rng.randint(0, 16))
                toks = [
                    "abcd"[rng.randint(0, 4)] + str(rng.randint(0, 2))
                    for _ in range(n_tok)
                ]
                rows.append({"doc_id": d, "text": " ".join(toks)})
            out = repeated_window_counts(_docs(rows), k=3).to_pandas()
            got = (
                dict(zip(out["doc_id"], out["n_dup_windows"]))
                if "doc_id" in out.columns
                else {}
            )
            want = TestRepeatedSubstrings._brute_counts(rows, 3)
            assert got == want, (trial, rows)


class TestBloomFilter:
    def test_no_false_negatives_and_fpr_bound(self):
        import numpy as np

        from redactifai_ray.functions.sketch import BloomFilter

        bf = BloomFilter.for_capacity(5000, fpr=1e-3)
        added = [f"in-{i}" for i in range(5000)]
        bf.update(added)
        assert bf.contains(added).all()  # Bloom guarantee: no FNs
        probes = [f"out-{i}" for i in range(50000)]
        fp_rate = bf.contains(probes).mean()
        assert fp_rate < 5e-3, fp_rate  # ~1e-3 target with slack

    def test_merge_equals_single_build(self):
        import numpy as np

        from redactifai_ray.functions.sketch import BloomFilter

        whole = BloomFilter(4096, 5)
        whole.update([f"v{i}" for i in range(300)])
        a = BloomFilter(4096, 5)
        a.update([f"v{i}" for i in range(150)])
        b = BloomFilter(4096, 5)
        b.update([f"v{i}" for i in range(150, 300)])
        a.merge(b)
        assert (a.words == whole.words).all()

    def test_roundtrip_and_geometry_guard(self):
        import pytest as _pytest

        from redactifai_ray.functions.sketch import BloomFilter

        bf = BloomFilter(1024, 3)
        bf.update(["x", "y"])
        back = BloomFilter.from_bytes(bf.to_bytes(), bf.n_bits, bf.k)
        assert (back.words == bf.words).all()
        with _pytest.raises(ValueError):
            bf.merge(BloomFilter(2048, 3))


class TestDecontaminateBloom:
    def _corpus(self):
        filler = [
            {"doc_id": 100 + i, "text": f"unique{i} " + " ".join(f"w{i}_{j}" for j in range(15))}
            for i in range(8)
        ]
        train = [
            {"doc_id": 1, "text": "prefix words " + LONG + " suffix words"},
            {"doc_id": 2, "text": "totally different content here " + " ".join(f"z{j}" for j in range(15))},
            {"doc_id": 3, "text": LONG.upper()},
        ] + filler
        test = [{"doc_id": 900, "text": "lead in " + LONG + " trail out"}]
        return train, test

    def test_flags_superset_of_exact(self, ray_session):
        from redactifai_ray.stages.curate import (
            find_contaminated,
            find_contaminated_bloom,
        )

        train, test = self._corpus()
        exact = set(
            find_contaminated(_docs(train), _docs(test)).to_pandas()["doc_id"]
        )
        bloom = set(
            find_contaminated_bloom(_docs(train), _docs(test)).to_pandas()["doc_id"]
        )
        assert exact == {1, 3}
        assert exact <= bloom  # no false negatives, ever
        # at this corpus size the FPR makes excess flags ~impossible
        assert bloom == exact, bloom

    def test_drop_keeps_clean_docs(self, ray_session):
        from redactifai_ray.stages.curate import decontaminate_bloom

        train, test = self._corpus()
        kept = decontaminate_bloom(_docs(train), _docs(test)).to_pandas()
        assert sorted(kept["doc_id"]) == sorted(
            d["doc_id"] for d in train if d["doc_id"] not in (1, 3)
        )

    def test_superset_with_bounded_excess_on_sf0001(self, ray_session):
        """On the real corpus the bloom flags are a superset of the exact
        contaminated set with excess bounded by the FPR contract: the
        train side probes ~40k grams at fpr=1e-4, so expected excess is
        ~4 docs; 20 is a >5σ ceiling. (The result is deterministic —
        same hashes, same filter — just not byte-equal to exact.)"""
        from redactifai_ray.pipelines.queries import (
            q_decontaminate,
            q_decontaminate_bloom,
        )

        exact = q_decontaminate("/root/testdata/sf0.001")
        bloom = q_decontaminate_bloom("/root/testdata/sf0.001")
        assert set(exact["doc_id"]) <= set(bloom["doc_id"])
        excess = len(bloom) - len(exact)
        assert 0 <= excess <= 20, excess


class TestPackSequences:
    def test_matches_serial_plan(self, ray_session):
        from redactifai_ray.stages.curate import pack_sequences

        rows = [
            {"doc_id": i, "text": " ".join(["w"] * ((i * 5) % 13))}
            for i in range(60)
        ]  # includes empty docs (i*5 % 13 == 0)
        L = 16
        out = (
            pack_sequences(_docs(rows), seq_len=L, bucket_width=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        cum = 0
        for _, r in out.iterrows():
            n = (int(r["doc_id"]) * 5) % 13
            assert r["n_tokens"] == n
            assert r["start_pos"] == cum
            assert r["first_seq"] == cum // L
            assert r["last_seq"] == (cum + max(n, 1) - 1) // L
            assert r["offset_in_first"] == cum % L
            cum += n

    def test_straddle_and_empty_semantics(self, ray_session):
        from redactifai_ray.stages.curate import pack_sequences

        rows = [
            {"doc_id": 0, "text": " ".join(["w"] * 10)},  # fills [0,10)
            {"doc_id": 1, "text": ""},                    # empty at pos 10
            {"doc_id": 2, "text": " ".join(["w"] * 10)},  # straddles 16
        ]
        out = (
            pack_sequences(_docs(rows), seq_len=16)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert (out.loc[0, "first_seq"], out.loc[0, "last_seq"]) == (0, 0)
        # empty doc occupies no tokens but parks in the cursor's sequence
        assert (out.loc[1, "first_seq"], out.loc[1, "last_seq"]) == (0, 0)
        assert out.loc[1, "n_tokens"] == 0
        # doc 2: tokens [10,20) → sequences 0 and 1
        assert (out.loc[2, "first_seq"], out.loc[2, "last_seq"]) == (0, 1)
        assert out.loc[2, "offset_in_first"] == 10


class TestDedupLines:
    def test_first_wins_and_empty_structural(self, ray_session):
        from redactifai_ray.stages.curate import dedup_lines

        rows = [
            {
                "doc_id": 0,
                "text": "nav bar\nbody one\n\nnav bar\nbody two\n\nnav bar",
            },
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "only line"},
        ]
        out = (
            dedup_lines(_docs(rows))
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        # duplicate 'nav bar' drops (2nd+3rd), blank lines all survive
        assert out.loc[0, "text"] == "nav bar\nbody one\n\nbody two\n"
        assert out.loc[0, "n_lines"] == 7
        assert out.loc[0, "n_lines_kept"] == 5
        assert out.loc[1, "text"] == ""
        assert out.loc[1, "n_lines"] == 1
        assert out.loc[2, "text"] == "only line"

    def test_cli_flag(self, ray_session, tmp_path):
        import io
        import json as _json
        from contextlib import redirect_stdout

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from redactifai_ray.curate_cli import main

        src = tmp_path / "dl.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["a\nb\na\nc"], pa.string()),
                }
            ),
            src,
        )
        out = str(tmp_path / "dl_out")
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(["--input", str(src), "--output", out, "--dedup-lines"])
        assert rc == 0
        con = duckdb.connect()
        (text,) = con.sql(f"select text from '{out}/docs/*.parquet'").fetchone()
        assert text == "a\nb\nc"


class TestTemperatureMixture:
    def test_rate_endpoints(self):
        from redactifai_ray.stages.curate import temperature_rates

        counts = {"en": 1000, "fr": 250, "zh": 10}
        # α=1: natural proportions — keep everything
        assert temperature_rates(counts, alpha=1.0) == {
            "en": 1.0,
            "fr": 1.0,
            "zh": 1.0,
        }
        # α=0: equalize expected counts — rate n_min/n
        r0 = temperature_rates(counts, alpha=0.0)
        assert r0["zh"] == 1.0
        assert r0["en"] == 10 / 1000
        assert r0["fr"] == 10 / 250
        # α=0.5: sqrt(n_min/n), monotone in count
        r5 = temperature_rates(counts, alpha=0.5)
        assert r5["zh"] == 1.0
        assert 0 < r5["en"] < r5["fr"] < 1.0

    def test_empty_counts(self):
        from redactifai_ray.stages.curate import temperature_rates

        assert temperature_rates({}, alpha=0.5) == {}

    def test_flattens_skew_and_rarest_keeps_all(self, ray_session):
        import ray.data

        from redactifai_ray.stages.curate import temperature_mixture

        rows = [
            {"doc_id": i, "lang": "en" if i < 900 else "zh"}
            for i in range(1000)
        ]
        out = (
            temperature_mixture(
                ray.data.from_items(rows), alpha=0.5, key_col="lang"
            )
            .to_pandas()
            .groupby("lang")
            .size()
        )
        assert out["zh"] == 100  # rarest source keeps everything
        # en's expected keep = 900·sqrt(100/900) = 300; hash-uniformity
        # puts the realized count near it
        assert 240 <= out["en"] <= 360
        # the skew ratio flattened from 9:1 toward 3:1
        assert out["en"] / out["zh"] < 5

    def test_deterministic_across_runs(self, ray_session):
        import ray.data

        from redactifai_ray.stages.curate import temperature_mixture

        rows = [
            {"doc_id": i, "lang": f"l{i % 3}"} for i in range(300)
        ] + [{"doc_id": 1000 + i, "lang": "l0"} for i in range(300)]
        a = (
            temperature_mixture(
                ray.data.from_items(rows), alpha=0.3, key_col="lang"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            temperature_mixture(
                ray.data.from_items(rows).repartition(7),
                alpha=0.3,
                key_col="lang",
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)  # partitioning-invariant, RNG-free

    def test_cli_temperature_flag(self, ray_session, tmp_path):
        import io
        from contextlib import redirect_stdout

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from redactifai_ray.curate_cli import main

        src = tmp_path / "t.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(200), pa.int64()),
                    "text": pa.array(["x"] * 200, pa.string()),
                    "lang": pa.array(
                        ["en"] * 180 + ["zh"] * 20, pa.string()
                    ),
                }
            ),
            src,
        )
        out = str(tmp_path / "t_out")
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(
                [
                    "--input", str(src), "--output", out,
                    "--temperature", "0.5", "--temperature-col", "lang",
                ]
            )
        assert rc == 0
        con = duckdb.connect()
        got = dict(
            con.sql(
                f"select lang, count(*) from '{out}/docs/*.parquet' "
                "group by lang"
            ).fetchall()
        )
        assert got["zh"] == 20  # rarest keeps all
        assert got["en"] < 120  # en downsampled toward sqrt(20/180)
