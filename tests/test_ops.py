"""Training-data operator tests: analysis, dedup families, similarity
search, multimodal plumbing. Run over /root/testdata/sf0.001 plus small
synthetic corners."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


class TestTextStats:
    def test_token_counts_match_split(self, docs):
        from redactifai_ray.stages.analyze import add_text_stats

        out = add_text_stats(docs).to_pandas()
        sample = out.head(20)
        for _, r in sample.iterrows():
            assert r["n_tokens"] == len(r["text"].split())
        assert (out["quality_score"] >= 0).all() and (out["quality_score"] <= 1).all()

    def test_quality_monotone_in_stopwords(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import add_text_stats

        t_good = "the cat and the dog are in the house with a bird " * 5
        t_bad = "zxqv wkrp fjord glyph " * 5
        ds = ray.data.from_items(
            [{"doc_id": 1, "text": t_good}, {"doc_id": 2, "text": t_bad}]
        )
        out = add_text_stats(ds).to_pandas()
        out = out.set_index("doc_id")
        assert out.loc[1, "quality_score"] > out.loc[2, "quality_score"]


class TestLangId:
    def test_known_languages(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import add_lang_pred

        rows = [
            {"doc_id": 1, "text": "the cat is in the house and it is happy with the dog"},
            {"doc_id": 2, "text": "der hund ist mit der katze in einem haus und das ist gut"},
            {"doc_id": 3, "text": "le chat est dans la maison avec les chiens et pour nous"},
            {"doc_id": 4, "text": "zxqv wkrp fjord"},
        ]
        out = (
            add_lang_pred(ray.data.from_items(rows))
            .to_pandas()
            .set_index("doc_id")["lang_pred"]
        )
        assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "unknown"


class TestFingerprint:
    def test_stable_and_distinct(self, docs):
        from redactifai_ray.stages.analyze import add_fingerprint

        out = add_fingerprint(docs.limit(50)).to_pandas()
        assert out["fingerprint"].str.len().eq(16).all()
        assert out["fingerprint"].nunique() > 40  # random texts → near-unique


class TestExactDedup:
    def test_synthetic_dups_collapse(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import exact_dedup

        rows = [
            {"doc_id": 1, "text": "alpha beta gamma"},
            {"doc_id": 2, "text": "alpha beta gamma"},
            {"doc_id": 3, "text": "something else entirely"},
            {"doc_id": 4, "text": "alpha beta gamma"},
        ]
        out = exact_dedup(ray.data.from_items(rows)).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3]  # min id kept per text

    def test_no_dups_identity(self, docs):
        from redactifai_ray.stages.dedup import exact_dedup

        assert exact_dedup(docs).count() == docs.count()


class TestMinHash:
    def test_near_dups_found_far_pairs_not(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import minhash_lsh_pairs

        base = " ".join(f"tok{i}" for i in range(120))
        near = base.replace("tok5 ", "tok5x ").replace("tok80 ", "changed ")
        far = " ".join(f"other{i}" for i in range(120))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": far},
        ]
        out = minhash_lsh_pairs(
            ray.data.from_items(rows), threshold=0.5
        ).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_string_ids_fail_fast(self, ray_session):
        # the near-dup family's slim pair exchanges are int64-keyed; a
        # string id must raise a clear driver-side TypeError (naming the
        # stable_hash64 remedy), not an opaque per-task int() ValueError
        import pyarrow as pa
        import pytest
        import ray.data

        from redactifai_ray.stages.dedup import minhash_lsh_pairs

        tbl = pa.table(
            {"doc_id": ["u1", "u2"], "text": ["a b c", "a b d"]}
        )
        with pytest.raises(TypeError, match="stable_hash64"):
            minhash_lsh_pairs(ray.data.from_arrow(tbl))

    def test_verify_exact_jaccard(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import verify_pairs_jaccard

        a = "one two three four five six seven eight"
        b = "one two three four five six seven different"
        ds = ray.data.from_items(
            [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b}]
        )
        out = verify_pairs_jaccard(ds, [(1, 2)], shingle_k=1)
        # token sets: 8 each, 7 shared → 7/9
        assert out.iloc[0]["jaccard"] == pytest.approx(7 / 9)


class TestSimHash:
    def test_near_dup_detected(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import simhash_pairs

        base = " ".join(f"word{i}" for i in range(300))
        near = base.replace("word7 ", "w7 ")
        far = " ".join(f"zz{i}" for i in range(300))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": far},
        ]
        out = simhash_pairs(ray.data.from_items(rows), max_hamming=6).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert (1, 2) in got and (1, 3) not in got


class TestEmbeddingDedup:
    def test_identical_vectors_pair(self, emb, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import embedding_near_dup_pairs

        # plant an exact duplicate vector pair
        two = emb.take(2)
        planted = ray.data.from_items(
            [
                {"vec_id": 9001, "embedding": two[0]["embedding"], "label": 0},
                {"vec_id": 9002, "embedding": two[0]["embedding"], "label": 0},
            ]
        )
        ds = emb.union(planted)
        out = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert (9001, 9002) in got


class TestKnn:
    def test_topk_matches_numpy_oracle(self, emb, ray_session):
        from redactifai_ray.stages.similarity import knn_topk

        df = emb.to_pandas()
        mat = np.asarray(list(df["embedding"]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1)[:, None]
        ids = df["vec_id"].to_numpy()

        q_ids = [int(ids[0]), int(ids[1])]
        q_vecs = [mat[0].tolist(), mat[1].tolist()]
        out = knn_topk(emb, q_ids, q_vecs, k=5).to_pandas()

        for qi, qvec in zip(q_ids, [mat[0], mat[1]]):
            sims = mat @ qvec
            order = sorted(zip(-sims, ids))  # sim desc, id asc
            expect = [int(i) for s, i in order if i != qi][:5]
            got = (
                out[out["query_id"] == qi]
                .sort_values("rank")["vec_id"]
                .astype(int)
                .tolist()
            )
            assert got == expect

    def test_rank_and_determinism(self, emb, ray_session):
        from redactifai_ray.stages.similarity import knn_topk_from_dataset

        a = knn_topk_from_dataset(emb, n_queries=3, k=4).to_pandas()
        b = knn_topk_from_dataset(emb, n_queries=3, k=4).to_pandas()
        key = ["query_id", "rank"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
        assert set(a.groupby("query_id")["rank"].max()) == {4}


class TestMultimodal:
    def test_real_decoder_unavailable(self):
        from redactifai_ray.stages.multimodal import DecodeImage

        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)

    def test_fake_decode_pipeline(self, ray_session):
        import ray.data

        from redactifai_ray.stages.multimodal import (
            DecodeImage,
            ResizeStub,
            encode_fake_image,
        )

        rows = [
            {"img_id": i, "image": encode_fake_image(64 + i, 48, bytes(range(256)) * 2)}
            for i in range(10)
        ] + [{"img_id": 99, "image": b"not an image"}]
        ds = ray.data.from_items(rows)
        ds = ds.map_batches(
            ResizeStub,
            fn_constructor_kwargs=dict(fake=True, target=32),
            batch_format="pyarrow",
            concurrency=1,
        )
        out = ds.map_batches(
            DecodeImage,
            fn_constructor_kwargs=dict(fake=True),
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
        ok = out[out["img_id"] != 99]
        assert (ok["width"] == 32).all() and (ok["height"] == 32).all()
        assert (ok["decode_ok"]).all()
        feats = np.asarray(list(ok["features"]))
        assert feats.shape == (10, 16)
        assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-5)
        bad = out[out["img_id"] == 99].iloc[0]
        assert not bad["decode_ok"] and bad["width"] == 0
        assert "image" not in out.columns  # blob dropped after decode


class TestNearDedup:
    def test_clusters_collapse_to_min_id(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import cluster_pairs, near_dedup

        base = " ".join(f"tok{i}" for i in range(150))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("tok3 ", "tokX ")},
            {"doc_id": 3, "text": base.replace("tok9 ", "tokY ")},
            {"doc_id": 4, "text": " ".join(f"other{i}" for i in range(150))},
        ]
        out = near_dedup(ray.data.from_items(rows), threshold=0.6).to_pandas()
        assert sorted(out["doc_id"]) == [1, 4]

    def test_union_find_transitive(self):
        from redactifai_ray.stages.dedup import cluster_pairs

        roots = cluster_pairs([(2, 3), (1, 2), (5, 6)])
        assert roots[3] == 1 and roots[2] == 1 and roots[6] == 5

    def test_no_pairs_identity(self, ray_session):
        # note: the provided documents table contains PLANTED near-dups
        # (true Jaccard ~0.95-0.99), so identity only holds on a corpus
        # of genuinely distinct texts
        import ray.data

        from redactifai_ray.stages.dedup import near_dedup

        rows = [
            {"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(80))}
            for i in range(40)
        ]
        ds = ray.data.from_items(rows)
        assert near_dedup(ds, threshold=0.6).count() == 40

    def test_testdata_planted_near_dups_found(self, docs, ray_session):
        """The driver's documents table plants true near-duplicates
        (verified Jaccard >= 0.95); near_dedup must find and drop them."""
        from redactifai_ray.stages.dedup import minhash_lsh_pairs, verify_pairs_jaccard

        pairs = minhash_lsh_pairs(docs, threshold=0.9).to_pandas()
        assert len(pairs) >= 10
        ver = verify_pairs_jaccard(
            docs, list(zip(pairs["id_a"], pairs["id_b"]))[:10], shingle_k=3
        )
        assert (ver["jaccard"] > 0.9).all()


class TestRelocatePipeline:
    def test_detect_on_text_relocates(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
        )

        html = (
            b"<html><body><p>Customer Samuel Grummons wrote to us about the "
            b"missing delivery and the support ticket is still open now.</p>"
            b"</body></html>"
        )
        # crawl text variant: newlines + char noise, same span surface
        text = (
            "Customer Samuel Grummons wrote to us\nabout the missing delivery "
            "and the support ticket is still open now."
        )
        import datetime

        tbl = pa.table({
            "url": pa.array(["http://a/1", "http://a/2"], pa.string()),
            "warc_ts": pa.array([datetime.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
            "html": pa.array([html, html], pa.binary()),
            "text": pa.array([text, None], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        })
        d = tmp_path / "pages"
        d.mkdir()
        pq.write_table(tbl, d / "p.parquet")
        out = finalize_output(
            build_deidentify_pipeline(str(d), dedup=False, detect_on="text")
        ).to_pandas().set_index("url")
        for url in ("http://a/1", "http://a/2"):
            assert "[PERSON]" in out.loc[url, "masked_text"]
            assert "Samuel Grummons" not in out.loc[url, "masked_text"]


class TestKnnLsh:
    def test_recall_vs_brute_force(self, emb, ray_session):
        from redactifai_ray.stages.similarity import knn_topk, knn_topk_lsh

        df = emb.to_pandas()
        ids = df["vec_id"].tolist()[:4]
        vecs = [list(v) for v in df["embedding"].tolist()[:4]]
        exact = knn_topk(emb, ids, vecs, k=5).to_pandas()
        approx = knn_topk_lsh(emb, ids, vecs, k=5, n_planes=4, probe_hamming=2).to_pandas()
        hits = 0
        total = 0
        for qid in ids:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
            total += len(e)
        recall = hits / total
        # the test embeddings are near-uniform 64-dim vectors — the hardest
        # case for LSH; with 4 planes + 2-bit probes recall is ~0.8
        assert recall >= 0.5
        # every query still returns k results
        assert (approx.groupby("query_id").size() == 5).all()


class TestLabelPropagation:
    def test_components_path_and_pair(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import label_propagation

        pairs = ray.data.from_items(
            [{"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3},
             {"id_a": 3, "id_b": 4}, {"id_a": 10, "id_b": 11}]
        )
        lab = label_propagation(pairs).to_pandas()
        got = dict(zip(lab["node"], lab["label"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_matches_union_find(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import cluster_pairs, label_propagation

        edges = [(1, 5), (5, 9), (2, 6), (6, 2), (100, 3), (3, 9), (40, 41)]
        pairs = ray.data.from_items(
            [{"id_a": a, "id_b": b} for a, b in edges]
        )
        lab = label_propagation(pairs).to_pandas()
        got = dict(zip(lab["node"], lab["label"]))
        roots = cluster_pairs(edges)
        for node, root in roots.items():
            assert got[node] == root

    def test_near_dedup_distributed_matches_driver(self, ray_session):
        """Forced distributed path (the round-1 hard-fail regime) must
        keep exactly the same survivors as driver union-find."""
        import ray.data

        from redactifai_ray.stages.dedup import near_dedup

        base = " ".join(f"tok{i}" for i in range(150))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("tok3 ", "tokX ")},
            {"doc_id": 3, "text": base.replace("tok9 ", "tokY ")},
            {"doc_id": 4, "text": " ".join(f"other{i}" for i in range(150))},
        ]
        ds = ray.data.from_items(rows)
        a = sorted(
            r["doc_id"]
            for r in near_dedup(ds, threshold=0.6, method="driver").take_all()
        )
        b = sorted(
            r["doc_id"]
            for r in near_dedup(ds, threshold=0.6, method="distributed").take_all()
        )
        assert a == b == [1, 4]
        # auto with a tiny cap must route to distributed, not raise
        c = sorted(
            r["doc_id"]
            for r in near_dedup(ds, threshold=0.6, max_pairs=0).take_all()
        )
        assert c == [1, 4]


class TestMinHashScalePath:
    def test_join_fallback_matches_fast_path(self, ray_session):
        """max_broadcast_ids=0 forces the distributed signature semi-join
        + join-based estimation; results must match the broadcast path."""
        import ray.data

        from redactifai_ray.stages.dedup import minhash_lsh_pairs

        base = " ".join(f"tok{i}" for i in range(120))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("tok5 ", "tok5x ")},
            {"doc_id": 3, "text": " ".join(f"o{i}" for i in range(120))},
        ]
        ds = ray.data.from_items(rows)
        fast = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        slow = minhash_lsh_pairs(
            ds, threshold=0.5, max_broadcast_ids=0
        ).to_pandas()
        key = ["id_a", "id_b", "est_jaccard"]
        assert sorted(map(tuple, fast[key].values.tolist())) == sorted(
            map(tuple, slow[key].values.tolist())
        )


class TestEmbeddingPlantedRecall:
    def test_planted_pairs_recovered(self, ray_session):
        """q_embedding_near_dup plants jittered copies (cos ≈ 0.989);
        multi-table LSH must recover ≥ 0.9 of the planted pairs."""
        from redactifai_ray.pipelines.queries import PLANT_OFFSET, q_embedding_near_dup

        out = q_embedding_near_dup(SF)
        n_planted = 20
        planted_found = {
            int(a)
            for a, b in zip(out["id_a"], out["id_b"])
            if int(b) == int(a) + PLANT_OFFSET
        }
        assert len(planted_found) >= 0.9 * n_planted
        assert (out["cosine"] >= 0.95).all()


class TestExactDedupSlimShuffle:
    def test_loser_broadcast_matches_shuffle_fallback(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import exact_dedup

        rows = [{"doc_id": i, "text": f"text {i % 7}"} for i in range(30)]
        ds = ray.data.from_items(rows)
        fast = exact_dedup(ds).to_pandas().sort_values("doc_id")
        slow = exact_dedup(ds, max_broadcast_losers=0).to_pandas().sort_values(
            "doc_id"
        )
        assert sorted(fast["doc_id"]) == sorted(slow["doc_id"]) == list(range(7))


class TestLangIdScripts:
    def test_script_and_latin_vote(self, ray_session):
        """Upgraded two-stage LangId: Unicode-script routing for non-Latin
        scripts plus a 7-language Latin stopword vote."""
        from redactifai_ray.stages.analyze import LangId

        l = LangId()
        cases = {
            "en": "the cat is on the mat and it was not there for a while",
            "de": "der hund ist nicht mit der katze auf dem tisch und das gut",
            "fr": "le chien est dans la maison avec les enfants pour une fête",
            "es": "el perro está en la casa con los niños para una fiesta y no es más",
            "it": "il cane è nella casa con i bambini per una festa e non è più qui",
            "pt": "o cão está em casa com as crianças para uma festa e não é mais",
            "zh": "这是一个中文句子，用于测试语言识别的功能。我们希望它能正确工作。",
            "ja": "これは日本語のテスト文です。言語判定が正しく動くことを確認します。",
            "ko": "이것은 한국어 테스트 문장입니다. 언어 감지가 잘 되는지 확인합니다.",
            "ru": "Это тестовое предложение на русском языке для проверки языка.",
        }
        for want, text in cases.items():
            assert l.predict(text) == want
        assert l.predict("") == "unknown"
        assert l.predict("zxqv wkrp fjord") == "unknown"

    def test_testdata_predictions_stable(self, docs, ray_session):
        """The provided documents table is English word-soup regardless of
        its synthetic ``lang`` label — predictions must be en/unknown only
        (guards against spurious non-Latin routing on ASCII text)."""
        from redactifai_ray.stages.analyze import add_lang_pred

        out = add_lang_pred(docs).select_columns(["lang_pred"]).to_pandas()
        assert set(out["lang_pred"]) <= {"en", "unknown"}


class TestMultimodalVideoAudio:
    def test_frame_sample_explodes_and_drops_blob(self, ray_session):
        import ray.data

        from redactifai_ray.stages.multimodal import (
            DecodeImage,
            FrameSample,
            encode_fake_image,
            encode_fake_video,
        )

        frames = [encode_fake_image(8, 6, bytes([i]) * 32) for i in range(25)]
        vid = encode_fake_video(frames, fps=5)
        ds = ray.data.from_items(
            [{"doc_id": 1, "video": vid}, {"doc_id": 2, "video": b"junk"}]
        )
        sampled = ds.map_batches(
            FrameSample,
            fn_constructor_kwargs=dict(every_n=10, fake=True),
            batch_format="pyarrow",
            batch_size=1,  # heavy-payload contract: tiny batches
            concurrency=(1, 2),
        )
        out = sampled.to_pandas()
        assert list(out["frame_idx"]) == [0, 10, 20]  # doc 2 yields nothing
        assert "video" not in out.columns
        # sampled frames feed the image stage directly
        dec = sampled.map_batches(
            DecodeImage,
            fn_constructor_kwargs=dict(bytes_col="image", fake=True),
            batch_format="pyarrow",
            concurrency=(1, 2),
        ).to_pandas()
        assert (dec["width"] == 8).all() and dec["decode_ok"].all()

    def test_audio_features(self, ray_session):
        import numpy as np
        import ray.data

        from redactifai_ray.stages.multimodal import AudioFeatures, encode_fake_audio

        t = np.arange(16000, dtype=np.float64) / 16000.0
        tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
        ds = ray.data.from_items(
            [
                {"aid": 1, "audio": encode_fake_audio(16000, tone)},
                {"aid": 2, "audio": b"notaudio"},
            ]
        )
        out = (
            ds.map_batches(
                AudioFeatures,
                fn_constructor_kwargs=dict(fake=True),
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .to_pandas()
            .set_index("aid")
        )
        assert out.loc[1, "duration_s"] == 1.0
        assert abs(out.loc[1, "rms"] - 20000 / 32768 / np.sqrt(2)) < 0.01
        assert abs(out.loc[1, "zcr"] - 2 * 440 / 16000) < 0.01
        assert out.loc[2, "n_samples"] == 0
        assert "audio" not in out.columns

    def test_real_codec_paths_guarded(self):
        import pytest as _pytest

        from redactifai_ray.stages.multimodal import AudioFeatures, FrameSample

        with _pytest.raises(NotImplementedError):
            FrameSample(fake=False)
        with _pytest.raises(NotImplementedError):
            AudioFeatures(fake=False)


class TestAsofAndRangeJoin:
    def test_asof_deterministic_and_backward(self, ray_session):
        from redactifai_ray.pipelines.queries import q_asof_purchase

        a = q_asof_purchase(SF).sort_values(["user_id", "event_id"]).reset_index(drop=True)
        b = q_asof_purchase(SF).sort_values(["user_id", "event_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
        # every match is a real purchase event id
        import ray.data

        ev = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_id", "event_type"]
        ).to_pandas()
        purch_ids = set(ev.loc[ev["event_type"] == "purchase", "event_id"])
        assert set(a["purchase_event_id"]) <= purch_ids

    def test_quantity_bands_partition_input(self, ray_session):
        from redactifai_ray.pipelines.queries import q_quantity_bands

        out = q_quantity_bands(SF)
        import ray.data

        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_quantity"]
        ).to_pandas()
        in_range = ((li["l_quantity"] >= 0) & (li["l_quantity"] < 60)).sum()
        assert out["n_items"].sum() == in_range  # bands partition [0, 60)


class TestJaccardDups:
    def test_pairs_symmetric_threshold(self, ray_session):
        from redactifai_ray.pipelines.queries import q_jaccard_dups

        out = q_jaccard_dups(SF)
        assert len(out) > 0
        assert (out["jaccard"] >= 0.8).all() and (out["jaccard"] <= 1.0).all()
        assert (out["id_a"] < out["id_b"]).all()
        # deterministic across runs
        again = q_jaccard_dups(SF)
        key = ["id_a", "id_b"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True),
            again.sort_values(key).reset_index(drop=True),
        )


class TestKnnIvf:
    def test_recall_vs_brute_force(self, emb, ray_session):
        from redactifai_ray.stages.similarity import (
            build_ivf_centroids,
            knn_topk,
            knn_topk_ivf,
        )

        df = emb.to_pandas()
        ids = df["vec_id"].tolist()[:4]
        vecs = [list(v) for v in df["embedding"].tolist()[:4]]
        C = build_ivf_centroids(emb, n_centroids=16)
        assert C.shape[0] == 16
        exact = knn_topk(emb, ids, vecs, k=5).to_pandas()
        approx = knn_topk_ivf(
            emb, ids, vecs, k=5, centroids=C, nprobe=6
        ).to_pandas()
        hits = total = 0
        for qid in ids:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
            total += len(e)
        assert hits / total >= 0.5  # near-uniform vectors: IVF's hard case
        assert (approx.groupby("query_id").size() == 5).all()

    def test_centroids_deterministic(self, emb, ray_session):
        import numpy as np

        from redactifai_ray.stages.similarity import build_ivf_centroids

        a = build_ivf_centroids(emb, n_centroids=8)
        b = build_ivf_centroids(emb, n_centroids=8)
        assert np.array_equal(a, b)


class TestShippedPatternsFile:
    def test_webtext_extra_patterns_detect_and_mask(self, ray_session, tmp_path):
        import os

        import pyarrow as pa_
        import pyarrow.parquet as pq
        import ray.data

        import redactifai_ray
        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
        )
        from redactifai_ray.stages.content import load_patterns_file

        pfile = os.path.join(
            os.path.dirname(redactifai_ray.__file__), "patterns", "webtext_extra.json"
        )
        pats = load_patterns_file(pfile)
        assert {"IPAddress", "CreditCard", "MacAddress"} <= set(pats)

        html = (
            b"<html><body><p>Server at 192.168.10.44 billed card "
            b"4111 1111 1111 1111 for the premium plan yesterday.</p>"
            b"</body></html>"
        )
        t = pa_.table(
            {
                "url": ["http://x/1"],
                "warc_ts": pa_.array([pd.Timestamp("2024-01-01")], pa_.timestamp("us")),
                "html": pa_.array([html], pa_.binary()),
                "text": pa_.array([None], pa_.string()),
                "lang": ["en"],
            }
        )
        pq.write_table(t, str(tmp_path / "p.parquet"))
        out = finalize_output(
            build_deidentify_pipeline(
                str(tmp_path / "p.parquet"), dedup=False, extra_patterns=pats
            )
        ).to_pandas()
        masked = out.iloc[0]["masked_text"]
        assert "192.168.10.44" not in masked and "[IPADDRESS]" in masked
        assert "4111" not in masked and "[CREDITCARD]" in masked


class TestRelocateSurfaceFallback:
    def test_aligner_miss_caught_by_substring(self, ray_session):
        """A span whose context words are all noise-corrupted defeats the
        fuzzy aligner — the PHI-safe fallback must still mask the surface
        wherever it appears in the target."""
        import pyarrow as pa_

        from redactifai_ray.stages.relocate import make_relocate_batch

        tgt = "completely different framing text mentions 555-12-9876 here"
        src = "zz qq ww 555-12-9876 rr tt yy"  # context shares no words
        spans = [{"start": 9, "end": 20, "category": "SSN",
                  "subcategory": "", "confidence": 0.95, "text": "555-12-9876"}]
        batch = pa_.table(
            {
                "text": pa_.array([src], pa_.string()),
                "extracted_text": pa_.array([tgt], pa_.string()),
                "spans": pa_.array([spans]),
            }
        )
        out = make_relocate_batch()(batch)
        got = out["spans"].to_pylist()[0]
        assert any(
            tgt[s["start"]:s["end"]] == "555-12-9876" and s["category"] == "SSN"
            for s in got
        )
        # fallback disabled → documents the pre-fix behavior
        out2 = make_relocate_batch(surface_fallback=False)(batch)
        assert all(
            tgt[s["start"]:s["end"]] != "555-12-9876"
            or s["category"] != "SSN"
            for s in out2["spans"].to_pylist()[0]
        ) or len(out2["spans"].to_pylist()[0]) <= len(got)

    def test_absent_surface_drops_safely(self, ray_session):
        import pyarrow as pa_

        from redactifai_ray.stages.relocate import make_relocate_batch

        batch = pa_.table(
            {
                "text": pa_.array(["noise 111-22-3333 noise"], pa_.string()),
                "extracted_text": pa_.array(["the extractor removed it"], pa_.string()),
                "spans": pa_.array([[{"start": 6, "end": 17, "category": "SSN",
                                      "subcategory": "", "confidence": 0.95,
                                      "text": "111-22-3333"}]]),
            }
        )
        out = make_relocate_batch()(batch)
        assert out["spans"].to_pylist()[0] == []


class TestAdviceR2Regressions:
    def test_surface_fallback_length_changing_lower(self, ray_session):
        """'İ' (U+0130) lowers to TWO chars — lowered-string offsets would
        shift every later span and mask the wrong region (ADVICE r2).
        The finditer fallback keeps offsets in original coordinates."""
        from redactifai_ray.stages.relocate import make_relocate_batch

        tgt = "İİİİ prefix text mentions 555-12-9876 right here"
        src = "zz qq ww 555-12-9876 rr tt yy"  # defeats the aligner
        spans = [{"start": 9, "end": 20, "category": "SSN",
                  "subcategory": "", "confidence": 0.95, "text": "555-12-9876"}]
        batch = pa.table(
            {
                "text": pa.array([src], pa.string()),
                "extracted_text": pa.array([tgt], pa.string()),
                "spans": pa.array([spans]),
            }
        )
        got = make_relocate_batch()(batch)["spans"].to_pylist()[0]
        hits = [s for s in got if s["category"] == "SSN"]
        assert hits and all(
            tgt[s["start"]:s["end"]] == "555-12-9876" for s in hits
        )

    def test_exact_dedup_string_ids(self, ray_session):
        """exact_dedup must keep ids in their native dtype — string doc
        ids crashed the r2 slim path (ADVICE r2)."""
        import ray.data

        from redactifai_ray.stages.dedup import exact_dedup

        ds = ray.data.from_items(
            [
                {"doc_id": "d-b", "text": "same text"},
                {"doc_id": "d-a", "text": "same text"},
                {"doc_id": "d-c", "text": "unique one"},
            ]
        )
        out = exact_dedup(ds).to_pandas()
        assert sorted(out["doc_id"]) == ["d-a", "d-c"]

    def test_winner_filter_null_keys(self, ray_session):
        """Null keys must pass through the vectorized membership test —
        pc.is_in yields null there and the numpy conversion broke
        (ADVICE r2)."""
        import ray

        from redactifai_ray.pipelines.deidentify import make_winner_filter

        winners_ref = ray.put({"u1": 200})
        batch = pa.table(
            {
                "url": pa.array(["u1", None, "u2", "u1"], pa.string()),
                "warc_ts": pa.array([100, 50, 60, 200], pa.int64()),
            }
        )
        out = make_winner_filter(winners_ref)(batch)
        # loser u1@100 dropped; null-key row and unique rows survive
        assert out["warc_ts"].to_pylist() == [50, 60, 200]


class TestDistributedVerifyFallbacks:
    def test_embedding_fallback_matches_broadcast(self, emb, ray_session):
        """max_broadcast_ids=0 forces the distributed unit-vector
        semi-join verify (VERDICT r2 #1 — previously a hard ValueError);
        the pair set and cosines must match the broadcast path."""
        import ray.data

        from redactifai_ray.stages.dedup import embedding_near_dup_pairs

        two = emb.take(2)
        planted = ray.data.from_items(
            [
                {"vec_id": 9001, "embedding": two[0]["embedding"], "label": 0},
                {"vec_id": 9002, "embedding": two[0]["embedding"], "label": 0},
                {"vec_id": 9003, "embedding": two[1]["embedding"], "label": 0},
                {"vec_id": 9004, "embedding": two[1]["embedding"], "label": 0},
            ]
        )
        ds = emb.union(planted)
        fast = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
        slow = embedding_near_dup_pairs(
            ds, threshold=0.999, max_broadcast_ids=0
        ).to_pandas()
        key = ["id_a", "id_b"]
        assert sorted(map(tuple, fast[key].values.tolist())) == sorted(
            map(tuple, slow[key].values.tolist())
        )
        f = fast.sort_values(key).reset_index(drop=True)
        s = slow.sort_values(key).reset_index(drop=True)
        assert np.allclose(f["cosine"], s["cosine"])
        assert {(9001, 9002), (9003, 9004)} <= set(
            map(tuple, s[key].values.tolist())
        )

    def test_jaccard_fallback_matches_broadcast(self, ray_session):
        """max_broadcast_ids=0 forces the distributed shingle-payload
        semi-join (VERDICT r2 #2 — previously an uncapped driver
        gather); exact jaccard values must be bit-identical."""
        import ray.data

        from redactifai_ray.stages.dedup import verify_pairs_jaccard

        base = " ".join(f"w{i}" for i in range(60))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("w7 ", "w7x ")},
            {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(60))},
            {"doc_id": 4, "text": base},
        ]
        ds = ray.data.from_items(rows)
        pairs = [(1, 2), (1, 3), (1, 4), (2, 4)]
        fast = verify_pairs_jaccard(ds, pairs, shingle_k=3)
        slow = verify_pairs_jaccard(ds, pairs, shingle_k=3, max_broadcast_ids=0)
        key = ["id_a", "id_b"]
        f = fast.sort_values(key).reset_index(drop=True)
        s = slow.sort_values(key).reset_index(drop=True)
        assert list(map(tuple, f[key].values.tolist())) == list(
            map(tuple, s[key].values.tolist())
        )
        assert (f["jaccard"].to_numpy() == s["jaccard"].to_numpy()).all()
        assert f.loc[(f["id_a"] == 1) & (f["id_b"] == 4), "jaccard"].iloc[0] == 1.0

    def test_jaccard_accepts_pairs_dataset(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import verify_pairs_jaccard

        base = " ".join(f"w{i}" for i in range(40))
        ds = ray.data.from_items(
            [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": base}]
        )
        pairs_ds = ray.data.from_items([{"id_a": 1, "id_b": 2, "est_jaccard": 1.0}])
        out = verify_pairs_jaccard(ds, pairs_ds, shingle_k=3)
        assert out["jaccard"].tolist() == [1.0]


class TestTpchQ3SemijoinFallback:
    def test_fallback_matches_broadcast(self, ray_session):
        """max_broadcast_keys=0 forces the join-free customer semi-join
        (VERDICT r2 #3 — previously an uncapped fact-derived key-set
        broadcast); top-10 result must be identical."""
        from redactifai_ray.pipelines.queries import q_tpch_q3

        fast = q_tpch_q3(SF)
        slow = q_tpch_q3(SF, max_broadcast_keys=0)
        pd.testing.assert_frame_equal(fast, slow)

    def test_customers_no_orders_anti_fallback(self, ray_session):
        """max_broadcast_keys=0 forces the join-free ANTI-join for the
        fact-derived urgent-custkey set (round-4 VERDICT #3 — previously
        an uncapped broadcast); result must be identical."""
        from redactifai_ray.pipelines.queries import q_customers_no_orders

        fast = q_customers_no_orders(SF)
        slow = q_customers_no_orders(SF, max_broadcast_keys=0)
        pd.testing.assert_frame_equal(fast, slow)


class TestWarcishSource:
    def _rows(self, n=25):
        return [
            {
                "url": f"https://ex{i % 3}.example.com/p/{i}",
                "warc_ts": 1_700_000_000_000_000 + i,
                "lang": ["en", "de", "fr"][i % 3],
                "html": (
                    f"<html><body><p>page {i} body with enough characters "
                    "to clear the extractor's minimum content threshold"
                    "</p></body></html>"
                ),
            }
            for i in range(n)
        ]

    def test_roundtrip_multi_archive(self, ray_session, tmp_path):
        from redactifai_ray.sources.warcish import read_warcish, write_warcish

        rows = self._rows()
        paths = write_warcish(str(tmp_path), rows, records_per_file=10)
        assert len(paths) == 3  # 25 records / 10 per file
        out = (
            read_warcish(str(tmp_path))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert len(out) == 25
        by_url = out.set_index("url")
        for r in rows:
            got = by_url.loc[r["url"]]
            assert got["html"] == r["html"].encode()
            assert got["lang"] == r["lang"]
            assert got["warc_ts"].value == r["warc_ts"] * 1000  # ns vs us

    def test_feeds_extractor(self, ray_session, tmp_path):
        from redactifai_ray.sources.warcish import read_warcish, write_warcish
        from redactifai_ray.stages.extract import make_extract_batch

        write_warcish(str(tmp_path), self._rows(6), records_per_file=3)
        out = (
            read_warcish(str(tmp_path))
            .map_batches(make_extract_batch(), batch_format="pyarrow")
            .to_pandas()
        )
        assert len(out) == 6
        assert all("body" in t for t in out["extracted_text"])

    def test_corrupt_record_raises(self, tmp_path):
        from redactifai_ray.sources.warcish import parse_warcish, write_warcish

        path = write_warcish(str(tmp_path), self._rows(2), records_per_file=2)[0]
        blob = open(path, "rb").read()
        with pytest.raises(ValueError, match="corrupt|truncated"):
            parse_warcish(b"XX" + blob[2:], path)
        with pytest.raises(ValueError, match="truncated"):
            parse_warcish(blob[:-5], path)


class TestNormalizeText:
    def test_nfc_lower_collapse(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import normalize_text

        rows = [
            {"doc_id": 0, "text": "  HeLLo\t WOrld  "},
            {"doc_id": 1, "text": "Café time"},  # e + combining acute
            {"doc_id": 2, "text": None},
        ]
        out = (
            normalize_text(ray.data.from_items(rows))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "text"] == "hello world"
        assert out.loc[1, "text"] == "café time"  # composed é
        assert out.loc[2, "text"] is None


class TestPmiBigrams:
    def test_matches_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data

        from redactifai_ray.stages.analyze import pmi_bigrams

        texts = [
            "strong coffee strong coffee very strong coffee",
            "weak tea weak tea strong tea",
            "strong coffee again and strong coffee forever",
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        out = (
            pmi_bigrams(ray.data.from_items(rows), min_count=2)
            .to_pandas()
            .set_index(["w1", "w2"])
            .sort_index()
        )
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in texts:
            toks = t.split()
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        n_uni = sum(uni.values())
        n_bi = sum(bi.values())
        expected = {
            (x, y): (
                c,
                math.log((c * 1.0 * n_uni * n_uni) / (n_bi * 1.0 * uni[x] * uni[y])),
            )
            for (x, y), c in bi.items()
            if c >= 2
        }
        assert set(out.index) == set(expected)
        for key, (c, pmi) in expected.items():
            assert out.loc[key, "n_xy"] == c
            assert out.loc[key, "pmi"] == pytest.approx(pmi, abs=0)
        # the dominant collocation must score positive PMI
        assert out.loc[("strong", "coffee"), "pmi"] > 0

    def test_sharded_fallback_matches_broadcast(self, ray_session):
        """max_broadcast_vocab=0 forces the shard-by-term path (round-4:
        the hard ValueError became code); results must be bit-exact vs
        the broadcast path."""
        import ray.data

        from redactifai_ray.stages.analyze import pmi_bigrams

        texts = [
            "strong coffee strong coffee very strong coffee",
            "weak tea weak tea strong tea",
            "strong coffee again and strong coffee forever",
            "a b c d e f g h a b a b",
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        fast = (
            pmi_bigrams(ray.data.from_items(rows), min_count=2)
            .to_pandas()
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )
        slow = (
            pmi_bigrams(
                ray.data.from_items(rows), min_count=2, max_broadcast_vocab=0
            )
            .to_pandas()
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)  # bit-exact
        assert len(fast) > 0

    def test_term_pkey_batch_equals_elementwise(self):
        """Round-4 regression: pandas' hash_array(categorize=True)
        returns content-dependent WRONG hashes for object arrays with
        duplicate NUL-bearing strings (the \\x00-joined pair keys) —
        batch hashing must equal element-wise hashing."""
        import numpy as np

        from redactifai_ray.stages.analyze import _term_pkey

        keys = [f"w{i % 7}\x00t{i % 11}" for i in range(500)]
        batch = _term_pkey(keys, 64)
        rowwise = np.array([_term_pkey([k], 64)[0] for k in keys])
        assert (batch == rowwise).all()

    def test_tfidf_sharded_fallback_matches_broadcast(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import tfidf_top_terms

        texts = [
            "alpha beta beta gamma gamma gamma",
            "alpha alpha delta",
            "beta delta delta epsilon epsilon epsilon epsilon",
            "zeta",
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        fast = (
            tfidf_top_terms(ray.data.from_items(rows), k=2)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        slow = (
            tfidf_top_terms(
                ray.data.from_items(rows), k=2, max_broadcast_vocab=0
            )
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, slow)  # bit-exact
        assert len(fast) > 0


class TestKmeansAssign:
    def test_deterministic_and_consistent(self, ray_session, emb):
        from redactifai_ray.stages.similarity import (
            build_ivf_centroids,
            kmeans_assign,
        )

        C = build_ivf_centroids(emb, n_centroids=4)
        a = (
            kmeans_assign(emb, centroids=C)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        b = (
            kmeans_assign(emb, centroids=C)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # every vector lands in a valid cluster, sim within cosine range
        assert a["cluster_id"].between(0, 3).all()
        assert a["sim"].between(-1.0000001, 1.0000001).all()
        # assignment really is argmax vs the same centroids
        import numpy as np

        emb_pd = emb.to_pandas()
        X = np.asarray(list(emb_pd["embedding"]), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        best = np.argmax(X @ C.T, axis=1)
        merged = emb_pd[["vec_id"]].assign(expect=best).merge(a, on="vec_id")
        assert (merged["expect"] == merged["cluster_id"]).all()


class TestSemDedup:
    def _emb_rows(self):
        rng = np.random.default_rng(7)
        rows = []
        base = rng.normal(size=(10, 16))
        for i, v in enumerate(base):
            rows.append({"vec_id": i, "embedding": (v / np.linalg.norm(v)).tolist()})
        # planted near-dups: 100..102 are tiny perturbations of row 0;
        # 200 duplicates row 5
        for j, (src, nid) in enumerate([(0, 100), (0, 101), (0, 102), (5, 200)]):
            v = base[src] + rng.normal(scale=1e-4, size=16)
            rows.append(
                {"vec_id": nid, "embedding": (v / np.linalg.norm(v)).tolist()}
            )
        return rows

    def test_drops_planted_keeps_first(self, ray_session):
        import ray.data

        from redactifai_ray.stages.similarity import semdedup

        out = (
            semdedup(
                ray.data.from_items(self._emb_rows()),
                threshold=0.99,
                n_centroids=3,
            )
            .to_pandas()
            .set_index("vec_id")
        )
        assert len(out) == 14
        # originals survive, planted copies die (keep-first-by-id)
        assert bool(out.loc[0, "keep"]) and bool(out.loc[5, "keep"])
        for nid in (100, 101, 102, 200):
            assert not bool(out.loc[nid, "keep"]), nid
        # distinct base vectors survive
        assert int(out["keep"].sum()) == 10

    def test_blockwise_equals_full(self, ray_session):
        import ray.data

        from redactifai_ray.stages.similarity import (
            build_ivf_centroids,
            semdedup,
        )

        ds = ray.data.from_items(self._emb_rows())
        C = build_ivf_centroids(ds, n_centroids=3)
        full = (
            semdedup(ds, threshold=0.99, centroids=C)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        blocky = (
            semdedup(ds, threshold=0.99, centroids=C, block_rows=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(full, blocky)


class TestIncrementalDedup:
    def test_two_increments(self, ray_session, tmp_path):
        import ray.data

        from redactifai_ray.stages.dedup import incremental_exact_dedup

        store = str(tmp_path / "store")
        shard1 = [
            {"doc_id": 0, "text": "alpha content"},
            {"doc_id": 1, "text": "beta content"},
            {"doc_id": 2, "text": "alpha content"},  # within-shard dup
        ]
        out1 = (
            incremental_exact_dedup(
                ray.data.from_items(shard1), store, run_id="r1"
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out1["doc_id"].tolist() == [0, 1]  # min id wins in-shard

        shard2 = [
            {"doc_id": 10, "text": "alpha content"},  # seen in r1 → drop
            {"doc_id": 11, "text": "gamma content"},  # new → keep
            {"doc_id": 12, "text": "gamma content"},  # in-shard dup → drop
        ]
        out2 = (
            incremental_exact_dedup(
                ray.data.from_items(shard2), store, run_id="r2"
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out2["doc_id"].tolist() == [11]

        # third increment sees BOTH runs' survivors
        shard3 = [
            {"doc_id": 20, "text": "gamma content"},  # seen in r2 → drop
            {"doc_id": 21, "text": "delta content"},
        ]
        out3 = (
            incremental_exact_dedup(
                ray.data.from_items(shard3), store, run_id="r3"
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out3["doc_id"].tolist() == [21]

    def test_loser_cap_raises(self, ray_session, tmp_path):
        import ray.data

        from redactifai_ray.stages.dedup import incremental_exact_dedup

        rows = [{"doc_id": i, "text": "same"} for i in range(5)]
        with pytest.raises(ValueError, match="split the shard"):
            incremental_exact_dedup(
                ray.data.from_items(rows),
                str(tmp_path / "s"),
                max_broadcast_losers=2,
            )

    def test_chain_equals_global_dedup(self, ray_session, tmp_path):
        """Invariant: with ids increasing across increments (crawl-global
        ids, the store contract), chaining incremental_exact_dedup over
        the increments keeps exactly the docs a single global exact_dedup
        over the concatenation keeps (min id per content)."""
        import ray.data

        from redactifai_ray.stages.dedup import (
            exact_dedup,
            incremental_exact_dedup,
        )

        texts = [f"content {i % 7}" for i in range(30)]  # 7 distinct
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        store = str(tmp_path / "chain")
        survivors: list[int] = []
        for k in range(3):  # three increments of 10
            out = incremental_exact_dedup(
                ray.data.from_items(rows[k * 10 : (k + 1) * 10]),
                store,
                run_id=f"r{k}",
            ).to_pandas()
            if "doc_id" in out.columns:
                survivors.extend(int(d) for d in out["doc_id"])
        global_ids = sorted(
            int(d)
            for d in exact_dedup(ray.data.from_items(rows))
            .to_pandas()["doc_id"]
        )
        assert sorted(survivors) == global_ids == list(range(7))


class TestWinsorize:
    def test_clips_to_exact_quantiles(self, ray_session):
        import ray.data

        from redactifai_ray.stages.curate import exact_quantiles, winsorize

        vals = list(range(1, 101))  # 1..100
        rows = [{"doc_id": i, "n": v} for i, v in enumerate(vals)]
        ds = ray.data.from_items(rows)
        cuts = exact_quantiles(ds, "n", [0.05, 0.95])
        assert cuts[0.05] == 5 and cuts[0.95] == 95  # ceil(q*n)-1 rank
        out = (
            winsorize(ds, "n", 0.05, 0.95)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_winsor"].min() == 5
        assert out["n_winsor"].max() == 95
        assert (out.loc[10:89, "n_winsor"] == out.loc[10:89, "n"]).all()


class TestCanonicalUrl:
    def test_rules(self):
        from redactifai_ray.functions.urls import canonical_url as cu

        assert (
            cu("HTTP://WWW.Example.com:80/a/?utm_source=x&b=2&a=1#frag")
            == "http://example.com/a?a=1&b=2"
        )
        assert cu("https://example.com:443/") == "https://example.com/"
        assert cu("https://example.com:8443/x") == "https://example.com:8443/x"
        assert cu("https://example.com/path/") == "https://example.com/path"
        assert cu("https://example.com") == "https://example.com/"
        # tracking-only query → dropped entirely
        assert (
            cu("https://example.com/p?gclid=abc&utm_medium=m")
            == "https://example.com/p"
        )
        # blank values survive; unparseable / relative inputs pass through
        assert cu("https://example.com/p?q=") == "https://example.com/p?q="
        assert cu("not a url") == "not a url"
        assert cu(None) is None
        # www-stripping never empties the host
        assert cu("http://www./x") == "http://www./x"

    def test_malformed_port_and_ipv6(self):
        """Round-4 ADVICE regression: urlsplit defers port validation to
        the .port accessor, so out-of-range ports must pass through (not
        raise); IPv6 hosts keep their brackets and stay idempotent."""
        from redactifai_ray.functions.urls import canonical_url as cu

        assert cu("http://x:99999/") == "http://x:99999/"
        assert cu("http://x:-1/") == "http://x:-1/"
        assert cu("http://[::1]:8080/a/") == "http://[::1]:8080/a"
        assert cu("https://[2001:DB8::1]:443/p/") == "https://[2001:db8::1]/p"
        for u in ("http://[::1]:8080/a/", "http://x:99999/"):
            assert cu(cu(u)) == cu(u)

    def test_dedup_merges_spelling_variants(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from redactifai_ray.pipelines.deidentify import (
            compute_dup_winners,
            make_winner_filter,
        )
        from redactifai_ray.functions.urls import canonical_url
        import ray

        rows = {
            "url": [
                "http://WWW.Example.com/a?utm_source=x",
                "http://example.com/a",          # same page, newer crawl
                "http://example.com/b",          # unique
            ],
            "warc_ts": [100, 200, 50],
        }
        p = tmp_path / "pages.parquet"
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(rows["url"]),
                    "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
                }
            ),
            p,
        )
        winners = compute_dup_winners([str(p)], key_fn=canonical_url)
        assert len(winners) == 1  # one canonical key duplicated
        ds = ray.data.read_parquet(str(p))
        out = ds.map_batches(
            make_winner_filter(ray.put(winners), key_fn=canonical_url),
            batch_format="pyarrow",
        ).to_pandas()
        assert sorted(out["url"]) == [
            "http://example.com/a",
            "http://example.com/b",
        ]


class TestRegistrableDomain:
    def test_rules(self):
        from redactifai_ray.functions.urls import registrable_domain as rd

        assert rd("https://news.sub.example.com/x") == "example.com"
        assert rd("https://a.b.example.co.uk/") == "example.co.uk"
        assert rd("http://example.org") == "example.org"
        assert rd("http://192.168.10.1/x") == "192.168.10.1"
        assert rd("http://localhost/x") == "localhost"
        assert rd(None) is None

    def test_domain_stats_over_pages(self, ray_session, tmp_path):
        import ray.data

        from redactifai_ray.functions.urls import add_domain

        rows = [
            {"url": f"https://s{i % 3}.shard.site{i % 2}.example.com/p/{i}"}
            for i in range(20)
        ]
        out = (
            add_domain(ray.data.from_items(rows))
            .groupby("domain")
            .count()
            .to_pandas()
            .sort_values("domain")
        )
        assert out["domain"].tolist() == ["example.com"]
        assert out["count()"].tolist() == [20]


class TestBlocklistFilter:
    def test_blocks_by_registrable_domain(self, ray_session):
        import ray.data

        from redactifai_ray.functions.urls import filter_blocklist

        rows = [
            {"url": "https://spam.example.com/a", "v": 1},
            {"url": "https://sub.deep.spamsite.net/b", "v": 2},
            {"url": "https://good.org/c", "v": 3},
        ]
        out = filter_blocklist(
            ray.data.from_items(rows), ["example.com", "spamsite.net"]
        ).to_pandas()
        assert out["url"].tolist() == ["https://good.org/c"]
        allow = filter_blocklist(
            ray.data.from_items(rows), ["example.com"], invert=True
        ).to_pandas()
        assert allow["url"].tolist() == ["https://spam.example.com/a"]


class TestHashEmbedding:
    def test_near_dups_high_cosine_and_feeds_semdedup(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import text_hash_embedding
        from redactifai_ray.stages.similarity import semdedup

        base = (
            "the quick brown fox jumps over the lazy dog while birds "
            "sing above the tall green trees near the river bend"
        )
        rows = [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base.replace("lazy", "sleepy")},  # near-dup
            {"doc_id": 2, "text": "completely different content about "
                                  "database engines and query planners"},
        ]
        emb = text_hash_embedding(ray.data.from_items(rows)).to_pandas()
        vecs = {r["doc_id"]: np.array(r["embedding"]) for _, r in emb.iterrows()}
        assert np.dot(vecs[0], vecs[1]) > 0.9          # near-dup → high cos
        assert np.dot(vecs[0], vecs[2]) < 0.5          # unrelated → low
        assert np.isclose(np.linalg.norm(vecs[0]), 1.0)
        # determinism across executions
        emb2 = text_hash_embedding(ray.data.from_items(rows)).to_pandas()
        v2 = {r["doc_id"]: np.array(r["embedding"]) for _, r in emb2.iterrows()}
        assert np.array_equal(vecs[1], v2[1])
        # end-to-end: hash embeddings drive the semantic dedup family
        ds = text_hash_embedding(ray.data.from_items(rows), id_col="doc_id")
        out = (
            semdedup(ds, threshold=0.9, n_centroids=2, id_col="doc_id")
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[0, "keep"]) and not bool(out.loc[1, "keep"])
        assert bool(out.loc[2, "keep"])


class TestWarcishSplitRead:
    def test_split_equals_whole_and_parallelizes(self, ray_session, tmp_path):
        from redactifai_ray.sources.warcish import (
            read_warcish,
            read_warcish_split,
            write_warcish,
        )

        rows = [
            {
                "url": f"https://ex.com/{i}",
                "warc_ts": 1_700_000_000_000_000 + i,
                "lang": "en",
                "html": f"<html><body><p>record {i} with some body text "
                        f"payload</p></body></html>",
            }
            for i in range(50)
        ]
        # ONE big archive
        write_warcish(str(tmp_path), rows, records_per_file=50)
        whole = (
            read_warcish(str(tmp_path))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        split = (
            read_warcish_split(str(tmp_path), records_per_task=7)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(whole, split)
        assert len(split) == 50

    def test_missing_index_falls_back(self, ray_session, tmp_path):
        import os

        from redactifai_ray.sources.warcish import (
            read_warcish_split,
            write_warcish,
        )

        write_warcish(str(tmp_path), [
            {"url": "https://a/1", "warc_ts": 1, "lang": "en",
             "html": "<p>x</p>"}
        ], records_per_file=10)
        for f in os.listdir(tmp_path):
            if f.endswith(".idx"):
                os.unlink(tmp_path / f)
        out = read_warcish_split(str(tmp_path)).to_pandas()
        assert len(out) == 1


class TestIncrementalMinhashDedup:
    def _mk(self, i, text):
        return {"doc_id": i, "text": text}

    def test_three_increments(self, ray_session, tmp_path):
        import ray.data

        from redactifai_ray.stages.dedup import incremental_minhash_dedup

        store = str(tmp_path / "mh_store")
        base = " ".join(f"tok{i}" for i in range(120))
        near = base.replace("tok5 ", "tok5x ").replace("tok80 ", "changed ")
        near2 = base.replace("tok7 ", "tok7y ")
        far = " ".join(f"other{i}" for i in range(120))

        # increment 1: base + an in-shard near-dup + an unrelated doc
        out1 = (
            incremental_minhash_dedup(
                ray.data.from_items(
                    [self._mk(1, base), self._mk(2, near), self._mk(3, far)]
                ),
                store, run_id="r1", threshold=0.5,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out1["doc_id"].tolist() == [1, 3]  # in-shard near-dup drops

        # increment 2: near-dup of the STORED doc 1 + a fresh doc
        fresh = " ".join(f"fresh{i}" for i in range(120))
        out2 = (
            incremental_minhash_dedup(
                ray.data.from_items(
                    [self._mk(10, near2), self._mk(11, fresh)]
                ),
                store, run_id="r2", threshold=0.5,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out2["doc_id"].tolist() == [11]  # store wins vs doc 10

        # increment 3: near-dup of increment 2's survivor
        fresh_near = fresh.replace("fresh3 ", "freshX ")
        out3 = incremental_minhash_dedup(
            ray.data.from_items([self._mk(20, fresh_near)]),
            store, run_id="r3", threshold=0.5,
        )
        assert out3.count() == 0  # near-dup of run-2's survivor drops

    def test_distributed_fallback_equals_driver(self, ray_session, tmp_path):
        """Above max_pairs the store no longer hard-fails (round-4): it
        routes through the distributed pair fold + label propagation and
        must produce the same survivors as the driver path, across the
        full three-increment chain."""
        import ray.data

        from redactifai_ray.stages.dedup import incremental_minhash_dedup

        base = " ".join(f"tok{i}" for i in range(120))
        near = base.replace("tok5 ", "tok5x ").replace("tok80 ", "changed ")
        near2 = base.replace("tok7 ", "tok7y ")
        far = " ".join(f"other{i}" for i in range(120))
        fresh = " ".join(f"fresh{i}" for i in range(120))
        fresh_near = fresh.replace("fresh3 ", "freshX ")
        novel = " ".join(f"novel{i}" for i in range(120))
        increments = [
            [self._mk(1, base), self._mk(2, near), self._mk(3, far)],
            [self._mk(10, near2), self._mk(11, fresh)],
            [self._mk(20, fresh_near), self._mk(21, novel)],
        ]

        results = {}
        for name, max_pairs in (("driver", 5_000_000), ("dist", 0)):
            store = str(tmp_path / f"store_{name}")
            outs = []
            for k, rows in enumerate(increments):
                out = incremental_minhash_dedup(
                    ray.data.from_items(rows), store,
                    run_id=f"r{k}", threshold=0.5, max_pairs=max_pairs,
                )
                df = out.to_pandas()
                outs.append(
                    sorted(df["doc_id"]) if "doc_id" in df.columns else []
                )
            results[name] = outs
        assert results["driver"] == results["dist"]
        # sanity: chain semantics actually exercised store-vs-new rules
        assert results["driver"][0] == [1, 3]
        assert results["driver"][1] == [11]
        assert results["driver"][2] == [21]  # 20 near-dups r2's survivor

    def test_retry_same_run_id_is_idempotent(self, ray_session, tmp_path):
        """Round-4 ADVICE regression: the store appends before the
        caller writes output, so a crashed run's retry must NOT dedup
        against its own prior append (which would empty the output) and
        must not accumulate duplicate store files."""
        import glob

        import ray.data

        from redactifai_ray.stages.dedup import (
            incremental_exact_dedup,
            incremental_minhash_dedup,
        )

        store = str(tmp_path / "exact")
        rows = [self._mk(1, "alpha content here"), self._mk(2, "beta text")]
        first = incremental_exact_dedup(
            ray.data.from_items(rows), store, run_id="rX"
        ).to_pandas()
        retry = incremental_exact_dedup(
            ray.data.from_items(rows), store, run_id="rX"
        ).to_pandas()
        assert sorted(retry["doc_id"]) == sorted(first["doc_id"]) == [1, 2]

        mstore = str(tmp_path / "mh")
        text = " ".join(f"tok{i}" for i in range(120))
        mrows = [self._mk(5, text)]
        m1 = incremental_minhash_dedup(
            ray.data.from_items(mrows), mstore, run_id="rY", threshold=0.5
        )
        n_band_files = len(glob.glob(f"{mstore}/bands/run=rY/*.parquet"))
        m2 = incremental_minhash_dedup(
            ray.data.from_items(mrows), mstore, run_id="rY", threshold=0.5
        )
        assert m1.count() == m2.count() == 1
        # overwrite, not append: file count stable across retries
        assert len(glob.glob(f"{mstore}/bands/run=rY/*.parquet")) == n_band_files


class TestTpchQ17:
    """Correlated-subquery (aggregate-then-rejoin) vs a serial pandas
    brute force using the same fixed-point expressions."""

    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_tpch_q17

        out = q_tpch_q17(self.SF)

        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        part = pd.read_parquet(
            f"{self.SF}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        keys = set(part.loc[part["p_brand"] == "Brand#23", "p_partkey"])
        li = li[li["l_partkey"].isin(keys)]
        thr = 0.2 * li.groupby("l_partkey")["l_quantity"].mean()
        sel = li[li["l_quantity"] < li["l_partkey"].map(thr)]
        cents = np.floor(sel["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        assert int(out["n_items"].iloc[0]) == len(sel)
        assert len(sel) > 0  # the fixture must actually exercise the path
        assert float(out["avg_yearly"].iloc[0]) == (int(cents.sum()) / 100.0) / 7.0

    def test_unknown_brand_yields_empty_aggregate(self, ray_session):
        import math

        from redactifai_ray.pipelines.queries import q_tpch_q17

        out = q_tpch_q17(self.SF, brand="Brand#none")
        assert int(out["n_items"].iloc[0]) == 0
        assert math.isnan(float(out["avg_yearly"].iloc[0]))


class TestTpchQ5:
    """Six-table star join vs a serial pandas brute force using the same
    fixed-point revenue expression; the distributed supplier-lookup
    fallback (cap=0-ish) must match the broadcast path exactly."""

    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _brute(sf):
        import pandas as pd

        nation = pd.read_parquet(f"{sf}/nation.parquet")
        region = pd.read_parquet(f"{sf}/region.parquet")
        cust = pd.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        orders = pd.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        supp = pd.read_parquet(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        li = pd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        rk = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
        nat = nation[nation["n_regionkey"].isin(rk)]
        orders = orders[
            (orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
            & (orders["o_orderdate"] < pd.Timestamp("1997-01-01"))
        ]
        j = (
            li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cust, left_on="o_custkey", right_on="c_custkey")
            .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        )
        j = j[j["c_nationkey"] == j["s_nationkey"]]
        rev = np.floor(
            j["l_extendedprice"].to_numpy()
            * (1.0 - j["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        j = j.assign(revenue_c=rev)
        out = (
            j.groupby("n_name", as_index=False)["revenue_c"]
            .sum()
            .sort_values(["revenue_c", "n_name"], ascending=[False, True])
            .reset_index(drop=True)
        )
        out["revenue_c"] = out["revenue_c"].astype(np.int64)
        return out

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q5

        out = q_tpch_q5(self.SF).reset_index(drop=True)
        want = self._brute(self.SF)
        assert len(want) > 0  # fixture must exercise the join
        assert out.equals(want), (out, want)

    def test_distributed_supplier_fallback_matches(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q5

        fast = q_tpch_q5(self.SF).reset_index(drop=True)
        slow = q_tpch_q5(self.SF, max_broadcast_keys=1).reset_index(drop=True)
        assert fast.equals(slow)

    def test_unknown_region_is_empty(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q5

        out = q_tpch_q5(self.SF, region="ATLANTIS")
        assert len(out) == 0
        assert list(out.columns) == ["n_name", "revenue_c"]


class TestTpchQ4Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_tpch_q4r

        out = q_tpch_q4r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        )
        ret = set(li.loc[li["l_returnflag"] == "R", "l_orderkey"])
        want = (
            orders[orders["o_orderkey"].isin(ret)]
            .groupby("o_orderpriority", as_index=False)
            .size()
            .rename(columns={"size": "n_orders"})
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        want["n_orders"] = want["n_orders"].astype(np.int64)
        assert len(want) > 0
        assert out.equals(want), (out, want)

class TestRangeJoin:
    SF = "/root/testdata/sf0.001"

    def _brute(self, sf: str) -> pd.DataFrame:
        from redactifai_ray.pipelines.queries import CAMPAIGNS

        orders = pd.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        cents = np.floor(
            orders["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        rows = []
        for name, lo, hi in CAMPAIGNS:
            m = (orders["o_orderdate"] >= pd.Timestamp(lo)) & (
                orders["o_orderdate"] < pd.Timestamp(hi)
            )
            rows.append((name, int(m.sum()), int(cents[m.to_numpy()].sum())))
        return (
            pd.DataFrame(rows, columns=["campaign", "n_orders", "rev_c"])
            .astype({"n_orders": np.int64, "rev_c": np.int64})
            .sort_values("campaign")
            .reset_index(drop=True)
        )

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_range_join

        out = q_range_join(self.SF).reset_index(drop=True)
        want = self._brute(self.SF)
        assert (want["n_orders"] > 0).any()
        assert out.equals(want), (out, want)

    def test_overlapping_intervals_double_count(self, ray_session):
        """An order in the y2k ∩ y2k_extend overlap contributes to BOTH
        campaigns — the range join is 0..n matches per row, not banding."""
        from redactifai_ray.pipelines.queries import q_range_join

        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet", columns=["o_orderdate"]
        )
        overlap = (
            (orders["o_orderdate"] >= pd.Timestamp("1999-12-01"))
            & (orders["o_orderdate"] < pd.Timestamp("2000-03-01"))
        ).sum()
        assert overlap > 0  # fixture must exercise the overlap
        out = q_range_join(self.SF).set_index("campaign")
        # total matches exceed distinct matched orders ⇒ multi-match
        in_any = pd.Series(False, index=orders.index)
        from redactifai_ray.pipelines.queries import CAMPAIGNS

        for _, lo, hi in CAMPAIGNS:
            in_any |= (orders["o_orderdate"] >= pd.Timestamp(lo)) & (
                orders["o_orderdate"] < pd.Timestamp(hi)
            )
        assert int(out["n_orders"].sum()) == int(in_any.sum()) + int(overlap)


class TestTpchQ12Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q12r

        out = q_tpch_q12r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        )
        li = li[
            (li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
        ]
        j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        high = j["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        want = (
            pd.DataFrame(
                {
                    "l_linestatus": j["l_linestatus"],
                    "high_line_count": high.astype(np.int64),
                    "low_line_count": (~high).astype(np.int64),
                }
            )
            .groupby("l_linestatus", as_index=False)
            .sum()
            .sort_values("l_linestatus")
            .reset_index(drop=True)
        )
        assert len(want) > 0
        assert out.equals(want), (out, want)


class TestTpchQ14Returns:
    SF = "/root/testdata/sf0.001"

    def _brute(self, sf: str) -> pd.DataFrame:
        li = pd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        part = pd.read_parquet(
            f"{sf}/part.parquet", columns=["p_partkey", "p_type"]
        )
        li = li[
            (li["l_shipdate"] >= pd.Timestamp("1997-09-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-10-01"))
        ]
        rev = np.floor(
            li["l_extendedprice"].to_numpy()
            * (1.0 - li["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        promo_keys = set(part.loc[part["p_type"] == "PROMO", "p_partkey"])
        is_promo = li["l_partkey"].isin(promo_keys).to_numpy()
        return pd.DataFrame(
            {
                "promo_rev_c": pd.array([int(rev[is_promo].sum())], "int64"),
                "total_rev_c": pd.array([int(rev.sum())], "int64"),
            }
        )

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q14r

        out = q_tpch_q14r(self.SF)
        want = self._brute(self.SF)
        assert int(want["total_rev_c"][0]) > 0
        assert int(want["promo_rev_c"][0]) > 0  # fixture exercises promo
        assert out.equals(want), (out, want)

    def test_semijoin_fallback_matches(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q14r

        fast = q_tpch_q14r(self.SF)
        slow = q_tpch_q14r(self.SF, max_broadcast_keys=1)
        assert fast.equals(slow), (fast, slow)


class TestBm25:
    SF = "/root/testdata/sf0.001"

    def _brute(self, sf: str, terms, k=20, k1=1.2, b=0.75) -> pd.DataFrame:
        import math
        from collections import Counter

        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        toks = [(t or "").lower().split() for t in docs["text"]]
        n_docs = len(toks)
        avgdl = sum(len(t) for t in toks) * 1.0 / n_docs
        dfs = {
            term: sum(1 for t in toks if term in set(t)) for term in terms
        }
        rows = []
        for doc_id, tk in zip(docs["doc_id"], toks):
            dl = len(tk)
            if dl == 0:
                continue
            cnt = Counter(tk)
            score_u = 0
            for term in terms:
                tf = cnt.get(term, 0)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n_docs - dfs[term] + 0.5) / (dfs[term] + 0.5))
                s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                score_u += int(math.floor(s * 1000000.0 + 0.5))
            if score_u > 0:
                rows.append((int(doc_id), score_u))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return pd.DataFrame(rows[:k], columns=["doc_id", "bm25_u"]).astype(
            {"doc_id": np.int64, "bm25_u": np.int64}
        )

    def test_matches_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import BM25_QUERY, q_bm25

        out = q_bm25(self.SF).reset_index(drop=True)
        want = self._brute(self.SF, BM25_QUERY)
        assert len(want) == 20  # fixture corpus exercises a full top-k
        assert out.equals(want), (out, want)

    def test_absent_terms_empty(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import bm25_topk

        docs = ray.data.read_parquet(
            f"{self.SF}/documents.parquet", columns=["doc_id", "text"]
        )
        out = bm25_topk(docs, ["zzzznotaword"], k=5)
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "bm25_u"]

    def test_rare_term_outranks_common_at_equal_tf(self, ray_session):
        """IDF ordering sanity: for single-occurrence docs, the rarer
        query term scores strictly higher."""
        import ray.data

        from redactifai_ray.stages.analyze import bm25_topk

        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "raregem filler filler filler"},
                {"doc_id": 2, "text": "common filler filler filler"},
                {"doc_id": 3, "text": "common words here also"},
                {"doc_id": 4, "text": "common again padding text"},
            ]
        )
        out = bm25_topk(docs, ["raregem", "common"], k=4)
        assert int(out.iloc[0]["doc_id"]) == 1


class TestProfileTable:
    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_profile_docs

        out = q_profile_docs("/root/testdata/sf0.001")
        docs = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["lang", "n_chars", "source"],
        )
        rows = []
        for c in ["lang", "n_chars", "source"]:
            col = docs[c]
            vals = col.dropna()
            as_str = vals.astype(str)
            rows.append(
                (
                    c,
                    len(col),
                    int(col.isna().sum()),
                    int(vals.nunique()),
                    str(vals.min()),
                    str(vals.max()),
                )
            )
        want = pd.DataFrame(
            rows,
            columns=["col_name", "n_rows", "n_nulls", "n_distinct",
                     "min_v", "max_v"],
        ).astype({"n_rows": np.int64, "n_nulls": np.int64,
                  "n_distinct": np.int64}).sort_values(
            "col_name").reset_index(drop=True)
        assert out.equals(want), (out, want)

    def test_nulls_counted_and_skipped_in_minmax(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import profile_table

        ds = ray.data.from_items(
            [
                {"s": "b", "n": 7},
                {"s": None, "n": 100},
                {"s": "a", "n": None},
                {"s": "a", "n": 3},
            ]
        )
        out = profile_table(ds, ["s", "n"]).set_index("col_name")
        assert out.loc["s", "n_nulls"] == 1
        assert out.loc["s", "n_distinct"] == 2
        assert (out.loc["s", "min_v"], out.loc["s", "max_v"]) == ("a", "b")
        assert out.loc["n", "n_nulls"] == 1
        # zero-pad keeps numeric order: 100 > 7 even as strings
        assert (out.loc["n", "min_v"], out.loc["n", "max_v"]) == ("3", "100")
        assert (out["n_rows"] == 4).all()

    def test_negative_ints_rejected(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import profile_table

        ds = ray.data.from_items([{"n": -1}, {"n": 5}])
        with pytest.raises(Exception) as ei:
            profile_table(ds, ["n"])
        assert "negative" in str(ei.value)


class TestHllDistinctBy:
    def test_within_bound_of_exact(self, ray_session):
        from redactifai_ray.pipelines.queries import (
            q_distinct_users_per_type,
            q_hll_users_per_type,
        )

        exact = q_distinct_users_per_type("/root/testdata/sf0.001")
        approx = q_hll_users_per_type("/root/testdata/sf0.001")
        exact_col = [c for c in exact.columns if c != "event_type"][0]
        m = exact.merge(approx, on="event_type")
        assert len(m) == len(exact) > 0
        rel = (m["n_distinct_approx"] - m[exact_col]).abs() / m[exact_col]
        # 1.04/sqrt(2^12) ≈ 1.6%; allow 3σ
        assert (rel < 0.05).all(), m

    def test_merge_order_invariant(self, ray_session):
        import ray.data

        from redactifai_ray.functions.sketch import hll_distinct_by

        rows = [
            {"k": f"g{i % 3}", "v": f"u{i % 500}"} for i in range(5000)
        ]
        a = hll_distinct_by(
            ray.data.from_items(rows).repartition(2), "k", "v"
        ).to_pandas().sort_values("k").reset_index(drop=True)
        b = hll_distinct_by(
            ray.data.from_items(rows[::-1]).repartition(13), "k", "v"
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert a.equals(b), (a, b)


class TestJsonlSource:
    """JSONL interchange source/sink (sources/jsonl.py): roundtrips must be
    value-identical with the Parquet representation, including binary html
    (base64) and microsecond timestamps."""

    def _pages(self, tmp_path):
        import ray

        from redactifai_ray.fixtures import write_pages_parquet

        pdir = str(tmp_path / "pages_pq")
        write_pages_parquet(pdir, 60, rows_per_file=20)
        return pdir

    def test_pages_roundtrip_value_identical(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data

        from redactifai_ray.sources.jsonl import (
            read_pages_jsonl,
            write_pages_jsonl,
        )

        pdir = self._pages(tmp_path)
        orig = ray.data.read_parquet(pdir).to_pandas()
        jdir = str(tmp_path / "pages_jsonl")
        write_pages_jsonl(ray.data.read_parquet(pdir), jdir)
        back = read_pages_jsonl(jdir).to_pandas()
        key = ["url"]
        a = orig.sort_values(key).reset_index(drop=True)
        b = back[orig.columns].sort_values(key).reset_index(drop=True)
        assert len(a) == len(b) == 60
        pd.testing.assert_frame_equal(a, b)
        # html survives byte-exact (base64 is lossless)
        assert (a["html"] == b["html"]).all()
        # timestamps keep microsecond precision
        assert (a["warc_ts"] == b["warc_ts"]).all()

    def test_pages_jsonl_feeds_extract_stage(self, ray_session, tmp_path):
        import ray.data

        from redactifai_ray.sources.jsonl import (
            read_pages_jsonl,
            write_pages_jsonl,
        )
        from redactifai_ray.stages.extract import make_extract_batch

        pdir = self._pages(tmp_path)
        jdir = str(tmp_path / "pages_jsonl2")
        write_pages_jsonl(ray.data.read_parquet(pdir), jdir)
        out = (
            read_pages_jsonl(jdir)
            .map_batches(make_extract_batch(), batch_format="pyarrow")
            .to_pandas()
        )
        assert len(out) == 60
        assert (out["extracted_text"].str.len() > 0).any()

    def test_documents_roundtrip_and_projection(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data

        from redactifai_ray.sources.jsonl import (
            read_documents_jsonl,
            write_documents_jsonl,
        )

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        orig = docs.to_pandas()
        jdir = str(tmp_path / "docs_jsonl")
        write_documents_jsonl(docs, jdir)
        back = read_documents_jsonl(jdir).to_pandas()
        a = orig.sort_values("doc_id").reset_index(drop=True)
        b = back[orig.columns].sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        slim = read_documents_jsonl(jdir, columns=["doc_id", "lang"])
        assert set(slim.schema().names) == {"doc_id", "lang"}


def _write_mini_sf(tmp_path, customers, orders):
    """Write a tiny synthetic customer/orders sf dir for edge cases the
    testdata fixtures cannot exercise (zero-order customers).
    customers: (c_custkey, c_nationkey, c_acctbal); orders:
    (o_orderkey, o_custkey, o_orderpriority)."""
    import pyarrow.parquet as pq

    ck, nk, bal = zip(*customers)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(ck, pa.int64()),
                "c_name": pa.array([f"c{i}" for i in ck], pa.string()),
                "c_nationkey": pa.array(nk, pa.int64()),
                "c_acctbal": pa.array(bal, pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * len(ck)),
            }
        ),
        tmp_path / "customer.parquet",
    )
    ok, oc, op = zip(*orders) if orders else ((), (), ())
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array(oc, pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ok)),
                "o_totalprice": pa.array([1.0] * len(ok), pa.float64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1996-01-01")] * len(ok),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(op, pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )


class TestTpchQ13Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q13r

        out = q_tpch_q13r(self.SF)
        cust = pd.read_parquet(
            f"{self.SF}/customer.parquet", columns=["c_custkey"]
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        orders = orders[orders["o_orderpriority"] != "1-URGENT"]
        per = orders.groupby("o_custkey").size()
        counts = cust["c_custkey"].map(per).fillna(0).astype(np.int64)
        want = (
            counts.value_counts()
            .rename_axis("c_count")
            .reset_index(name="custdist")
            .astype({"c_count": np.int64, "custdist": np.int64})
            .sort_values(
                ["custdist", "c_count"], ascending=[False, False]
            )
            .reset_index(drop=True)
        )
        assert len(want) > 1
        assert out.equals(want), (out, want)

    def test_zero_order_bucket(self, ray_session, tmp_path):
        """Every testdata customer has ≥1 order, so the LEFT-JOIN zero
        bucket needs a synthetic table: 3 of 5 customers order-less."""
        from redactifai_ray.pipelines.queries import q_tpch_q13r

        _write_mini_sf(
            tmp_path,
            customers=[(i, i % 3, 100.0) for i in range(1, 6)],
            orders=[(10, 1, "3-MEDIUM"), (11, 1, "2-HIGH"),
                    (12, 2, "1-URGENT")],
        )
        out = q_tpch_q13r(str(tmp_path)).set_index("c_count")
        # cust 1 → 2 non-urgent orders; cust 2's only order is urgent
        # (filtered ⇒ zero bucket); cust 3,4,5 have none
        assert int(out.loc[0, "custdist"]) == 4
        assert int(out.loc[2, "custdist"]) == 1
        assert int(out["custdist"].sum()) == 5


class TestTpchQ15Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q15r

        out = q_tpch_q15r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=[
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        li = li[
            (li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))
        ]
        rev_c = np.floor(
            li["l_extendedprice"].to_numpy()
            * (1.0 - li["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        per = (
            pd.DataFrame({"s_suppkey": li["l_suppkey"], "rev": rev_c})
            .groupby("s_suppkey", as_index=False)["rev"]
            .sum()
        )
        winners = per[per["rev"] == per["rev"].max()]
        supp = pd.read_parquet(
            f"{self.SF}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        want = (
            winners.merge(supp, on="s_suppkey")
            .rename(columns={"rev": "total_revenue_c"})
            .astype({"s_suppkey": np.int64, "total_revenue_c": np.int64})[
                ["s_suppkey", "s_name", "total_revenue_c"]
            ]
            .sort_values("s_suppkey")
            .reset_index(drop=True)
        )
        assert len(want) >= 1
        assert out.equals(want), (out, want)


class TestTpchQ22Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q22r

        out = q_tpch_q22r(self.SF)
        cust = pd.read_parquet(
            f"{self.SF}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet", columns=["o_custkey"]
        )
        bal_c = np.floor(cust["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        pos = bal_c[bal_c > 0]
        total_c, n = int(pos.sum()), len(pos)
        cand = cust[(bal_c * n) > total_c].assign(
            bal_c=bal_c[(bal_c * n) > total_c]
        )
        no_ord = cand[~cand["c_custkey"].isin(set(orders["o_custkey"]))]
        want = (
            no_ord.groupby("c_nationkey")
            .agg(numcust=("bal_c", "size"), totacctbal_c=("bal_c", "sum"))
            .reset_index()
            .astype(
                {
                    "c_nationkey": np.int64,
                    "numcust": np.int64,
                    "totacctbal_c": np.int64,
                }
            )
            .sort_values("c_nationkey")
            .reset_index(drop=True)
        )
        # testdata has no order-less customers ⇒ want may be empty; the
        # survivor path is pinned on a synthetic table below
        assert out.equals(want), (out, want)

    def test_survivors_on_synthetic(self, ray_session, tmp_path):
        """No testdata customer is order-less, so the anti-join survivor
        + cross-multiply predicate is pinned synthetically: balances
        10, 20, 30, 40 (avg of positives 25) with customers 3 (bal 30,
        no orders) and 4 (bal 40, has orders) above average."""
        from redactifai_ray.pipelines.queries import q_tpch_q22r

        _write_mini_sf(
            tmp_path,
            customers=[
                (1, 0, 10.0),
                (2, 0, 20.0),
                (3, 1, 30.0),
                (4, 1, 40.0),
                (5, 2, -5.0),  # negative: excluded from the average
            ],
            orders=[(10, 4, "3-MEDIUM")],
        )
        out = q_tpch_q22r(str(tmp_path))
        # only customer 3 survives: above avg (30*4 > 100) AND no orders
        assert out.to_dict("records") == [
            {"c_nationkey": 1, "numcust": 1, "totacctbal_c": 3000}
        ]


class TestProductQuantization:
    def test_codebook_shapes_and_determinism(self, emb, ray_session):
        from redactifai_ray.stages.similarity import train_pq_codebooks

        b1 = train_pq_codebooks(emb, m=8, nbits=4, sample_size=200)
        b2 = train_pq_codebooks(emb, m=8, nbits=4, sample_size=200)
        assert b1.shape == (8, 16, 8)  # 64-dim / 8 subspaces
        assert (b1 == b2).all()  # seeded driver training is bit-stable

    def test_dim_not_divisible_raises(self, emb, ray_session):
        from redactifai_ray.stages.similarity import train_pq_codebooks

        with pytest.raises(ValueError, match="not divisible"):
            train_pq_codebooks(emb, m=7)

    def test_encode_is_m_bytes_and_deterministic(self, emb, ray_session):
        from redactifai_ray.stages.similarity import (
            pq_encode,
            train_pq_codebooks,
        )

        B = train_pq_codebooks(emb, m=8, nbits=8, sample_size=500)
        c1 = pq_encode(emb, B).to_pandas().sort_values("vec_id")
        c2 = pq_encode(emb, B).to_pandas().sort_values("vec_id")
        assert (c1["pq_code"].str.len() == 8).all()
        assert (c1["pq_code"].to_numpy() == c2["pq_code"].to_numpy()).all()

    def test_recall_vs_brute_force(self, emb, ray_session):
        from redactifai_ray.stages.similarity import knn_topk, knn_topk_pq

        df = emb.to_pandas()
        ids = df["vec_id"].tolist()[:4]
        vecs = [list(v) for v in df["embedding"].tolist()[:4]]
        exact = knn_topk(emb, ids, vecs, k=5).to_pandas()
        approx = knn_topk_pq(emb, ids, vecs, k=5, m=8, nbits=8).to_pandas()
        hits = total = 0
        for qid in ids:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            hits += len(e & a)
            total += len(e)
        # near-uniform 64-dim fixtures are the adversarial case for any
        # quantizer; 8×8-bit PQ holds solid recall there
        assert hits / total >= 0.5
        assert (approx.groupby("query_id").size() == 5).all()

    def test_precomputed_codes_path_identical(self, emb, ray_session):
        """The codes-table path (raw embeddings never read) must score
        identically to inline encoding — that is the 100-TB contract."""
        from redactifai_ray.stages.similarity import (
            knn_topk_pq,
            pq_encode,
            train_pq_codebooks,
        )

        df = emb.to_pandas()
        ids = df["vec_id"].tolist()[:3]
        vecs = [list(v) for v in df["embedding"].tolist()[:3]]
        B = train_pq_codebooks(emb, m=8, nbits=6)
        inline = (
            knn_topk_pq(emb, ids, vecs, k=5, codebooks=B)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        codes = pq_encode(emb, B)
        precomp = (
            knn_topk_pq(emb, ids, vecs, k=5, codebooks=B, codes=codes)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert inline.equals(precomp), (inline, precomp)


class TestCompressionRatio:
    def test_exact_int_contract(self, ray_session):
        import zlib

        import ray.data

        from redactifai_ray.stages.analyze import compression_ratio

        rows = [
            {"doc_id": 0, "text": "abc " * 200},      # highly compressible
            {"doc_id": 1, "text": "x"},               # tiny, incompressible
            {"doc_id": 2, "text": None},              # null rides through
            {"doc_id": 3, "text": ""},                # empty
        ]
        out = (
            compression_ratio(ray.data.from_items(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b0 = ("abc " * 200).encode()
        assert out.loc[0, "raw_len"] == len(b0)
        assert out.loc[0, "comp_len"] == len(zlib.compress(b0, 6))
        assert out.loc[0, "ratio_bp"] == (len(zlib.compress(b0, 6)) * 10000) // len(b0)
        assert out.loc[0, "ratio_bp"] < 2000  # boilerplate compresses hard
        # null/empty: raw_len 0, ratio pinned to 10000 (never gated out)
        assert (out.loc[[2, 3], "raw_len"] == 0).all()
        assert (out.loc[[2, 3], "ratio_bp"] == 10000).all()
        assert out["ratio_bp"].dtype == "int64"

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from redactifai_ray.stages.analyze import compression_ratio

        rows = [{"doc_id": i, "text": f"tok{i % 7} " * (i + 1)} for i in range(40)]
        a = compression_ratio(ray.data.from_items(rows)).to_pandas()
        b = compression_ratio(
            ray.data.from_items(rows).repartition(5)
        ).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestNtile:
    def test_matches_duckdb_on_heavy_ties(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd

        from redactifai_ray.pipelines.queries import q_ntile_chars

        # heavy ties: 3 langs × lengths drawn from {10, 20, 30}
        df = pd.DataFrame(
            {
                "doc_id": range(90),
                "lang": [("en", "fr", "de")[i % 3] for i in range(90)],
                "n_chars": [(10, 20, 30)[(i * 7) % 3] for i in range(90)],
                "text": ["x"] * 90,
                "source": ["src0"] * 90,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = (
            q_ntile_chars(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got["tile"] = got["tile"].astype("int64")
        want = duckdb.sql(
            f"""
            SELECT doc_id, lang,
                   NTILE(4) OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id)::BIGINT AS tile
            FROM '{tmp_path}/documents.parquet' ORDER BY doc_id
            """
        ).df()
        want["tile"] = want["tile"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestCubeAndCohort:
    def test_cube_grouping_sets_reconcile(self, ray_session):
        from redactifai_ray.pipelines.queries import q_cube_orders

        out = q_cube_orders("/root/testdata/sf0.001")
        total = out[(out["status"] == "(all)") & (out["priority"] == "(all)")][
            "n"
        ].iloc[0]
        fine = out[(out["status"] != "(all)") & (out["priority"] != "(all)")]
        by_s = out[(out["status"] != "(all)") & (out["priority"] == "(all)")]
        by_p = out[(out["status"] == "(all)") & (out["priority"] != "(all)")]
        assert fine["n"].sum() == total
        assert by_s["n"].sum() == total
        assert by_p["n"].sum() == total

    def test_cohort_first_week_dominates(self, ray_session):
        from redactifai_ray.pipelines.queries import q_cohort_retention

        out = q_cohort_retention("/root/testdata/sf0.001")
        # a cohort's week-0 cell counts every user of the cohort, so it
        # is the row-max within the cohort; no active week precedes it
        for cw, g in out.groupby("cohort_week"):
            assert (g["active_week"] >= cw).all()
            week0 = g.loc[g["active_week"] == cw, "n_users"]
            assert len(week0) == 1
            assert week0.iloc[0] == g["n_users"].max()


class TestQ8Shape:
    def test_numerator_bounded_by_denominator(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q8r

        out = q_tpch_q8r("/root/testdata/sf0.001")
        assert (out["nation_rev_c"] <= out["total_rev_c"]).all()
        assert (out["total_rev_c"] > 0).all()
        assert set(out["l_year"]) <= {1996, 1997}


class TestLookupOnKey:
    def test_matches_pandas_inner_merge(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from redactifai_ray.pipelines.queries import _lookup_on_key

        rng = np.random.RandomState(7)
        fact = pd.DataFrame(
            {
                "k": rng.randint(0, 40, size=300).astype("int64"),
                "payload": np.arange(300, dtype="int64"),
            }
        )
        # mapping covers only part of the key space; unmatched facts drop
        mapping = pd.DataFrame(
            {
                "mk": np.arange(0, 30, dtype="int64"),
                "val": (np.arange(0, 30, dtype="int64") * 11) % 7,
            }
        )
        got = (
            _lookup_on_key(
                ray.data.from_pandas(fact).repartition(5),
                ray.data.from_pandas(mapping).repartition(3),
                "k",
                "mk",
                "val",
                ["payload"],
                {"payload": pa.int64()},
            )
            .to_pandas()
            .sort_values(["payload"])
            .reset_index(drop=True)
        )
        want = (
            fact.merge(mapping, left_on="k", right_on="mk", how="inner")[
                ["payload", "val"]
            ]
            .sort_values(["payload"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["payload", "val"]], want)

    def test_empty_mapping_drops_all(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from redactifai_ray.pipelines.queries import _lookup_on_key

        fact = pd.DataFrame(
            {"k": np.arange(10, dtype="int64"),
             "payload": np.arange(10, dtype="int64")}
        )
        mapping = pd.DataFrame(
            {"mk": pd.Series(dtype="int64"), "val": pd.Series(dtype="int64")}
        )
        out = _lookup_on_key(
            ray.data.from_pandas(fact),
            ray.data.from_pandas(mapping),
            "k", "mk", "val", ["payload"], {"payload": pa.int64()},
        ).to_pandas()
        assert len(out) == 0
        # Ray drops column names for ANY zero-row dataset at to_pandas
        # (documented in the helper) — callers branch on emptiness first


class TestFunnelBruteForce:
    def test_matches_pandas_reference(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from redactifai_ray.pipelines.queries import q_funnel_conversion

        rng = np.random.RandomState(11)
        n = 600
        types = np.array(["view", "click", "purchase", "error", "signup"])
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "user_id": rng.randint(0, 40, n).astype("int64"),
                "event_type": types[rng.randint(0, 5, n)],
                "ts": pd.to_datetime("2025-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
                "value": np.zeros(n),
                "props": [""] * n,
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            tmp_path / "events.parquet",
        )
        got = q_funnel_conversion(str(tmp_path)).set_index("step")["n_users"]

        # brute force: strict-order chain over first timestamps
        us = df.pivot_table(
            index="user_id", columns="event_type", values="ts", aggfunc="min"
        )
        def depth(row):
            d, prev = 0, pd.Timestamp.min
            for s in ("view", "click", "purchase"):
                t = row.get(s, pd.NaT)
                if pd.isna(t) or t <= prev:
                    break
                d, prev = d + 1, t
            return d
        ds_ = us.apply(depth, axis=1)
        assert got["view"] == int((ds_ >= 1).sum())
        assert got["click"] == int((ds_ >= 2).sum())
        assert got["purchase"] == int((ds_ >= 3).sum())


class TestTpchQ19Returns:
    SF = "/root/testdata/sf0.001"
    CLAUSES = [
        ("Brand#12", 1, 5, 1, 11),
        ("Brand#23", 1, 10, 10, 20),
        ("Brand#24", 1, 15, 20, 30),
    ]

    def _brute(self) -> int:
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        part = pd.read_parquet(
            f"{self.SF}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"],
        )
        j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        hit = np.zeros(len(j), bool)
        for b, slo, shi, qlo, qhi in self.CLAUSES:
            hit |= (
                (j["p_brand"] == b)
                & (j["p_size"] >= slo)
                & (j["p_size"] <= shi)
                & (j["l_quantity"] >= qlo)
                & (j["l_quantity"] <= qhi)
            ).to_numpy()
        rev = np.floor(
            j["l_extendedprice"].to_numpy()
            * (1.0 - j["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        return int(rev[hit].sum())

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q19r

        out = q_tpch_q19r(self.SF)
        want = self._brute()
        assert want > 0
        assert int(out["revenue_c"].iloc[0]) == want

    def test_forced_fallback_equivalence(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q19r

        fast = q_tpch_q19r(self.SF)
        slow = q_tpch_q19r(self.SF, max_broadcast_keys=0)
        assert fast.equals(slow), (fast, slow)


class TestTpchQ21Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q21r

        out = q_tpch_q21r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
        )
        supp = pd.read_parquet(
            f"{self.SF}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        f = orders[orders["o_orderstatus"] == "F"]
        j = li.merge(
            f, left_on="l_orderkey", right_on="o_orderkey", how="inner"
        )
        j["late"] = j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=90)
        per = j.groupby("l_orderkey").agg(ns=("l_suppkey", "nunique"))
        late = j[j["late"]]
        per = per.join(
            late.groupby("l_orderkey")["l_suppkey"].nunique().rename("nl")
        ).join(late.groupby("l_orderkey")["l_suppkey"].first().rename("sole"))
        hit = per[(per["ns"] >= 2) & (per["nl"] == 1)]
        want = (
            hit.groupby("sole")
            .size()
            .rename("numwait")
            .reset_index()
            .merge(supp, left_on="sole", right_on="s_suppkey")
            .groupby("s_name", as_index=False)["numwait"]
            .sum()
        )
        want["numwait"] = want["numwait"].astype(np.int64)
        want = (
            want.sort_values(["numwait", "s_name"], ascending=[False, True])
            .head(10)[["s_name", "numwait"]]
            .reset_index(drop=True)
        )
        assert len(want) > 0
        assert out.equals(want), (out, want)


class TestTpchQ16Returns:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q16r

        out = q_tpch_q16r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )
        part = pd.read_parquet(f"{self.SF}/part.parquet")
        supp = pd.read_parquet(
            f"{self.SF}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
        )
        bad = set(supp[supp["s_acctbal"] < 0]["s_suppkey"])
        part = part[
            (part["p_brand"] != "Brand#12")
            & part["p_size"].isin((1, 4, 9, 14, 23, 36, 45, 49))
        ]
        j = li[~li["l_suppkey"].isin(bad)].merge(
            part, left_on="l_partkey", right_on="p_partkey"
        )
        want = (
            j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
            .nunique()
            .rename("supplier_cnt")
            .reset_index()
        )
        want["p_size"] = want["p_size"].astype(np.int64)
        want["supplier_cnt"] = want["supplier_cnt"].astype(np.int64)
        want = want.sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
        ).reset_index(drop=True)
        assert len(want) > 0
        assert out.equals(want), (out.head(), want.head())


class TestTpchQ9Returns:
    SF = "/root/testdata/sf0.001"

    def _brute(self) -> pd.DataFrame:
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
            ],
        )
        part = pd.read_parquet(
            f"{self.SF}/part.parquet", columns=["p_partkey", "p_name"]
        )
        supp = pd.read_parquet(
            f"{self.SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        nat = pd.read_parquet(
            f"{self.SF}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        orders = pd.read_parquet(
            f"{self.SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        good = part[part["p_name"].str.contains("red")]
        j = (
            li.merge(good, left_on="l_partkey", right_on="p_partkey")
            .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
            .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        )
        j["profit_c"] = np.floor(
            j["l_extendedprice"].to_numpy()
            * (1.0 - j["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        j["o_year"] = j["o_orderdate"].dt.year.astype(np.int64)
        want = (
            j.groupby(["n_name", "o_year"], as_index=False)["profit_c"]
            .sum()
            .rename(columns={"n_name": "nation"})
        )
        want["profit_c"] = want["profit_c"].astype(np.int64)
        return want.sort_values(
            ["nation", "o_year"], ascending=[True, False]
        ).reset_index(drop=True)[["nation", "o_year", "profit_c"]]

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q9r

        out = q_tpch_q9r(self.SF)
        want = self._brute()
        assert len(want) > 0
        assert out.equals(want), (out.head(), want.head())

    def test_forced_fallback_equivalence(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q9r

        fast = q_tpch_q9r(self.SF)
        slow = q_tpch_q9r(self.SF, max_broadcast_keys=0)
        assert fast.equals(slow), (fast, slow)


class TestTpchQ2Q11Q20Returns:
    SF = "/root/testdata/sf0.001"

    def _region_suppliers(self):
        supp = pd.read_parquet(
            f"{self.SF}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        )
        nat = pd.read_parquet(f"{self.SF}/nation.parquet")
        reg = pd.read_parquet(f"{self.SF}/region.parquet")
        j = supp.merge(
            nat, left_on="s_nationkey", right_on="n_nationkey"
        ).merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        return j[j["r_name"] == "EUROPE"]

    def test_q2_matches_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q2r

        out = q_tpch_q2r(self.SF)
        part = pd.read_parquet(f"{self.SF}/part.parquet")
        part = part[
            (part["p_type"] == "LARGE")
            & part["p_size"].between(10, 20)
        ]
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        ).drop_duplicates()
        es = self._region_suppliers().copy()
        es["bal_c"] = np.floor(es["s_acctbal"] * 100 + 0.5).astype(np.int64)
        j = li.merge(
            part[["p_partkey"]], left_on="l_partkey", right_on="p_partkey"
        ).merge(es, left_on="l_suppkey", right_on="s_suppkey")
        j = j.sort_values(
            ["l_partkey", "bal_c", "l_suppkey"],
            ascending=[True, False, True],
        ).drop_duplicates("l_partkey")
        want = pd.DataFrame(
            {
                "s_acctbal_c": j["bal_c"].astype(np.int64),
                "s_name": j["s_name"],
                "nation": j["n_name"],
                "p_partkey": j["l_partkey"].astype(np.int64),
            }
        ).sort_values(
            ["s_acctbal_c", "nation", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
        ).head(100).reset_index(drop=True)
        assert len(want) > 0
        assert out.equals(want), (out, want)

    def test_q11_matches_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q11r

        out = q_tpch_q11r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        es = set(self._region_suppliers()["s_suppkey"])
        li = li[li["l_suppkey"].isin(es)].copy()
        li["value_c"] = np.floor(
            li["l_extendedprice"].to_numpy()
            * (1.0 - li["l_discount"].to_numpy())
            * 10000.0
            + 0.5
        ).astype(np.int64)
        v = li.groupby("l_partkey", as_index=False)["value_c"].sum()
        total = int(v["value_c"].sum())
        want = v[v["value_c"] * 1000 > total].copy()
        want["l_partkey"] = want["l_partkey"].astype(np.int64)
        want["value_c"] = want["value_c"].astype(np.int64)
        want = want.sort_values(
            ["value_c", "l_partkey"], ascending=[False, True]
        ).reset_index(drop=True)[["l_partkey", "value_c"]]
        assert len(want) > 0
        assert out.equals(want), (out.head(), want.head())

    def test_q20_matches_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_tpch_q20r

        out = q_tpch_q20r(self.SF)
        li = pd.read_parquet(
            f"{self.SF}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        part = pd.read_parquet(
            f"{self.SF}/part.parquet", columns=["p_partkey", "p_name"]
        )
        red = set(part[part["p_name"].str.contains("red")]["p_partkey"])
        li = li[
            li["l_partkey"].isin(red)
            & (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
        ].copy()
        li["qty"] = li["l_quantity"].astype(np.int64)
        agg = li.groupby("l_suppkey", as_index=False)["qty"].sum()
        agg = agg[agg["qty"] > 50]
        es = self._region_suppliers()
        want = agg.merge(
            es[["s_suppkey", "s_name"]],
            left_on="l_suppkey",
            right_on="s_suppkey",
        )[["s_name", "qty"]]
        want["qty"] = want["qty"].astype(np.int64)
        want = want.sort_values("s_name").reset_index(drop=True)
        assert len(want) > 0
        assert out.equals(want), (out, want)


class TestSlidingDistinct:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas_brute_force(self, ray_session):
        from redactifai_ray.pipelines.queries import q_sliding_distinct

        out = q_sliding_distinct(self.SF)
        ev = pd.read_parquet(
            f"{self.SF}/events.parquet", columns=["ts", "user_id"]
        )
        base = ev["ts"].dt.floor("h")
        both = pd.concat(
            [
                pd.DataFrame(
                    {"window_start": base - pd.Timedelta(hours=k),
                     "user_id": ev["user_id"]}
                )
                for k in (0, 1)
            ],
            ignore_index=True,
        )
        want = (
            both.groupby("window_start")["user_id"]
            .nunique()
            .rename("n_users")
            .reset_index()
        )
        want["n_users"] = want["n_users"].astype(np.int64)
        want = want.sort_values("window_start").reset_index(drop=True)
        assert len(want) > 0
        out = out.assign(
            window_start=out["window_start"].astype("datetime64[ns]")
        )
        assert out.equals(want), (out.head(), want.head())


class TestReadability:
    SF = "/root/testdata/sf0.001"

    def test_matches_python_re_brute_force(self, ray_session):
        import re

        from redactifai_ray.pipelines.queries import q_readability

        out = q_readability(self.SF)
        docs = pd.read_parquet(
            f"{self.SF}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id").reset_index(drop=True)
        w_re, s_re, y_re = (
            re.compile(r"\S+"),
            re.compile(r"[.!?]+"),
            re.compile(r"[aeiouy]+"),
        )
        for i in range(0, len(docs), 37):  # sampled spot-check
            text = docs["text"].iloc[i] or ""
            row = out[out["doc_id"] == docs["doc_id"].iloc[i]].iloc[0]
            nw = len(w_re.findall(text))
            ns = len(s_re.findall(text))
            ny = len(y_re.findall(text.lower()))
            assert row["n_words"] == nw
            assert row["n_sentences"] == ns
            assert row["n_syllables"] == ny
            assert row["wps_bp"] == (nw * 10000) // max(ns, 1)
            assert row["spw_bp"] == (ny * 10000) // max(nw, 1)

    def test_empty_text_clamps(self, ray_session):
        # zero words / zero sentences must clamp denominators to 1
        import pyarrow.compute as _pc

        from redactifai_ray.pipelines import queries as q

        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([None], pa.string())})
        # drive the batch fn through the same code path
        txt = _pc.coalesce(t["text"], pa.scalar("", pa.string()))
        assert _pc.count_substring_regex(txt, r"\S+")[0].as_py() == 0


class TestHostComponents:
    SF = "/root/testdata/sf0.001"

    def test_matches_union_find_and_component_count(self, ray_session):
        from redactifai_ray.pipelines.queries import q_host_components
        from redactifai_ray.stages.dedup import cluster_pairs

        out = q_host_components(self.SF)
        docs = pd.read_parquet(
            f"{self.SF}/documents.parquet", columns=["doc_id"]
        )
        ids = docs["doc_id"].to_numpy(dtype=np.int64)
        src = ids % 200
        dst = (src + 4 * (1 + ids % 47)) % 200
        roots = cluster_pairs(list(zip(src.tolist(), dst.tolist())))
        got = dict(zip(out["host"], out["component"]))
        # cluster_pairs omits self-rooted nodes; compare on its domain
        # and check the query covers every host
        assert len(got) == 200
        for n, r in roots.items():
            assert got[int(n)] == int(r)
        # mod-4 residue classes cannot connect: exactly four components
        assert out["component"].nunique() == 4
        assert (out["host"] % 4 == out["component"] % 4).all()


class TestPercentRankUnpivot:
    SF = "/root/testdata/sf0.001"

    def test_percent_rank_matches_pandas(self, ray_session):
        from redactifai_ray.pipelines.queries import q_percent_rank_in_lang

        out = q_percent_rank_in_lang(self.SF).sort_values(
            "doc_id"
        ).reset_index(drop=True)
        docs = pd.read_parquet(
            f"{self.SF}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
        )
        rnk = docs.groupby("lang")["n_chars"].rank(
            method="min", ascending=False
        ).astype(np.int64)
        npart = docs.groupby("lang")["n_chars"].transform("size").astype(
            np.int64
        )
        want = pd.DataFrame(
            {
                "doc_id": docs["doc_id"],
                "lang": docs["lang"],
                "pr_bp": ((rnk - 1) * 10000)
                // np.maximum(npart - 1, 1),
            }
        ).sort_values("doc_id").reset_index(drop=True)
        want["pr_bp"] = want["pr_bp"].astype(np.int64)
        assert out.equals(want), (out.head(), want.head())

    def test_unpivot_shape_and_values(self, ray_session):
        from redactifai_ray.pipelines.queries import q_unpivot_measures

        out = q_unpivot_measures(self.SF).to_pandas()
        li = pd.read_parquet(f"{self.SF}/lineitem.parquet")
        assert len(out) == 4 * len(li)
        # spot-check one row across all four measures
        row = li.iloc[17]
        sel = out[
            (out["l_orderkey"] == row["l_orderkey"])
            & (out["l_linenumber"] == row["l_linenumber"])
        ].set_index("measure")["value_c"]
        for m, col in [
            ("quantity", "l_quantity"),
            ("extendedprice", "l_extendedprice"),
            ("discount", "l_discount"),
            ("tax", "l_tax"),
        ]:
            assert sel[m] == int(np.floor(row[col] * 10000 + 0.5))


class TestExactJaccardJoin:
    def _brute(self, rows, k, num, den):
        from redactifai_ray.stages.dedup import _word_shingle_hashes

        sets = {
            i: frozenset(_word_shingle_hashes(t, k).tolist())
            for i, t in rows
        }
        out = {}
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and den * inter >= num * union:
                    out[(a, b)] = inter
        return out

    def _corpus(self):
        import random

        rng = random.Random(99)
        words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        rows = []
        for i in range(60):
            base = [rng.choice(words) for _ in range(rng.randint(3, 30))]
            rows.append((i, " ".join(base)))
            if i % 4 == 0:  # plant a near-dup: mutate one word
                mut = list(base)
                if mut:
                    mut[rng.randrange(len(mut))] = rng.choice(words)
                rows.append((1000 + i, " ".join(mut)))
        rows.append((2000, "tiny"))  # < k words: excluded by contract
        rows.append((2001, ""))
        return rows

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import exact_jaccard_join

        rows = self._corpus()
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in rows]
        ).repartition(7)
        out = exact_jaccard_join(
            ds, shingle_words=3, threshold=(1, 2)
        ).to_pandas()
        got = (
            {}
            if out.empty or "id_a" not in out.columns
            else {
                (int(r.id_a), int(r.id_b)): int(r.n_shared)
                for r in out.itertuples()
            }
        )
        assert got == self._brute(rows, 3, 1, 2)

    def test_tighter_threshold_subset(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import exact_jaccard_join

        rows = self._corpus()
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in rows]
        ).repartition(5)
        loose = exact_jaccard_join(ds, shingle_words=3, threshold=(1, 2))
        tight = exact_jaccard_join(ds, shingle_words=3, threshold=(4, 5))
        lp = {
            (int(r.id_a), int(r.id_b)) for r in loose.to_pandas().itertuples()
        }
        tp = {
            (int(r.id_a), int(r.id_b)) for r in tight.to_pandas().itertuples()
        }
        assert tp == {
            k for k, v in self._brute(rows, 3, 4, 5).items()
        }
        assert tp <= lp


class TestJaccardDedup:
    def _corpus(self):
        import random

        rng = random.Random(7)
        words = "one two three four five six seven eight nine ten".split()
        rows = []
        for i in range(40):
            base = [rng.choice(words) for _ in range(12)]
            rows.append((i, " ".join(base)))
            if i % 3 == 0:  # plant a near-dup
                mut = list(base)
                mut[5] = rng.choice(words)
                rows.append((500 + i, " ".join(mut)))
        return rows

    def _want_survivors(self, rows, k, num, den):
        from redactifai_ray.stages.dedup import (
            _word_shingle_hashes,
            cluster_pairs,
        )

        sets = {
            i: frozenset(_word_shingle_hashes(t, k).tolist())
            for i, t in rows
        }
        pairs = []
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and den * inter >= num * union:
                    pairs.append((a, b))
        roots = cluster_pairs(pairs)
        losers = {d for d, r in roots.items() if d != r}
        return {i for i, _ in rows} - losers

    def test_keep_one_matches_brute_force(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import jaccard_dedup

        rows = self._corpus()
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in rows]
        ).repartition(5)
        kept = {
            int(r["doc_id"])
            for r in jaccard_dedup(
                ds, shingle_words=3, threshold=(1, 2)
            ).select_columns(["doc_id"]).take_all()
        }
        assert kept == self._want_survivors(rows, 3, 1, 2)
        assert len(kept) < len(rows)  # planted dups actually dropped

    def test_driver_equals_distributed(self, ray_session):
        import ray.data

        from redactifai_ray.stages.dedup import jaccard_dedup

        rows = self._corpus()
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in rows]
        ).repartition(4)
        a = {
            int(r["doc_id"])
            for r in jaccard_dedup(
                ds, shingle_words=3, threshold=(1, 2), method="driver"
            ).select_columns(["doc_id"]).take_all()
        }
        b = {
            int(r["doc_id"])
            for r in jaccard_dedup(
                ds, shingle_words=3, threshold=(1, 2), method="distributed"
            ).select_columns(["doc_id"]).take_all()
        }
        assert a == b
