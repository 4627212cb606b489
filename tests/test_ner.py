"""Trained NER detector: training determinism, gazetteer quality,
false-positive suppression vs the heuristic, and the actor-pool
end-to-end path (VERDICT r2 #4 / SURVEY §2.3 ST2)."""

import glob
import os
import shutil

import pytest

from redactifai_ray.fixtures import (
    FIRST_NAMES,
    LAST_NAMES,
    write_pages_parquet,
)

CORPUS = "/tmp/rrx_ner_corpus"
N_PAGES = 300


@pytest.fixture(scope="module")
def corpus(ray_session):
    if not glob.glob(os.path.join(CORPUS, "*.parquet")):
        shutil.rmtree(CORPUS, ignore_errors=True)
        write_pages_parquet(CORPUS, N_PAGES, rows_per_file=100)
    return CORPUS


@pytest.fixture(scope="module")
def model(corpus):
    from redactifai_ray.stages.ner import train_ner_from_files

    return train_ner_from_files(sorted(glob.glob(f"{CORPUS}/*.parquet")))


@pytest.fixture(scope="module")
def det(model):
    from redactifai_ray.stages.ner import TrainedNerDetector

    return TrainedNerDetector(model=model, text_col="text")


class TestTraining:
    def test_deterministic(self, corpus, model):
        from redactifai_ray.stages.ner import train_ner_from_files

        again = train_ner_from_files(sorted(glob.glob(f"{CORPUS}/*.parquet")))
        assert again == model

    def test_gazetteer_learns_planted_names(self, model):
        gaz = set(model["gazetteer"])
        firsts = [n.lower() for n in FIRST_NAMES]
        lasts = [n.lower() for n in LAST_NAMES]
        # names appear capitalized mid-sentence and (outside emails)
        # never lowercase — nearly all should be learned
        assert sum(n in gaz for n in firsts) == len(firsts)
        assert sum(n in gaz for n in lasts) == len(lasts)

    def test_gazetteer_excludes_common_words(self, model):
        gaz = set(model["gazetteer"])
        for w in ("the", "water", "house", "world", "time", "people", "and"):
            assert w not in gaz

    def test_email_local_parts_do_not_veto(self):
        # "samuel" occurs lowercase ONLY inside emails; embedded
        # occurrences must not count as lowercase evidence
        from redactifai_ray.stages.ner import train_ner_model

        def stats_for(texts):
            import pyarrow as pa

            from redactifai_ray.stages.ner import _TOKEN_RE, _embedded

            from collections import Counter

            cap_mid, cap_any, lower = Counter(), Counter(), Counter()
            for t in texts:
                import re as _re

                for m in _TOKEN_RE.finditer(t):
                    tok = m.group()
                    if _embedded(t, m.start(), m.end()):
                        continue
                    if tok[0].isupper():
                        key = tok.lower()
                        cap_any[key] += 1
                        j = m.start() - 1
                        while j >= 0 and t[j] in " \t\"'([":
                            j -= 1
                        if j >= 0 and t[j] not in ".!?\n":
                            cap_mid[key] += 1
                    else:
                        lower[tok] += 1
            return {
                k: (cap_mid[k], cap_any[k], lower[k])
                for k in set(cap_any) | set(lower)
            }

        texts = [
            "please ask Samuel Grummons about it. mail samuel.grummons@example.com now.",
            "later Samuel Grummons replied. again samuel.grummons@example.com wrote.",
            "then Samuel Grummons agreed.",
        ]
        model = train_ner_model(stats_for(texts))
        assert "samuel" in model["gazetteer"]
        assert "grummons" in model["gazetteer"]

    def test_model_shape(self, model):
        assert set(model) == {
            "gazetteer", "logodds", "default_logodds", "score_threshold",
        }
        assert model["gazetteer"] == sorted(model["gazetteer"])


class TestScoring:
    def test_generalizes_to_unseen_name_like_tokens(self, det):
        assert det._name_like("Samuelson")
        assert det._name_like("Martiner")

    def test_rejects_non_name_tokens(self, det):
        assert not det._name_like("Website")
        assert not det._name_like("the")


class TestDetection:
    def test_detects_planted_name(self, det):
        spans = det.detect("Contact Maria Lopez for details.")
        assert [(s["text"], s["category"]) for s in spans] == [
            ("Maria Lopez", "Person")
        ]

    def test_trims_non_name_prefix(self, det):
        # the heuristic would emit "Contact Maria Lopez" whole;
        # the trained model trims to the name run
        spans = det.detect("Contact Maria Lopez for details.")
        assert spans[0]["text"] == "Maria Lopez"

    def test_kills_sentence_initial_false_positives(self, det):
        from redactifai_ray.stages.detect import SpanDetector

        text = "Water Table rose under the bridge. Great Book or result."
        assert det._detect_names(text) == []
        # the heuristic accepts both — this is the delta the model buys
        heuristic = SpanDetector(text_col="text")
        assert len(heuristic._detect_names(text)) == 2

    def test_provider_context(self, det):
        spans = det.detect("study Dr. Henry Grummons today.")
        assert [(s["text"], s["category"]) for s in spans] == [
            ("Henry Grummons", "HealthcareProfessional")
        ]

    def test_regex_categories_inherited(self, det):
        spans = det.detect("reach me at maria.lopez@example.com today")
        assert [s["category"] for s in spans] == ["Email"]

    def test_skip_phrases_still_apply(self, det):
        assert det.detect("The Privacy Policy and Cookie Policy apply.") == []


class TestRegistry:
    def test_registered(self):
        from redactifai_ray.registry import get_detector
        from redactifai_ray.stages.ner import TrainedNerDetector

        assert get_detector("trained-ner") is TrainedNerDetector

    def test_requires_model(self):
        from redactifai_ray.stages.ner import TrainedNerDetector

        with pytest.raises(ValueError):
            TrainedNerDetector()


class TestPipeline:
    def test_actor_pool_end_to_end(self, corpus, model):
        import ray

        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
        )

        ds = build_deidentify_pipeline(
            corpus,
            detector="trained-ner",
            detector_init={"model_ref": ray.put(model)},
            detect_concurrency=(1, 2),
        )
        df = finalize_output(ds).to_pandas()
        assert (df["status"] == "ok").all()
        assert df["span_count"].sum() > 0
        # planted full names must be gone from every masked text
        masked = " ".join(df["masked_text"].dropna())
        for first in FIRST_NAMES[:5]:
            for last in LAST_NAMES[:5]:
                assert f"{first} {last}" not in masked
