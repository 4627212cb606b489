"""Detector unit tests — mirrors the reference's provider tests
(tests/unit/test_azure_phi_detection_service.py — masking levels, sort
order, empty text; tests/unit/test_aws_services.py:225-299 — chunking with
offset re-basing, sorted-by-offset) plus the mock detector's category and
name-heuristic behavior (src/services/mock_phi_detection_service.py)."""

import pytest

from redactifai_ray.policy import MaskingLevel
from redactifai_ray.stages.detect import NAME_CONFIDENCE, REGEX_CONFIDENCE, SpanDetector


@pytest.fixture(scope="module")
def det():
    return SpanDetector()


def cats(spans):
    return {s["category"] for s in spans}


class TestCategories:
    def test_email(self, det):
        out = det.detect("write to jane.doe@example.com for info")
        assert any(s["category"] == "Email" and s["text"] == "jane.doe@example.com" for s in out)

    def test_phone_paren(self, det):
        out = det.detect("call (617) 555-1234 today")
        assert any(s["category"] == "PhoneNumber" for s in out)

    def test_phone_dashed(self, det):
        assert "PhoneNumber" in cats(det.detect("call 617-555-1234 today"))

    def test_ssn(self, det):
        assert "SSN" in cats(det.detect("ssn 123-45-6789 on file"))

    def test_date_slash(self, det):
        assert "Date" in cats(det.detect("born 03/15/1985 in town"))

    def test_date_dash(self, det):
        assert "Date" in cats(det.detect("on 12-15-2023 we met"))

    def test_mrn(self, det):
        out = det.detect("record MRN: 12345678 stored")
        assert any(s["category"] == "Id" for s in out)

    def test_member_id(self, det):
        assert "Id" in cats(det.detect("insurance Member ID: ABC123456789 ok"))

    def test_address(self, det):
        assert "Address" in cats(
            det.detect("ship to 123 Main Street, Boston, MA 02101 please")
        )

    def test_regex_confidence(self, det):
        out = det.detect("mail me a@b.co now")
        email = [s for s in out if s["category"] == "Email"][0]
        assert email["confidence"] == pytest.approx(REGEX_CONFIDENCE)

    def test_empty_text(self, det):
        assert det.detect("") == []

    def test_sorted_by_offset(self, det):
        out = det.detect("Samuel Grummons met a@b.co and 617-555-1234 on 1/2/2020")
        starts = [s["start"] for s in out]
        assert starts == sorted(starts)


class TestNames:
    def test_capitalized_bigram(self, det):
        out = det.detect("customer Samuel Grummons purchased items")
        names = [s for s in out if s["category"] == "Person"]
        assert names and names[0]["text"] == "Samuel Grummons"
        assert names[0]["confidence"] == pytest.approx(NAME_CONFIDENCE)
        assert names[0]["subcategory"] == "PersonName"

    def test_skip_phrases(self, det):
        out = det.detect("insured by Blue Cross and also Blue Shield today")
        assert not cats(out) & {"Person"}

    def test_provider_context(self, det):
        out = det.detect("seen by Dr. Sarah Johnson at noon")
        assert any(s["category"] == "HealthcareProfessional" for s in out)
        assert not any(s["category"] == "Person" for s in out)

    def test_provider_context_window_is_10_chars(self, det):
        # "Doctor" appears well before the name (>10 chars away) → Person
        out = det.detect("The Doctor observing from afar saw Emma Walker leave")
        assert any(s["category"] == "Person" and s["text"] == "Emma Walker" for s in out)

    def test_lowercase_not_a_name(self, det):
        out = det.detect("samuel grummons stayed lowercase throughout")
        assert "Person" not in cats(out)

    def test_disable_names(self):
        d = SpanDetector(detect_names=False)
        assert d.detect("Samuel Grummons visited") == []


class TestMaskingLevels:
    def test_safe_harbor_keeps_provider(self):
        d = SpanDetector(masking_level=MaskingLevel.SAFE_HARBOR)
        out = d.detect("seen by Dr. Sarah Johnson at noon")
        assert any(s["category"] == "HealthcareProfessional" for s in out)

    def test_limited_dataset_drops_provider(self):
        d = SpanDetector(masking_level=MaskingLevel.LIMITED_DATASET)
        out = d.detect("seen by Dr. Sarah Johnson at noon")
        assert not any(s["category"] == "HealthcareProfessional" for s in out)

    def test_limited_dataset_monotone_subset(self):
        # reference: tests/integration/test_mocked_pipeline.py:68-95
        text = "Dr. Sarah Johnson called Samuel Grummons at 617-555-1234 on 1/2/2020"
        full = SpanDetector(masking_level=MaskingLevel.SAFE_HARBOR).detect(text)
        limited = SpanDetector(masking_level=MaskingLevel.LIMITED_DATASET).detect(text)
        key = lambda s: (s["start"], s["end"], s["category"])
        assert set(map(key, limited)) <= set(map(key, full))
        assert len(limited) < len(full)

    def test_custom_categories(self):
        d = SpanDetector(masking_level=MaskingLevel.CUSTOM, custom_categories=["Email"])
        out = d.detect("mail a@b.co or call 617-555-1234")
        assert cats(out) == {"Email"}


class TestExtensibility:
    def test_extra_patterns(self):
        d = SpanDetector(extra_patterns={"Url": [r"https?://\S+"]})
        out = d.detect("visit https://example.com/page now")
        assert "Url" in cats(out)


class TestChunking:
    def test_long_text_offsets_rebased(self):
        # reference: tests/unit/test_aws_services.py:225-257
        d = SpanDetector(max_chunk_chars=100, chunk_overlap=20)
        pad = "x" * 150
        text = pad + " a@b.co " + "y" * 50
        out = d.detect(text)
        email = [s for s in out if s["category"] == "Email"][0]
        assert text[email["start"] : email["end"]] == "a@b.co"

    def test_seam_entity_not_split(self):
        # entity (30 chars) straddles the first chunk cut; contract needs
        # chunk_overlap >= 2 x entity length
        d = SpanDetector(max_chunk_chars=100, chunk_overlap=60)
        filler = "w" * 85
        text = filler + " long.email.address@example.com " + "z" * 40
        out = d.detect(text)
        emails = [s for s in out if s["category"] == "Email"]
        assert len(emails) == 1
        assert text[emails[0]["start"] : emails[0]["end"]] == "long.email.address@example.com"

    def test_chunked_sorted(self):
        d = SpanDetector(max_chunk_chars=60, chunk_overlap=10)
        text = "a@b.co " + "x" * 80 + " c@d.io " + "y" * 80 + " e@f.gg"
        out = d.detect(text)
        starts = [s["start"] for s in out]
        assert starts == sorted(starts)


class TestBatchStage:
    def test_arrow_batch_contract(self):
        import pyarrow as pa

        d = SpanDetector()
        batch = pa.table(
            {
                "url": ["u1", "u2"],
                "extracted_text": ["mail a@b.co", ""],
            }
        )
        out = d(batch)
        assert "spans" in out.column_names
        spans = out["spans"].to_pylist()
        assert spans[0][0]["category"] == "Email"
        assert spans[1] == []
