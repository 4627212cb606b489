"""Masking-level policy tests (reference: phi_detection_service.py:43-76)."""

from redactifai_ray.policy import (
    PROVIDER_CATEGORIES,
    MaskingLevel,
    filter_by_level,
    should_mask,
)


class TestSafeHarbor:
    def test_masks_everything(self):
        for cat in ["Person", "Email", "HealthcareProfessional", "Organization", "Whatever"]:
            assert should_mask(cat, MaskingLevel.SAFE_HARBOR)


class TestLimitedDataset:
    def test_provider_categories_unmasked(self):
        for cat in PROVIDER_CATEGORIES:
            assert not should_mask(cat, MaskingLevel.LIMITED_DATASET)

    def test_patient_categories_masked(self):
        for cat in ["Person", "Email", "SSN", "Date"]:
            assert should_mask(cat, MaskingLevel.LIMITED_DATASET)


class TestCustom:
    def test_membership(self):
        allowed = frozenset({"Email", "SSN"})
        assert should_mask("Email", MaskingLevel.CUSTOM, allowed)
        assert not should_mask("Person", MaskingLevel.CUSTOM, allowed)

    def test_unconfigured_masks_all(self):
        # reference placeholder behavior (phi_detection_service.py:73-76)
        assert should_mask("Anything", MaskingLevel.CUSTOM, None)


class TestFilter:
    def test_filter_by_level(self):
        spans = [
            {"category": "Person", "start": 0, "end": 1, "confidence": 1.0, "subcategory": "", "text": ""},
            {"category": "Organization", "start": 2, "end": 3, "confidence": 1.0, "subcategory": "", "text": ""},
        ]
        out = filter_by_level(spans, MaskingLevel.LIMITED_DATASET)
        assert [s["category"] for s in out] == ["Person"]
