"""Masking-level policy — which span categories get masked.

Re-expresses the reference's compliance predicate
(``PHIDetectionService._should_include_entity``,
src/services/phi_detection_service.py:43-76):

  * SAFE_HARBOR       — mask every detected category;
  * LIMITED_DATASET   — keep provider/organization categories unmasked;
  * CUSTOM            — mask exactly a configured category set
    (reference: ``custom_phi_categories``,
    src/services/azure_phi_detection_service.py:48,56-59,163-173).
"""

from __future__ import annotations

from enum import Enum
from typing import Iterable, Optional


class MaskingLevel(str, Enum):
    SAFE_HARBOR = "safe_harbor"
    LIMITED_DATASET = "limited_dataset"
    CUSTOM = "custom"


# reference: phi_detection_service.py:63-71
PROVIDER_CATEGORIES = frozenset(
    {
        "HealthcareProfessional",
        "Doctor",
        "Physician",
        "Organization",
        "Hospital",
    }
)


def should_mask(
    category: str,
    level: MaskingLevel = MaskingLevel.SAFE_HARBOR,
    custom_categories: Optional[frozenset[str]] = None,
) -> bool:
    if level == MaskingLevel.SAFE_HARBOR:
        return True
    if level == MaskingLevel.LIMITED_DATASET:
        return category not in PROVIDER_CATEGORIES
    # CUSTOM: membership in the configured set; mask-all if unconfigured
    if custom_categories is None:
        return True
    return category in custom_categories


def filter_by_level(
    spans: Iterable[dict],
    level: MaskingLevel = MaskingLevel.SAFE_HARBOR,
    custom_categories: Optional[frozenset[str]] = None,
) -> list[dict]:
    return [s for s in spans if should_mask(s["category"], level, custom_categories)]
