"""Extension registries: pluggable extractors and detectors.

The reference routes providers through a string→impl factory
(src/services/service_factory.py:17-92) behind ABC protocols
(OCRService src/services/ocr_service.py:19-43; PHIDetectionService
src/services/phi_detection_service.py:18-41). Here the protocol is
structural: an *extractor* is ``bytes -> (text, blocks)``, a *detector*
is a ``map_batches``-compatible callable class.
"""

from __future__ import annotations

from typing import Callable

from .stages.detect import SpanDetector
from .stages.extract import extract_main_content, extract_main_content_strict
from .stages.ner import TrainedNerDetector

EXTRACTORS: dict[str, Callable] = {
    "dom-density": extract_main_content,  # jusText/trafilatura-style default
    # precision-leaning variant: higher block/density thresholds, its own
    # version string + golden fixtures (reference ships two OCR providers
    # behind one factory — service_factory.py:17-92; this is the analog)
    "dom-density-strict": extract_main_content_strict,
}

DETECTORS: dict[str, type] = {
    "regex-ner": SpanDetector,  # regex table + heuristic NER (local, warm)
    # corpus-trained gazetteer + char-trigram name model: the
    # heavy-state detector the actor path (detector_mode="actors",
    # SURVEY §2.3 ST2) exists for; needs model/model_ref at construction
    # (train with stages.ner.train_ner_from_corpus)
    "trained-ner": TrainedNerDetector,
}


def get_extractor(name: str) -> Callable:
    try:
        return EXTRACTORS[name]
    except KeyError:
        raise KeyError(f"unknown extractor {name!r}; have {sorted(EXTRACTORS)}") from None


def get_detector(name: str) -> type:
    try:
        return DETECTORS[name]
    except KeyError:
        raise KeyError(f"unknown detector {name!r}; have {sorted(DETECTORS)}") from None
