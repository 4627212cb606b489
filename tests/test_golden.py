"""Golden-fixture byte-equality tests — the BASELINE.json per-row invariant:
100% byte-identical extracted+masked text per url vs the committed golden
table (regenerate only via scripts/make_golden.py on a version bump)."""

import os

import pyarrow.parquet as pq
import pytest

from redactifai_ray import EXTRACTOR_VERSION
from redactifai_ray.fixtures import page_record
from redactifai_ray.functions.mask import mask_text
from redactifai_ray.stages.detect import SpanDetector
from redactifai_ray.stages.extract import extract_main_content

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.parquet")


@pytest.fixture(scope="module")
def golden():
    t = pq.read_table(GOLDEN)
    return {r["url"]: r for r in t.to_pylist()}


@pytest.fixture(scope="module")
def detector():
    return SpanDetector()


def test_golden_exists_and_versioned(golden):
    assert len(golden) > 150
    versions = {r["extractor_version"] for r in golden.values()}
    assert versions == {EXTRACTOR_VERSION}, (
        "extractor version changed — regenerate goldens via scripts/make_golden.py"
    )


def test_extracted_text_byte_identical(golden, detector):
    mismatches = []
    for i in range(200):
        rec = page_record(i, 42)
        g = golden.get(rec["url"])
        if g is None:
            continue
        text, _ = extract_main_content(rec["html"])
        if text.encode() != g["extracted_text"].encode():
            mismatches.append(rec["url"])
    assert mismatches == []


def test_masked_text_byte_identical(golden, detector):
    mismatches = []
    for i in range(200):
        rec = page_record(i, 42)
        g = golden.get(rec["url"])
        if g is None:
            continue
        text, _ = extract_main_content(rec["html"])
        masked, _ = mask_text(text, detector.detect(text))
        if masked.encode() != g["masked_text"].encode():
            mismatches.append(rec["url"])
    assert mismatches == []


def test_span_lists_exact(golden, detector):
    for i in range(0, 200, 7):
        rec = page_record(i, 42)
        g = golden.get(rec["url"])
        if g is None:
            continue
        text, _ = extract_main_content(rec["html"])
        spans = detector.detect(text)
        got = [(s["start"], s["end"], s["category"]) for s in spans]
        want = [(s["start"], s["end"], s["category"]) for s in g["spans"]]
        assert got == want, rec["url"]


def test_no_pii_survives_masking(golden):
    """Safety net: golden masked_text must not contain surfaces the
    detector's own patterns would still match (self-consistency)."""
    det = SpanDetector(detect_names=False)
    for url, g in golden.items():
        leftovers = det.detect(g["masked_text"])
        assert leftovers == [], (url, leftovers[:3])
