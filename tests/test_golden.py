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


# ---- second extractor profile (§2.10 surface: two impls, one registry) --

GOLDEN_STRICT = os.path.join(
    os.path.dirname(__file__), "golden", "golden_strict.parquet"
)


@pytest.fixture(scope="module")
def golden_strict():
    t = pq.read_table(GOLDEN_STRICT)
    return {r["url"]: r for r in t.to_pylist()}


def test_strict_golden_versioned(golden_strict):
    from redactifai_ray.stages.extract import EXTRACT_PROFILES

    versions = {r["extractor_version"] for r in golden_strict.values()}
    assert versions == {EXTRACT_PROFILES["dom-density-strict"]["version"]}
    assert versions != {EXTRACTOR_VERSION}  # distinct version namespace


def test_strict_extractor_byte_identical(golden_strict):
    from redactifai_ray.stages.extract import extract_main_content_strict

    mismatches = []
    for i in range(200):
        rec = page_record(i, 42)
        g = golden_strict.get(rec["url"])
        if g is None:
            continue
        text, _ = extract_main_content_strict(rec["html"])
        if text.encode() != g["extracted_text"].encode():
            mismatches.append(rec["url"])
    assert mismatches == []


def test_profiles_distinct_and_strict_subset(golden, golden_strict):
    """The two registered extractors are genuinely different classifiers
    (some pages classify differently), and strict only DROPS blocks —
    every strict content block also appears in the default extraction."""
    differs = 0
    for url, g in golden.items():
        s = golden_strict[url]
        if g["extracted_text"] != s["extracted_text"]:
            differs += 1
        for blk in s["extracted_text"].split("\n\n"):
            assert not blk or blk in g["extracted_text"]
    assert differs > 0


def test_registry_has_both_extractors():
    from redactifai_ray.registry import get_extractor

    d = get_extractor("dom-density")
    s = get_extractor("dom-density-strict")
    html = (
        b"<html><body><p>A paragraph of thirty-five chars ok.</p><p>"
        + b"A sufficiently long paragraph of body prose for both profiles. "
        * 2
        + b"</p></body></html>"
    )
    td, _ = d(html)
    ts, _ = s(html)
    # the 35-char paragraph sits between the two min_content thresholds
    assert "thirty-five" in td and "thirty-five" not in ts
    assert "body prose" in td and "body prose" in ts
