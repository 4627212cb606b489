"""Span algebra unit tests.

Scenario sources: reference domain invariants
(tests/unit/test_domain.py — overlap predicates) and the matcher's merge
semantics (tests/unit/test_entity_matcher.py), re-expressed over
character intervals.
"""

import pytest

from redactifai_ray.functions.spans import (
    chunk_text,
    clamp_spans,
    dedupe_spans,
    filter_confidence,
    make_span,
    merge_spans,
    rebase_spans,
    sort_spans,
    spans_overlap,
)


def s(start, end, cat="X", conf=0.9, text=""):
    return make_span(start, end, cat, conf, text)


class TestOverlap:
    def test_overlapping(self):
        assert spans_overlap(s(0, 10), s(5, 15))

    def test_touching_half_open_do_not_overlap(self):
        # reference: PHIEntity.overlaps_with half-open (domain.py:165-167)
        assert not spans_overlap(s(0, 10), s(10, 20))

    def test_contained(self):
        assert spans_overlap(s(0, 100), s(40, 50))

    def test_disjoint(self):
        assert not spans_overlap(s(0, 5), s(6, 9))


class TestValidation:
    def test_negative_start_rejected(self):
        with pytest.raises(ValueError):
            make_span(-1, 5, "X")

    def test_end_before_start_rejected(self):
        with pytest.raises(ValueError):
            make_span(10, 5, "X")


class TestMerge:
    def test_disjoint_unchanged(self):
        out = merge_spans([s(0, 5), s(10, 15)])
        assert [(m["start"], m["end"]) for m in out] == [(0, 5), (10, 15)]

    def test_overlapping_coalesce(self):
        out = merge_spans([s(0, 10), s(5, 15)])
        assert [(m["start"], m["end"]) for m in out] == [(0, 15)]

    def test_touching_stay_separate(self):
        out = merge_spans([s(0, 10), s(10, 20)])
        assert len(out) == 2

    def test_nested_absorbed(self):
        out = merge_spans([s(0, 20), s(5, 10)])
        assert [(m["start"], m["end"]) for m in out] == [(0, 20)]

    def test_category_of_highest_confidence_wins(self):
        out = merge_spans([s(0, 10, "A", 0.5), s(5, 15, "B", 0.9)])
        assert out[0]["category"] == "B"
        assert out[0]["confidence"] == pytest.approx(0.9)

    def test_tie_goes_to_earliest_start(self):
        out = merge_spans([s(0, 10, "A", 0.9), s(5, 15, "B", 0.9)])
        assert out[0]["category"] == "A"

    def test_chain_of_three(self):
        out = merge_spans([s(0, 6), s(5, 11), s(10, 16)])
        assert [(m["start"], m["end"]) for m in out] == [(0, 16)]

    def test_unsorted_input(self):
        out = merge_spans([s(10, 15), s(0, 5)])
        assert [(m["start"], m["end"]) for m in out] == [(0, 5), (10, 15)]

    def test_empty(self):
        assert merge_spans([]) == []

    def test_deterministic(self):
        spans = [s(3, 9, "A", 0.7), s(0, 4, "B", 0.8), s(8, 12, "C", 0.9)]
        assert merge_spans(list(spans)) == merge_spans(list(reversed(spans)))


class TestConfidenceFilter:
    def test_below_threshold_dropped(self):
        # reference: entity_matcher.py:99-105 — strict less-than skipped
        out = filter_confidence([s(0, 5, conf=0.4), s(6, 9, conf=0.6)], 0.5)
        assert len(out) == 1 and out[0]["start"] == 6

    def test_equal_threshold_kept(self):
        assert len(filter_confidence([s(0, 5, conf=0.5)], 0.5)) == 1

    def test_zero_threshold_keeps_all(self):
        assert len(filter_confidence([s(0, 5, conf=0.0)], 0.0)) == 1


class TestChunking:
    def test_short_text_single_chunk(self):
        assert chunk_text("abc", 10) == [(0, "abc")]

    def test_hard_cut_no_overlap(self):
        # reference behavior: hard cuts at MAX_TEXT_LENGTH
        # (aws_comprehend_medical_service.py:144-147)
        chunks = chunk_text("a" * 25, 10, 0)
        assert [c[0] for c in chunks] == [0, 10, 20]
        assert "".join(c[1] for c in chunks) == "a" * 25

    def test_overlap_windows_cover_seams(self):
        chunks = chunk_text("x" * 30, 10, 3)
        starts = [c[0] for c in chunks]
        assert starts == [0, 7, 14, 21]
        for (s0, c0), (s1, _) in zip(chunks, chunks[1:]):
            assert s1 < s0 + len(c0)  # every seam is inside some window

    def test_rebase(self):
        out = rebase_spans([s(2, 5)], 100)
        assert (out[0]["start"], out[0]["end"]) == (102, 105)

    def test_seam_dedupe(self):
        a = s(95, 105, "Email", 0.9)
        b = s(95, 105, "Email", 0.95)  # same span seen from the next window
        out = dedupe_spans([a, b])
        assert len(out) == 1 and out[0]["confidence"] == pytest.approx(0.95)

    def test_chunked_detection_equals_whole_text(self):
        """End-to-end: chunked detection over a long text finds the same
        spans as unchunked — including one straddling a chunk seam."""
        from redactifai_ray.stages.detect import SpanDetector

        det_small = SpanDetector(max_chunk_chars=100, chunk_overlap=30)
        det_big = SpanDetector()
        filler = "word " * 19  # 95 chars
        text = filler + "reach me at jane.doe@example.com today " + "tail " * 20
        spans_a = det_small.detect(text)
        spans_b = det_big.detect(text)
        key = lambda sp: (sp["start"], sp["end"], sp["category"])
        assert sorted(map(key, spans_a)) == sorted(map(key, spans_b))


class TestClamp:
    def test_out_of_range_clamped(self):
        out = clamp_spans([s(5, 50)], 20)
        assert (out[0]["start"], out[0]["end"]) == (5, 20)

    def test_fully_outside_dropped(self):
        assert clamp_spans([s(30, 40)], 20) == []


class TestSort:
    def test_total_order(self):
        spans = [s(5, 9, "B"), s(5, 9, "A"), s(5, 7, "C"), s(1, 2, "Z")]
        out = sort_spans(spans)
        assert [(x["start"], x["end"], x["category"]) for x in out] == [
            (1, 2, "Z"), (5, 7, "C"), (5, 9, "A"), (5, 9, "B"),
        ]
