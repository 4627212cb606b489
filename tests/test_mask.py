"""Masking unit tests — the text analog of the reference's
tests/unit/test_image_masking_service.py scenarios (copy-on-write,
multi-region, no-op, overlapping masks, debug mode)."""

import pytest

from redactifai_ray.functions.mask import (
    BLOCK_CHAR,
    BLOCK_STYLE,
    TOKEN_STYLE,
    apply_spans,
    debug_mask,
    mask_text,
    mask_token,
)
from redactifai_ray.functions.spans import make_span


def s(start, end, cat="Email", conf=0.9):
    return make_span(start, end, cat, conf)


TEXT = "Contact jane.doe@example.com or call 617-555-1234 now."


class TestApply:
    def test_token_style(self):
        out = apply_spans(TEXT, [s(8, 28)], TOKEN_STYLE)
        assert out == "Contact [EMAIL] or call 617-555-1234 now."

    def test_block_style_preserves_length(self):
        out = apply_spans(TEXT, [s(8, 28)], BLOCK_STYLE)
        assert len(out) == len(TEXT)
        assert out[8:28] == BLOCK_CHAR * 20

    def test_no_spans_is_identity(self):
        # reference: apply_masks with no regions copies unchanged (:66-69)
        assert apply_spans(TEXT, []) == TEXT

    def test_multiple_spans(self):
        out = apply_spans(TEXT, [s(8, 28), s(37, 49, "PhoneNumber")])
        assert out == "Contact [EMAIL] or call [PHONENUMBER] now."

    def test_input_unmodified(self):
        t = str(TEXT)
        apply_spans(t, [s(8, 28)])
        assert t == TEXT  # copy-on-write analog

    def test_overlapping_spans_rejected(self):
        with pytest.raises(ValueError):
            apply_spans(TEXT, [s(8, 28), s(20, 30)])

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            apply_spans("short", [s(0, 99)])

    def test_span_at_text_end(self):
        assert apply_spans("ab cd", [s(3, 5, "X")]) == "ab [X]"

    def test_whole_text_span(self):
        assert apply_spans("abc", [s(0, 3, "All")]) == "[ALL]"


class TestMaskText:
    def test_overlapping_raw_spans_coalesce(self):
        # overlapping masks union (reference masker draws both rectangles)
        out, merged = mask_text(TEXT, [s(8, 20), s(15, 28)])
        assert out == "Contact [EMAIL] or call 617-555-1234 now."
        assert len(merged) == 1

    def test_byte_identical_determinism(self):
        spans = [s(8, 28), s(37, 49, "PhoneNumber")]
        a, _ = mask_text(TEXT, list(spans))
        b, _ = mask_text(TEXT, list(reversed(spans)))
        assert a.encode() == b.encode()


class TestDebug:
    def test_debug_keeps_surface(self):
        out = debug_mask(TEXT, [s(8, 28)])
        assert out == "Contact [EMAIL:jane.doe@example.com] or call 617-555-1234 now."


class TestToken:
    def test_token_form(self):
        assert mask_token("PhoneNumber") == "[PHONENUMBER]"
