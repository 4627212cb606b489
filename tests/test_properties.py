"""Property-based tests (hypothesis) for the span/mask/chunk algebra —
invariants that hold for ALL inputs, beyond the reference's example-based
strategy (SURVEY §5 notes it has no property tests)."""

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from redactifai_ray.functions.mask import BLOCK_STYLE, apply_spans, mask_text
from redactifai_ray.functions.spans import (
    chunk_text,
    clamp_spans,
    make_span,
    merge_spans,
    sort_spans,
    spans_overlap,
)

CATS = ("Email", "Person", "Date", "SSN")


@st.composite
def raw_spans(draw, max_end=200):
    n = draw(st.integers(0, 12))
    out = []
    for _ in range(n):
        start = draw(st.integers(0, max_end - 1))
        end = draw(st.integers(start + 1, max_end))
        out.append(
            make_span(
                start, end,
                draw(st.sampled_from(CATS)),
                draw(st.floats(0.1, 1.0, allow_nan=False)),
            )
        )
    return out


class TestMergeProperties:
    @given(raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_merged_never_overlap(self, spans):
        merged = merge_spans(spans)
        for a, b in zip(merged, merged[1:]):
            assert not spans_overlap(a, b)
            assert a["end"] <= b["start"]

    @given(raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_merge_idempotent(self, spans):
        once = merge_spans(spans)
        twice = merge_spans(once)
        assert [(m["start"], m["end"]) for m in once] == [
            (m["start"], m["end"]) for m in twice
        ]

    @given(raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_merge_order_invariant(self, spans):
        a = merge_spans(list(spans))
        b = merge_spans(list(reversed(spans)))
        assert a == b

    @given(raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_coverage_preserved(self, spans):
        # every input character covered by some raw span is covered by a
        # merged span, and vice versa
        covered_raw = set()
        for s in spans:
            covered_raw.update(range(s["start"], s["end"]))
        covered_merged = set()
        for m in merge_spans(spans):
            covered_merged.update(range(m["start"], m["end"]))
        assert covered_raw == covered_merged


class TestMaskProperties:
    @given(st.text(min_size=0, max_size=300), raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_block_style_length_preserving(self, text, spans):
        spans = clamp_spans(spans, len(text))
        masked, _ = mask_text(text, spans, style=BLOCK_STYLE)
        assert len(masked) == len(text)

    @given(st.text(min_size=0, max_size=300), raw_spans())
    @settings(max_examples=200, deadline=None)
    def test_unmasked_regions_unchanged(self, text, spans):
        spans = clamp_spans(spans, len(text))
        merged = merge_spans(spans)
        masked = apply_spans(text, merged, style=BLOCK_STYLE)
        cursor = 0
        for m in merged:
            assert masked[cursor : m["start"]] == text[cursor : m["start"]]
            cursor = m["end"]
        assert masked[cursor:] == text[cursor:]

    @given(st.text(min_size=0, max_size=300), raw_spans())
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, text, spans):
        spans = clamp_spans(spans, len(text))
        a, _ = mask_text(text, list(spans))
        b, _ = mask_text(text, list(reversed(spans)))
        assert a == b


class TestChunkProperties:
    @given(st.text(max_size=500), st.integers(5, 60), st.integers(0, 4))
    @settings(max_examples=200, deadline=None)
    def test_chunks_reassemble(self, text, size, overlap):
        chunks = chunk_text(text, size, overlap)
        # reconstruct: each chunk's non-overlapping suffix concatenates to text
        step = size - overlap
        rebuilt = ""
        for i, (base, chunk) in enumerate(chunks):
            if i == 0:
                rebuilt = chunk
            else:
                rebuilt += chunk[len(rebuilt) - base:]
        assert rebuilt == text

    @given(st.text(min_size=1, max_size=500), st.integers(5, 60), st.integers(0, 4))
    @settings(max_examples=200, deadline=None)
    def test_offsets_index_original(self, text, size, overlap):
        for base, chunk in chunk_text(text, size, overlap):
            assert text[base : base + len(chunk)] == chunk


class TestDetectorProperties:
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_spans_within_bounds_and_sorted(self, text):
        from redactifai_ray.stages.detect import SpanDetector

        det = SpanDetector()
        spans = det.detect(text)
        starts = [s["start"] for s in spans]
        assert starts == sorted(starts)
        for s in spans:
            assert 0 <= s["start"] < s["end"] <= len(text)
            assert text[s["start"] : s["end"]] == s["text"]

    @given(st.text(alphabet="ab@.x- 0123456789", max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_masking_removes_all_detector_matches(self, text):
        from redactifai_ray.stages.detect import SpanDetector

        det = SpanDetector(detect_names=False)
        masked, _ = mask_text(text, det.detect(text))
        assert det.detect(masked.replace("[", " ").replace("]", " ")) == [] or all(
            s["text"] not in masked for s in det.detect(text)
        )


class TestUrlProperties:
    @example("http://x:99999/")  # out-of-range port: urlsplit defers the
    # ValueError to parts.port (round-4 ADVICE fix)
    @example("http://[::1]:8080/a/")  # IPv6 brackets must survive
    @example("https://[2001:db8::1]/path/")
    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_canonical_never_raises_and_idempotent(self, s):
        from redactifai_ray.functions.urls import canonical_url

        once = canonical_url(s)
        assert canonical_url(once) == once  # idempotent fixpoint

    @given(
        st.sampled_from(["http", "https"]),
        st.from_regex(r"[a-z]{1,10}(\.[a-z]{1,8}){1,3}", fullmatch=True),
        st.from_regex(r"(/[a-zA-Z0-9._~-]{0,12}){0,4}", fullmatch=True),
    )
    @settings(max_examples=200, deadline=None)
    def test_wellformed_urls_keep_scheme_and_registrable_host(
        self, scheme, host, path
    ):
        from redactifai_ray.functions.urls import (
            canonical_url,
            registrable_domain,
        )

        url = f"{scheme}://{host}{path}"
        c = canonical_url(url)
        assert c.startswith(f"{scheme}://")
        # canonicalization never changes the registrable domain
        assert registrable_domain(c) == registrable_domain(url)


class TestFusedParserProperties:
    @example("<p>unterminated <script>var x='<p>f</p>';")
    @example("a<div><a href=x>l</a>t</div><nav><p>m</p></nav><p>bb</p>")
    @example("<P >case<BR/>mix</p ><!--c--><![CDATA[x]]><?pi?>tail")
    @example("<textarea><p>raw</p></textarea><title>t</title>rest")
    @given(
        st.text(
            alphabet=st.sampled_from(
                list("<>/ &;abpdivnavscriptstylebr=\"'!-[]?x \n\t")
            ),
            max_size=300,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_fused_equals_event_pipeline_on_tag_soup(self, html):
        """The fused single-pass parser (round-4 perf path) must emit
        byte-identical blocks to the two-stage event pipeline on ANY
        input, including malformed tag soup."""
        from redactifai_ray.stages.extract import extract_blocks

        assert extract_blocks(html, "fast") == extract_blocks(html, "events")


class TestPdfProperties:
    @given(st.binary(max_size=4000))
    @settings(max_examples=200, deadline=None)
    def test_extract_fail_soft_on_fuzz(self, raw):
        """Garbage bytes must never raise out of the PDF extractor —
        W2's per-row failure isolation depends on it."""
        from redactifai_ray.stages.pdfextract import extract_pdf_content

        text, blocks = extract_pdf_content(b"%PDF-1.4\n" + raw)
        assert isinstance(text, str)

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=32, max_codepoint=126,
                ),
                min_size=30,
                max_size=120,
            ).map(lambda s: " ".join(s.replace("\\", " ").split())),
            min_size=1,
            max_size=4,
        ),
        st.booleans(),
    )
    @example(paras=["THE BUDGET SHOWS NET GAINS, see Smith ET AL."], compress=False)
    @example(paras=["0" * 60 + "ET", "BT " * 12 + "inner BT run"], compress=True)
    @settings(max_examples=500, deadline=None)
    def test_roundtrip_any_ascii_paragraphs(self, paras, compress):
        from redactifai_ray.stages.extract import _normalize
        from redactifai_ray.stages.pdfextract import (
            build_pdf,
            extract_pdf_content,
        )

        paras = [p for p in (_normalize(p) for p in paras) if len(p) >= 25]
        if not paras:
            return
        text, _ = extract_pdf_content(build_pdf(paras, compress=compress))
        assert text == "\n\n".join(paras)
