"""Extractor unit tests: boilerplate stripping, density classification,
offset integrity, malformed-input tolerance, determinism."""

from redactifai_ray.stages.extract import (
    extract_blocks,
    extract_main_content,
)

ARTICLE = b"""
<html><head><title>T</title><script>var x = "ignore me";</script>
<style>.c{color:red}</style></head>
<body>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></nav>
<header><h1>A Clear Headline Here</h1></header>
<article>
<p>This is the first real paragraph with enough characters to count as content.</p>
<p>Second paragraph also long enough to be kept by the density classifier rules.</p>
</article>
<aside><ul><li><a href="/t">tag one</a></li><li><a href="/u">tag two</a></li></ul></aside>
<footer><p>(c) 2024 Example Inc. All rights reserved.</p></footer>
</body></html>
"""


class TestContentSelection:
    def test_main_paragraphs_kept(self):
        text, _ = extract_main_content(ARTICLE)
        assert "first real paragraph" in text
        assert "Second paragraph" in text

    def test_boilerplate_stripped(self):
        text, _ = extract_main_content(ARTICLE)
        assert "Home" not in text
        assert "tag one" not in text
        assert "All rights reserved" not in text

    def test_script_style_never_leak(self):
        text, _ = extract_main_content(ARTICLE)
        assert "ignore me" not in text
        assert "color:red" not in text

    def test_heading_kept(self):
        text, _ = extract_main_content(ARTICLE)
        assert "A Clear Headline Here" in text

    def test_link_density_rejects_link_lists(self):
        html = (
            b"<body><div>"
            b'<a href="/1">one link text</a> <a href="/2">two link text</a> '
            b'<a href="/3">three link text</a></div></body>'
        )
        blocks = extract_blocks(html)
        assert all(not b["is_content"] for b in blocks)

    def test_short_block_rejected(self):
        blocks = extract_blocks(b"<body><p>too short</p></body>")
        assert not blocks[0]["is_content"]


class TestOffsets:
    def test_block_offsets_point_into_text(self):
        text, blocks = extract_main_content(ARTICLE)
        for b in blocks:
            if b["is_content"]:
                assert text[b["start"] : b["end"]] == b["text"]

    def test_blocks_joined_by_blank_line(self):
        text, blocks = extract_main_content(ARTICLE)
        content = [b for b in blocks if b["is_content"]]
        assert text == "\n\n".join(b["text"] for b in content)


class TestRobustness:
    def test_empty_input(self):
        assert extract_main_content(b"") == ("", [])

    def test_plain_text_no_tags(self):
        text, _ = extract_main_content(
            b"Just a plain text file with enough words to count as real content here."
        )
        assert "plain text file" in text

    def test_unclosed_tags(self):
        html = b"<body><div><p>An unclosed paragraph with plenty of content to keep here<p>And another trailing one with enough length to be kept too</div>"
        text, _ = extract_main_content(html)
        assert "unclosed paragraph" in text

    def test_entities_decoded(self):
        html = b"<body><p>Tom &amp; Jerry&#8217;s adventures continue with plenty of text here.</p></body>"
        text, _ = extract_main_content(html)
        assert "Tom & Jerry’s" in text

    def test_non_utf8_bytes_tolerated(self):
        html = "<body><p>Valid leading content that is long enough to keep around.</p></body>".encode() + b"\xff\xfe"
        text, _ = extract_main_content(html)
        assert "Valid leading content" in text

    def test_whitespace_collapsed(self):
        html = b"<body><p>spaced     out\n\n\ttext with     enough length to be content</p></body>"
        text, _ = extract_main_content(html)
        assert "spaced out text" in text


class TestDeterminism:
    def test_byte_identical_across_calls(self):
        a, _ = extract_main_content(ARTICLE)
        b, _ = extract_main_content(ARTICLE)
        assert a.encode() == b.encode()

    def test_nfc_normalization(self):
        # e + combining acute (NFD input) normalizes to single codepoint
        nfd = "cafe\u0301"
        html = ("<body><p>" + (nfd + " ") * 10 + "long enough content</p></body>").encode()
        text, _ = extract_main_content(html)
        assert "caf\u00e9" in text
        assert "\u0301" not in text


class TestOversizeGuard:
    def test_oversize_truncated_not_failed(self):
        from redactifai_ray.stages.extract import make_extract_batch
        import pyarrow as pa

        big = (b"<html><body><p>" + b"word " * 100 + b"</p>" ) * 50
        ex = make_extract_batch(max_html_bytes=1024)
        out = ex(pa.table({"url": ["u"], "html": [big]}))
        assert out["status"][0].as_py() == "ok"
        assert out["error"][0].as_py() == "truncated_oversize_html"
        assert 0 < out["n_chars"][0].as_py() < 2000


class TestFastParser:
    def test_fast_equals_stdlib_on_fixture_corpus(self):
        from redactifai_ray.fixtures import page_record
        from redactifai_ray.stages.extract import extract_blocks

        for i in range(0, 300, 3):
            rec = page_record(i)
            fast = extract_blocks(rec["html"], "fast")
            assert fast == extract_blocks(rec["html"], "stdlib"), f"page {i}"
            # the fused fast path must also match the two-stage event
            # pipeline it replaced (round-4 perf pass)
            assert fast == extract_blocks(rec["html"], "events"), f"page {i}"

    def test_fused_equals_events_on_edge_cases(self):
        from redactifai_ray.stages.extract import extract_blocks

        cases = [
            b"<p>unterminated <script>var x = '<p>fake</p>';",
            b"<div><a href='#'>link text</a> and plain tail</div>",
            b"<nav><p>menu items here</p></nav><p>body paragraph with "
            b"plenty of characters to clear every threshold easily</p>",
            b"text before any tag <p>then a block</p> trailing data",
            b"<ul><li>one</li><li>two &amp; three</li></ul>",
            b"<p>a<br/>b<br>c</p><hr><p>after rule more text here</p>",
            b"<!-- comment --><!DOCTYPE html><?pi ?><p>content here ok</p>",
            b"<title>skip me</title><textarea>raw</textarea><p>kept text</p>",
            b"<header><h1>Site Head</h1></header><article><p>body copy "
            b"long enough to classify as content for sure</p></article>",
        ]
        for html in cases:
            assert extract_blocks(html, "fast") == extract_blocks(
                html, "events"
            ), html

    def test_textarea_rawtext_divergence(self):
        # the one intentional divergence: textarea content is rawtext
        from redactifai_ray.stages.extract import extract_blocks

        html = b"<textarea><p>form draft</p></textarea><p>real body content long enough here</p>"
        fast = extract_blocks(html, "fast")
        assert all("form draft" not in b["text"] for b in fast)
        assert any("real body" in b["text"] for b in fast)


class TestPdfExtract:
    PARA1 = (
        "The quick brown fox jumps over the lazy dog near the river "
        "bank while the afternoon sun warms the meadow grass gently"
    )
    PARA2 = (
        "A second paragraph carries different narrative content with "
        "plenty of characters to clear the minimum content threshold"
    )

    def test_uncompressed_roundtrip(self):
        from redactifai_ray.stages.pdfextract import (
            build_pdf,
            extract_pdf_content,
        )

        raw = build_pdf([self.PARA1, self.PARA2])
        text, blocks = extract_pdf_content(raw)
        # byte-exact golden: per-BT paragraph merge reconstructs the
        # source paragraphs exactly (the byte-identical contract extends
        # to the PDF branch)
        assert text == self.PARA1 + "\n\n" + self.PARA2
        assert all(b["tag"] == "pdfpara" for b in blocks)
        # offsets are constructive into the assembled text
        for b in blocks:
            if b["is_content"]:
                assert text[b["start"] : b["end"]] == b["text"]

    def test_flate_equals_uncompressed(self):
        from redactifai_ray.stages.pdfextract import (
            build_pdf,
            extract_pdf_content,
        )

        a, _ = extract_pdf_content(build_pdf([self.PARA1], compress=False))
        b, _ = extract_pdf_content(build_pdf([self.PARA1], compress=True))
        assert a == b and "quick brown fox" in a

    def test_header_footer_gated_out(self):
        from redactifai_ray.stages.pdfextract import (
            build_pdf,
            extract_pdf_content,
        )

        raw = build_pdf([self.PARA1], header_footer="Page 7 of 12")
        text, blocks = extract_pdf_content(raw)
        assert "Page 7 of 12" not in text
        assert any(
            b["text"] == "Page 7 of 12" and not b["is_content"]
            for b in blocks
        )

    def test_et_bt_inside_literals_roundtrip(self):
        """Round-3 regression: uppercase 'ET'/'BT' inside shown text
        ("NET", "GET", "BUDGET", "ET AL.") must not terminate or open a
        BT block — the scanner must treat BT/ET as operator tokens
        outside string literals only."""
        from redactifai_ray.stages.pdfextract import (
            build_pdf,
            extract_pdf_content,
        )

        paras = [
            "THE BUDGET REPORT SHOWS NET GAINS ACROSS EVERY MARKET "
            "SEGMENT THIS QUARTER",
            "See Smith ET AL. for the BT subtree analysis and the "
            "GET endpoint documentation in the appendix",
            "ET" * 20 + " starts and BT" + "BT" * 10 + " ends",
        ]
        for compress in (False, True):
            text, _ = extract_pdf_content(build_pdf(paras, compress=compress))
            assert text == "\n\n".join(paras)

    def test_stream_bounds_hostile_flate_payloads(self):
        """Round-4 hypothesis find: Flate payloads that END in a CR byte
        or CONTAIN the literal b'\\nendstream' must still decode — naive
        regex bounding clips or mis-bounds them."""
        import zlib

        from redactifai_ray.stages.pdfextract import _decode_streams

        def obj(payload: bytes) -> bytes:
            return (
                b"1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(payload) + payload + b"\nendstream\nendobj\n"
            )

        # find content whose compressed form ends in \r (0x0D)
        for i in range(50_000):
            content = b"BT (payload %d) Tj ET" % i
            z = zlib.compress(content)
            if z.endswith(b"\r"):
                got = _decode_streams(obj(z))
                assert got == [content], "CR-terminated payload clipped"
                break
        else:
            raise AssertionError("no CR-ending compressed form found")
        # and one whose compressed form contains b"\nendstream"
        probe = zlib.compress(b"x")  # cheap skip if never found
        found = False
        for i in range(200_000):
            content = b"BT (doc %d content) Tj ET" % i
            z = zlib.compress(content)
            if b"\nendstream" in z:
                assert _decode_streams(obj(z)) == [content]
                found = True
                break
        if not found:  # astronomically unlikely either way — also cover
            # the no-/Length fallback with a CR-ending payload
            assert _decode_streams(
                b"<< /Filter /FlateDecode >>\nstream\n" + zlib.compress(
                    b"BT (no length key) Tj ET"
                ) + b"\nendstream"
            ) == [b"BT (no length key) Tj ET"]

    def test_et_bt_literal_boundaries_raw_stream(self):
        from redactifai_ray.stages.pdfextract import _lines_of_stream

        # "ET" inside the literal must not end the block early
        stream = rb"BT (BUDGET and ET AL. and NET) Tj (tail) Tj ET"
        assert _lines_of_stream(stream) == [["BUDGET and ET AL. and NETtail"]]
        # "BT" inside a literal must not open a bogus block
        stream2 = rb"BT (a BT b) Tj ET BT (second block) Tj ET"
        assert _lines_of_stream(stream2) == [["a BT b"], ["second block"]]
        # "ET" inside a TJ array string and a hex string
        stream3 = rb"BT [(GET) -200 (SET)] TJ ET"
        assert _lines_of_stream(stream3) == [["GET SET"]]
        # text outside BT..ET is not shown text
        stream4 = rb"(orphan) Tj BT (real) Tj ET"
        assert _lines_of_stream(stream4) == [["real"]]
        # unterminated block keeps its shown text (fail-soft)
        stream5 = rb"BT (kept on missing ET) Tj"
        assert _lines_of_stream(stream5) == [["kept on missing ET"]]

    def test_escapes_hex_and_tj(self):
        from redactifai_ray.stages.pdfextract import _lines_of_stream

        stream = (
            rb"BT (with \(parens\) and \134 backslash and \101 octal) Tj ET"
            rb" BT [(kerned) -200 (words) -20 (close)] TJ ET"
            b" BT <48656C6C6F> Tj ET"
        )
        groups = _lines_of_stream(stream)
        assert groups[0] == ["with (parens) and \\ backslash and A octal"]
        assert groups[1] == ["kerned wordsclose"]
        assert groups[2] == ["Hello"]
        # multi-line BT block groups its Td lines together
        multi = rb"BT (first line) Tj 0 -14 Td (second line) Tj ET"
        assert _lines_of_stream(multi) == [["first line", "second line"]]

    def test_sniff_and_pipeline_route(self, ray_session):
        import ray.data

        from redactifai_ray.stages.content import sniff_content_type
        from redactifai_ray.stages.extract import make_extract_batch
        from redactifai_ray.stages.pdfextract import build_pdf

        raw = build_pdf([self.PARA1, self.PARA2], compress=True)
        assert sniff_content_type(raw) == "pdf"
        rows = [
            {
                "url": "https://example.com/doc.pdf",
                "warc_ts": 1,
                "html": raw,
                "lang": "en",
            },
            {
                "url": "https://example.com/page.html",
                "warc_ts": 2,
                "html": b"<html><body><p>" + self.PARA2.encode() + b"</p></body></html>",
                "lang": "en",
            },
        ]
        out = (
            ray.data.from_items(rows)
            .map_batches(make_extract_batch(), batch_format="pyarrow")
            .to_pandas()
            .set_index("url")
        )
        assert (out["status"] == "ok").all()
        assert "quick brown fox" in out.loc["https://example.com/doc.pdf", "extracted_text"]
        assert out.loc["https://example.com/doc.pdf", "content_type"] == "pdf"
        assert "second paragraph" in out.loc["https://example.com/page.html", "extracted_text"]
