"""Main-content extraction: HTML bytes → extracted_text + offset blocks.

The structure-recovery stage — the webtext analog of the reference's OCR
step (``MockOCRService.analyze_document`` → per-word positions +
``full_text``, src/services/mock_ocr_service.py:48-184): instead of pixel
word boxes we emit *blocks* with character offsets into the canonical
``extracted_text``.

Algorithm (jusText/trafilatura-style; lxml is not available in this
environment, so tokenization is a lean regex scanner with the stdlib
html.parser retained as a cross-check implementation — identical output
on the whole fixture corpus, test-pinned):

  1. tokenize HTML into a flat element stream (tolerant of
     malformed/unclosed markup — the fixture noise analog of OCR errors);
  2. group character data into *blocks* at block-level tag boundaries,
     tracking per block: normalized text, chars inside <a> (link chars),
     tag of the opening block element, tag count (for text density), and
     whether any ancestor is structural boilerplate
     (nav/header/footer/aside/menu) or skipped content
     (script/style/noscript/template/head/svg/iframe);
  3. classify blocks content vs boilerplate with deterministic
     text-density / link-density thresholds;
  4. ``extracted_text`` = content blocks joined by "\\n\\n", NFC-normalized,
     whitespace collapsed — a pure function of the input bytes
     (byte-identical invariant; versioned as EXTRACTOR_VERSION).

Batch stage contract: Arrow table in (``url, warc_ts, html, lang``) →
Arrow table out (input minus ``html``, plus ``extracted_text, n_blocks,
n_chars, status, error``). ``html`` is projected away here so downstream
blocks are slim (SURVEY §7.5.5).
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

import pyarrow as pa

from .. import EXTRACTOR_VERSION

BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table blockquote pre
    article section main figure figcaption form fieldset address hr br
    body center""".split()
)
SKIP_TAGS = frozenset(
    "script style noscript template head svg iframe object embed select option".split()
)
BOILER_TAGS = frozenset("nav header footer aside menu".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
VOID_TAGS = frozenset(
    "br hr img meta link input area base col source track wbr".split()
)

# one-probe tag dispatch for the fused parser (round-4 perf pass):
# 0 = inline/other, 1 = SKIP, 2 = BOILER, 3 = BLOCK, 4 = <a>, 5 = br/hr
_TAG_CAT: dict[str, int] = {t: 3 for t in BLOCK_TAGS}
_TAG_CAT.update({t: 1 for t in SKIP_TAGS})
_TAG_CAT.update({t: 2 for t in BOILER_TAGS})
_TAG_CAT["a"] = 4
_TAG_CAT["br"] = _TAG_CAT["hr"] = 5

# classification thresholds (deterministic; part of EXTRACTOR_VERSION)
MIN_CONTENT_CHARS = 25
MIN_HEADING_CHARS = 8
MAX_LINK_DENSITY = 0.33

# Named extraction profiles — the §2.10 extension surface the reference
# demonstrates with multiple OCR providers behind one factory
# (src/services/service_factory.py:17-92): same parse, different
# deterministic classification thresholds, each with its own pinned
# version string and golden fixtures. "dom-density-strict" is a
# trafilatura-"favor_precision"-style variant: longer minimum blocks,
# tighter link-density, and a minimum text-density (chars per inline tag)
# so tag-fragmented junk drops out.
EXTRACT_PROFILES: dict[str, dict] = {
    "dom-density": dict(
        min_content_chars=MIN_CONTENT_CHARS,
        min_heading_chars=MIN_HEADING_CHARS,
        max_link_density=MAX_LINK_DENSITY,
        min_text_density=0.0,
        version=EXTRACTOR_VERSION,
    ),
    "dom-density-strict": dict(
        min_content_chars=50,
        min_heading_chars=12,
        max_link_density=0.20,
        min_text_density=8.0,
        version="rrx-strict-1",
    ),
}


class _Block:
    __slots__ = ("parts", "link_chars", "tag", "boiler", "n_tags")

    def __init__(self, tag: str, boiler: bool):
        self.parts: list[str] = []
        self.link_chars = 0
        self.tag = tag
        self.boiler = boiler
        self.n_tags = 0


class _BlockParser(HTMLParser):
    """Flatten an HTML document into text blocks with density features."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._skip_depth = 0
        self._boiler_depth = 0
        self._a_depth = 0

    # -- tag events -------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BOILER_TAGS:
            self._flush()
            self._boiler_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            if tag not in ("br", "hr"):
                self._cur = _Block(tag, self._boiler_depth > 0)
        elif self._cur is not None:
            self._cur.n_tags += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS or self._skip_depth:
            return
        if tag in ("br", "hr"):
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in BOILER_TAGS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._cur = _Block("", self._boiler_depth > 0)
        self._cur.parts.append(data)
        if self._a_depth > 0:
            self._cur.link_chars += len(" ".join(data.split()))

    def _flush(self) -> None:
        if self._cur is not None and self._cur.parts:
            self.blocks.append(self._cur)
        self._cur = None

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"          # comments (unterminated → to EOF)
    r"|!\[CDATA\[.*?(?:\]\]>|$)"  # CDATA
    r"|![^>]*>?"                 # doctype / other declarations
    r"|\?[^>]*>?"                # processing instructions
    r"|(/?)([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*?(/?)>"  # open/close/void tags
    r")",
    re.S,
)
# note: textarea IS rawtext here (HTML5) — the stdlib parser leaks form
# contents as data; the one intentional divergence (version rrx-3)
_RAWTEXT_CLOSE = {
    tag: re.compile(rf"</{tag}(?=[\s>/])|</{tag}$", re.I) for tag in
    ("script", "style", "noscript", "template", "textarea", "title")
}


def _fast_events(html: str):
    """Yield ('start'|'end'|'startend', tag) and ('data', text) events from
    a lean regex tokenizer — the same event stream the stdlib
    ``HTMLParser(convert_charrefs=True)`` produces for the constructs this
    extractor consumes, at ~4x the speed (the stdlib parser spends ~85% of
    extraction time in its own scanning machinery — profiled, see git
    history). Raw-text elements (script/style/…) skip straight to their
    closing tag; entities unescape lazily (only when '&' present)."""
    import html as _html

    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            data = html[pos:]
            if data:
                yield ("data", _html.unescape(data) if "&" in data else data)
            break
        if m.start() > pos:
            data = html[pos : m.start()]
            yield ("data", _html.unescape(data) if "&" in data else data)
        closing, tag, selfclose = m.group(1), m.group(2), m.group(3)
        pos = m.end()
        if tag is None:
            continue  # comment/doctype/PI
        tag = tag.lower()
        if closing:
            yield ("end", tag)
        elif selfclose:
            yield ("startend", tag)
        else:
            yield ("start", tag)
            rc = _RAWTEXT_CLOSE.get(tag)
            if rc is not None:
                mc = rc.search(html, pos)
                if mc is None:
                    yield ("end", tag)
                    break
                gt = html.find(">", mc.start())
                pos = (gt + 1) if gt >= 0 else n
                yield ("end", tag)


def _parse_blocks_fast(html: str) -> list[_Block]:
    """Fused tokenizer + block builder: the ``_fast_events`` regex scan
    and the ``_BlockParser`` state machine in ONE loop — no generator
    resumes, no per-event tuple allocation, no handler dispatch (round-4
    perf pass; extraction was 62% of flagship wall). Semantics are
    byte-identical to ``_fast_events`` → ``_BlockParser`` (test-pinned
    against the stdlib path on the whole fixture corpus); ``_fast_events``
    remains as the readable reference implementation."""
    import html as _html

    unescape = _html.unescape
    search = _TAG_RE.search
    cat = _TAG_CAT.get
    blocks: list[_Block] = []
    cur: _Block | None = None
    skip_depth = 0
    boiler_depth = 0
    a_depth = 0
    pos = 0
    n = len(html)
    while pos < n:
        m = search(html, pos)
        if m is None:
            start = end = n
        else:
            start, end = m.span()
        if start > pos and not skip_depth:
            data = html[pos:start]
            if "&" in data:
                data = unescape(data)
            if cur is None and data.strip():
                cur = _Block("", boiler_depth > 0)
            if cur is not None:
                cur.parts.append(data)
                if a_depth > 0:
                    # == len(" ".join(data.split())) without the join
                    # allocation (sum of word lengths + single spaces)
                    w = data.split()
                    if w:
                        cur.link_chars += (
                            sum(map(len, w)) + len(w) - 1
                        )
        if m is None:
            break
        closing, tag, selfclose = m.group(1, 2, 3)
        pos = end
        if tag is None:
            continue  # comment/doctype/PI
        if not tag.islower():  # real-corpus tags are mostly lowercase
            tag = tag.lower()
        c = cat(tag, 0)
        if closing:
            # -- end tag ------------------------------------------------
            if c == 1:  # SKIP
                if skip_depth:
                    skip_depth -= 1
            elif skip_depth:
                pass
            elif c == 2:  # BOILER
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
                if boiler_depth:
                    boiler_depth -= 1
            elif c == 3 or c == 5:  # BLOCK (incl. br/hr)
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
            elif c == 4:  # a
                if a_depth:
                    a_depth -= 1
        elif selfclose:
            # -- self-closing tag ----------------------------------------
            if c == 5 and not skip_depth:  # br/hr
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
        else:
            # -- start tag ----------------------------------------------
            if c == 1:  # SKIP
                skip_depth += 1
            elif skip_depth:
                pass
            elif c == 2:  # BOILER
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
                boiler_depth += 1
            elif c == 3:  # BLOCK
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = _Block(tag, boiler_depth > 0)
            elif c == 5:  # br/hr
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
            elif c == 4:  # a
                a_depth += 1
                if cur is not None:
                    cur.n_tags += 1
            elif cur is not None:
                cur.n_tags += 1
            # rawtext tags are SKIP (script/style/…) or cat-0 (title,
            # textarea) — skip the dict probe for the other categories
            rc = _RAWTEXT_CLOSE.get(tag) if c <= 1 else None
            if rc is not None:
                # raw-text element: skip straight to its closing tag,
                # then apply end-tag semantics for it
                mc = rc.search(html, pos)
                if mc is None:
                    halt = True
                else:
                    gt = html.find(">", mc.start())
                    pos = (gt + 1) if gt >= 0 else n
                    halt = False
                # end-tag semantics (rawtext tags are SKIP or inline;
                # none are BOILER/BLOCK/a)
                if c == 1 and skip_depth:
                    skip_depth -= 1
                if halt:
                    break
    if cur is not None and cur.parts:
        blocks.append(cur)
    return blocks


def _normalize(text: str) -> str:
    """Whitespace-collapse + NFC — the single normalization chosen for the
    byte-identical contract (SURVEY §7.5.1). ASCII fast path: NFC is the
    identity on ASCII, so the (C-level) isascii check skips the unicodedata
    call for the common case without changing any output byte."""
    collapsed = " ".join(text.split())
    if collapsed.isascii():
        return collapsed
    return unicodedata.normalize("NFC", collapsed)


def extract_blocks(
    html: bytes | str, parser_impl: str = "fast", profile: str = "dom-density"
) -> list[dict]:
    """Parse HTML and return all text blocks with density features.

    Returns dicts ``{text, tag, link_density, text_density, is_content}``
    in document order; offsets are assigned later by ``assemble_text``.
    ``parser_impl``: "fast" (fused regex tokenizer + block builder,
    default), "events" (the two-stage ``_fast_events`` → ``_BlockParser``
    pipeline the fused path must match), or "stdlib" (html.parser) —
    identical output on the whole fixture corpus (test-pinned); the
    slower impls are kept as cross-check references.
    ``profile``: an ``EXTRACT_PROFILES`` key selecting the classification
    thresholds (parse is shared; only block classification differs).
    """
    prof = EXTRACT_PROFILES[profile]
    min_content = prof["min_content_chars"]
    min_heading = prof["min_heading_chars"]
    max_link = prof["max_link_density"]
    min_density = prof["min_text_density"]
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    if parser_impl == "fast":
        raw_blocks = _parse_blocks_fast(html)
    elif parser_impl == "events":
        # the readable reference pipeline the fused fast path must match
        parser = _BlockParser()
        for kind, payload in _fast_events(html):
            if kind == "data":
                parser.handle_data(payload)
            elif kind == "start":
                parser.handle_starttag(payload, [])
            elif kind == "end":
                parser.handle_endtag(payload)
            else:  # startend
                parser.handle_startendtag(payload, [])
        parser._flush()
        raw_blocks = parser.blocks
    else:
        parser = _BlockParser()
        parser.feed(html)
        parser.close()
        raw_blocks = parser.blocks

    out: list[dict] = []
    for b in raw_blocks:
        text = _normalize("".join(b.parts))
        if not text:
            continue
        chars = len(text)
        link_density = min(1.0, b.link_chars / chars) if chars else 0.0
        text_density = chars / (1.0 + b.n_tags)
        if b.boiler and b.tag not in HEADING_TAGS:
            # headings are exempt from the boiler-ancestor rule: real page
            # headlines commonly live inside <header> (link density still
            # applies below, so nav headings full of links stay excluded)
            is_content = False
        elif link_density > max_link:
            is_content = False
        elif b.tag in HEADING_TAGS:
            is_content = chars >= min_heading and b.link_chars == 0
        else:
            is_content = chars >= min_content and text_density >= min_density
        out.append(
            {
                "text": text,
                "tag": b.tag,
                "link_density": link_density,
                "text_density": text_density,
                "is_content": is_content,
            }
        )
    return out


def assemble_text(blocks: list[dict]) -> tuple[str, list[dict]]:
    """Join content blocks with "\\n\\n" and assign [start, end) offsets into
    the result. Non-content blocks get offsets (-1, -1)."""
    pieces: list[str] = []
    pos = 0
    enriched: list[dict] = []
    for blk in blocks:
        b = dict(blk)
        if b["is_content"]:
            if pieces:
                pos += 2  # "\n\n"
            b["start"], b["end"] = pos, pos + len(b["text"])
            pos += len(b["text"])
            pieces.append(b["text"])
        else:
            b["start"], b["end"] = -1, -1
        enriched.append(b)
    return "\n\n".join(pieces), enriched


def extract_main_content(
    html: bytes | str, profile: str = "dom-density"
) -> tuple[str, list[dict]]:
    """bytes → (extracted_text, blocks). Deterministic; pure."""
    return assemble_text(extract_blocks(html, profile=profile))


def extract_main_content_strict(html: bytes | str) -> tuple[str, list[dict]]:
    """Strict-density profile (see EXTRACT_PROFILES['dom-density-strict'])."""
    return assemble_text(extract_blocks(html, profile="dom-density-strict"))


BLOCK_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("tag", pa.string()),
        ("link_density", pa.float32()),
        ("text_density", pa.float32()),
        ("is_content", pa.bool_()),
    ]
)


MAX_HTML_BYTES = 16 * 1024 * 1024  # oversize guard (reference analog:
# DocumentProcessor.optimize_for_ocr size gate, document_processor.py:187-222)


def make_extract_batch(
    emit_blocks: bool = False,
    html_col: str = "html",
    max_html_bytes: int = MAX_HTML_BYTES,
    extractor: str = "dom-density",
):
    """Build the extraction batch fn for ``map_batches(batch_format="pyarrow")``.

    Stateless (pure CPU) → runs as elastic Ray tasks, not actors. Failure
    isolation is per row: a parse error yields ``status="failed"`` with an
    empty ``extracted_text`` — never raw html (deviation from the
    reference's write-unmasked-on-failure fallback,
    src/services/deidentification_service.py:334-347; see SURVEY §7.5.4).
    """

    from .content import sniff_content_type
    from .pdfextract import extract_pdf_content

    profile_version = EXTRACT_PROFILES[extractor]["version"]

    def extract_batch(batch: pa.Table) -> pa.Table:
        htmls = batch[html_col].to_pylist()
        texts: list[str] = []
        n_blocks: list[int] = []
        statuses: list[str] = []
        errors: list[str | None] = []
        ctypes: list[str] = []
        blocks_col: list[list[dict]] = []
        for raw in htmls:
            raw = raw or b""
            if len(raw) > max_html_bytes:
                # oversize payloads truncate at a boundary-safe cut rather
                # than OOM-ing a worker; recorded in the error column
                raw = raw[:max_html_bytes]
                oversize = True
            else:
                oversize = False
            ctype = sniff_content_type(raw)
            ctypes.append(ctype)
            try:
                if ctype == "text":
                    # plain-text payload: no DOM walk, same normalization
                    text = _normalize(raw.decode("utf-8", errors="replace"))
                    blocks = (
                        [{"text": text, "start": 0, "end": len(text),
                          "tag": "", "link_density": 0.0,
                          "text_density": float(len(text)),
                          "is_content": True}]
                        if text else []
                    )
                elif ctype == "pdf":
                    # PDF/layout branch: same block schema + assembly,
                    # downstream is format-blind (stages/pdfextract.py)
                    text, blocks = extract_pdf_content(raw)
                elif ctype in ("binary", "empty"):
                    text, blocks = "", []
                else:
                    text, blocks = extract_main_content(raw, profile=extractor)
                texts.append(text)
                n_blocks.append(sum(1 for b in blocks if b["is_content"]))
                statuses.append("ok")
                errors.append("truncated_oversize_html" if oversize else None)
                if emit_blocks:
                    blocks_col.append(
                        [{k: b[k] for k in (
                            "text", "start", "end", "tag",
                            "link_density", "text_density", "is_content")}
                         for b in blocks]
                    )
            except Exception as exc:  # per-row failure isolation
                texts.append("")
                n_blocks.append(0)
                statuses.append("failed")
                errors.append(f"{type(exc).__name__}: {exc}")
                if emit_blocks:
                    blocks_col.append([])

        drop = [html_col]
        cols = [c for c in batch.column_names if c not in drop]
        out = batch.select(cols)
        out = out.append_column("extracted_text", pa.array(texts, pa.string()))
        out = out.append_column(
            "n_chars", pa.array([len(t) for t in texts], pa.int64())
        )
        out = out.append_column("n_blocks", pa.array(n_blocks, pa.int32()))
        out = out.append_column("status", pa.array(statuses, pa.string()))
        out = out.append_column("error", pa.array(errors, pa.string()))
        out = out.append_column("content_type", pa.array(ctypes, pa.string()))
        out = out.append_column(
            "extractor_version",
            pa.array([profile_version] * len(texts), pa.string()),
        )
        if emit_blocks:
            out = out.append_column(
                "blocks", pa.array(blocks_col, pa.list_(BLOCK_STRUCT))
            )
        return out

    return extract_batch
