"""Minimal real PDF text/layout extraction — stdlib only.

The north-star pipeline extracts "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; this module supplies the PDF branch without any
PDF library (none ships in this environment): a genuine small parser for
the text-bearing subset of PDF —

- object/content streams, including ``/FlateDecode`` (zlib IS stdlib);
- ``BT … ET`` text blocks with the text-showing operators ``Tj``,
  ``TJ`` (kerned arrays; a gap below ``TJ_SPACE_GAP`` thousandths of em
  inserts a space, the standard word-break heuristic), ``'`` and ``"``;
- line structure from the positioning operators ``Td``/``TD``/``T*``
  (each starts a new line);
- literal strings with the full escape set (octal, specials, line
  continuations) and hex strings.

Layout heuristic, mirroring the HTML profile: each text LINE becomes a
block, and lines shorter than ``min_content_chars`` (page numbers,
running headers/footers) are classified non-content — the PDF analog of
the DOM walk's text-density gate. Blocks feed the same
``assemble_text`` as HTML, so downstream (detect→mask, offsets, golden
contract) is format-blind.

Not handled (documented, fail-soft to empty text, never an exception
out of the row): encrypted PDFs, CID/Type0 composite fonts (bytes
decode latin-1 — the WinAnsi-ish approximation), object streams
(``/ObjStm``), non-Flate filters.
"""

from __future__ import annotations

import re
import zlib

# a TJ kern gap of ≥ this many thousandths of an em reads as a word break
TJ_SPACE_GAP = 150

_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")

_ESCAPES = {
    ord("n"): "\n",
    ord("r"): "\r",
    ord("t"): "\t",
    ord("b"): "\b",
    ord("f"): "\f",
    ord("("): "(",
    ord(")"): ")",
    ord("\\"): "\\",
}


def _decode_streams(raw: bytes) -> list[bytes]:
    """All stream payloads, Flate-decompressed when the preceding object
    dict says so; undecodable streams are skipped, not fatal.

    Payload bounds come from the dict's direct ``/Length`` when it
    verifies (``endstream`` right after), because compressed bytes can
    themselves contain ``\\nendstream`` or end in ``\\r`` — a naive
    regex scan mis-bounds those (round-4 hypothesis find). Without a
    usable /Length, Flate streams self-terminate via
    ``zlib.decompressobj`` and raw streams scan to the next
    ``endstream`` with one trailing EOL stripped."""
    out = []
    pos = 0
    n = len(raw)
    while True:
        m = _STREAM_START_RE.search(raw, pos)
        if m is None:
            break
        start = m.end()
        head = raw[max(0, m.start() - 400) : m.start()]
        flate = b"/FlateDecode" in head
        payload = None
        end = start
        lm = None
        for cand in _LENGTH_RE.finditer(head):
            lm = cand  # last /Length before `stream` = the owning dict
        if lm is not None:
            ln = int(lm.group(1))
            if start + ln <= n and re.match(
                rb"\s*endstream", raw[start + ln : start + ln + 12]
            ):
                payload = raw[start : start + ln]
                end = start + ln
        if payload is None and not flate:
            e = raw.find(b"endstream", start)
            if e < 0:
                break
            payload = raw[start:e]
            if payload.endswith(b"\r\n"):
                payload = payload[:-2]
            elif payload.endswith((b"\n", b"\r")):
                payload = payload[:-1]
            end = e
        if flate:
            decoded = None
            if payload is not None:
                try:
                    decoded = zlib.decompress(payload)
                except zlib.error:
                    decoded = None
            if decoded is None:
                # zlib streams are self-terminating: decode from the
                # stream start and let zlib find its own end
                d = zlib.decompressobj()
                try:
                    decoded = d.decompress(raw[start:])
                    end = n - len(d.unused_data)
                except zlib.error:
                    pos = start + 1
                    continue
            payload = decoded
        out.append(payload)
        pos = max(end, start + 1)
    return out


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the '('; returns
    (text, index after the closing paren). Handles nesting + escapes."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    assert data[i : i + 1] == b"<"
    j = data.find(b">", i + 1)
    if j < 0:
        return "", len(data)
    hx = re.sub(rb"\s", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _lines_of_stream(data: bytes) -> list[list[str]]:
    """Per-``BT``-block line groups from one content stream: the outer
    list has one entry per BT…ET block, the inner list its text lines.
    Grouping matters for layout: a BT block is the operator-level
    paragraph unit, and its internal ``Td`` line breaks are typography
    (wrapping), not structure.

    One linear tokenization pass over the stream: string literals, hex
    strings and TJ arrays are consumed by the same parsers everywhere,
    so ``BT``/``ET`` are recognized only as standalone operator tokens
    — an "ET" inside ``(BUDGET)`` or ``(ET AL.)`` can never terminate
    a block (the round-3 truncation bug)."""
    groups: list[list[str]] = []
    lines: list[str] = []
    cur: list[str] = []
    pend: list[str] = []  # operands (strings) awaiting an operator
    in_bt = False
    i = 0
    n = len(data)

    def flush_line():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def close_block():
        nonlocal lines
        cur.extend(pend)
        pend.clear()
        flush_line()
        if lines:
            groups.append(lines)
        lines = []

    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            s, i = _parse_literal(data, i)
            if in_bt:
                pend.append(s)
        elif c == b"<" and data[i : i + 2] != b"<<":
            s, i = _parse_hex(data, i)
            if in_bt:
                pend.append(s)
        elif c == b"[":
            # TJ array: strings interleaved with kern numbers
            j = i + 1
            parts: list[str] = []
            while j < n and data[j : j + 1] != b"]":
                cj = data[j : j + 1]
                if cj == b"(":
                    s, j = _parse_literal(data, j)
                    parts.append(s)
                elif cj == b"<":
                    s, j = _parse_hex(data, j)
                    parts.append(s)
                else:
                    num = _NUM_RE.match(data, j)
                    if num:
                        if float(num.group()) <= -TJ_SPACE_GAP:
                            parts.append(" ")
                        j = num.end()
                    else:
                        j += 1
            if in_bt:
                pend.append("".join(parts))
            i = j + 1
        else:
            op = _OP_RE.match(data, i)
            if op:
                o = op.group()
                if o == b"BT":
                    if in_bt:  # malformed: unterminated prior block
                        close_block()
                    in_bt = True
                elif o == b"ET":
                    if in_bt:
                        close_block()
                        in_bt = False
                elif in_bt:
                    if o in (b"Td", b"TD", b"T*"):
                        flush_line()
                    elif o == b"Tj" or o == b"TJ":
                        cur.extend(pend)
                        pend.clear()
                    elif o in (b"'", b'"'):
                        flush_line()
                        cur.extend(pend)
                        pend.clear()
                i = op.end()
            else:
                i += 1
    if in_bt:  # missing ET: keep what was shown (fail-soft)
        close_block()
    return groups


def pdf_text_blocks(raw: bytes, min_content_chars: int = 25) -> list[dict]:
    """PDF bytes → block dicts in the extract-stage schema. One block
    per ``BT`` text block: its internal line breaks are typographic
    wrapping, so the lines re-join with spaces into one paragraph (the
    standard line-merge heuristic of PDF text extraction); short
    paragraphs (page numbers, running headers) classify non-content —
    the layout analog of the DOM walk's density gate."""
    from .extract import _normalize

    blocks = []
    for stream in _decode_streams(raw):
        if b"BT" not in stream:
            continue
        for group in _lines_of_stream(stream):
            text = _normalize(" ".join(group))
            if not text:
                continue
            blocks.append(
                {
                    "text": text,
                    "tag": "pdfpara",
                    "link_density": 0.0,
                    "text_density": float(len(text)),
                    "is_content": len(text) >= min_content_chars,
                }
            )
    return blocks


def extract_pdf_content(raw: bytes) -> tuple[str, list[dict]]:
    """bytes → (extracted_text, blocks); same contract and assembly as
    ``extract.extract_main_content`` so downstream is format-blind."""
    from .extract import assemble_text

    return assemble_text(pdf_text_blocks(raw))


def build_pdf(
    paragraphs: list[str],
    compress: bool = False,
    header_footer: str | None = None,
) -> bytes:
    """Deterministic minimal one-page PDF builder (test/fixture producer
    — the PDF analog of ``fixtures.write_pages_parquet``'s HTML). Each
    paragraph renders as one ``BT``…``ET`` block with a ``Td`` line per
    60-char wrap; ``header_footer`` adds a short running line (which the
    layout gate should classify non-content)."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def wrap(s: str, width: int = 60) -> list[str]:
        # word-boundary wrap, like a text layout engine
        out, cur = [], ""
        for w in s.split():
            cand = f"{cur} {w}".strip()
            if len(cand) > width and cur:
                out.append(cur)
                cur = w
            else:
                cur = cand
        if cur:
            out.append(cur)
        return out or [""]

    ops: list[str] = []
    y = 760
    if header_footer:
        ops.append(
            f"BT /F1 9 Tf 40 {y} Td ({esc(header_footer)}) Tj ET"
        )
        y -= 24
    for para in paragraphs:
        lines = wrap(para)
        body = f"BT /F1 11 Tf 40 {y} Td ({esc(lines[0])}) Tj"
        for ln in lines[1:]:
            body += f" 0 -14 Td ({esc(ln)}) Tj"
        body += " ET"
        ops.append(body)
        y -= 14 * len(lines) + 10
    content = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref)
    )
    return bytes(out)
