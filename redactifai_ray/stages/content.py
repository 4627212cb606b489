"""Content-type sniffing + pattern-file loading (SURVEY §2.2 M12, §2.10).

``sniff_content_type`` re-expresses the reference's DocumentFormat
normalizer (``DocumentFormat.from_string`` / ``to_mime_type``,
src/utils/document_processor.py:25-99) for web payloads: classify raw
bytes as html / plain text / binary so the parse stage can route rows to
the right extractor (Parser-protocol analog, §2.10).

``load_patterns_file`` implements the custom-regex extension surface the
reference documents but ships empty (src/phi_patterns.yaml; schema in
docs/Engineering Specification.md:850-871): a YAML/JSON list of
``{name, regex, category, flags?}`` entries compiled into the detector's
``extra_patterns``.
"""

from __future__ import annotations

import json

HTML_MARKERS = (b"<html", b"<!doctype", b"<head", b"<body", b"<div", b"<p>", b"<article")


def sniff_content_type(raw: bytes) -> str:
    """'html' | 'pdf' | 'text' | 'binary' | 'empty' — cheap deterministic
    sniff. The PDF magic may follow a short junk preamble (the spec
    tolerates it within the first 1024 bytes) — but an HTML marker
    appearing BEFORE the magic wins, so an HTML page merely mentioning
    '%PDF-' in an early script/comment is not misrouted to the PDF
    parser (round-4 ADVICE: that fail-softed to silent content loss)."""
    if not raw:
        return "empty"
    head = raw[:4096]
    pdf_at = head[:1024].find(b"%PDF-")
    if pdf_at >= 0:
        before = head[:pdf_at].lower()
        if not any(m in before for m in HTML_MARKERS):
            return "pdf"
    lowered = head[:512].lstrip()[:256].lower()
    if any(m in lowered for m in HTML_MARKERS) or b"<" in lowered[:64] and b">" in lowered:
        if any(m in head.lower() for m in HTML_MARKERS):
            return "html"
    # binary heuristic: NUL bytes or high ratio of non-UTF8 sequences
    if b"\x00" in head:
        return "binary"
    try:
        head.decode("utf-8")
    except UnicodeDecodeError:
        # tolerate a truncated final multibyte char
        try:
            head[:-4].decode("utf-8")
        except UnicodeDecodeError:
            return "binary"
    if any(m in head.lower() for m in HTML_MARKERS):
        return "html"
    return "text"


def load_patterns_file(path: str) -> dict[str, list[str]]:
    """Load a patterns file → ``{category: [regex, ...]}``.

    Accepts YAML (list of ``{name, regex, category, flags?}`` — the
    reference's documented schema) or JSON of the same shape; also a
    plain mapping ``{category: [regex, ...]}``.
    """
    with open(path) as f:
        raw = f.read()
    data = None
    try:
        import yaml

        data = yaml.safe_load(raw)
    except Exception:
        data = json.loads(raw)
    if data is None:
        return {}
    out: dict[str, list[str]] = {}
    if isinstance(data, dict):
        for cat, pats in data.items():
            out.setdefault(str(cat), []).extend(
                [pats] if isinstance(pats, str) else [str(p) for p in pats]
            )
        return out
    for entry in data:
        cat = entry.get("category") or entry.get("name") or "Custom"
        regex = entry["regex"]
        flags = str(entry.get("flags", "")).lower()
        if "i" in flags and not regex.startswith("(?i)"):
            # detector compiles IGNORECASE already; keep explicit flag inline
            regex = "(?i)" + regex
        out.setdefault(cat, []).append(regex)
    return out
