"""SpanMatcher — fuzzy re-location of detected spans onto a canonical text.

This re-expresses the reference's crown-jewel component, the
``EntityMatcher`` (src/services/entity_matcher.py), in pure span land.
There, PHI entities carry character offsets into OCR ``full_text`` and must
be matched to OCR *words* (which may disagree with ``full_text`` because of
OCR errors) to produce pixel mask regions. Here, spans detected over one
text variant (e.g. the crawl-provided ``text`` column) must be re-located
onto the canonical ``extracted_text`` to produce character mask intervals.

Semantics ported behavior-for-behavior (each pinned by tests mirroring
tests/unit/test_entity_matcher.py):

  * offset map construction: walk the text, skip whitespace, locate each
    word exactly or fuzzily and record its [start, end) interval; unfound
    words are skipped (entity_matcher.py:138-203);
  * word location: exact prefix match first, else candidate lengths
    ``len(word) ± 2`` inside a ``len(word) + 5`` window accepted at
    Levenshtein distance <= ``fuzzy_match_threshold`` (default 2), skipping
    all-whitespace candidates (entity_matcher.py:205-253);
  * span -> words: half-open interval-overlap join against the offset map,
    then validation — combined matched-word text must be within
    ``max(len(entity)//3, threshold)`` edit distance of the span text
    (case-insensitive) or the match is rejected (entity_matcher.py:255-299);
  * fallback content search: only if the span text occurs in the target
    text (case-insensitive); spans shorter than 3 chars never fuzzy-search;
    match the span's words as a consecutive sequence (exact, or distance
    <= 1 for words of >= 3 chars); first match wins, then stop
    (entity_matcher.py:311-372);
  * merge: matched words group by ``group`` (the page analog) and each
    group merges to one interval min(start)-pad .. max(end)+pad, clamped at
    0 (entity_matcher.py:374-442; padding default 0 chars vs 5 px).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .spans import sort_spans
from .textdist import levenshtein


@dataclass
class WordSpan:
    """A source word located in the target text (reference: WordOffset,
    entity_matcher.py:25-45)."""

    text: str
    start: int
    end: int
    group: int = 0

    def overlaps_range(self, start: int, end: int) -> bool:
        return not (self.end <= start or end <= self.start)


class SpanMatcher:
    def __init__(
        self,
        fuzzy_match_threshold: int = 2,
        confidence_threshold: float = 0.0,
        pad_chars: int = 0,
        resync_window: int = 200,
    ):
        self.fuzzy_match_threshold = fuzzy_match_threshold
        self.confidence_threshold = confidence_threshold
        self.pad_chars = pad_chars
        # webtext robustness extension (not in the reference): when a word
        # is unlocatable at the cursor, look for its next EXACT occurrence
        # within this many chars and jump there. The reference skips the
        # word with the cursor unchanged (entity_matcher.py:194-201) —
        # which, after a single mis-length fuzzy match, leaves the cursor
        # stuck mid-word and silently kills the rest of the alignment on
        # long documents. Resync only fires where the reference would have
        # dropped the word, so every test-pinned behavior is preserved;
        # set 0 to disable (strict reference semantics).
        self.resync_window = resync_window

    # -- offset map -------------------------------------------------------

    def build_offset_map(
        self, words: list[str], text: str, groups: Optional[list[int]] = None
    ) -> list[WordSpan]:
        """Align ``words`` (in order) to ``text``; skip unlocatable words."""
        offset_map: list[WordSpan] = []
        cursor = 0
        for idx, raw in enumerate(words):
            word = raw.strip()
            if not word:
                continue
            while cursor < len(text) and text[cursor].isspace():
                cursor += 1
            if cursor >= len(text):
                break
            found = self._find_word_in_text(text, word, cursor)
            if found is None and self.resync_window and len(word) >= 3:
                j = text.find(word, cursor + 1, cursor + self.resync_window)
                if j >= 0:
                    found = (j, len(word))
            if found is not None:
                start, length = found
                offset_map.append(
                    WordSpan(
                        text=word,
                        start=start,
                        end=start + length,
                        group=groups[idx] if groups else 0,
                    )
                )
                cursor = start + length
            # unfound word: skip it, keep the cursor (reference :194-201)
        return offset_map

    def _find_word_in_text(
        self, text: str, word: str, start: int
    ) -> Optional[tuple[int, int]]:
        if not word:
            return None
        wlen = len(word)
        if text.startswith(word, start):
            return start, wlen
        window = min(wlen + 5, len(text) - start)
        if window > 0:
            sub = text[start : start + window]
            for length in range(max(1, wlen - 2), min(len(sub), wlen + 3)):
                candidate = sub[:length]
                if not candidate.strip():
                    continue
                if levenshtein(word, candidate, self.fuzzy_match_threshold) <= self.fuzzy_match_threshold:
                    return start, length
        return None

    # -- span matching ----------------------------------------------------

    def match(self, words_or_map, text: str, spans: list[dict]) -> list[dict]:
        """Re-locate ``spans`` (dicts per functions.spans) onto ``text``.

        ``words_or_map`` is either a list of word strings or a prebuilt
        ``list[WordSpan]``. Returns located spans (possibly several per
        input span — one per word group), sorted by start; unmatched spans
        are dropped (the reference logs and skips, entity_matcher.py:128-134).
        """
        if words_or_map and isinstance(words_or_map[0], WordSpan):
            offset_map = words_or_map
        else:
            offset_map = self.build_offset_map(list(words_or_map), text)

        located: list[dict] = []
        # k-th span with an identical surface takes the k-th matching
        # sequence in the fallback search: first-match-only per instance
        # (reference :423-466 pins first-match for a single span; with
        # several instances of one surface, mapping them all to occurrence
        # #1 would leave later occurrences unmasked)
        fallback_counts: dict[str, int] = {}
        for span in sort_spans(spans):
            if span["confidence"] < self.confidence_threshold:
                continue
            matched = self._find_overlapping_words(
                span, offset_map, text, fallback_counts
            )
            if not matched:
                continue
            by_group: dict[int, list[WordSpan]] = {}
            for w in matched:
                by_group.setdefault(w.group, []).append(w)
            for group in sorted(by_group):
                ws = by_group[group]
                start = max(0, min(w.start for w in ws) - self.pad_chars)
                end = min(len(text), max(w.end for w in ws) + self.pad_chars)
                located.append(
                    {
                        "start": start,
                        "end": end,
                        "category": span["category"],
                        "subcategory": span.get("subcategory", ""),
                        "confidence": span["confidence"],
                        "text": text[start:end],
                        "group": group,
                    }
                )
        located.sort(key=lambda s: (s["start"], s["end"], s["category"]))
        return located

    def _find_overlapping_words(
        self,
        span: dict,
        offset_map: list[WordSpan],
        text: str,
        fallback_counts: Optional[dict] = None,
    ) -> list[WordSpan]:
        overlapping = [
            w for w in offset_map if w.overlaps_range(span["start"], span["end"])
        ]
        if overlapping:
            combined = " ".join(w.text for w in overlapping)
            span_text = span["text"].strip()
            max_distance = max(len(span_text) // 3, self.fuzzy_match_threshold)
            if levenshtein(combined.lower(), span_text.lower(), max_distance) > max_distance:
                overlapping = []
        if not overlapping and span["text"].lower() in text.lower():
            skip = 0
            if fallback_counts is not None:
                key = span["text"].strip().lower()
                skip = fallback_counts.get(key, 0)
                fallback_counts[key] = skip + 1
            overlapping = self._fuzzy_search(span, offset_map, skip)
        return overlapping

    def _fuzzy_search(
        self, span: dict, offset_map: list[WordSpan], skip: int = 0
    ) -> list[WordSpan]:
        span_text = span["text"].strip().lower()
        if len(span_text) < 3:
            return []
        span_words = span_text.split()
        i = 0
        while i < len(offset_map):
            matched: list[WordSpan] = []
            for j, sw in enumerate(span_words):
                if i + j >= len(offset_map):
                    break
                ow = offset_map[i + j].text.strip().lower()
                if ow == sw:
                    matched.append(offset_map[i + j])
                elif len(sw) >= 3 and levenshtein(ow, sw, 1) <= 1:
                    matched.append(offset_map[i + j])
                else:
                    break
            if len(matched) == len(span_words):
                if skip == 0:
                    return matched  # first (unclaimed) match only (:370)
                skip -= 1
                i += len(span_words)  # jump past the claimed occurrence
                continue
            i += 1
        return []
