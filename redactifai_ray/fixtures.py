"""Deterministic synthetic Common-Crawl-style pages (the fixture corpus).

The analog of the reference's seeded mock generators
(``MockOCRService(seed=…)`` sample text + seeded OCR-error injection,
src/services/mock_ocr_service.py:25-46,77-114,186-220), re-targeted to the
``input_hint`` page schema:

    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Every random choice is keyed on ``stable_hash64(url-or-index, seed)`` —
never global RNG state or wall clock — so any row regenerates identically
in any process (FIXTURES.md requirement).

Generated structure per page:
  * main content: heavy-tailed paragraph count, seeded lorem-with-PII
    sentences planting spans our detector vocabulary recognizes (emails,
    phones, SSNs, dates, addresses, ids, person/provider names);
  * boilerplate: nav/header/footer/sidebar link lists + cookie banner —
    what the extractor must strip (high link density / boiler ancestors);
  * noise (~5% of pages): malformed/unclosed tags, HTML entities,
    irregular whitespace (the OCR-error analog);
  * ~2% duplicate urls with newer warc_ts (exercises URL dedup);
  * edge rows: empty html, all-boilerplate html, non-UTF8 bytes, null text.

``text`` is a deliberately noisy plain-text variant of the main content
(whitespace jitter + occasional character substitutions) for the
SpanMatcher alignment path.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa

from .functions.hashing import stable_hash64

BASE_TS = datetime(2024, 1, 1, 0, 0, 0)

WORDS_EN = (
    "the of and to in a is that for it as with on be are this by from or an "
    "have new more data open model system result time work line point world "
    "high small large light public value level national water part found house "
    "great same right study story fact month lot book eye job word business "
    "issue side kind head far black long both little since provide service "
    "around friend once white least learn should never each hand life tell "
    "write becomes better during press close night real almost example"
).split()
WORDS_DE = (
    "der die das und ist von mit auf für ein eine nicht als auch werden bei "
    "einem durch über nach wird sind oder zur beim seit gegen unter anders "
    "heute woche jahr mensch arbeit leben wasser stadt land haus zeit welt"
).split()
WORDS_FR = (
    "le la les de des et un une est dans pour que qui sur avec pas plus par "
    "mais comme tout nous vous leur bien sans peut cette faire monde temps "
    "ville maison travail vie eau terre jour nuit chose femme homme enfant"
).split()

FIRST_NAMES = (
    "Samuel Maria James Linda Robert Susan Michael Karen David Nancy Carlos "
    "Emma Oliver Sophia Liam Ava Noah Isabella Ethan Mia Henry Grace"
).split()
LAST_NAMES = (
    "Grummons Johnson Martinez Smith Brown Davis Wilson Garcia Miller Lopez "
    "Anderson Thomas Taylor Moore Jackson Martin Lee Walker Hall Young"
).split()
STREETS = "Main Oak Elm Park Washington Lake Hill Maple Cedar Pine".split()
STREET_KINDS = ["Street", "Avenue", "Road", "Boulevard"]
CITIES = "Boston Cambridge Somerville Quincy Newton Medford Arlington Waltham".split()

NAV_WORDS = "home about products pricing blog careers contact support docs api team press legal".split()


def url_for(i: int, seed: int = 42) -> str:
    h = stable_hash64(f"u{i}", seed)
    site = h % 1000
    w1 = WORDS_EN[(h >> 10) % len(WORDS_EN)]
    w2 = WORDS_EN[(h >> 20) % len(WORDS_EN)]
    return f"https://site{site}.example/{w1}/{w2}/{i}"


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _pii_fragment(rng: random.Random) -> tuple[str, str]:
    """Return (category, surface form) using the detector's vocabulary."""
    kind = rng.randrange(8)
    if kind == 0:
        first, last = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
        return "Email", f"{first.lower()}.{last.lower()}@example.com"
    if kind == 1:
        return "PhoneNumber", f"({rng.randrange(200, 999)}) {rng.randrange(200, 999)}-{rng.randrange(1000, 9999)}"
    if kind == 2:
        return "PhoneNumber", f"{rng.randrange(200, 999)}-{rng.randrange(200, 999)}-{rng.randrange(1000, 9999)}"
    if kind == 3:
        return "SSN", f"{rng.randrange(100, 899)}-{rng.randrange(10, 99)}-{rng.randrange(1000, 9999)}"
    if kind == 4:
        return "Date", f"{rng.randrange(1, 12)}/{rng.randrange(1, 28)}/{rng.randrange(1950, 2024)}"
    if kind == 5:
        return (
            "Address",
            f"{rng.randrange(1, 999)} {rng.choice(STREETS)} {rng.choice(STREET_KINDS)}, "
            f"{rng.choice(CITIES)}, MA {rng.randrange(10000, 99999)}",
        )
    if kind == 6:
        if rng.random() < 0.5:
            return "Id", f"MRN: {rng.randrange(10 ** 7, 10 ** 8)}"
        return "Id", f"Member ID: ABC{rng.randrange(10 ** 8, 10 ** 9)}"
    first, last = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
    if rng.random() < 0.25:
        return "HealthcareProfessional", f"Dr. {first} {last}"
    return "Person", f"{first} {last}"


def _paragraph(rng: random.Random, words: list[str], plant_pii: bool) -> str:
    sents = [_sentence(rng, words, rng.randrange(8, 22)) for _ in range(rng.randrange(2, 6))]
    if plant_pii:
        _, surface = _pii_fragment(rng)
        idx = rng.randrange(len(sents))
        lead = _sentence(rng, words, rng.randrange(3, 8))[:-1]
        sents[idx] = f"{lead} {surface}."
    return " ".join(sents)


def _nav_block(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>'
        for w in rng.sample(NAV_WORDS, rng.randrange(4, 9))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _footer_block(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(NAV_WORDS, rng.randrange(3, 7))
    )
    return (
        f"<footer><div>{links}</div>"
        f"<p>© 2024 Site{rng.randrange(1000)} Inc. All rights reserved.</p></footer>"
    )


def _sidebar_block(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/tag/{rng.choice(WORDS_EN)}">{rng.choice(WORDS_EN)}</a></li>'
        for _ in range(rng.randrange(3, 8))
    )
    return f"<aside><h3>Tags</h3><ul>{items}</ul></aside>"


def _noisy_text(rng: random.Random, text: str) -> str:
    """Whitespace jitter + seeded char errors (the OCR-error analog,
    reference: mock_ocr_service.py:186-220 S→5, O→0, I→1)."""
    subs = {"S": "5", "O": "0", "I": "1", "l": "1", "G": "6"}
    chars = list(text)
    n_err = max(0, int(len(chars) * 0.002))
    for _ in range(n_err):
        i = rng.randrange(len(chars))
        if chars[i] in subs:
            chars[i] = subs[chars[i]]
    out = "".join(chars)
    if rng.random() < 0.5:
        out = out.replace(". ", ".\n", 3)
    return out


def _paragraph_count(rng: random.Random, scale_cap: int) -> int:
    r = rng.random()
    if r < 0.90:
        return rng.randrange(1, 9)
    if r < 0.985:
        return rng.randrange(9, 41)
    if r < 0.999:
        return rng.randrange(100, 400)
    return rng.randrange(800, max(801, scale_cap))  # ~0.5-3 MB pages


def page_record(i: int, seed: int = 42, scale_cap: int = 3000) -> dict:
    """Deterministically generate page ``i``. Duplicate/edge behavior is a
    pure function of (i, seed)."""
    h = stable_hash64(f"p{i}", seed)
    # ~2% duplicates of an earlier url: same html, newer warc_ts
    if i > 20 and h % 50 == 0:
        src = i - 1 - (h >> 8) % 16
        rec = page_record(src, seed, scale_cap)
        rec["warc_ts"] = rec["warc_ts"] + timedelta(days=30, seconds=i % 86400)
        rec["is_duplicate_of"] = rec["url"]
        return rec

    rng = random.Random(h)
    url = url_for(i, seed)
    warc_ts = BASE_TS + timedelta(seconds=(h >> 16) % (86400 * 365))
    lang_r = rng.random()
    if lang_r < 0.90:
        lang, words = "en", list(WORDS_EN)
    elif lang_r < 0.94:
        lang, words = "de", list(WORDS_DE)
    elif lang_r < 0.97:
        lang, words = "fr", list(WORDS_FR)
    else:
        lang, words = "unknown", list(WORDS_EN)

    mod = i % 97
    if mod == 3:  # empty html
        return {
            "url": url, "warc_ts": warc_ts, "html": b"", "text": None, "lang": lang,
        }
    if mod == 17:  # all boilerplate, nothing extractable
        html = f"<html><body>{_nav_block(rng)}{_footer_block(rng)}</body></html>"
        return {
            "url": url, "warc_ts": warc_ts, "html": html.encode(),
            "text": None, "lang": lang,
        }

    n_paras = _paragraph_count(rng, scale_cap)
    paras = []
    for p in range(n_paras):
        plant = rng.random() < 0.35
        paras.append(_paragraph(rng, words, plant))

    title = _sentence(rng, words, rng.randrange(3, 7))[:-1]
    noisy = rng.random() < 0.05
    body_parts = [_nav_block(rng), f"<header><h1>{title}</h1></header>"]
    if rng.random() < 0.4:
        body_parts.append(_sidebar_block(rng))
    body_parts.append("<article>")
    for p_i, para in enumerate(paras):
        if noisy and p_i % 7 == 3:
            body_parts.append(f"<div><p>{para}<p></div>")  # unclosed <p>
        else:
            body_parts.append(f"<p>{para}</p>")
        if noisy and p_i % 11 == 5:
            body_parts.append("<div>&amp; &#8217;  </div>")
    body_parts.append("</article>")
    body_parts.append('<div class="cookie"><a href="/accept">Accept cookies</a></div>')
    body_parts.append(_footer_block(rng))
    html = "<html><head><title>%s</title><script>var x=1;</script></head><body>%s</body></html>" % (
        title, "".join(body_parts),
    )
    html_bytes = html.encode("utf-8")
    if mod == 31:  # non-UTF8 tail bytes
        html_bytes += b"\xff\xfe trailing"

    main_text = "\n".join([title] + paras)
    text = None if i % 7 == 0 else _noisy_text(rng, main_text)
    return {
        "url": url, "warc_ts": warc_ts, "html": html_bytes, "text": text, "lang": lang,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_table(n: int, seed: int = 42, start: int = 0, scale_cap: int = 3000) -> pa.Table:
    recs = [page_record(i, seed, scale_cap) for i in range(start, start + n)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in recs], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in recs], pa.binary()),
            "text": pa.array([r["text"] for r in recs], pa.string()),
            "lang": pa.array([r["lang"] for r in recs], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def write_pages_parquet(
    out_dir: str,
    n: int,
    seed: int = 42,
    rows_per_file: int = 2000,
    scale_cap: int = 3000,
    parallel: bool = True,
) -> str:
    """Materialize n synthetic pages as a sharded Parquet directory.

    Shards generate in parallel as Ray tasks when a Ray session is up
    (generation is row-keyed → embarrassingly parallel & deterministic);
    falls back to sequential otherwise.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    starts = list(range(0, n, rows_per_file))

    def _shard(start: int) -> tuple[str, pa.Table]:
        cnt = min(rows_per_file, n - start)
        return (f"pages-{start:09d}.parquet", pages_table(cnt, seed, start, scale_cap))

    import ray

    if parallel and ray.is_initialized():
        @ray.remote
        def gen(start: int) -> None:
            name, tbl = _shard(start)
            pq.write_table(tbl, os.path.join(out_dir, name))

        ray.get([gen.remote(s) for s in starts])
    else:
        for s in starts:
            name, tbl = _shard(s)
            pq.write_table(tbl, os.path.join(out_dir, name))
    return out_dir
