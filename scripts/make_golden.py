"""Regenerate the committed golden fixture table (tests/golden/golden.parquet).

Run ONLY on an intentional extractor/detector version bump (the analog of
the reference's frozen seeded-mock expectations). The test suite asserts
byte-identical ``extracted_text`` / ``masked_text`` per url against this
file (BASELINE.json per-row invariant).

    python scripts/make_golden.py
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redactifai_ray import EXTRACTOR_VERSION
from redactifai_ray.fixtures import page_record
from redactifai_ray.functions.mask import mask_text
from redactifai_ray.stages.detect import SPAN_STRUCT, SpanDetector
from redactifai_ray.stages.extract import EXTRACT_PROFILES, extract_main_content

N_GOLDEN = 200
SEED = 42


def main(profile: str = "dom-density", out_name: str = "golden.parquet") -> None:
    version = EXTRACT_PROFILES[profile]["version"]
    det = SpanDetector()
    rows = {
        "url": [], "extracted_text": [], "masked_text": [], "spans": [],
        "span_count": [], "extractor_version": [],
    }
    seen = set()
    for i in range(N_GOLDEN):
        rec = page_record(i, SEED)
        if rec["url"] in seen:  # duplicates extract identically; keep first
            continue
        seen.add(rec["url"])
        text, _ = extract_main_content(rec["html"], profile=profile)
        spans = det.detect(text)
        masked, merged = mask_text(text, spans)
        rows["url"].append(rec["url"])
        rows["extracted_text"].append(text)
        rows["masked_text"].append(masked)
        rows["spans"].append(spans)
        rows["span_count"].append(len(merged))
        rows["extractor_version"].append(version)

    table = pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "extracted_text": pa.array(rows["extracted_text"], pa.string()),
            "masked_text": pa.array(rows["masked_text"], pa.string()),
            "spans": pa.array(rows["spans"], pa.list_(SPAN_STRUCT)),
            "span_count": pa.array(rows["span_count"], pa.int32()),
            "extractor_version": pa.array(rows["extractor_version"], pa.string()),
        }
    )
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, os.path.join(out, out_name))
    print(f"wrote {table.num_rows} golden rows to {out_name} (extractor {version})")


if __name__ == "__main__":
    main()
    main(profile="dom-density-strict", out_name="golden_strict.parquet")
