"""redactifai_ray — a Ray-Data-native PII detect-and-mask engine for webtext.

A from-scratch re-imagination of the capabilities of ssgrummons/RedactifAI
(reference at /root/reference, cited by file:line in docstrings), re-targeted
from TIFF/OCR medical documents to Common-Crawl-style web pages:

    read_parquet(pages) -> map_batches(extract_main_content)    # DOM walk
      -> dedup(url) -> size-bucket -> map_batches(Detector)     # actor pool
      -> map_batches(merge + mask) -> write_parquet(out, spans, lineage)

Everything is expressed over ``ray.data.Dataset`` with zero-copy Arrow
batches; no code is ported from the reference.
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "rrx-4"  # rrx-4: PDF BT/ET tokenizer + stream-bounds fixes
