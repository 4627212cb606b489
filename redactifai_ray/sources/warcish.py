"""A WARC-like multi-record container source.

Common Crawl ships crawls as a few thousand huge archive files, each a
concatenation of per-page records — not as Parquet. This module gives the
engine that ingestion shape without any WARC library: a minimal
length-prefixed binary container ("warcish") with one record per page,
plus a Ray Data reader that turns a directory of such archives into the
engine's canonical pages schema ``(url, warc_ts, html, lang)``.

Format (little-endian, per record, concatenated with no framing between
records — mirrors WARC's "just keep reading records" layout):

    magic   2s   = b"WR"
    url_len u32 | url utf-8 bytes
    ts_us   i64  (epoch microseconds)
    lang_len u16 | lang utf-8 bytes
    html_len u32 | html bytes

Scale shape: ``ray.data.read_binary_files`` assigns one read task per
archive, and each task parses its archive into record rows in a single
pass — the ingest parallelism equals the archive count, exactly like
real WARC processing (CC publishes ~64k archives per crawl, far more
than cluster cores, so per-file tasks saturate). A mid-file split would
need a record index sidecar (CC's cdx role); documented, not
implemented — archives are written bounded (``records_per_file``) so a
file is one sensible task.

Reference analog: the TIFF-loader source (SURVEY §2.1 S1,
``src/services/image_loading_service.py``) — bytes-in, structured
rows out.
"""

from __future__ import annotations

import os
import struct

import pyarrow as pa
import ray.data

_MAGIC = b"WR"


def write_warcish(
    out_dir: str,
    rows: list[dict],
    records_per_file: int = 1000,
    prefix: str = "crawl",
) -> list[str]:
    """Write rows (dicts with url/warc_ts(us int)/lang/html(bytes)) as
    warcish archives. Test/fixture producer — real crawls arrive in this
    shape already."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi in range(0, len(rows), records_per_file):
        path = os.path.join(
            out_dir, f"{prefix}-{fi // records_per_file:05d}.warcish"
        )
        with open(path, "wb") as f:
            for r in rows[fi : fi + records_per_file]:
                url = r["url"].encode("utf-8")
                lang = (r.get("lang") or "unknown").encode("utf-8")
                html = r["html"]
                if isinstance(html, str):
                    html = html.encode("utf-8")
                f.write(_MAGIC)
                f.write(struct.pack("<I", len(url)))
                f.write(url)
                f.write(struct.pack("<q", int(r["warc_ts"])))
                f.write(struct.pack("<H", len(lang)))
                f.write(lang)
                f.write(struct.pack("<I", len(html)))
                f.write(html)
        paths.append(path)
    return paths


def parse_warcish(blob: bytes, source_path: str = "") -> pa.Table:
    """One archive blob → a pages-schema Arrow table. Raises ValueError
    on a corrupt record boundary (fail the task, not silently truncate —
    W2's failure-isolation doctrine applies at the partition level)."""
    urls, tss, langs, htmls = [], [], [], []
    off, n = 0, len(blob)
    while off < n:
        if blob[off : off + 2] != _MAGIC:
            raise ValueError(
                f"corrupt warcish record at offset {off} in {source_path!r}"
            )
        off += 2
        (url_len,) = struct.unpack_from("<I", blob, off)
        off += 4
        url = blob[off : off + url_len].decode("utf-8")
        off += url_len
        (ts,) = struct.unpack_from("<q", blob, off)
        off += 8
        (lang_len,) = struct.unpack_from("<H", blob, off)
        off += 2
        lang = blob[off : off + lang_len].decode("utf-8")
        off += lang_len
        (html_len,) = struct.unpack_from("<I", blob, off)
        off += 4
        if off + html_len > n:
            raise ValueError(
                f"truncated warcish record at offset {off} in {source_path!r}"
            )
        html = blob[off : off + html_len]
        off += html_len
        urls.append(url)
        tss.append(ts)
        langs.append(lang)
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_warcish(path: str, **kwargs) -> ray.data.Dataset:
    """Directory (or file list) of warcish archives → pages Dataset.

    One read task per archive; each task's parse is a single linear pass
    emitting one Arrow block. Feed the result straight into
    ``make_extract_batch`` — the schema matches ``read_pages`` (minus the
    crawl-provided ``text`` column, which the extractor derives anyway)."""
    raw = ray.data.read_binary_files(path, include_paths=True, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_warcish(blob, p)
            for blob, p in zip(
                batch["bytes"].to_pylist(), batch["path"].to_pylist()
            )
        ]
        if not tables:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "warc_ts": pa.array([], pa.timestamp("us")),
                    "html": pa.array([], pa.binary()),
                    "lang": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(tables)

    return raw.map_batches(parse, batch_format="pyarrow")
