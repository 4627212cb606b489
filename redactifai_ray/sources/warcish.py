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

Scale shape: ``read_warcish`` assigns one read task per archive — the
ingest parallelism equals the archive count, exactly like real WARC
processing (CC publishes ~64k archives per crawl, far more than cluster
cores, so per-file tasks saturate). For the few-huge-archives layout,
``read_warcish_split`` uses the ``.idx`` record-offset sidecar (CC's
cdx analog, written alongside every archive) to fan ONE archive out
into byte-range tasks.

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
        write_warcish_index(path)
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
    raw = ray.data.read_binary_files(
        path, include_paths=True,
        file_extensions=["warcish"],  # never ingest .idx sidecars as data
        **kwargs,
    )

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


# ------------------------------------------------------- index + ranged read


def write_warcish_index(archive_path: str) -> str:
    """Write the ``.idx`` sidecar for one archive: little-endian u64
    byte offsets, one per record (the cdx analog — what makes a huge
    archive splittable mid-file). ``write_warcish`` calls this for every
    archive it writes; run it once over legacy archives to retrofit."""
    offsets = []
    with open(archive_path, "rb") as f:
        blob = f.read()
    off, n = 0, len(blob)
    while off < n:
        if blob[off : off + 2] != _MAGIC:
            raise ValueError(f"corrupt record at {off} in {archive_path!r}")
        offsets.append(off)
        off += 2
        (url_len,) = struct.unpack_from("<I", blob, off)
        off += 4 + url_len
        off += 8  # ts
        (lang_len,) = struct.unpack_from("<H", blob, off)
        off += 2 + lang_len
        (html_len,) = struct.unpack_from("<I", blob, off)
        off += 4 + html_len
    idx_path = archive_path + ".idx"
    with open(idx_path, "wb") as f:
        f.write(struct.pack(f"<{len(offsets)}Q", *offsets))
    return idx_path


def _read_index(idx_path: str) -> list[int]:
    raw = open(idx_path, "rb").read()
    return list(struct.unpack(f"<{len(raw) // 8}Q", raw))


def read_warcish_split(
    path: str,
    records_per_task: int = 1000,
) -> ray.data.Dataset:
    """Mid-archive-splittable warcish reader: each ``.idx``-indexed
    archive fans out into byte-range tasks of ``records_per_task``
    records, so ONE huge archive parallelizes across the cluster (the
    limitation :func:`read_warcish` documents). Archives without a
    sidecar fall back to one task.

    Shape: the driver builds a tiny (path, start_byte, end_byte) task
    table from the sidecars alone (8 B/record read, no archive bytes);
    ``from_items`` of that table drives the parallel parse — each task
    reads ONLY its byte slice. Requires worker-visible storage paths
    (shared fs / object store), like every distributed file read."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        archives = sorted(_glob.glob(_os.path.join(path, "*.warcish")))
    else:
        archives = [path]
    tasks = []
    for a in archives:
        size = _os.path.getsize(a)
        idx = a + ".idx"
        if _os.path.exists(idx):
            offs = _read_index(idx)
            for s in range(0, len(offs), records_per_task):
                start = offs[s]
                end = (
                    offs[s + records_per_task]
                    if s + records_per_task < len(offs)
                    else size
                )
                tasks.append({"path": a, "start": start, "end": end})
        else:
            tasks.append({"path": a, "start": 0, "end": size})

    def parse_slice(batch: pa.Table) -> pa.Table:
        tables = []
        for p, s, e in zip(
            batch["path"].to_pylist(),
            batch["start"].to_pylist(),
            batch["end"].to_pylist(),
        ):
            with open(p, "rb") as f:
                f.seek(s)
                blob = f.read(e - s)
            tables.append(parse_warcish(blob, f"{p}[{s}:{e}]"))
        return pa.concat_tables(tables) if tables else parse_warcish(b"")

    return ray.data.from_items(tasks).map_batches(
        parse_slice, batch_format="pyarrow", batch_size=1
    )
