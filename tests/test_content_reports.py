"""Tests: content sniffing, patterns-file loading, report/read APIs,
raw-HTML-file source."""

import json
import os

import pytest

from redactifai_ray.stages.content import load_patterns_file, sniff_content_type


class TestSniff:
    def test_html(self):
        assert sniff_content_type(b"<!DOCTYPE html><html><body>x</body></html>") == "html"

    def test_html_fragment(self):
        assert sniff_content_type(b"  <div class='a'><p>hello</p></div>") == "html"

    def test_plain_text(self):
        assert sniff_content_type(b"just some plain prose with no markup at all") == "text"

    def test_binary(self):
        assert sniff_content_type(b"\x00\x01\x02\xff binary blob") == "binary"

    def test_non_utf8(self):
        assert sniff_content_type(b"\xff\xfe\xfa\xf0\x99\x88" * 20) == "binary"

    def test_empty(self):
        assert sniff_content_type(b"") == "empty"

    def test_pdf_magic_with_junk_preamble(self):
        assert sniff_content_type(b"junk\n%PDF-1.4\n1 0 obj") == "pdf"

    def test_html_mentioning_pdf_magic_stays_html(self):
        """Round-4 ADVICE regression: an HTML page whose early script/
        comment contains the literal '%PDF-' must not be misrouted to
        the PDF parser (which fail-softs to empty text)."""
        raw = (
            b"<!DOCTYPE html><html><head><script>var magic='%PDF-1.7';"
            b"</script></head><body><p>real content</p></body></html>"
        )
        assert sniff_content_type(raw) == "html"


class TestPatternsFile:
    def test_yaml_reference_schema(self, tmp_path):
        p = tmp_path / "patterns.yaml"
        p.write_text(
            "- name: uk_nino\n"
            "  regex: '[A-Z]{2}[0-9]{6}[A-Z]'\n"
            "  category: NationalId\n"
            "- name: url\n"
            "  regex: 'https?://\\S+'\n"
            "  category: Url\n"
            "  flags: i\n"
        )
        out = load_patterns_file(str(p))
        assert out["NationalId"] == ["[A-Z]{2}[0-9]{6}[A-Z]"]
        assert out["Url"] == ["(?i)https?://\\S+"]

    def test_json_mapping(self, tmp_path):
        p = tmp_path / "patterns.json"
        p.write_text(json.dumps({"Url": ["https?://\\S+"]}))
        assert load_patterns_file(str(p)) == {"Url": ["https?://\\S+"]}

    def test_patterns_flow_into_detector(self, tmp_path):
        from redactifai_ray.stages.detect import SpanDetector

        p = tmp_path / "patterns.yaml"
        p.write_text("- name: u\n  regex: 'https?://\\S+'\n  category: Url\n")
        det = SpanDetector(extra_patterns=load_patterns_file(str(p)))
        out = det.detect("see https://example.com now")
        assert any(s["category"] == "Url" for s in out)


class TestReports:
    @pytest.fixture(scope="class")
    def out_ds(self, ray_session):
        from redactifai_ray.fixtures import write_pages_parquet
        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
        )

        corpus = "/tmp/rrx_test_corpus"
        import glob

        if not glob.glob(os.path.join(corpus, "*.parquet")):
            write_pages_parquet(corpus, 300, rows_per_file=100)
        return finalize_output(build_deidentify_pipeline(corpus)).materialize()

    def test_job_report(self, out_ds):
        from redactifai_ray.pipelines.reports import job_report

        rep = job_report(out_ds)
        assert rep["n_pages"] > 0
        assert rep["n_spans"] > 0
        assert rep["by_status"].get("ok", 0) > 0

    def test_recent_pages(self, out_ds):
        from redactifai_ray.pipelines.reports import recent_pages

        df = recent_pages(out_ds, k=5)
        assert len(df) == 5
        assert df["warc_ts"].is_monotonic_decreasing

    def test_sample_seeded(self, out_ds):
        from redactifai_ray.pipelines.reports import sample_for_qa

        a = sorted(sample_for_qa(out_ds, 0.1, seed=7).to_pandas()["url"])
        b = sorted(sample_for_qa(out_ds, 0.1, seed=7).to_pandas()["url"])
        assert a == b and len(a) > 0

    def test_page_status_and_lineage(self, out_ds, tmp_path, ray_session):
        from redactifai_ray.pipelines.reports import lineage_report, page_status

        out_root = str(tmp_path / "out")
        os.makedirs(os.path.join(out_root, "pages"))
        out_ds.write_parquet(os.path.join(out_root, "pages"))
        from redactifai_ray.state.lineage import write_manifest

        write_manifest(out_root, {"partition_id": "000000", "status": "complete"})
        url = out_ds.take(1)[0]["url"]
        row = page_status(out_root, url)
        assert row and row["url"] == url
        lr = lineage_report(out_root)
        assert len(lr) == 1 and lr.iloc[0]["status"] == "complete"

    def test_page_status_missing(self, tmp_path):
        from redactifai_ray.pipelines.reports import page_status

        assert page_status(str(tmp_path), "nope") is None


class TestHtmlFileSource:
    def test_read_html_dir(self, ray_session, tmp_path):
        from redactifai_ray.pipelines.deidentify import (
            build_deidentify_pipeline,
            finalize_output,
        )
        from redactifai_ray.sources.pages import read_pages_from_html_files

        d = tmp_path / "html"
        d.mkdir()
        for i in range(3):
            (d / f"page{i}.html").write_text(
                f"<html><body><p>Document {i} body with enough words to be "
                f"extracted as content. Contact a{i}@b.co today.</p></body></html>"
            )
        ds = read_pages_from_html_files(str(d))
        out = finalize_output(
            build_deidentify_pipeline(ds, dedup=False)
        ).to_pandas()
        assert len(out) == 3
        assert out["masked_text"].str.contains("EMAIL", regex=False).all()
        assert out["url"].str.startswith("file://").all()
