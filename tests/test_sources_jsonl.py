"""S1 alternate source format: JSONL pages ingest round-trip.

The canonical input is parquet; a Common-Crawl-style JSONL export must
land in the SAME PAGES schema byte-identically (html included), with
malformed lines quarantined — never dropped silently, never fatal.
"""

import base64
import json

from kgp import schemas
from kgp.operators.sources import read_pages_jsonl
from kgp.synth import synth_pages_pdf


def _write_jsonl(path, pdf, extra_lines=()):
    with open(path, "w") as f:
        for _, r in pdf.iterrows():
            f.write(
                json.dumps(
                    {
                        "url": r["url"],
                        "warc_ts": r["warc_ts"].isoformat(),
                        "html_b64": base64.b64encode(
                            bytes(r["html"])
                        ).decode(),
                        "text": r["text"],
                        "lang": r["lang"],
                    }
                )
                + "\n"
            )
        for line in extra_lines:
            f.write(line + "\n")


def test_jsonl_roundtrip_byte_identical(spark, tmp_path):
    pdf = synth_pages_pdf(25)
    p = str(tmp_path / "pages.jsonl")
    _write_jsonl(p, pdf)
    got = read_pages_jsonl(spark, p)
    assert got.schema == schemas.PAGES or [
        (f.name, f.dataType) for f in got.schema.fields
    ] == [(f.name, f.dataType) for f in schemas.PAGES.fields]
    rows = {r["url"]: r for r in got.collect()}
    assert len(rows) == 25
    for _, want in pdf.iterrows():
        r = rows[want["url"]]
        assert bytes(r["html"]) == bytes(want["html"])  # byte-identical
        assert r["text"] == want["text"]
        assert r["lang"] == want["lang"]
        assert r["warc_ts"] == want["warc_ts"].to_pydatetime()


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    pdf = synth_pages_pdf(5)
    p = str(tmp_path / "pages.jsonl")
    _write_jsonl(
        p,
        pdf,
        extra_lines=[
            "{not json at all",
            '{"url": "https://ok.example/1", "warc_ts": "nonsense-ts", '
            '"html_b64": "", "text": "t", "lang": "en"}',
        ],
    )
    clean, corrupt = read_pages_jsonl(spark, p, with_corrupt=True)
    # the malformed JSON line is quarantined with its raw content
    bad = corrupt.collect()
    assert len(bad) == 1 and "not json" in bad[0]["raw_line"]
    # the well-formed line with a bad timestamp stays a CLEAN row with
    # NULL warc_ts (P2 freshness treats NULL as stale) — not poisoned
    got = {r["url"]: r for r in clean.collect()}
    assert len(got) == 6
    assert got["https://ok.example/1"]["warc_ts"] is None
