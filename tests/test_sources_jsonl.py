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
            # valid JSON, undecodable base64: row survives, html NULL
            '{"url": "https://ok.example/2", '
            '"warc_ts": "2024-01-01T00:00:00", '
            '"html_b64": "!!!not-base64!!!", "text": "t2", "lang": "en"}',
            # valid JSON with NO url: must be quarantined, not vanish
            '{"warc_ts": "2024-01-01T00:00:00", "text": "orphan", '
            '"lang": "en"}',
        ],
    )
    clean, corrupt = read_pages_jsonl(spark, p, with_corrupt=True)
    # the malformed JSON line AND the url-less line are quarantined,
    # each carrying its VERBATIM raw line (diagnosable/re-parseable)
    # plus a reason
    bad = {r["reason"]: (r["raw_line"] or "") for r in corrupt.collect()}
    assert len(bad) == 2
    assert "not json" in bad["malformed json"]
    assert "orphan" in bad["missing url"]  # content preserved, not a
    # '<missing url>' placeholder
    got = {r["url"]: r for r in clean.collect()}
    assert len(got) == 7
    # field-level damage degrades instead of poisoning or aborting:
    # bad timestamp -> NULL warc_ts (P2 treats NULL as stale),
    # bad base64 -> NULL html — the job never throws
    assert got["https://ok.example/1"]["warc_ts"] is None
    assert got["https://ok.example/2"]["html"] is None
    assert got["https://ok.example/2"]["text"] == "t2"


def test_domain_col_handles_pathless_urls(spark):
    """Path-less urls (no trailing '/') must extract their host, not
    collapse into one '' quota bucket."""
    from kgp.operators.sources import domain_col

    df = spark.createDataFrame(
        [("https://bare.example",), ("http://x.example/p/1",),
         ("https://y.example/",)],
        "url string",
    )
    got = sorted(
        r["d"] for r in df.select(domain_col("url").alias("d")).collect()
    )
    assert got == ["bare.example", "x.example", "y.example"]


def test_domain_col_strips_userinfo_and_port(spark):
    """Blocklist evasion via authority decoration: userinfo and port
    must not ride along, or 'https://u@bad.example/' slips past a
    'bad.example' blocklist entry and one host splits across quota
    buckets. The DuckDB twin must agree byte-for-byte."""
    import duckdb

    from kgp.operators.sources import blocklist_filter, domain_col
    from kgp.queries_pages import _DOMAIN_SQL

    urls = [
        "https://bad.example:8080/x",
        "https://u@bad.example/",
        "https://u:pw@bad.example:443/y?q=1",
        "https://ok.example?a@b",
        "http://plain.example/p",
        "https://frag.example#sec",
    ]
    want = [
        "bad.example",
        "bad.example",
        "bad.example",
        "ok.example",
        "plain.example",
        "frag.example",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["d"]
        for r in df.select(domain_col("url").alias("d"))
        .orderBy("url")
        .collect()
    ]
    assert got == [d for _, d in sorted(zip(urls, want))]
    duck = [
        r[0]
        for r in duckdb.execute(
            f"SELECT {_DOMAIN_SQL} FROM (SELECT unnest(?) AS url) "
            "ORDER BY url",
            [urls],
        ).fetchall()
    ]
    assert duck == got  # cross-engine twin agreement
    # the decorated forms no longer evade the blocklist
    pages = df.withColumn("text", df.url)
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    surv = sorted(r["url"] for r in blocklist_filter(pages, bl).collect())
    assert surv == [
        "http://plain.example/p",
        "https://frag.example#sec",
        "https://ok.example?a@b",
    ]


def test_jsonl_missing_html_b64_yields_null_html(spark, tmp_path):
    """Absent html is NULL, not b'': the absent-vs-present distinction
    survives ingest, matching the undecodable-base64 degrade path."""
    p = str(tmp_path / "nohtml.jsonl")
    with open(p, "w") as f:
        f.write(
            '{"url": "https://nohtml.example/1", '
            '"warc_ts": "2024-01-01T00:00:00", '
            '"text": "t", "lang": "en"}\n'
        )
        f.write(
            '{"url": "https://nohtml.example/2", '
            '"warc_ts": "2024-01-01T00:00:00", "html_b64": null, '
            '"text": "t", "lang": "en"}\n'
        )
    got = {r["url"]: r for r in read_pages_jsonl(spark, p).collect()}
    assert got["https://nohtml.example/1"]["html"] is None
    assert got["https://nohtml.example/2"]["html"] is None


def test_blocklist_filter_drops_only_listed_domains(spark):
    """W3: listed domains vanish entirely, unlisted survive untouched;
    the corpus side must not shuffle (broadcast LEFT ANTI)."""
    from kgp.operators.sources import blocklist_filter

    pages = spark.createDataFrame(
        [("https://bad.example/a", "t1"), ("https://bad.example/b", "t2"),
         ("https://ok.example/c", "t3"), ("https://ok.example", "t4")],
        "url string, text string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    got = sorted(r["url"] for r in blocklist_filter(pages, bl).collect())
    assert got == ["https://ok.example", "https://ok.example/c"]
    plan = (
        blocklist_filter(pages, bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan
