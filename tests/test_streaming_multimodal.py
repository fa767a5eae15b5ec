"""Structured-Streaming wrapper + multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from kgp.operators.multimodal import (
    decode_image_stub,
    frame_sample_stub,
    html_to_text,
    media_features,
)
from kgp.streaming import start_kg_stream, triples_for_batch
from kgp.synth import synth_pages


def test_stream_matches_batch_and_is_idempotent(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    all_pages = synth_pages(spark, 120).cache()
    all_pages.filter(F.col("url").isNotNull()).limit(0).count()  # warm
    # chunk 1 arrives
    synth_pages(spark, 60).write.mode("append").parquet(pages_dir)
    q = start_kg_stream(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # chunk 2 arrives (rows 60..119 — regenerate full then anti-join)
    import pandas as pd

    from kgp.synth import synth_pages_pdf
    pdf2 = synth_pages_pdf(60, start=60)
    spark.createDataFrame(pdf2).write.mode("append").parquet(pages_dir)
    q2 = start_kg_stream(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    got = sorted(
        map(tuple, spark.read.parquet(out_dir)
            .select("subj", "pred", "obj").collect())
    )
    expect = sorted(
        map(tuple, triples_for_batch(synth_pages(spark, 120))
            .select("subj", "pred", "obj").collect())
    )
    assert got == expect

    # replaying with the same checkpoint adds nothing (idempotent sink)
    q3 = start_kg_stream(spark, pages_dir, out_dir, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(got)

    # the sink is date-partitioned and the per-batch dedup read prunes
    # to the batch's dates — it must NOT scan the cumulative sink
    import os

    parts = [
        d for d in os.listdir(out_dir) if d.startswith("ingest_date=")
    ]
    assert len(parts) > 1, parts  # synthetic warc_ts spans many days
    one_date = parts[0].split("=", 1)[1]
    pruned = spark.read.parquet(out_dir).filter(
        F.col("ingest_date").isin([one_date])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ingest_date" in plan
    # partition pruning: the filtered scan touches a strict subset of files
    total_files = {
        os.path.join(r, f)
        for r, _, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert 0 < pruned.count() < len(got)
    assert len(total_files) > 1


def test_stream_sink_cross_engine_matches_duckdb(spark, tmp_path):
    """Stream ≡ batch, verified ACROSS engines (round-3 verdict #7):
    after two availableNow drains (the second wave includes a re-crawl
    that plants cross-date duplicate triples) plus compaction, DuckDB
    recomputes the expected triples from the raw pages files via the
    pages_triples oracle SQL and reads the sink parquet directly —
    neither side of the final equality is computed by Spark."""
    import duckdb
    import pandas as pd

    from kgp.queries_pages import pages_triples_sql
    from kgp.streaming import compact_triples_sink
    from kgp.synth import synth_pages_pdf

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    synth_pages(spark, 80).write.mode("append").parquet(pages_dir)
    q = start_kg_stream(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    # wave 2: rows 80..119 plus a re-crawl of rows 0..9 on a later
    # ingest day — identical triples, different date partition, so the
    # per-date streaming dedup appends duplicates that only the
    # compaction job removes
    pdf2 = synth_pages_pdf(40, start=80)
    recrawl = synth_pages_pdf(10)
    recrawl["warc_ts"] = pd.to_datetime(
        recrawl["warc_ts"]
    ) + pd.Timedelta(days=400)
    spark.createDataFrame(
        pd.concat([pdf2, recrawl], ignore_index=True)
    ).write.mode("append").parquet(pages_dir)
    q2 = start_kg_stream(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(120)

    removed = compact_triples_sink(spark, out_dir)
    assert removed > 0  # the re-crawl duplicates really existed

    con = duckdb.connect()
    expect = con.execute(
        pages_triples_sql(f"{pages_dir}/*.parquet")
    ).fetchall()
    got = con.execute(
        "SELECT subj, pred, obj, edge_id FROM "
        f"read_parquet('{out_dir}/*/*.parquet')"
    ).fetchall()
    assert expect and sorted(got) == sorted(expect)


def test_html_binary_roundtrip_byte_identical(spark):
    pages = synth_pages(spark, 80)
    joined = (
        html_to_text(pages)
        .join(pages.select("url", "text"), "url")
        .withColumn("ok", F.col("decoded_text") == F.col("text"))
    )
    assert joined.filter(~F.col("ok")).count() == 0
    assert joined.count() == 80


def test_media_features_sizes(spark):
    pages = synth_pages(spark, 30)
    feats = media_features(pages)
    chk = feats.join(
        pages.select("url", F.length("html").cast("long").alias("want")),
        "url",
    )
    assert chk.filter(F.col("n_bytes") != F.col("want")).count() == 0
    assert feats.filter(F.length("payload_md5") != 32).count() == 0


def test_image_stub_raises_from_executor_side_plumbing(spark):
    pages = synth_pages(spark, 5)
    df = decode_image_stub(pages)
    assert df.schema.simpleString() == (
        "struct<url:string,width:int,height:int,channels:int>"
    )
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        df.count()


def test_frame_sample_counts_match_windows(spark):
    from kgp.operators.segment import extract_docs

    pages = synth_pages(spark, 50)
    frames = frame_sample_stub(pages)
    per_url = frames.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("frame_md5").alias("n_uniq"),
    )
    # one frame per 30 s window == n_segments from the segmentation op
    docs = extract_docs(pages).select("url", "n_segments")
    bad = per_url.join(docs, "url").filter(
        (F.col("n_frames") != F.col("n_segments"))
        | (F.col("n_uniq") != F.col("n_frames"))
    )
    assert bad.count() == 0


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    """Watermarked tumbling-window agg over a file stream must equal
    the batch groupBy(window) on the same data (complete mode)."""
    from datetime import datetime, timedelta

    from kgp.streaming import events_windowed_counts

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=(i * 7) % 95), i % 5,
         ["view", "click"][i % 2], float(i), "{}")
        for i in range(200)
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        events_windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM win_counts").collect())
    )
    want = sorted(
        map(
            tuple,
            spark.read.parquet(src)
            .groupBy(F.window("ts", "10 minutes"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total_value"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type",
                "n",
                "total_value",
            )
            .collect(),
        )
    )
    assert got == want and got


def test_compact_triples_sink_restores_global_key_invariant(
    spark, tmp_path
):
    """A url re-crawled on a later ingest date appends duplicate
    (subj, pred, obj) rows (documented streaming tradeoff); compaction
    keeps the min-ingest_date winner and rewrites atomically."""
    import datetime

    from kgp.streaming import compact_triples_sink

    out_dir = str(tmp_path / "sink")
    d1 = datetime.date(2024, 3, 1)
    d2 = datetime.date(2024, 5, 9)
    rows = [
        ("page:u1", "contains_entity", "entity:x",
         "edge:page:u1:entity:x:contains_entity", d1),
        # same edge re-crawled later — the duplicate compaction removes
        ("page:u1", "contains_entity", "entity:x",
         "edge:page:u1:entity:x:contains_entity", d2),
        ("page:u2", "contains_entity", "entity:y",
         "edge:page:u2:entity:y:contains_entity", d2),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, edge_id string, "
        "ingest_date date",
    )
    df.write.mode("append").partitionBy("ingest_date").parquet(out_dir)

    removed = compact_triples_sink(spark, out_dir)
    assert removed == 1

    sink = spark.read.parquet(out_dir)
    got = {
        (r["subj"], r["obj"]): r["ingest_date"] for r in sink.collect()
    }
    assert got == {("page:u1", "entity:x"): d1, ("page:u2", "entity:y"): d2}
    # still date-partitioned (pruned reads keep working post-compact)
    import os

    parts = [
        d for d in os.listdir(out_dir) if d.startswith("ingest_date=")
    ]
    assert parts and "ingest_date=2024-03-01" in parts
    # idempotent: compacting a clean sink removes nothing
    assert compact_triples_sink(spark, out_dir) == 0
    # empty/missing sink is a no-op
    assert compact_triples_sink(spark, str(tmp_path / "nope")) == 0


def test_stream_kg_cli_end_to_end(tmp_path):
    """jobs/stream_kg.py drains synthetic crawl waves into a
    duplicate-free date-partitioned sink and exits 0 (subprocess: the
    CLI owns its own SparkSession and stops it)."""
    import os
    import re
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "jobs", "stream_kg.py"),
            "--synth", "300", "--batches", "2", "--cores", "4",
            "--output", str(tmp_path / "o"), "--compact",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    drained = [
        ln for ln in r.stdout.splitlines() if ln.startswith("drained")
    ]
    assert drained, r.stdout[-2000:]
    rows = int(re.search(r"sink_rows=(\d+)", drained[0]).group(1))
    keys = int(re.search(r"distinct_triples=(\d+)", drained[0]).group(1))
    assert rows == keys > 0
    assert "compacted: removed 0" in r.stdout
