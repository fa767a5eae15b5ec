"""Resumability (lineage + checkpoint skip) and skew handling (X6)."""

import shutil

import pytest
from pyspark.sql import functions as F

from kgp import lineage as L
from kgp.checkpoint import build_kg_pipeline
from kgp.skew import (
    repartition_by_url_hash,
    salted_count_distinct,
    salted_sum,
)
from kgp.synth import synth_pages


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    synth_pages(spark, 300).write.parquet(p)
    return p


def test_kill_and_resume_identical_output(spark, pages_path, tmp_path):
    out_resumed = str(tmp_path / "resumed")
    out_fresh = str(tmp_path / "fresh")

    # run 1: "crashes" after the mentions stage commit
    r1 = build_kg_pipeline(spark, pages_path, out_resumed,
                           stop_after="mentions")
    assert r1.executed == ["docs", "mentions"]

    # run 2: resumes — committed stages skipped, remainder executed
    r2 = build_kg_pipeline(spark, pages_path, out_resumed)
    assert r2.skipped == ["docs", "mentions"]
    assert r2.executed == ["capped", "triples", "entities"]

    # uncrashed reference run
    build_kg_pipeline(spark, pages_path, out_fresh)

    for table in ["triples", "entities"]:
        a = sorted(map(tuple,
                   spark.read.parquet(f"{out_resumed}/{table}").collect()))
        b = sorted(map(tuple,
                   spark.read.parquet(f"{out_fresh}/{table}").collect()))
        assert a == b, table


def test_lineage_counters_match_output(spark, pages_path, tmp_path):
    out = str(tmp_path / "o")
    build_kg_pipeline(spark, pages_path, out)
    lin = L.read_lineage(spark, out)
    committed = lin.filter(F.col("status") == L.STATUS_COMMITTED)
    triple_rows = (
        committed.filter(F.col("stage") == "triples")
        .agg(F.sum("rows_out"))
        .collect()[0][0]
    )
    assert triple_rows == spark.read.parquet(f"{out}/triples").count()
    # every stage committed exactly once; per-partition rows present
    stages = {r["stage"] for r in committed.select("stage").collect()}
    assert stages == {"docs", "mentions", "capped", "triples", "entities"}
    assert L.run_stats(spark, out).count() >= 5


def test_half_written_stage_is_overwritten(spark, pages_path, tmp_path):
    """No _SUCCESS / no committed lineage row ⇒ the stage reruns and
    clobbers a partial attempt (crash between task and job commit)."""
    out = str(tmp_path / "o")
    r1 = build_kg_pipeline(spark, pages_path, out, stop_after="docs")
    # simulate a crashed second stage: directory exists, no _SUCCESS
    mpath = f"{out}/mentions"
    spark.read.parquet(f"{out}/docs").limit(3).write.parquet(mpath)
    import os
    os.remove(f"{mpath}/_SUCCESS")
    r2 = build_kg_pipeline(spark, pages_path, out)
    assert "mentions" in r2.executed
    assert spark.read.parquet(mpath).count() > 3


def test_salted_count_distinct_equals_plain(spark, pages_path):
    from kgp.operators.ner import gazetteer_df, mentions_relational
    from kgp.operators.segment import extract_docs
    from kgp.operators.triples import cap_mentions, normalize_entity_id

    pages = spark.read.parquet(pages_path)
    capped = cap_mentions(
        mentions_relational(extract_docs(pages), gazetteer_df(spark))
    ).select(normalize_entity_id(F.col("surface")).alias("e"), "url")
    plain = {
        r["e"]: r["n"]
        for r in capped.groupBy("e")
        .agg(F.countDistinct("url").alias("n"))
        .collect()
    }
    salted = {
        r["e"]: r["n_distinct"]
        for r in salted_count_distinct(capped, "e", "url").collect()
    }
    assert plain == salted and plain


def test_salted_sum_equals_plain(spark):
    df = spark.createDataFrame(
        [("k1", i % 7, f"c{i}") for i in range(1000)]
        + [("k2", 1, "x")],
        "key string, v int, carrier string",
    )
    plain = {r["key"]: r["t"] for r in
             df.groupBy("key").agg(F.sum("v").alias("t")).collect()}
    salted = {r["key"]: r["total"] for r in
              salted_sum(df, "key", "v", "carrier").collect()}
    assert plain == salted


def test_url_hash_repartition_balances_mega_domains(spark, pages_path):
    """Zipf-headed domains must spread ~uniformly over partitions."""
    pages = spark.read.parquet(pages_path)
    P = 8
    sizes = (
        repartition_by_url_hash(pages, P)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in sizes]
    assert len(counts) == P
    assert max(counts) / (sum(counts) / len(counts)) < 1.6
