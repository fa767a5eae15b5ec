"""End-to-end training-data prep pipeline: cleaning semantics,
dedup keep-min policy, split partitioning, and resume."""

import os

from pyspark.sql import functions as F

from kgp.checkpoint import build_training_pipeline
from kgp.synth import synth_pages

N = 400


def _pages_path(spark, tmp_path):
    p = str(tmp_path / "pages")
    synth_pages(spark, N).write.mode("overwrite").parquet(p)
    return p


def test_training_pipeline_end_to_end(spark, tmp_path):
    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus")
    r = build_training_pipeline(
        spark, pages, out, min_quality_e4=3000, near_dup_threshold=0.5
    )
    assert r.executed == ["docs", "filtered", "deduped", "split"]

    split = spark.read.parquet(f"{out}/split")
    n_out = split.count()
    assert 0 < n_out <= N

    # split column is hive-partitioned and complete
    vals = {r["split"] for r in split.select("split").distinct().collect()}
    assert vals <= {"train", "val", "test"} and "train" in vals
    assert os.path.isdir(f"{out}/split/split=train")

    # cleaning gate: every surviving doc passes quality + lang
    assert split.filter(F.col("quality_e4") < 3000).count() == 0
    assert split.filter(F.col("pred_lang") != "en").count() == 0

    # exact dedup: texts are unique
    assert (
        split.select(F.md5("extracted_text")).distinct().count() == n_out
    )

    # near-dup prune actually removed something: synth plants a
    # perturbed copy every 37th page, and keep-min keeps one per pair
    filtered = spark.read.parquet(f"{out}/filtered")
    assert n_out < filtered.count()


def test_training_pipeline_resume_skips_committed(spark, tmp_path):
    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus")
    r1 = build_training_pipeline(
        spark, pages, out, stop_after="filtered", min_quality_e4=3000
    )
    assert r1.executed == ["docs", "filtered"]

    r2 = build_training_pipeline(spark, pages, out, min_quality_e4=3000)
    assert r2.skipped == ["docs", "filtered"]
    assert r2.executed == ["deduped", "split"]

    # third run: everything committed, nothing recomputed, output stable
    before = (
        spark.read.parquet(f"{out}/split").orderBy("doc_id").collect()
    )
    r3 = build_training_pipeline(spark, pages, out, min_quality_e4=3000)
    assert r3.executed == []
    after = (
        spark.read.parquet(f"{out}/split").orderBy("doc_id").collect()
    )
    assert before == after


def test_training_cli_runs_and_is_idempotent(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cli_out")
    cmd = [
        sys.executable, "jobs/prepare_training_data.py",
        "--synth", "200", "--output", out, "--cores", "4",
        "--min-quality", "3000",
    ]
    env = dict(os.environ)
    r1 = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=600,
        cwd=repo,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "executed=['docs', 'filtered', 'deduped', 'split']" in r1.stdout
    r2 = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=600,
        cwd=repo,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "executed=[]" in r2.stdout

    # a rerun with DIFFERENT cleaning parameters must refuse to resume
    # (committed stages were built under the old contract)
    r3 = subprocess.run(
        cmd[:-1] + ["8000"], capture_output=True, text=True, env=env,
        timeout=600, cwd=repo,
    )
    assert r3.returncode == 2, (r3.returncode, r3.stderr[-1000:])
    assert "previous contract" in r3.stderr


def test_training_pipeline_decontaminates_against_benchmark(
    spark, tmp_path
):
    """With a benchmark parquet, the pipeline inserts the
    decontaminated stage and drops every doc sharing a 3-token shingle
    with the eval set — here the benchmark IS a slice of the corpus
    docs, so those docs (and their shingle-mates) must vanish from the
    split while clean docs survive."""
    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus_decon")

    # learn which docs survive the clean run, then use 5 of them as
    # the eval set — guarantees decontamination (not the quality gate)
    # is what removes them
    out0 = str(tmp_path / "corpus_clean")
    build_training_pipeline(
        spark, pages, out0, min_quality_e4=3000, near_dup_threshold=0.5
    )
    bench_path = str(tmp_path / "bench")
    bench = (
        spark.read.parquet(f"{out0}/deduped")
        .select("doc_id", "extracted_text")
        .orderBy("doc_id")
        .limit(5)
    )
    bench.write.mode("overwrite").parquet(bench_path)
    bench_ids = {r["doc_id"] for r in bench.collect()}
    assert len(bench_ids) == 5

    r = build_training_pipeline(
        spark, pages, out, min_quality_e4=3000,
        near_dup_threshold=0.5, benchmark_path=bench_path,
    )
    assert r.executed == [
        "docs", "filtered", "deduped", "decontaminated", "split",
    ]
    split = spark.read.parquet(f"{out}/split")
    out_ids = {r["doc_id"] for r in split.select("doc_id").collect()}
    # every benchmark doc is gone (it shares ALL its shingles with
    # itself), and the pipeline still kept a non-trivial corpus
    assert not (out_ids & bench_ids)
    assert len(out_ids) > 0
    # decontaminated is a subset of deduped
    dedup_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/deduped")
        .select("doc_id").collect()
    }
    assert out_ids < dedup_ids


def test_training_pipeline_max_tokens_per_doc(spark, tmp_path):
    """--max-tokens-per-doc caps every split doc at N whitespace
    tokens: over-cap docs become a byte-prefix of their original,
    at-or-under-cap docs ride through byte-identical, and the stage
    runs AFTER dedup (dedup compared full documents)."""
    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus_trunc")
    n_tok = 64
    r = build_training_pipeline(
        spark,
        pages,
        out,
        min_quality_e4=0,
        near_dup_threshold=0.5,
        max_tokens_per_doc=n_tok,
    )
    assert r.executed[-2:] == ["truncated", "split"]

    orig = (
        spark.read.parquet(f"{out}/deduped")
        .select("doc_id", F.col("extracted_text").alias("full"))
    )
    joined = (
        spark.read.parquet(f"{out}/split")
        .select("doc_id", "extracted_text")
        .join(orig, "doc_id")
        .collect()
    )
    assert joined
    n_cut = 0
    for row in joined:
        toks = [t for t in row["extracted_text"].split() if t]
        assert len(toks) <= n_tok, row["doc_id"]
        if row["extracted_text"] == row["full"]:
            assert len([t for t in row["full"].split() if t]) <= n_tok
        else:
            n_cut += 1
            assert row["full"].startswith(row["extracted_text"])
            assert len(toks) == n_tok
    # synth texts span 30-150+ tokens, so both branches are exercised
    assert 0 < n_cut < len(joined)


def test_training_cli_max_tokens_contract(tmp_path):
    """--max-tokens-per-doc is part of the resume contract: a rerun
    over the same --output with a different cap must refuse to resume
    (committed stages hold the old truncation)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cli_trunc")
    cmd = [
        sys.executable, "jobs/prepare_training_data.py",
        "--synth", "200", "--output", out, "--cores", "4",
        "--min-quality", "0", "--max-tokens-per-doc", "64",
    ]
    r1 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert (
        "executed=['docs', 'filtered', 'deduped', 'truncated', 'split']"
        in r1.stdout
    )
    r2 = subprocess.run(
        cmd[:-1] + ["32"], capture_output=True, text=True, timeout=600,
        cwd=repo,
    )
    assert r2.returncode == 2, (r2.returncode, r2.stderr[-1000:])
    assert "previous contract" in r2.stderr

    # --span-dedup-tokens is ALSO contract material (it rewrites text)
    r3 = subprocess.run(
        cmd + ["--span-dedup-tokens", "10"], capture_output=True,
        text=True, timeout=600, cwd=repo,
    )
    assert r3.returncode == 2, (r3.returncode, r3.stderr[-1000:])
    assert "previous contract" in r3.stderr


def test_training_pipeline_span_dedup_stage(spark, tmp_path):
    """--span-dedup-tokens inserts the span_cleaned stage: duplicated
    k-token blocks vanish (digest-exact vs span_dedup_stats computed
    on the stage INPUT), untouched docs ride through byte-identical,
    and no doc is dropped. near_dup_threshold=0.99 keeps the planted
    near-dup pairs alive through doc-level dedup, so they share
    aligned unperturbed blocks — the stage has real work to do."""
    import hashlib

    from kgp.operators.dedup import span_dedup_stats

    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus_span")
    k = 10
    r = build_training_pipeline(
        spark,
        pages,
        out,
        min_quality_e4=0,
        near_dup_threshold=0.99,
        span_dedup_tokens=k,
    )
    assert r.executed[-2:] == ["span_cleaned", "split"]

    pre = spark.read.parquet(f"{out}/deduped")
    stats = {
        row["doc_id"]: (row["n_removed"], row["clean_md5"])
        for row in span_dedup_stats(
            pre, text_col="extracted_text", k=k
        ).collect()
    }
    orig = {
        row["doc_id"]: row["extracted_text"]
        for row in pre.select("doc_id", "extracted_text").collect()
    }
    got = {
        row["doc_id"]: row["extracted_text"]
        for row in spark.read.parquet(f"{out}/span_cleaned")
        .select("doc_id", "extracted_text")
        .collect()
    }
    assert set(got) == set(orig)  # rewrite, never drop
    n_rewritten = 0
    for did, (n_removed, md5hex) in stats.items():
        if n_removed == 0:
            assert got[did] == orig[did], did
        else:
            n_rewritten += 1
            assert (
                hashlib.md5(got[did].encode()).hexdigest() == md5hex
            ), did
    assert n_rewritten > 0


def test_training_pipeline_domain_quota(spark, tmp_path):
    """--max-per-domain keeps the K HIGHEST-QUALITY docs per domain:
    the quota holds in the split output, and for a capped domain the
    survivors' quality floor ≥ the evicted docs' quality ceiling."""
    from kgp.operators.sources import domain_col

    pages = _pages_path(spark, tmp_path)
    out = str(tmp_path / "corpus_capped")
    k = 5
    r = build_training_pipeline(
        spark,
        pages,
        out,
        min_quality_e4=0,
        near_dup_threshold=0.5,
        max_per_domain=k,
    )
    assert "capped" in r.executed

    split = spark.read.parquet(f"{out}/split").withColumn(
        "domain", domain_col("url")
    )
    per_dom = {
        row["domain"]: row["count"]
        for row in split.groupBy("domain").count().collect()
    }
    assert max(per_dom.values()) <= k
    # the zipf head domain is genuinely capped (had >> k pages)
    deduped = spark.read.parquet(f"{out}/deduped").withColumn(
        "domain", domain_col("url")
    )
    head = (
        deduped.groupBy("domain").count()
        .orderBy(F.desc("count")).first()
    )
    assert head["count"] > k
    assert per_dom[head["domain"]] == k
    kept_min = (
        split.filter(F.col("domain") == head["domain"])
        .agg(F.min("quality_e4")).first()[0]
    )
    evicted_max = (
        deduped.join(
            split.select("doc_id"), "doc_id", "left_anti"
        )
        .filter(F.col("domain") == head["domain"])
        .agg(F.max("quality_e4")).first()[0]
    )
    assert kept_min >= evicted_max
