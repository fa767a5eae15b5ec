"""Fused in-row plan ≡ composable plan, with fewer shuffles."""

from pyspark.sql import functions as F

from kgp.operators.ner import gazetteer_df, mentions_relational
from kgp.operators.segment import extract_docs
from kgp.operators.triples import build_entities, build_triples, cap_mentions
from kgp.plans.pipeline import build_kg_fused
from kgp.synth import synth_pages


def _composable(spark, pages):
    docs = extract_docs(pages)
    capped = cap_mentions(
        mentions_relational(docs, gazetteer_df(spark))
    )
    return build_triples(capped), build_entities(capped)


def test_fused_equals_composable(spark):
    pages = synth_pages(spark, 400).cache()
    t_ref, e_ref = _composable(spark, pages)
    t_fused, e_fused = build_kg_fused(pages)
    assert sorted(map(tuple, t_ref.collect())) == \
           sorted(map(tuple, t_fused.collect()))
    assert sorted(map(tuple, e_ref.collect())) == \
           sorted(map(tuple, e_fused.collect()))
    pages.unpersist()


def test_fused_triples_single_shuffle(spark):
    """pages→triples fused: exactly one hash exchange (the edge dedup);
    the cap window's shuffle is gone."""
    pages = synth_pages(spark, 50)
    triples, _ = build_kg_fused(pages)
    plan = triples._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan


def test_fused_partition_invariance(spark):
    a = build_kg_fused(synth_pages(spark, 200, partitions=1))[0]
    b = build_kg_fused(synth_pages(spark, 200, partitions=11))[0]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fused_empty_gazetteer_yields_zero_mentions(spark):
    """Regression: an empty/all-filtered gazetteer must produce zero
    triples, not an analysis error (VOID array element type)."""
    pages = synth_pages(spark, 10)
    t, e = build_kg_fused(pages, gaz=[("decoy", "EVENT")])
    assert t.count() == 0 and e.count() == 0
