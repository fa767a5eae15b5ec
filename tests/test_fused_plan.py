"""Fused in-row plan ≡ composable plan, with fewer shuffles."""

from pyspark.sql import functions as F

from kgp.operators.ner import (
    gazetteer_df,
    mention_arrays_arrow,
    mentions_relational,
)
from kgp.operators.segment import extract_docs
from kgp.operators.triples import build_entities, build_triples, cap_mentions
from kgp.plans.pipeline import (
    build_kg_fused,
    cap_mention_array_col,
    outputs_from_capped,
)
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


def _udf_capped(docs):
    """Model-UDF extraction path: per-doc mention arrays from the
    Arrow UDF, then the in-row cap — the 'same fusion applies after
    the UDF' claim from kgp/plans/pipeline.py, exercised for real."""
    arrays = mention_arrays_arrow(docs)
    return arrays.select(
        "url",
        F.explode(cap_mention_array_col(F.col("mentions"))).alias("m"),
    ).select(
        "url",
        F.col("m.surface").alias("surface"),
        F.col("m.label").alias("label"),
        F.col("m.first_offset").alias("first_offset"),
    )


def test_udf_cap_equals_relational_path(spark):
    """Triple-set equality: Arrow-UDF mention arrays + in-row cap ≡
    broadcast-gazetteer relational extraction + packed-agg cap, on the
    synth corpus — including the downstream triples/entities."""
    pages = synth_pages(spark, 400).cache()
    docs = extract_docs(pages)
    ref_capped = cap_mentions(mentions_relational(docs, gazetteer_df(spark)))
    udf_capped = _udf_capped(docs)
    assert sorted(map(tuple, ref_capped.collect())) == \
           sorted(map(tuple, udf_capped.collect()))
    t_ref, e_ref = build_triples(ref_capped), build_entities(ref_capped)
    t_udf, e_udf = outputs_from_capped(udf_capped)
    assert sorted(map(tuple, t_ref.collect())) == \
           sorted(map(tuple, t_udf.collect()))
    assert sorted(map(tuple, e_ref.collect())) == \
           sorted(map(tuple, e_udf.collect()))
    pages.unpersist()


def test_udf_cap_no_shuffle_between_udf_and_cap(spark):
    """The capped-mentions table from the UDF path is a fully narrow
    plan: scan → MapInPandas → in-row filter/sort/slice → explode.
    No Window, no Exchange anywhere before the output dedups."""
    docs = extract_docs(synth_pages(spark, 50))
    plan = (
        _udf_capped(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan, plan
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan


def test_cap_mention_array_semantics(spark):
    """Filter-before-cap + pinned (first_offset, surface) order on a
    hand-built model output: 12 entity mentions + an early decoy label.
    The decoy must not consume a cap slot (gremlin_client.py:102-135:
    label filter precedes the cap), and the tie at offset 7 breaks by
    surface."""
    rows = [
        (
            "u1",
            # decoy label at offset 0 would win the sort if the filter
            # ran after the cap
            [{"surface": "noise", "label": "EVENT", "first_offset": 0}]
            + [
                {
                    "surface": f"e{i:02d}",
                    "label": "ORG",
                    "first_offset": 7 if i < 2 else 10 + i,
                }
                for i in range(12)
            ],
        )
    ]
    df = spark.createDataFrame(
        rows,
        "url string, mentions array<struct<"
        "surface:string,label:string,first_offset:bigint>>",
    )
    out = df.select(
        F.explode(cap_mention_array_col(F.col("mentions"))).alias("m")
    ).select("m.surface", "m.first_offset").collect()
    surfaces = [r["surface"] for r in out]
    assert len(surfaces) == 10  # capped, decoy excluded
    assert "noise" not in surfaces
    assert surfaces[:2] == ["e00", "e01"]  # offset-7 tie broken by surface
    assert surfaces == sorted(
        surfaces
    )  # here offset order == lexical order by construction


def test_fused_empty_gazetteer_yields_zero_mentions(spark):
    """Regression: an empty/all-filtered gazetteer must produce zero
    triples, not an analysis error (VOID array element type)."""
    pages = synth_pages(spark, 10)
    t, e = build_kg_fused(pages, gaz=[("decoy", "EVENT")])
    assert t.count() == 0 and e.count() == 0
