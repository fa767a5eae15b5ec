"""Pipeline queries over the synthetic `pages` table (rows-only checks).

The driver has no DuckDB view for `pages`, so these register without an
oracle_sql; their correctness gate is tests/ (byte-identity + P/R == 1.0
vs the vendored oracle in kgp.oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kgp.operators.ner import gazetteer_df, mentions_relational
from kgp.operators.segment import extract_docs, segment_pages
from kgp.operators.triples import build_entities, build_triples, cap_mentions
from kgp.queries import register
from kgp.synth import pages_scale_for_sf, synth_pages


def _pages(spark, sf_dir):
    return synth_pages(spark, pages_scale_for_sf(sf_dir))


@register("pages_extracted_docs", None)
def q_pages_docs(spark, sf_dir):
    return extract_docs(_pages(spark, sf_dir))


@register("pages_segments", None)
def q_pages_segments(spark, sf_dir):
    return segment_pages(_pages(spark, sf_dir))


@register("pages_triples", None)
def q_pages_triples(spark, sf_dir):
    docs = extract_docs(_pages(spark, sf_dir))
    m = mentions_relational(docs, gazetteer_df(spark))
    return build_triples(cap_mentions(m))


@register("pages_entities", None)
def q_pages_entities(spark, sf_dir):
    docs = extract_docs(_pages(spark, sf_dir))
    m = mentions_relational(docs, gazetteer_df(spark))
    return build_entities(cap_mentions(m))


@register("pages_fresh_filter", None)
def q_pages_fresh(spark, sf_dir):
    """P2 freshness filter (src/ingest/youtube.py:31-33): pushdown-able
    timestamp predicate; html column never read (column pruning)."""
    return (
        _pages(spark, sf_dir)
        .filter(F.col("warc_ts") >= F.lit("2024-07-01"))
        .select("url", "warc_ts", "lang")
    )
