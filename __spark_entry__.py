"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG-construction pipeline (segment →
                 NER → triples) on the deterministic synthetic `pages`
                 table at sf0.001 scale; returns the triples DataFrame.
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """pages(sf0.001, 500 rows) → segments → mentions → triples."""
    from kgp.operators.ner import gazetteer_df, mentions_relational
    from kgp.operators.segment import extract_docs
    from kgp.operators.triples import build_triples, cap_mentions
    from kgp.synth import synth_pages

    pages = synth_pages(spark, 500)
    docs = extract_docs(pages)
    mentions = mentions_relational(docs, gazetteer_df(spark))
    return build_triples(cap_mentions(mentions))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgp.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from kgp.queries import oracle_sql as _o

    return _o()
