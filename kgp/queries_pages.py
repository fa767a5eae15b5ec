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


@register("pages_linked_entities", None)
def q_pages_linked(spark, sf_dir):
    """X2 — alias-dict linking of page entities (pages gazetteer has
    real alias groups: Ada Lovelace / A. Lovelace / Lovelace …)."""
    from kgp.gazetteer import ALIAS_DICT
    from kgp.operators.linking import link_mentions

    docs = extract_docs(_pages(spark, sf_dir))
    m = mentions_relational(docs, gazetteer_df(spark))
    alias = spark.createDataFrame(
        [(s, c) for s, _, c in ALIAS_DICT],
        "surface string, canonical_id string",
    )
    return link_mentions(cap_mentions(m), alias)


@register("pages_canonical_entities", None)
def q_pages_canonical(spark, sf_dir):
    """X5 — CC canonicalization of the pages entity table."""
    from kgp.gazetteer import ALIAS_DICT
    from kgp.operators.canon import canonicalize_entities, same_as_from_alias

    docs = extract_docs(_pages(spark, sf_dir))
    m = mentions_relational(docs, gazetteer_df(spark))
    ents = build_entities(cap_mentions(m))
    alias = spark.createDataFrame(
        [(s, c) for s, _, c in ALIAS_DICT],
        "surface string, canonical_id string",
    )
    return canonicalize_entities(ents, same_as_from_alias(ents, alias))


@register("pages_near_dup_pairs", None)
def q_pages_near_dups(spark, sf_dir):
    """MinHash-LSH fuzzy dedup over the extracted page text."""
    from kgp.operators.dedup import near_dup_pairs_minhash

    docs = extract_docs(_pages(spark, sf_dir))
    return near_dup_pairs_minhash(
        docs, id_col="url", text_col="extracted_text", threshold=0.5
    )


@register("pages_html_media_features", None)
def q_pages_media(spark, sf_dir):
    """Multimodal: typed metadata over the binary html column."""
    from kgp.operators.multimodal import media_features

    return media_features(_pages(spark, sf_dir))


@register("pages_frame_samples", None)
def q_pages_frames(spark, sf_dir):
    """Multimodal: deterministic frame sampling at the 30 s cadence."""
    from kgp.operators.multimodal import frame_sample_stub

    return frame_sample_stub(_pages(spark, sf_dir))


@register("pages_quality_scores", None)
def q_pages_quality(spark, sf_dir):
    """Text-quality scoring over extracted page text."""
    from kgp.operators.textstats import quality_score

    docs = extract_docs(_pages(spark, sf_dir))
    return quality_score(docs, id_col="url", text_col="extracted_text")


@register("pages_lang_id", None)
def q_pages_lang(spark, sf_dir):
    """Marker-based language ID over extracted page text."""
    from kgp.operators.textstats import lang_id

    docs = extract_docs(_pages(spark, sf_dir))
    return lang_id(docs, id_col="url", text_col="extracted_text")


@register("pages_embeddings", None)
def q_pages_embeddings(spark, sf_dir):
    """F9 — deterministic mock embeddings over extracted page text
    (md5-seeded deviation from the reference's process-randomized
    hash(); SURVEY §2 F9)."""
    from kgp.operators.embed import with_embedding

    docs = extract_docs(_pages(spark, sf_dir))
    return with_embedding(
        docs.select("url", "extracted_text"), text_col="extracted_text"
    ).select("url", "embedding")


@register("pages_segment_triples", None)
def q_pages_segment_triples(spark, sf_dir):
    """Segment-level KG (strategies/youtube.py:177 store_segment_in_kg;
    F4 1-based namespacing `{doc_id}:segment:{i}`): gazetteer mentions
    per 30 s segment → triples whose subjects are segment ids."""
    segs = segment_pages(_pages(spark, sf_dir)).select(
        # build_triples prefixes "page:" itself (F4): seg_id is bare
        F.concat(
            F.col("url"), F.lit(":segment:"),
            (F.col("seg_idx") + 1).cast("string"),
        ).alias("seg_id"),
        F.col("text"),
    )
    m = mentions_relational(
        segs, gazetteer_df(spark), id_col="seg_id", text_col="text"
    ).withColumnRenamed("url", "seg_id")
    return build_triples(cap_mentions(m, doc_col="seg_id"), doc_col="seg_id")
