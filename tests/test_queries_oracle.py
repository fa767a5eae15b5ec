"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    assert _rows(scols, srows) == _rows(dcols, drows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj", "edge_id"]


def test_rows_only_queries_run(spark):
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            assert fn(spark, SF_DIR).count() >= 0, name


def test_driver_window_invariants():
    """The driver records the FIRST 50 registry entries; the explicit
    rotation window must stay exactly 50 oracle-backed names, leading
    the ordering, with every rotated-in/new entry present."""
    from kgp.queries import DRIVER_WINDOW, _REGISTRY, _ordered

    names = [n for n, _ in _ordered()]
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert names[:50] == DRIVER_WINDOW
    for n in DRIVER_WINDOW:
        assert _REGISTRY[n][1] is not None, f"{n} has no oracle"
    # everything outside the window is either r02-driver-green or
    # rows-only — a NEW oracle entry must be added to the window
    r02_green_or_rows_only = {
        "kg_mentions", "kg_entities", "kg_onehop_facts",
        "tpch_pricing_summary", "top_customers_by_revenue",
        "events_monthly_by_type", "events_json_extract",
        "pages_video_timeline", "pages_triples", "pages_entities",
        "pages_frame_samples", "dedup_fingerprint_groups",
        "dedup_ngram_jaccard_pairs", "kg_linked_mentions",
        # demoted late-r3 for events_user_setops; r02-driver-green,
        # S9 stays in-window via _nodes + _counts
        "kg_graph_export_edges",
        # demoted late-r3 for kg_pagerank / docs_train_split /
        # docs_boilerplate_ngrams; all three r02-driver-green with
        # their operator families still in-window
        "dedup_exact_groups", "text_lang_id", "kg_doc_entity_sets",
        "text_quality_features", "kg_docs_with_entity",
        "tpch_q3ish_shipping_priority", "events_date_roundtrip",
        "events_topn_per_user", "embedding_monthly_centroid",
        "ann_topk_bruteforce",
        "events_approx_distinct_users", "events_value_percentiles",
        # demoted late-r3 for docs_repetition_stats /
        # docs_decontamination / dedup_minhash_clusters; all three
        # r01+r02-driver-green (anti-join shape in-window via
        # events_user_setops, dedup family via minhash + embedding,
        # T1 via ann_topk_ivf)
        "customers_without_big_orders", "dedup_simhash_groups",
        "ann_topk_lsh",
        # demoted late-r3 for kg_triangle_counts / docs_span_dedup;
        # both r02-driver-green (X5 in-window via kg_canonical_entities
        # + kg_triples_canonical + dedup_minhash_clusters, S9 via
        # kg_graph_export_counts)
        "pages_canonical_entities", "kg_graph_export_nodes",
        # demoted late-r3 for pages_domain_stats/_capped; both
        # r02-driver-green (co-occurrence in-window via kg_pagerank +
        # kg_triangle_counts, F4 via kg_triples edge_id)
        "kg_entity_cooccurrence", "pages_segment_triples",
        # demoted late-r3 for docs_rolling_fingerprint; r02-driver-
        # green (X3/X4 in-window via dedup_minhash_lsh_pairs +
        # dedup_minhash_clusters + dedup_embedding_pairs)
        "pages_near_dup_pairs",
        # demoted late-r3 for docs_tfidf_top_terms; r02-driver-green
        # (the pinned floor-index percentile rule is stable; sketch
        # family still exercised by the rows-only approx twins)
        "events_value_percentiles_exact",
        # demoted late-r3 for pages_blocklist_filtered; r01+r02-
        # driver-green (X1 pattern extraction stable two rounds)
        "svo_pattern_triples",
    }
    outside = set(names[50:])
    assert outside <= r02_green_or_rows_only, (
        "new entries must go INTO the driver window: "
        f"{outside - r02_green_or_rows_only}"
    )
