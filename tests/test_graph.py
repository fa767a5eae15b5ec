"""Graph analytics + sampling operators: integer PageRank semantics
vs a pure-Python reference, split determinism/uniformity, boilerplate
n-gram mining."""

import pytest
from pyspark.sql import functions as F

from kgp.operators.graph import PR_BASE, PR_INIT, pagerank_int
from kgp.operators.sampling import hash_split

EDGES = [  # directed, already symmetrized where undirected
    ("a", "b"), ("b", "a"),
    ("a", "c"), ("c", "a"),
    ("b", "c"), ("c", "b"),
    ("d", "a"),  # d points at the hub but nothing points back
]
NODES = ["a", "b", "c", "d", "iso"]  # 'iso' has no edges at all


def _py_pagerank_int(edges, nodes, iters=3):
    """Line-for-line fixed-point recurrence in pure Python."""
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {n: PR_INIT for n in nodes}
    for _ in range(iters):
        nxt = {n: PR_BASE for n in nodes}
        for s, d in edges:
            nxt[d] += (85 * r[s]) // (100 * out[s])
        r = nxt
    return r


def test_pagerank_matches_python_reference(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    nodes = spark.createDataFrame([(n,) for n in NODES], "id string")
    got = {
        r["id"]: r["rank"]
        for r in pagerank_int(edges, nodes=nodes, iters=3).collect()
    }
    assert got == _py_pagerank_int(EDGES, NODES, iters=3)
    # isolated vertex holds the damped base after the first iteration
    assert got["iso"] == PR_BASE
    # the hub outranks its satellites
    assert got["a"] == max(got.values())


def test_pagerank_close_to_float_semantics(spark):
    """The fixed-point recurrence tracks float PageRank to ~1e-5 per
    node (scaled), so ranking order is the standard one."""
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    nodes = spark.createDataFrame([(n,) for n in NODES], "id string")
    got = {
        r["id"]: r["rank"] / PR_INIT
        for r in pagerank_int(edges, nodes=nodes, iters=3).collect()
    }
    out = {}
    for s, _ in EDGES:
        out[s] = out.get(s, 0) + 1
    rf = {n: 1.0 for n in NODES}
    for _ in range(3):
        nxt = {n: 0.15 for n in NODES}
        for s, d in EDGES:
            nxt[d] += 0.85 * rf[s] / out[s]
        rf = nxt
    for n in NODES:
        assert got[n] == pytest.approx(rf[n], abs=1e-4)


def test_hash_split_deterministic_and_uniform(spark):
    docs = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s1 = hash_split(docs).groupBy("split").count().collect()
    frac = {r["split"]: r["count"] / 10_000 for r in s1}
    assert frac["train"] == pytest.approx(0.80, abs=0.02)
    assert frac["val"] == pytest.approx(0.10, abs=0.01)
    assert frac["test"] == pytest.approx(0.10, abs=0.01)
    # same input → identical assignment (this is the whole point)
    a = hash_split(docs).orderBy("doc_id").collect()
    b = hash_split(docs).orderBy("doc_id").collect()
    assert a == b


def test_hash_split_rejects_incomplete_fractions(spark):
    """A fractions list not ending at 100 would leave tail buckets
    split=NULL and partitionBy('split') would silently drop them into
    __HIVE_DEFAULT_PARTITION__ — must fail loudly instead."""
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="ending at 100"):
        hash_split(docs, fractions=[("train", 95)])
    with pytest.raises(ValueError, match="increasing"):
        hash_split(docs, fractions=[("a", 90), ("b", 80), ("c", 100)])
    # empty list is a descriptive ValueError, not IndexError (and not
    # a silent fallback to the default fractions)
    with pytest.raises(ValueError, match="ending at 100"):
        hash_split(docs, fractions=[])


def test_hash_split_is_shuffle_free(spark):
    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pagerank_plan_does_not_replay_edge_lineage(spark):
    """The loop-invariant (edges ⋈ deg) and node tables are cut out of
    the per-iteration plan; without the materialization the 3-iteration
    plan over the co-occurrence pipeline carried 51 exchanges.
    (small_graph_threshold=0 forces the DISTRIBUTED path — the query
    itself dispatches this tiny graph to the driver.)"""
    from kgp.queries_ext import cooccurrence_graph

    edges, nodes = cooccurrence_graph(spark, "/root/testdata/sf0.01")
    df = pagerank_int(
        edges, nodes=nodes, iters=3, small_graph_threshold=0
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 12, plan.count("Exchange")


def test_pagerank_small_dispatch_matches_distributed(spark):
    """The driver-side recurrence is value-identical to the
    distributed loop on the same graph (the CC parity contract)."""
    from kgp.queries_ext import cooccurrence_graph

    edges, nodes = cooccurrence_graph(spark, "/root/testdata/sf0.01")
    local = {
        (r["id"], r["rank"])
        for r in pagerank_int(edges, nodes=nodes, iters=3).collect()
    }
    dist = {
        (r["id"], r["rank"])
        for r in pagerank_int(
            edges, nodes=nodes, iters=3, small_graph_threshold=0
        ).collect()
    }
    assert local == dist and len(local) > 0


def test_frequent_ngrams_cap_and_tiebreak(spark):
    from kgp.operators.dedup import frequent_ngrams

    docs = spark.createDataFrame(
        [(i, "x y z common tail") for i in range(6)]
        + [(100 + i, "a b c unique") for i in range(2)],
        "doc_id long, text string",
    )
    rows = frequent_ngrams(docs, n=3, min_docs=5, top=50).collect()
    grams = [r["gram"] for r in rows]
    # only the 6-doc grams survive min_docs=5; ordered by gram ASC on
    # the (n_docs, n_occurrences) tie
    assert grams == sorted(grams)
    assert all(r["n_docs"] == 6 for r in rows)
    assert "x y z" in grams and "a b c" not in grams


def test_triangle_counts_known_graph(spark):
    """K4 + pendant edge + isolated node, hand-counted: every K4
    vertex sits in C(3,2)=3 triangles, the pendant/isolated in 0."""
    from kgp.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in "abcdez"], "id string"
    )
    got = {
        r["id"]: (r["degree"], r["triangles"])
        for r in triangle_counts(edges, nodes).collect()
    }
    assert got == {
        "a": (3, 3), "b": (3, 3), "c": (3, 3), "d": (4, 3),
        "e": (1, 0), "z": (0, 0),
    }


def test_triangle_counts_randomized_vs_python(spark):
    """Canonical-orientation wedge close vs brute-force enumeration
    over a deterministic random graph."""
    import itertools
    import random

    from kgp.operators.graph import triangle_counts

    rng = random.Random(7)
    ids = [f"n{i}" for i in range(30)]
    es = sorted(
        {
            tuple(sorted(rng.sample(ids, 2)))
            for _ in range(120)
        }
    )
    eset = set(es)
    tri = {n: 0 for n in ids}
    deg = {n: 0 for n in ids}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    for a, b, c in itertools.combinations(sorted(ids), 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    edges = spark.createDataFrame(es, "src string, dst string")
    nodes = spark.createDataFrame([(n,) for n in ids], "id string")
    got = {
        r["id"]: (r["degree"], r["triangles"])
        for r in triangle_counts(edges, nodes).collect()
    }
    assert got == {n: (deg[n], tri[n]) for n in ids}


def test_triangle_counts_canonicalizes_dirty_input(spark):
    """Duplicate, reversed, and self-loop input pairs must not inflate
    degree or triangle counts — the operator canonicalizes internally
    (least/greatest, src<dst filter, dropDuplicates)."""
    from kgp.operators.graph import triangle_counts

    clean = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    dirty = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "c"), ("c", "b"),
         ("c", "d"), ("d", "c"), ("d", "d")],
        "src string, dst string",
    )
    want = {
        r["id"]: (r["degree"], r["triangles"])
        for r in triangle_counts(clean).collect()
    }
    got = {
        r["id"]: (r["degree"], r["triangles"])
        for r in triangle_counts(dirty).collect()
    }
    assert got == want
    assert want["a"] == (2, 1) and want["d"] == (1, 0)
