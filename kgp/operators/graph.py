"""Graph analytics over the materialized KG: deterministic integer
PageRank on DataFrames (GraphFrames-style iterative joins, no RDDs).

The reference stores its graph in a Gremlin server and does no global
analytics over it; entity importance ranking is the natural next query
a KG consumer runs, so it is implemented here as a first-class operator
(exceeds reference semantics by design, like the IVF ANN path).

Why INTEGER PageRank: float PageRank sums contributions in partition
order, so the same graph yields last-ulp-different ranks across
engines (and across Spark runs with different partitioning) — that can
never sit on a value-exact cross-engine gate. With ranks as scaled
BIGINTs and the damped contribution computed by integer division
(``(85 * rank) div (100 * deg)``), addition is associative and
commutative EXACTLY, so Spark and DuckDB agree bit-for-bit regardless
of order. The fixed-point semantics (damping 0.85, base 0.15 scaled by
1e6) are pinned; convergence behavior matches float PageRank to ~1e-6
per iteration, plenty for ranking.

Scale shape (100 TB): per iteration, one shuffle to join ranks onto
edges by src (both sides hash-partitioned on the same key — with the
edge table bucketed by src via kgp.catalog the exchange on the edge
side disappears) and one shuffle for the sum-by-dst, which partially
aggregates map-side. The rank table carries 16 bytes/node. Degree is
computed once, outside the loop. Lineage growth per iteration is two
joins; for deep iteration counts pass ``checkpoint_every`` so the plan
is cut with localCheckpoint before it compounds (same pattern as the
pointer-doubling CC loop in kgp/operators/canon.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.materialize import materialize as _mat

PR_INIT = 1_000_000  # rank fixed-point scale: 1.0 == 1e6
PR_BASE = 150_000    # (1 - damping) * scale == 0.15 * 1e6


def _pagerank_local(spark, edge_rows, node_ids, iters, id_type):
    """The identical fixed-point recurrence on the driver for SMALL
    graphs (same justification as the union-find dispatch in
    kgp/operators/canon.py: the data provably fits in one process, and
    the iterative loop's per-round action overhead dwarfs it).
    Semantics match the distributed loop exactly: out-degree counts
    ALL out-edges of a src (even to targets outside `node_ids`), while
    contributions flow only between ids present in `node_ids` —
    equality asserted in tests/test_graph.py."""
    out: dict = {}
    for s, _ in edge_rows:
        out[s] = out.get(s, 0) + 1
    r = {n: PR_INIT for n in node_ids}
    for _ in range(iters):
        nxt = {n: PR_BASE for n in node_ids}
        for s, d in edge_rows:
            if s in r and d in nxt:
                nxt[d] += (85 * r[s]) // (100 * out[s])
        r = nxt
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("rank", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(n, r[n]) for n in sorted(node_ids)], schema
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    checkpoint_every: int | None = None,
    materialize: bool = True,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Deterministic integer PageRank over directed ``edges(src, dst)``.

    ``edges`` must already be distinct directed pairs (symmetrize an
    undirected graph with a union before calling). ``nodes(id)``
    defaults to the endpoints of ``edges``; pass it explicitly to keep
    isolated vertices (they hold rank PR_BASE after the first
    iteration). Returns ``(id, rank)`` with rank a scaled BIGINT.

    Size dispatch (the canon.py CC pattern): when BOTH the edge and
    node tables fit under ``small_graph_threshold`` rows, the
    recurrence runs on the driver in one bounded job per table — the
    probe `limit(k+1).collect()` doubles as the fetch. Pass
    ``small_graph_threshold=0`` to force the distributed loop.

    ``materialize`` (default) eagerly materializes the loop-invariant
    degree-annotated edge table and the node table before iterating
    (kgp.materialize — conf-switchable primitive) — without it every
    iteration's plan replays the whole edge-derivation lineage
    (measured 51 exchanges for 3 iterations over the co-occurrence
    pipeline vs ~9 with the cut). Alternatively pre-write edges with
    kgp.catalog's bucketed layout (bucket by src) so the per-iteration
    rank join needs no edge-side exchange at all.
    """
    if small_graph_threshold:
        k = small_graph_threshold
        es = edges.select("src", "dst").limit(k + 1).collect()
        if len(es) <= k:
            erows = [(r[0], r[1]) for r in es]
            id_type = edges.schema["src"].dataType
            if nodes is None:
                ns = sorted(
                    {a for a, _ in erows} | {b for _, b in erows}
                )
                return _pagerank_local(
                    edges.sparkSession, erows, ns, iters, id_type
                )
            nrows = nodes.select("id").limit(k + 1).collect()
            if len(nrows) <= k:
                ns = sorted(r[0] for r in nrows)
                return _pagerank_local(
                    edges.sparkSession, erows, ns, iters, id_type
                )
            # edges small but node table isn't: distributed path
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) is loop-invariant
    out = edges.join(deg, "src")
    if materialize:
        out = _mat(out)
        nodes = _mat(nodes)
    ranks = nodes.select("id", F.lit(PR_INIT).cast("long").alias("rank"))
    for i in range(iters):
        contribs = (
            out.join(ranks, out.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                # integer div: exact in any summation order (DuckDB //)
                F.expr("(85 * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "id", "left").select(
            "id",
            (F.lit(PR_BASE) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = _mat(ranks)
    return ranks


def _tri_degree_oriented(
    e: DataFrame, deg: DataFrame, materialize: bool = True
) -> DataFrame:
    """Schank-Wagner degree-oriented wedge close over canonical edges
    ``e(src, dst)`` (src < dst, distinct) with ``deg(id, degree)``:
    orient each edge from its (degree, id)-smaller endpoint, pivot
    wedges only on out-edges. One (a, b, c) row per triangle (a the
    pivot). Out-degree under this orientation is O(√m), so the wedge
    table is O(m^1.5) even with zipf-head hubs — a hub's edges all
    point INTO it and pivot nothing."""
    ds = deg.select(
        F.col("id").alias("src"), F.col("degree").alias("_dsrc")
    )
    dd = deg.select(
        F.col("id").alias("dst"), F.col("degree").alias("_ddst")
    )
    ed = e.join(ds, "src").join(dd, "dst")
    # canonical input has src < dst, so <= breaks degree ties by id
    fwd = F.col("_dsrc") <= F.col("_ddst")
    o = ed.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("_ddst"))
        .otherwise(F.col("_dsrc"))
        .alias("_dv"),
    )
    if materialize:
        # consumed three times (two wedge sides + the closing probe);
        # callers that opted out of materialization (ADVICE r4: the
        # flag was ignored here) recompute the projection instead
        o = _mat(o)
    w1 = o.select("u", F.col("v").alias("b"), F.col("_dv").alias("_db"))
    w2 = o.select("u", F.col("v").alias("c"), F.col("_dv").alias("_dc"))
    wedges = w1.join(w2, "u").filter(
        (F.col("_db") < F.col("_dc"))
        | ((F.col("_db") == F.col("_dc")) & (F.col("b") < F.col("c")))
    )
    return (
        wedges.join(
            o.select(F.col("u").alias("b"), F.col("v").alias("c")),
            ["b", "c"],
        )
        .select(F.col("u").alias("a"), "b", "c")
    )


def triangle_counts(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    materialize: bool = True,
    orient: str = "id",
) -> DataFrame:
    """Per-node triangle participation + degree over undirected
    ``edges(src, dst)``. Input is canonicalized internally —
    least/greatest orientation, self-loops dropped, duplicates
    collapsed — so reversed or duplicated input pairs count each
    undirected edge once instead of silently inflating degree and
    triangle counts; already-canonical input passes through the
    dropDuplicates unchanged (idempotent, one extra map-side-partial
    shuffle absorbed by the materialize cut that follows).

    Triangle enumeration is the two-self-join wedge close: e1(a,b) ⋈
    e2(b,c) forms wedges, closed by probing e3(a,c); the a<b<c
    canonical orientation enumerates each triangle exactly once.
    Output ``(id, degree, triangles)`` covers every node in ``nodes``
    (default: edge endpoints) with 0-filled counts — clustering
    coefficient is then 2·triangles / (degree·(degree−1)) downstream.

    Scale shape: both joins key on edge endpoints with map-side
    partial agg on the final counts; the id-orientation matches the
    SQL twin exactly.

    ``orient`` picks the wedge-pivot order:

    * ``"id"`` (default) — a<b<c lexicographic close; matches the
      DuckDB oracle twin exactly. A head-entity hub of degree h
      pivots h·(h−1)/2 wedges: AQE's skew split rebalances those
      wedge rows across tasks, but the wedge COUNT itself stays
      quadratic in h.
    * ``"degree"`` — Schank-Wagner degree orientation: each edge
      points from its (degree, id)-smaller endpoint to the larger, and
      wedges pivot only on out-edges. Every vertex's out-degree is
      then O(√m), so total wedge work is O(m^1.5) REGARDLESS of degree
      skew — a degree-h hub pivots ~0 wedges (its edges all point
      INTO it). Counts are identical: each triangle has exactly one
      (degree, id)-minimal vertex, so it is enumerated exactly once;
      parity + the hub wedge bound are asserted in
      tests/test_resume_skew.py, measured numbers in PLANS.md. This is
      the production path for zipf-headed entity graphs.

    ``materialize`` (default) eagerly materializes the canonical edge
    table first (kgp.materialize): it is referenced four times (three
    join sides + degree) and alias-differing projections defeat
    Spark's ReusedExchange here, so an un-cut lineage replays the
    whole edge derivation per reference (observed: the incidence
    self-join + count-filter subplan planned 4× for the co-occurrence
    graph). Or pre-write edges bucketed by src (kgp.catalog).
    """
    if orient not in ("id", "degree"):
        raise ValueError(f"orient must be 'id' or 'degree': {orient!r}")
    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    if materialize:
        e = _mat(e)
    deg = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    if orient == "degree":
        tri = _tri_degree_oriented(e, deg, materialize)
    else:
        wedges = e.select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        ).join(
            e.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            "b",
        )
        tri = wedges.join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
        ).select("a", "b", "c")
    tn = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    if nodes is None:
        nodes = deg.select("id")
    return (
        nodes.join(deg, "id", "left")
        .join(tn, "id", "left")
        .select(
            "id",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0))
            .cast("long")
            .alias("triangles"),
        )
    )


def pagerank_sql(de_cte: str, iters: int = 3) -> str:
    """DuckDB twin: unrolled iterations over the same integer
    semantics. ``de_cte`` must define ``de(doc_id, eid)`` — distinct
    doc→entity incidence; the co-occurrence edge set and the rank
    recurrence are derived from it exactly as the Spark side does.
    """
    parts = [
        de_cte,
        """
edges AS (SELECT a.eid AS src, b.eid AS dst
          FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.eid <> b.eid
          GROUP BY 1, 2),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT eid AS id FROM de),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes)""",
    ]
    for i in range(iters):
        parts.append(
            f"""
r{i + 1} AS (
  SELECT n.id,
         -- sum(BIGINT) is HUGEINT in DuckDB; outer CAST pins BIGINT
         CAST(150000 + coalesce(sum(j.c), 0) AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS dst, (85 * r.rank) // (100 * d.deg) AS c
    FROM edges e JOIN deg d ON e.src = d.src
                 JOIN r{i} r ON r.id = e.src
  ) j ON j.dst = n.id
  GROUP BY n.id
)"""
        )
    sql = ",".join(parts)
    return (
        sql
        + f"\nSELECT id AS entity_id, rank AS pagerank FROM r{iters}"
    )
