"""X5 — canonicalization: connected components over same-as pairs.

North-rule: "canonicalization by connected-components (GraphFrames-style
iterative label propagation over DataFrames)". graphframes is not
installed in this sandbox (SURVEY §7.0), so CC is a hand-rolled
DataFrame loop.

Algorithm: hash-min label propagation WITH pointer doubling (the HCC
construction of Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds" — the same primitive GraphFrames'
CC builds on). Each round does two DataFrame steps:

    1. label(v) ← min(label(v), min_{(u,v) or (v,u) ∈ E} label(u))
       (edges⋈labels + groupBy(node).min)
    2. label(v) ← min(label(v), label(label(v)))
       (labels self-join — halves the remaining hop distance)

Step 2 makes the round count O(log diameter): a 30-node same-as chain
(transitive near-dup names from LSH blocking) converges in ~6 rounds
instead of 29. A kgp.materialize cut every round truncates the lineage
chain (SURVEY §4.4) so the plan doesn't grow exponentially; convergence is
detected by a changed-labels count and the fixpoint asserted, never
assumed.

Scale notes: each round shuffles (edges ⋈ labels) on node id — the
partitioning key is stable across rounds, so AQE reuses sane partition
counts; hot hub nodes hit the map-side-combine of the min-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgp.materialize import materialize as _mat


def _cc_local(spark, collected_edges) -> DataFrame:
    """Union-find on the driver for SMALL edge sets (≤ the caller's
    threshold — the same justification as a broadcast join: the data
    provably fits in one process). Union-find is direction-agnostic
    and idempotent, so the raw (possibly duplicated, one-direction)
    edge rows suffice — no union/distinct pre-pass. Produces the
    identical (node, component=min node id) labeling as the
    distributed loop (equality asserted in tests/test_linking_canon.py).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in collected_edges:
        # register both endpoints (a self-loop node must appear in the
        # output labeled as itself, as the distributed loop does)
        parent.setdefault(row["a"], row["a"])
        parent.setdefault(row["b"], row["b"])
        a, b = find(row["a"]), find(row["b"])
        if a != b:
            # min-label union ⇒ every root is its component's min id
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    rows = [(n, find(n)) for n in sorted(parent)]
    return spark.createDataFrame(rows, "node string, component string")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    `edges` is an undirected same-as pair set; ids are strings. Nodes
    with no edges are absent (callers left-join and coalesce to self).

    Size dispatch: a same-as graph under `small_graph_threshold` input
    edge rows resolves via driver-side union-find — ONE bounded job
    (`limit(threshold+1).collect()` is both the size probe and the
    data fetch; union-find needs no symmetrized/deduped edges, so the
    small path skips the union+distinct+checkpoint entirely — the
    iterative loop's per-round action overhead dwarfs an 11-node
    graph). Anything larger runs the hash-min + pointer-doubling loop,
    whose O(log diameter) rounds are the 100 TB path. Pass
    small_graph_threshold=0 to force the distributed loop.
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if small_graph_threshold:
        # scans at most threshold+1 rows, not the full edge set
        sample = raw.limit(small_graph_threshold + 1).collect()
        if len(sample) <= small_graph_threshold:
            return _cc_local(edges.sparkSession, sample)
    e = _mat(
        raw.union(
            raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    labels = _mat(
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        # hash-min step: neighbor's current label flows along edges
        prop = (
            e.join(labels, e.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        stepped = (
            labels.select("node", "component")
            .union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer-doubling step: l(v) ← min(l(v), l(l(v))). Components
        # are node ids, so looking the label up in the same table
        # halves the remaining path each round — total rounds are
        # O(log diameter), not O(diameter), so a 30-entity same-as
        # CHAIN (transitive near-dup names) converges in ~6 rounds.
        lut = stepped.select(
            F.col("node").alias("_c_node"),
            F.col("component").alias("_c_comp"),
        )
        new_labels = _mat(
            stepped.join(
                lut, stepped.component == F.col("_c_node"), "left"
            ).select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_c_comp"), F.col("component")),
                ).alias("component"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def canonicalize_entities(
    entities: DataFrame,
    same_as: DataFrame,
    id_col: str = "entity_id",
) -> DataFrame:
    """Attach canonical_id = min entity_id of the same-as component.

    Entities in no component canonicalize to themselves — the judged
    entity set is unchanged; canonical_id is an additional column
    (SURVEY §7.1 step 6 invariant).
    """
    cc = connected_components(same_as, "id_a", "id_b")
    return (
        entities.drop("canonical_id")
        .join(
            cc.select(
                F.col("node").alias(id_col),
                F.col("component").alias("canonical_id0"),
            ),
            on=id_col,
            how="left",
        )
        .withColumn(
            "canonical_id", F.coalesce("canonical_id0", F.col(id_col))
        )
        .drop("canonical_id0")
    )


def canonicalize_with_alias(
    entities: DataFrame,
    alias_df: DataFrame,
    materialize: bool = True,
) -> DataFrame:
    """X2→X5 in one call: same-as edges from the alias dict, CC, and
    the canonical_id attach — with the entity table materialized ONCE
    first (default). The entity DataFrame fans out to three consumers
    (edge build ×2 via m/hubs, final attach join), and without
    materialization Spark re-executes the whole upstream
    NER/cap/groupBy pipeline for each (measured 2.79 s → 2.02 s warm
    at sf0.1/local[32]). At scale this is "persist the entity table
    before resolution" — standard practice for a multi-consumer
    intermediate."""
    if materialize:
        entities = _mat(entities)
    return canonicalize_entities(
        entities, same_as_from_alias(entities, alias_df)
    )


def same_as_from_alias(entities: DataFrame, alias_df: DataFrame) -> DataFrame:
    """X2→X5 bridge: entities sharing an alias-dict canonical_id become
    same-as pairs (broadcast join, tiny dict).

    Edges are a STAR per alias group — each member pairs with the
    group's min entity_id — not the full clique: a hot alias matched
    by k entities emits k−1 edges instead of k(k−1)/2 (a 100k-entity
    boilerplate surface would otherwise explode to ~5·10⁹ pairs).
    Connected components are identical either way.
    """
    m = (
        entities.select("entity_id", "name")
        .join(
            F.broadcast(
                alias_df.select(
                    F.col("surface").alias("name"), "canonical_id"
                )
            ),
            on="name",
            how="inner",
        )
        .select("entity_id", "canonical_id")
    )
    hubs = m.groupBy("canonical_id").agg(
        F.min("entity_id").alias("id_a")
    )
    return (
        m.join(hubs, "canonical_id")
        .filter(F.col("entity_id") != F.col("id_a"))
        .select("id_a", F.col("entity_id").alias("id_b"))
        .distinct()
    )
