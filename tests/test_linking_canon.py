"""X2–X5: entity linking, LSH blocking, scoring, connected components."""

import pytest
from pyspark.sql import functions as F

from kgp.gazetteer import ALIAS_DICT
from kgp.operators.canon import (
    canonicalize_entities,
    connected_components,
    same_as_from_alias,
)
from kgp.operators.dedup import (
    near_dup_pairs_bruteforce,
    near_dup_pairs_minhash,
)
from kgp.operators.linking import link_mentions


def test_connected_components_chain_and_clique(spark):
    """A 4-node path, a 3-clique, and an isolated edge must each
    collapse to their min id; CC must converge (fixpoint asserted
    inside the operator)."""
    edges = spark.createDataFrame(
        [
            ("b", "a"), ("b", "c"), ("c", "d"),        # path a-b-c-d
            ("x", "y"), ("y", "z"), ("x", "z"),        # clique x-y-z
            ("m", "n"),                                 # pair
        ],
        "src string, dst string",
    )
    cc = {r["node"]: r["component"] for r in
          connected_components(edges, small_graph_threshold=0).collect()}
    assert cc == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "m": "m", "n": "m",
    }


def test_connected_components_partition_invariance(spark):
    """Same component labels at 1 and 13 partitions (determinism)."""
    rows = [(f"n{i}", f"n{i + 1}") for i in range(0, 40, 2)]
    e1 = spark.createDataFrame(rows, "src string, dst string").repartition(1)
    e2 = spark.createDataFrame(rows, "src string, dst string").repartition(13)
    r1 = sorted(map(tuple,
                    connected_components(e1, small_graph_threshold=0)
                    .collect()))
    r2 = sorted(map(tuple,
                    connected_components(e2, small_graph_threshold=0)
                    .collect()))
    assert r1 == r2


def test_alias_linking_and_canonicalization_pages(spark):
    """X2 alias link + X5 CC over the pages gazetteer: all surfaces of
    one canonical entity end in one component keyed by min entity_id."""
    alias = spark.createDataFrame(
        [(s, c) for s, _, c in ALIAS_DICT],
        "surface string, canonical_id string",
    )
    # entity rows as produced by build_entities: entity_id + name
    ents = spark.createDataFrame(
        [
            ("entity:ada_lovelace", "Ada Lovelace"),
            ("entity:a._lovelace", "A. Lovelace"),
            ("entity:lovelace", "Lovelace"),
            ("entity:turing", "Turing"),
            ("entity:nosuch", "Unknown Name"),
        ],
        "entity_id string, name string",
    ).withColumn("canonical_id", F.lit(None).cast("string"))
    same = same_as_from_alias(ents, alias)
    out = {
        r["entity_id"]: r["canonical_id"]
        for r in canonicalize_entities(ents, same).collect()
    }
    assert out["entity:ada_lovelace"] == "entity:a._lovelace"
    assert out["entity:a._lovelace"] == "entity:a._lovelace"
    assert out["entity:lovelace"] == "entity:a._lovelace"
    # singleton alias group and unmatched name canonicalize to self
    assert out["entity:turing"] == "entity:turing"
    assert out["entity:nosuch"] == "entity:nosuch"


def test_link_mentions_broadcast(spark):
    mentions = spark.createDataFrame(
        [("u1", "Acme Corp"), ("u1", "Globex Inc"), ("u2", "Nothing")],
        "url string, surface string",
    )
    alias = spark.createDataFrame(
        [(s, c) for s, _, c in ALIAS_DICT],
        "surface string, canonical_id string",
    )
    out = {(r["url"], r["surface"]): r["canonical_id"]
           for r in link_mentions(mentions, alias).collect()}
    assert out[("u1", "Acme Corp")] == "entity:acme_corp"
    assert out[("u1", "Globex Inc")] == "entity:globex"
    assert out[("u2", "Nothing")] is None
    # plan check: the alias side must be broadcast (no shuffle of mentions)
    plan = link_mentions(mentions, alias)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minhash_lsh_recall_vs_bruteforce(spark):
    """LSH candidates must recover every true near-dup pair at j≥0.7
    (banding gives P≈0.98 per pair at s=0.7; the driver documents
    fixture has planted dups well above that)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_bruteforce(docs, threshold=0.7).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_minhash(docs, threshold=0.7).collect()
    }
    assert truth, "fixture should contain planted near-dups"
    recall = len(lsh & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(lsh))
    # and LSH never invents pairs below threshold (verification step)
    assert lsh <= truth | lsh  # all LSH pairs are jaccard-verified ≥ 0.7
    for pair in lsh:
        assert pair in truth, "verified LSH pair missing from brute force"


@pytest.mark.parametrize("parts", [1, 7])
def test_minhash_partition_invariance(spark, parts):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(parts)
    )
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_minhash(docs, threshold=0.5).collect()
    )
    # pinned expectation from the sf0.001 fixture (25 planted pairs + 3
    # incidental high-overlap pairs at this threshold)
    assert len(pairs) == 28


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 60-node path must converge within max_iter (pointer doubling
    gives O(log d) rounds; plain propagation would need 59)."""
    rows = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(59)]
    cc = connected_components(
        spark.createDataFrame(rows, "src string, dst string"),
        small_graph_threshold=0,
    )
    comps = {r["component"] for r in cc.collect()}
    assert comps == {"n00"}


def test_same_as_star_not_clique(spark):
    """k entities sharing one alias emit k-1 star edges, not the
    k(k-1)/2 clique."""
    ents = spark.createDataFrame(
        [(f"entity:e{i}", "Acme Corp") for i in range(6)],
        "entity_id string, name string",
    )
    alias = spark.createDataFrame(
        [("Acme Corp", "canon:acme")],
        "surface string, canonical_id string",
    )
    edges = same_as_from_alias(ents, alias).collect()
    assert len(edges) == 5
    assert all(r["id_a"] == "entity:e0" for r in edges)


def test_cc_local_fast_path_matches_distributed(spark):
    """The size-dispatched union-find must produce the identical
    labeling as the hash-min + pointer-doubling loop."""
    import random

    rng = random.Random(7)
    rows = [
        (f"v{rng.randrange(80):02d}", f"v{rng.randrange(80):02d}")
        for _ in range(120)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    e = spark.createDataFrame(rows, "src string, dst string")
    local = sorted(map(tuple, connected_components(e).collect()))
    dist = sorted(
        map(
            tuple,
            connected_components(e, small_graph_threshold=0).collect(),
        )
    )
    assert local == dist and local
