"""X3 for entity linking: char-n-gram MinHash-LSH name blocking."""

from pyspark.sql import functions as F

from kgp.operators.canon import canonicalize_entities
from kgp.operators.linking import (
    char_shingles_col,
    name_blocking_candidates,
)


def _ents(spark):
    rows = [
        ("entity:acme_corp", "Acme Corp"),
        ("entity:acme_corporation", "Acme Corporation"),
        ("entity:globex", "Globex"),
        ("entity:globex_inc", "Globex Inc"),
        ("entity:initech", "Initech"),
        ("entity:zurich", "Zurich"),
    ]
    return spark.createDataFrame(rows, "entity_id string, name string")


def test_char_shingles(spark):
    df = spark.range(1).select(
        char_shingles_col(F.lit("Acme"), 3).alias("s"),
        char_shingles_col(F.lit("ab"), 3).alias("short"),
    )
    r = df.collect()[0]
    assert r["s"] == ["acm", "cme"]
    assert r["short"] == ["ab"]


def test_name_blocking_finds_alias_variants(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in name_blocking_candidates(_ents(spark)).collect()
    }
    assert ("entity:acme_corp", "entity:acme_corporation") in pairs
    assert ("entity:globex", "entity:globex_inc") in pairs
    # unrelated names don't pair
    assert not any("initech" in a or "initech" in b for a, b in pairs)
    assert not any("zurich" in a or "zurich" in b for a, b in pairs)


def test_name_blocking_feeds_canonicalization(spark):
    ents = _ents(spark).withColumn(
        "canonical_id", F.lit(None).cast("string")
    )
    same = name_blocking_candidates(ents).select("id_a", "id_b")
    out = {r["entity_id"]: r["canonical_id"]
           for r in canonicalize_entities(ents, same).collect()}
    assert out["entity:acme_corporation"] == "entity:acme_corp"
    assert out["entity:globex_inc"] == "entity:globex"
    assert out["entity:initech"] == "entity:initech"
