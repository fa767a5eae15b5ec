"""Similarity search over an embedding column (ARRAY<FLOAT>).

* brute-force exact cosine top-k — the correctness baseline; scored
  with JVM higher-order functions (zip_with/aggregate dot product, no
  Python), ranked with a window per query id.
* sign-LSH bucketed ANN — the scale path: bucket key = sign bits of
  the first B dimensions (axis-aligned hyperplane LSH). Queries probe
  only their own bucket, turning the all-pairs cross join into a
  bucket-equi-join. Recall < 1 by construction; measured vs brute force
  in tests (multi-probe = flip one bit raises recall; single-probe is
  the judged variant because it is SQL-oracle-able).
* embedding cosine near-dup pairs — dedup-by-embedding entry point.

Scale notes: brute force is O(Q·N) — fine when Q (queries) is small or
pushed through a broadcast; the bucketed variant shuffles once on the
bucket key. Both keep the N side partition-local arithmetic in codegen.
At real 100 TB scale the bucket path generalizes to IVF: k-means
centroids as bucket keys, same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kgp.operators.linking import cosine_col

SIGN_LSH_BITS = 8


def topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim, rank).

    queries is small ⇒ broadcast; the big side never shuffles until the
    per-query top-k (window on query_id — Q keys, trivially balanced).
    Self-matches excluded. Deterministic tiebreak (sim desc, id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    n = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_e4"), F.asc("neighbor_id")
    )
    return (
        n.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_e4",
            F.floor(cosine_col(F.col("_qv"), F.col("_nv")) * 10000)
            .cast("long"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim_e4", "rank")
    )


def sign_bucket_col(vec: Column, bits: int = SIGN_LSH_BITS) -> Column:
    """LSH bucket key: '1'/'0' per sign of dims 0..bits-1 (axis-aligned
    hyperplanes — deterministic, JVM-only, SQL-twinnable)."""
    return F.concat(
        *[
            F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ]
    )


def topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_LSH_BITS,
) -> DataFrame:
    """Bucketed ANN: score only neighbors in the query's sign bucket.

    One equi-join on the bucket key (2^bits buckets). Rank within the
    bucket; recall measured against topk_bruteforce in tests.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    n = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_nv"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_e4"), F.asc("neighbor_id")
    )
    return (
        n.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_e4",
            F.floor(cosine_col(F.col("_qv"), F.col("_nv")) * 10000)
            .cast("long"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim_e4", "rank")
    )


def near_dup_pairs_embedding(
    embeddings: DataFrame,
    threshold: int = 9500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_LSH_BITS,
    exact: bool = False,
) -> DataFrame:
    """(id_a < id_b, sim_e4 ≥ threshold) — embedding near-duplicates.

    Similarities ship as exact integers sim_e4 = floor(cosine·10⁴):
    floor of bit-identical doubles (same fold order both engines) is
    deterministic where round-half is not.

    exact=True does the O(n²) cross join (small-SF oracle baseline);
    default blocks on the sign-LSH bucket first (near-dups at high
    cosine almost surely share leading signs; recall tested).
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    joined = (
        a.crossJoin(b.drop("bucket"))
        if exact
        else a.join(b, "bucket")
    )
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim_e4",
            F.floor(cosine_col(F.col("_va"), F.col("_vb")) * 10000)
            .cast("long"),
        )
        .filter(F.col("sim_e4") >= threshold)
        .select("id_a", "id_b", "sim_e4")
    )
