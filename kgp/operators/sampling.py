"""Deterministic dataset splitting for training pipelines.

At 100 TB you cannot split with `rand()`: re-runs, resumed jobs, and
late-arriving partitions must land every document in the SAME split,
and the assignment must be reproducible across engines and cluster
sizes. The standard fix is a content-hash bucket: md5 of the stable
document key, first 8 hex chars as an integer, mod 100. md5 is
byte-identical in Spark and DuckDB (see kgp/queries_ext.py exactness
policy), so the split itself sits on the value-exact oracle gate.

The whole operator is a single stateless JVM projection — no shuffle,
no UDF, fully pushdown-transparent — so it composes with any scan at
zero cost and the assignment is independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cumulative percentage upper bounds; order defines precedence
DEFAULT_FRACTIONS: list[tuple[str, int]] = [
    ("train", 80),
    ("val", 90),
    ("test", 100),
]


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5(key).

    First 8 hex chars = 32 uniform bits, always positive in a BIGINT,
    so `%` agrees between Spark and DuckDB (both truncate toward zero;
    sign never differs on non-negative operands).
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Append (bucket, split) columns: reproducible train/val/test
    assignment keyed on the document id."""
    fractions = DEFAULT_FRACTIONS if fractions is None else fractions
    bounds = [ub for _, ub in fractions]
    if not bounds or bounds != sorted(set(bounds)) or bounds[-1] != 100:
        # The when-chain has no terminal otherwise: a list whose last
        # upper bound is < 100 would assign split=NULL to the tail
        # buckets, and partitionBy("split") would silently drop those
        # rows into __HIVE_DEFAULT_PARTITION__. Fail loudly instead.
        raise ValueError(
            "fractions must be strictly increasing cumulative "
            f"percentages ending at 100, got {fractions!r}"
        )
    b = hash_bucket(F.col(id_col))
    expr = None
    for name, ub in fractions:
        cond = b < ub
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    return df.withColumn("bucket", b).withColumn("split", expr)


def hash_bucket_sql(key_sql: str, buckets: int = 100) -> str:
    """DuckDB twin of hash_bucket ('0x…' CAST parses hex to BIGINT)."""
    return (
        f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {buckets}"
    )
