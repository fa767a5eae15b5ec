"""Bucketed range join — SURVEY §2.4 X-joins.

`range_join_within(df, key, ts, window)`: all pairs of rows sharing
`key` whose timestamps lie within `window` of each other.

A naive theta join (|a.ts − b.ts| ≤ w) becomes a per-key nested loop —
O(n²) on hot keys. The scalable plan buckets time into width-w cells
and turns the range predicate into an equi-join on (key, cell) after
replicating ONE side into its 3 adjacent cells:

    b side: explode cell ∈ {c−1, c, c+1}  (3× one side, not |range|×)
    join on (key, cell) — plain shuffled hash join, AQE-skew-safe
    exact |dt| ≤ w filter re-applied (bucket adjacency is a superset)

The replication factor is constant (3), independent of data volume and
window size — this is the interval-join layout Flink/KSQL use. DuckDB
evaluates the inequality join directly as the oracle
(kgp.queries_ext.events_range_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_within(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    window_s: float = 60.0,
    id_col: str = "event_id",
) -> DataFrame:
    """(id_a < id_b, gap_us) pairs with |ts_a − ts_b| ≤ window_s."""
    w_us = int(window_s * 1_000_000)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    base = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.floor(us / F.lit(w_us)).alias("_cell"),
    )
    a = base.select(
        F.col("_k"),
        F.col("_id").alias("id_a"),
        F.col("_us").alias("us_a"),
        "_cell",
    )
    b = base.select(
        F.col("_k"),
        F.col("_id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.explode(
            F.array(F.col("_cell") - 1, F.col("_cell"), F.col("_cell") + 1)
        ).alias("_cell"),
    )
    return (
        a.join(b, ["_k", "_cell"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= w_us)
        )
        .select(
            F.col("_k").alias(key),
            "id_a",
            "id_b",
            F.abs(F.col("us_a") - F.col("us_b")).alias("gap_us"),
        )
        # no distinct needed: a carries ONE cell, so each qualifying
        # pair matches exactly one of b's three replicas — adding a
        # distinct here would buy nothing and cost a full shuffle
    )
