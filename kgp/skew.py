"""X6 — explicit skew handling: salting, two-phase aggregation,
url-hash repartitioning.

North-rule: "skew from head entities and mega-domains is handled
explicitly with salted aggregation keys, AQE skew-join hints, and
url-hash repartitioning". AQE conf lives in kgp.session.ENGINE_CONF
(adaptive.enabled + skewJoin.enabled); this module holds the two
API-level techniques AQE cannot do for you:

* two-phase salted aggregation — a groupBy on a zipf-headed key (head
  entity, mega-domain) funnels the head key's rows into one reduce
  task. Phase 1 aggregates on (key, salt = pmod(xxhash64(carrier), S))
  spreading each hot key over S tasks; phase 2 re-aggregates the S
  partials. Costs one extra (tiny) shuffle of ≤ S·|keys| rows; bounds
  every reduce task at |rows|/S.
* url-hash repartition — before a per-row-expensive stage (NER UDF),
  repartition on pmod(xxhash64(url), P) so one mega-domain's pages
  spread evenly rather than arriving clustered from the scan order.

The synthetic pages table (kgp.synth) plants zipf-ranked domains and
entities precisely so tests can verify salted == plain results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(carrier: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a high-cardinality
    carrier column (NOT the group key — salting the key itself with
    rand() breaks determinism and resume)."""
    return F.pmod(F.xxhash64(carrier), F.lit(n_salts)).cast("int")


def salted_count_distinct(
    df: DataFrame,
    key: str,
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Two-phase count(DISTINCT distinct_col) GROUP BY key, hot-key safe.

    Phase 1 dedups (key, salt, value) — the expensive shuffle, spread
    over n_salts tasks per key. Phase 2 merges partial distinct counts;
    correctness requires the salt to be a pure function of the DISTINCT
    column (same value ⇒ same salt ⇒ no double-count across salts).
    """
    phase1 = (
        df.select(
            key,
            F.col(distinct_col).alias("_v"),
            salt_col(F.col(distinct_col), n_salts).alias("_salt"),
        )
        .groupBy(key, "_salt")
        .agg(F.countDistinct("_v").alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias(out_col))


def salted_sum(
    df: DataFrame,
    key: str,
    value_col: str,
    carrier: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-phase SUM(value) GROUP BY key over a salted carrier."""
    phase1 = (
        df.select(
            key,
            F.col(value_col).alias("_v"),
            salt_col(F.col(carrier), n_salts).alias("_salt"),
        )
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias(out_col))


def repartition_by_url_hash(
    df: DataFrame, partitions: int, url_col: str = "url"
) -> DataFrame:
    """Spread mega-domains before expensive per-row stages: hash-
    partition on the full url — uniform regardless of domain skew
    (url is unique per row, unlike domain). NB: pass the column, not a
    pmod(...) of it — repartition hashes the expression value, so a
    pre-bucketed small-domain expression would collide partitions.
    """
    return df.repartition(partitions, F.col(url_col))
