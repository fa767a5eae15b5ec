"""As-of (time-travel) join — SURVEY §2.4 X-joins.

`asof_join(left, right, on, key)`: for every left row, attach the
most recent right row with right.ts <= left.ts within the same key —
the standard event↔dimension-snapshot temporal join.

Spark has no native ASOF JOIN; the idiomatic distributed plan is the
union-and-window ("piggyback") construction, NOT a theta join:

    tag rows (side=1 left, side=0 right) → union → window per key
    ordered by (ts, side) → running last non-null right-payload
    STRUCT via last(ignorenulls=True) → keep left rows

One shuffle on the key (the window), no O(|L|·|R|) pair blowup, no
range-condition nested loop — this is how as-of scales to 100 TB (the
alternative join + filter + row_number plan shuffles BOTH tables twice
and explodes skewed keys). The payload fills as ONE struct, so a right
row whose payload field is legitimately NULL does not leak an older
row's value for that field. DuckDB has native ASOF JOIN, which is the
independent oracle (kgp.queries_ext.events_asof_join).

Tie rules: right.ts == left.ts MATCHES (<= semantics, right sorts
before left at equal ts); among right rows with equal (key, ts) the
one latest in (tiebreak ascending) order wins, deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_tiebreak: str | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """left columns + right payload columns (NULL when no prior row).

    payload_cols: right columns to carry (default: all but key/ts).
    """
    payload = payload_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    left_only = [c for c in left.columns if c not in (key, ts)]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    payload_struct_t = (
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in payload) + ">"
    )

    lt = left.select(
        key,
        ts,
        F.lit(1).alias("_side"),
        *left_only,
        F.lit(None).cast(payload_struct_t).alias("_p"),
    )
    rt = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
    )
    u = lt.unionByName(rt)

    # tiebreak sorts AFTER _side: left rows carry a NULL payload, and
    # placing a nulls-first payload key before _side would sort them
    # ahead of equal-ts right rows, losing the <= tie match
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if right_tiebreak and right_tiebreak in payload:
        order.append(F.col("_p")[right_tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "_pf", F.last("_p", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        key,
        ts,
        *left_only,
        *[F.col("_pf")[c].alias(c) for c in payload],
    )
