"""Approximate sketches: tolerance vs exact answers."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_tolerance(spark):
    from kgp.queries_ext import q_events_approx_distinct

    approx = {r["event_type"]: r["approx_users"]
              for r in q_events_approx_distinct(spark, SF).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.05 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_percentile_approx_within_tolerance(spark):
    from kgp.queries_ext import q_events_percentiles

    approx = {r["event_type"]: (r["p50"], r["p95"], r["p99"])
              for r in q_events_percentiles(spark, SF).collect()}
    exact_rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.expr(
            "percentile(value, array(0.5, 0.95, 0.99))"
        ).alias("p"))
        .collect()
    )
    exact = {r["event_type"]: r["p"] for r in exact_rows}
    for k, want in exact.items():
        got = approx[k]
        for g, w in zip(got, want):
            assert abs(g - w) <= max(1.0, 0.05 * abs(w)), (k, got, want)
