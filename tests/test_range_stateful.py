"""Bucketed range join + stateful streaming operator."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kgp.operators.rangejoin import range_join_within


def test_range_join_matches_bruteforce(spark):
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append((i, i % 4, base + timedelta(seconds=(i * 37) % 5000)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["gap_us"])
        for r in range_join_within(df, key="user_id",
                                   window_s=120.0).collect()
    )
    # brute-force theta join as the in-test oracle
    a = df.alias("a")
    b = df.alias("b")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    brute = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(F.col("a.event_id") < F.col("b.event_id"))
        .withColumn("gap_us", F.abs(us("a.ts") - us("b.ts")))
        .filter(F.col("gap_us") <= 120 * 1_000_000)
        .select(F.col("a.event_id").alias("id_a"),
                F.col("b.event_id").alias("id_b"), "gap_us")
    )
    want = sorted((r["id_a"], r["id_b"], r["gap_us"])
                  for r in brute.collect())
    assert got == want and got


def test_range_join_boundary_inclusive(spark):
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 0, base),
            (2, 0, base + timedelta(seconds=60)),        # == window: in
            (3, 0, base + timedelta(seconds=60, microseconds=1)),  # out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    pairs = {(r["id_a"], r["id_b"])
             for r in range_join_within(df, key="user_id",
                                        window_s=60.0).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) in pairs


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """State must persist across micro-batches: two files, one file per
    trigger, final running totals equal the batch aggregate."""
    from kgp.streaming import stateful_running_counts

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    rows1 = [(i, datetime(2024, 1, 1), i % 3, "view", 10.0, "{}")
             for i in range(30)]
    rows2 = [(100 + i, datetime(2024, 1, 2), i % 3, "view", 5.0, "{}")
             for i in range(15)]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_running_counts(stream)
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pdf = spark.sql(
        "SELECT * FROM running_counts"
    ).toPandas()
    # update-mode memory sink keeps every emission; the LAST row per
    # user is the running total after all batches
    last = pdf.groupby("user_id").last()
    assert sorted(last["n"].tolist()) == [15, 15, 15]
    assert sorted(last["total"].tolist()) == [125.0, 125.0, 125.0]
    # state crossed batches: users emitted more than once
    assert (pdf.groupby("user_id").size() > 1).all()
