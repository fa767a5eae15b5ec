"""As-of join semantics on hand-built fixtures."""

from datetime import datetime

from kgp.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),   # before any right
            (2, "u1", _ts("2024-01-01T12:00:00")),   # == right ts (match)
            (3, "u1", _ts("2024-01-01T13:30:00")),   # between rights
            (4, "u1", _ts("2024-01-01T15:00:00")),   # after last right
            (5, "u2", _ts("2024-01-01T12:00:00")),   # other key, no right
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T12:00:00"), 100),
            ("u1", _ts("2024-01-01T14:00:00"), 200),
        ],
        "user_id string, ts timestamp, snap long",
    )
    out = {r["event_id"]: r["snap"]
           for r in asof_join(left, right, key="user_id").collect()}
    assert out == {1: None, 2: 100, 3: 100, 4: 200, 5: None}


def test_asof_null_payload_does_not_leak_older_row(spark):
    """A right row with a NULL payload field must shadow older rows
    (struct fill, not per-column fill)."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T10:00:00"), 7),
            ("k", _ts("2024-01-01T11:00:00"), None),  # latest: NULL snap
        ],
        "user_id string, ts timestamp, snap long",
    )
    row = asof_join(left, right, key="user_id").collect()[0]
    assert row["snap"] is None


def test_asof_partition_invariance(spark):
    import random

    random.seed(7)
    lrows = [(i, f"u{i % 5}", _ts("2024-01-01T00:00:00").replace(
        hour=random.randint(0, 23))) for i in range(100)]
    rrows = [(f"u{j % 5}", _ts("2024-01-01T00:00:00").replace(
        hour=random.randint(0, 23)), j) for j in range(40)]
    l1 = spark.createDataFrame(
        lrows, "event_id long, user_id string, ts timestamp")
    r1 = spark.createDataFrame(
        rrows, "user_id string, ts timestamp, snap long")
    # dedupe right (key, ts) for a well-defined as-of answer
    from pyspark.sql import functions as F
    r1 = r1.groupBy("user_id", "ts").agg(F.max("snap").alias("snap"))
    a = sorted(map(tuple, asof_join(
        l1.repartition(1), r1, key="user_id").collect()))
    b = sorted(map(tuple, asof_join(
        l1.repartition(17), r1, key="user_id").collect()))
    assert a == b


def test_asof_right_tiebreak_keeps_equal_ts_match(spark):
    """Regression: with right_tiebreak set, an equal-ts right row must
    still match (<= semantics) and the max-tiebreak row must win."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T12:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T12:00:00"), 7),
            ("k", _ts("2024-01-01T12:00:00"), 9),
        ],
        "user_id string, ts timestamp, snap long",
    )
    row = asof_join(
        left, right, key="user_id", right_tiebreak="snap"
    ).collect()[0]
    assert row["snap"] == 9
