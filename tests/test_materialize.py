"""kgp.materialize — the config-driven materialization primitive.

One test per mode (localCheckpoint | checkpoint | persist) plus the
failure contracts. The operators that route through it (CC loop,
PageRank/triangles edge tables, MinHash bands, tf table, entity
incidence) are covered by their own suites; here we pin the primitive
itself so a cluster deployment can flip the conf and trust every site
switches over.
"""
import pytest
from pyspark.sql import functions as F

from kgp.materialize import DIR_KEY, MODE_KEY, materialize


def _df(spark):
    return spark.range(100).withColumn("v", F.col("id") * 2)


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture
def clean_conf(spark):
    """Restore the materialize confs after each test so the session
    fixture's other consumers see the default mode."""
    yield spark
    spark.conf.unset(MODE_KEY)
    spark.conf.unset(DIR_KEY)


def test_default_mode_is_local_checkpoint(clean_conf):
    spark = clean_conf
    out = materialize(_df(spark))
    # A (local)checkpointed DataFrame's logical plan collapses to an
    # RDD scan (LogicalRDD) — the lineage cut is the whole point.
    assert "LogicalRDD" in _optimized_plan(out)
    assert out.count() == 100
    assert out.agg(F.sum("v")).first()[0] == 9900


def test_checkpoint_mode_requires_dir_then_uses_it(clean_conf, tmp_path):
    spark = clean_conf
    spark.conf.set(MODE_KEY, "checkpoint")
    # No dir set anywhere: loud, descriptive failure (the silent
    # alternative is a mid-job crash on the first .checkpoint()).
    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint dir"):
            materialize(_df(spark))
    # Dir supplied via the kgp conf: helper wires it into the context.
    spark.conf.set(DIR_KEY, str(tmp_path / "ckpt"))
    out = materialize(_df(spark))
    assert "LogicalRDD" in _optimized_plan(out)
    assert out.count() == 100
    got = spark.sparkContext.getCheckpointDir()
    assert got is not None and "ckpt" in got
    # Reliable checkpoints actually hit the dir (that is the cluster
    # survivability property localCheckpoint lacks).
    import os

    assert any(
        files for _, _, files in os.walk(str(tmp_path / "ckpt"))
    ), "reliable checkpoint wrote nothing to the checkpoint dir"


def test_persist_mode_pins_memory_and_disk(clean_conf):
    spark = clean_conf
    spark.conf.set(MODE_KEY, "persist")
    df = _df(spark)
    out = materialize(df)
    try:
        lvl = out.storageLevel
        assert lvl.useMemory and lvl.useDisk and not lvl.useOffHeap
        assert out.count() == 100
    finally:
        out.unpersist()


def test_unknown_mode_raises(clean_conf):
    spark = clean_conf
    spark.conf.set(MODE_KEY, "replicate-to-mars")
    with pytest.raises(ValueError, match="replicate-to-mars"):
        materialize(_df(spark))


def test_operators_follow_the_conf(clean_conf):
    """End-to-end: flip the conf to persist and run an operator that
    materializes internally (connected_components' distributed loop) —
    it must still converge to the right components. This is the 'one
    conf switches every site' contract."""
    spark = clean_conf
    from kgp.operators.canon import connected_components

    spark.conf.set(MODE_KEY, "persist")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    # force the distributed pointer-doubling path
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            edges, small_graph_threshold=0
        ).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }
