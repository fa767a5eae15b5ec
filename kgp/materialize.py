"""Config-driven materialization of multi-consumer and loop
intermediates.

Several operators cut lineage or pin a DataFrame that is consumed more
than once (the MinHash bands table, the loop-invariant PageRank edge
table, the tf table, the CC loop's per-round labels). In local mode
``localCheckpoint`` is the right primitive — no directory, no I/O to a
reliable store — but on a cluster with dynamic allocation an executor
loss discards localCheckpoint blocks and FAILS the job mid-query.
Instead of carrying a "swap this call on clusters" caveat at every
site, all sites route through :func:`materialize`, which honors one
session conf:

    spark.kgp.materialize.mode = localCheckpoint   (default; local/dev)
                               | checkpoint        (reliable; clusters —
                                 requires a checkpoint dir, taken from
                                 SparkContext.setCheckpointDir or the
                                 ``spark.kgp.checkpoint.dir`` conf)
                               | persist           (MEMORY_AND_DISK;
                                 recompute-on-loss instead of job
                                 failure — note it pins the blocks
                                 until unpersist, so loop callers that
                                 re-materialize per round should
                                 prefer checkpoint on clusters)

A cluster deployment sets the mode (and dir) once in spark-submit conf
and every operator in the engine switches over — no code changes.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MODE_KEY = "spark.kgp.materialize.mode"
DIR_KEY = "spark.kgp.checkpoint.dir"
MODES = ("localCheckpoint", "checkpoint", "persist")


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` per the session's ``spark.kgp.materialize.
    mode`` conf (default ``localCheckpoint``). ``eager`` triggers the
    computation now (an action for persist); pass ``eager=False`` only
    where the caller's next action is immediate anyway."""
    spark = df.sparkSession
    mode = spark.conf.get(MODE_KEY, "localCheckpoint")
    if mode == "localCheckpoint":
        return df.localCheckpoint(eager=eager)
    if mode == "checkpoint":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            d = spark.conf.get(DIR_KEY, None)
            if d is None:
                raise ValueError(
                    f"{MODE_KEY}=checkpoint needs a checkpoint dir: "
                    "call SparkContext.setCheckpointDir or set "
                    f"{DIR_KEY}"
                )
            sc.setCheckpointDir(d)
        return df.checkpoint(eager=eager)
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    raise ValueError(
        f"unknown {MODE_KEY}={mode!r}; expected one of {MODES}"
    )
