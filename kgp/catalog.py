"""Table catalog seam: name → storage, Parquet now, Iceberg by config.

SURVEY §1.3 / §7.0: "the code must isolate the writer so an Iceberg
catalog is a config switch, not a code change". All pipeline reads and
writes go through this module; pointing KGP_CATALOG_FORMAT=iceberg (on
a cluster with the Iceberg runtime jars and a configured catalog)
switches every table to `spark.read/writeTo.format("iceberg")` with
snapshot commits — the two-phase _SUCCESS+ledger protocol in
kgp.checkpoint degrades gracefully to Iceberg's own snapshot atomicity.

The sandbox has no Iceberg jars, so the iceberg branch is exercised
only for its dispatch logic (tests assert the seam routes correctly);
parquet is the live path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Resolves logical table names to physical locations."""

    def __init__(
        self,
        root: str,
        fmt: str | None = None,
        namespace: str = "kgp",
    ) -> None:
        self.root = root.rstrip("/")
        self.fmt = fmt or os.environ.get("KGP_CATALOG_FORMAT", "parquet")
        self.namespace = namespace

    def location(self, table: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.namespace}.{table}"
        return f"{self.root}/{table}"

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(self.location(table))
        return spark.read.parquet(self.location(table))

    def write(
        self, df: DataFrame, table: str, mode: str = "overwrite"
    ) -> None:
        if self.fmt == "iceberg":
            w = df.writeTo(self.location(table))
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        df.write.mode(mode).parquet(self.location(table))

    def truncate(self, spark: SparkSession, table: str) -> None:
        """S8 destructive truncate (gremlin_client.py:223-245) — the
        set-oriented twin of the reference's drop-all traversal."""
        if self.fmt == "iceberg":
            spark.sql(f"DELETE FROM {self.location(table)}")
            return
        empty = spark.createDataFrame(
            [], self.read(spark, table).schema
        )
        empty.write.mode("overwrite").parquet(self.location(table))
