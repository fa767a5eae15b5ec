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

    def table_name(self, table: str) -> str:
        """Session-catalog identifier for bucketed tables."""
        return f"{self.namespace}_{table}"

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        buckets: int,
        bucket_cols: list[str],
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Hash-bucketed layout (X6 companion, the 100 TB join lever):
        a table bucketed on its join key joins another table bucketed
        on the same key with the SAME bucket count with NO Exchange on
        either side — the co-location is established once at write
        time instead of re-shuffling the fact table on every query.
        For the KG that means `triples` bucketed by obj and `entities`
        by entity_id make every endpoint-resolution join (J2/J3, the
        hottest repeated join in the reference's serving path,
        /root/reference/src/kg/gremlin_client.py:87-94) shuffle-free.

        Bucketed parquet needs the session catalog (saveAsTable), so
        these tables resolve via spark.table(); files live under the
        catalog root like every other table. sortBy(bucket_cols) is
        applied by default so each bucket file is also sorted — joins
        skip the per-task sort when both sides match. On Iceberg the
        same declaration is a partition-transform (bucket(N, col)).
        """
        spark = df.sparkSession
        if self.fmt == "iceberg":
            # Iceberg expresses bucketing as a partition transform on
            # the table; dispatch-only in the sandbox (no jars).
            from pyspark.sql.functions import bucket

            transforms = [bucket(buckets, c) for c in bucket_cols]
            df.writeTo(self.location(table)).partitionedBy(
                transforms[0], *transforms[1:]
            ).createOrReplace()
            return
        name = self.table_name(table)
        if mode == "overwrite":
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode(mode)
            .format("parquet")
            .option("path", f"{self.root}/{table}")
            .bucketBy(buckets, *bucket_cols)
            .sortBy(*(sort_cols or bucket_cols))
            .saveAsTable(name)
        )

    def read_bucketed(self, spark: SparkSession, table: str) -> DataFrame:
        """Read a bucketed table WITH its bucket metadata (a plain
        parquet read of the same files would lose the layout and
        reintroduce the Exchange)."""
        if self.fmt == "iceberg":
            return self.read(spark, table)
        return spark.table(self.table_name(table))

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
