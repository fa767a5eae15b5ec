"""Tiny driver-side filesystem helpers over the Hadoop FileSystem API.

CLI markers (resume-safety contracts) and existence probes must work
wherever the job's --output lives — local disk, hdfs://, s3a:// — so
they go through Hadoop's FileSystem, not os.path (the streaming
compaction swap in kgp/streaming.py shares `_fs` for the same
reason). All
helpers are driver-only metadata operations: one RPC each, never data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def read_text(spark: SparkSession, path: str) -> str:
    """Small text file (marker-sized) → str."""
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; FSDataInputStream's
        # read(ByteBuffer) is unsupported on some filesystems
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Atomic-enough marker write: create-overwrite of a tiny file
    (single block; object stores publish it atomically on close)."""
    fs, p = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def resume_marker_guard(
    spark: SparkSession, marker_path: str, content: str
) -> str | None:
    """Refuse-to-resume contract shared by the batch CLIs: if the
    marker exists with DIFFERENT content, return the previous content
    (the caller errors out — a silently stale output with exit code 0
    is the worst outcome); otherwise write/keep the marker and return
    None. Hadoop create() makes parent dirs, so no mkdir is needed."""
    if exists(spark, marker_path):
        prev = read_text(spark, marker_path).strip()
        return prev if prev != content.strip() else None
    write_text(spark, marker_path, content)
    return None
