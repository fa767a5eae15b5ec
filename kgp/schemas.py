"""Spark schemas for every engine table (SURVEY.md §1.3).

The input contract (BASELINE.json input_hint) is PAGES exactly:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Temporal segments (reference VideoSegment, src/ingest/base.py:6-15,
# re-keyed to url + char-free seconds).
SEGMENTS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seg_idx", IntegerType(), False),
        StructField("start_s", DoubleType(), False),
        StructField("end_s", DoubleType(), False),
        StructField("text", StringType(), False),
    ]
)

# Extracted whole-document text (S4 invariant: byte-identical per url).
DOCS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("extracted_text", StringType(), False),
        StructField("n_segments", IntegerType(), False),
    ]
)

# One row per (document, gazetteer-surface) hit, pre-cap.
MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("label", StringType(), False),
        StructField("first_offset", LongType(), False),
    ]
)

ENTITIES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("label", StringType(), False),  # 'Entity'/'Content'
        StructField("type", StringType(), False),
        StructField("canonical_id", StringType(), True),
    ]
)

TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("edge_id", StringType(), False),
        StructField("ts", TimestampType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# Per-stage per-partition lineage ledger (reference TaskInfo,
# src/api/task_tracker.py:19-29, lifted to stage×partition grain).
LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows_out", LongType(), False),
        StructField("status", StringType(), False),
        StructField("finished_at", TimestampType(), True),
    ]
)
