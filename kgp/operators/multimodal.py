"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extract plumbing.

The pages table carries `html: BINARY` (BASELINE.json input_hint); the
reference's multimodal surface is video segments with visual_entities
(/root/reference/src/ingest/base.py:13) and stubbed non-text sources
(src/ingest/instagram.py:6-16 yields empty text — the reference itself
ships decode stubs). Policy here, per the build brief: the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
REAL and tested; pixel/sample decoding that needs absent native libs
is stubbed behind NotImplementedError or a deterministic fake.

Scale notes: binary payloads ride in the same parquet row group as
their metadata — column pruning means scans that don't touch `html`
never read those bytes (asserted in tests via the scan's ReadSchema).
Decode runs in mapInPandas with small Arrow batches (payload bytes ×
maxRecordsPerBatch bounds executor memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ARRAY of media structs: the `segments`-style nested layout for
# non-text assets attached to a page.
MEDIA_SCHEMA = (
    "url string, media_idx int, kind string, n_bytes bigint, "
    "payload_md5 string"
)


def html_to_text(pages: DataFrame) -> DataFrame:
    """Decode the html BINARY column back to text — REAL decode (the
    synthetic corpus wraps text in <html><body>…</body></html>), used
    to prove the binary round-trip plumbing: output must equal the
    `text` column byte-identically (tested).

    Arrow-batched mapInPandas; vectorized pandas str ops, no per-row
    Python loop.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf["html"].apply(
                lambda b: None
                if b is None
                else b.decode("utf-8", errors="replace")
            )
            s = s.str.replace(r"^<html><body>", "", regex=True)
            s = s.str.replace(r"</body></html>$", "", regex=True)
            yield pd.DataFrame(
                {"url": pdf["url"].astype(str), "decoded_text": s}
            )

    return pages.select("url", "html").mapInPandas(
        decode, schema="url string, decoded_text string"
    )


def media_features(pages: DataFrame, kind: str = "html") -> DataFrame:
    """Typed metadata extraction over a binary column: size + content
    digest per asset — the feature-extraction UDF shape (deterministic,
    no native libs needed). JVM-side entirely: length/md5 are built-ins
    on BINARY."""
    return pages.select(
        "url",
        F.lit(0).alias("media_idx"),
        F.lit(kind).alias("kind"),
        F.length(F.col("html")).cast("long").alias("n_bytes"),
        F.md5(F.col("html")).alias("payload_md5"),
    )


def decode_image_stub(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """Image decode/resize plumbing — STUB (no PIL/cv2 in sandbox).

    The Arrow batch shape, schema, and partition behavior are real;
    calling the action raises NotImplementedError from the executors.
    Swap `_decode` for a real decoder when the library is present.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not installed); "
                "this stub pins the UDF signature and batch shape"
            )

    return pages.select("url", binary_col).mapInPandas(
        _decode,
        schema="url string, width int, height int, channels int",
    )


def frame_sample_stub(
    pages: DataFrame, every_n_seconds: float = 30.0
) -> DataFrame:
    """Video frame-sampling plumbing — deterministic fake: emits one
    'frame' row per S3 window of the page's text-derived duration, so
    downstream joins/aggregations over frames are fully testable
    without a video decoder (mirrors the reference's 30 s segment
    cadence, src/ingest/youtube.py:119)."""
    from kgp.constants import SECONDS_PER_TOKEN

    toks = F.split(F.col("text"), " ", -1)
    dur = F.size(toks).cast("double") * F.lit(SECONDS_PER_TOKEN)
    n_frames = F.greatest(
        F.ceil(dur / F.lit(every_n_seconds)).cast("int"), F.lit(1)
    )
    return (
        pages.select(
            "url",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn(
            "frame_ts_s", F.col("frame_idx") * F.lit(every_n_seconds)
        )
        .withColumn(
            "frame_md5",
            F.md5(F.concat_ws("|", F.col("url"), F.col("frame_idx"))),
        )
    )
