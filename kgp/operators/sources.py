"""S2 — per-source ingest strategy dispatch.

Reference semantics (one normalization policy per platform):

* youtube (src/ingest/youtube.py + strategies/youtube.py:11-21): item
  id from the `v=` / `youtu.be/` url patterns with FALLBACK TO THE
  INPUT on miss; canonical url rebuilt as watch?v=<id>; text is the
  joined transcript (passes through here).
* twitter (src/ingest/twitter.py:26-34): id is the trailing status id;
  canonical url = twitter.com/i/web/status/<id>.
* instagram (src/ingest/instagram.py:6-16): id is the last path
  segment of the rstripped url; the reference yields EMPTY text (its
  own decode stub) — reproduced as text_out = ''.
* every emitted segment carries confidence = 1.0 and topics = [] as
  constants (src/ingest/youtube.py:207-209) — kept as pinned columns.

Spark-first shape: one `when`-chain projection (whole-stage codegen,
zero shuffle, no UDF) — the reference's per-source Python classes
collapse into a single vectorized dispatch over the platform column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# strategies/youtube.py:11-21 patterns, fused into one alternation
YOUTUBE_ID_PAT = r"(?:v=|youtu\.be/)([A-Za-z0-9_-]+)"
TWITTER_ID_PAT = r"status/([0-9A-Za-z]+)"


def normalize_content_items(
    df: DataFrame,
    url_col: str = "url",
    platform_col: str = "platform",
    text_col: str = "text",
) -> DataFrame:
    """Append the per-source normalized columns: item_id,
    canonical_url, text_out, confidence_e4, topics."""
    url = F.col(url_col)
    plat = F.col(platform_col)
    yt = F.regexp_extract(url, YOUTUBE_ID_PAT, 1)
    tw = F.regexp_extract(url, TWITTER_ID_PAT, 1)
    ig = F.element_at(
        F.split(F.regexp_replace(url, "/+$", ""), "/"), -1
    )
    raw_id = (
        F.when(plat == "youtube", yt)
        .when(plat == "twitter", tw)
        .otherwise(ig)
    )
    # regex miss ⇒ fall back to the input (strategies/youtube.py:21)
    item_id = F.when(raw_id == "", url).otherwise(raw_id)
    canonical = (
        F.when(
            plat == "youtube",
            F.concat(F.lit("https://www.youtube.com/watch?v="), item_id),
        )
        .when(
            plat == "twitter",
            F.concat(
                F.lit("https://twitter.com/i/web/status/"), item_id
            ),
        )
        .otherwise(url)
    )
    text_out = (
        F.when(plat == "instagram", F.lit(""))
        .otherwise(F.col(text_col))
    )
    return df.withColumns(
        {
            "item_id": item_id,
            "canonical_url": canonical,
            "text_out": text_out,
            # constants the reference attaches to every segment
            "confidence_e4": F.lit(10000).cast("long"),
            "topics": F.lit(""),
        }
    )
