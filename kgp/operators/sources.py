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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# S1 alternate source format: Common-Crawl-style newline-delimited
# JSON (a WET/WAT-shaped export). The wire schema is EXPLICIT — schema
# inference is a full extra pass over 100 TB — and binary html rides
# as base64 (JSON carries no binary).
JSONL_PAGES_WIRE = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.StringType(), True),
        T.StructField("html_b64", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
)


def read_pages_jsonl(
    spark: SparkSession, path: str, with_corrupt: bool = False
):
    """Read JSONL pages into the canonical PAGES schema
    (url, warc_ts, html, text, lang — kgp.schemas.PAGES).

    PERMISSIVE mode with a corrupt-record column: a malformed line at
    10^12 documents is a certainty, so it must neither fail the job
    (FAILFAST) nor vanish silently (DROPMALFORMED) — corrupt rows are
    quarantined and countable, and a valid-JSON row with NO url (the
    row key) is quarantined too, not dropped. ``with_corrupt=True``
    additionally returns the quarantine frame (url if it parsed, the
    VERBATIM raw line, and a reason). The file is read as text and
    parsed with from_json so the quarantine always carries the actual
    line — a url-less row with a typo'd key ('uri') stays diagnosable
    and re-parseable downstream. Field-level damage inside an
    otherwise-keyed row degrades instead of poisoning it: unparseable
    timestamps and undecodable base64 become NULL via the try_
    variants (under ANSI mode — the Spark 4 default — the strict
    forms THROW and kill the job on one bad value; P2 freshness
    treats NULL warc_ts as stale). Everything is JVM expressions —
    the decode pipelines into whole-stage codegen, no UDF.
    """
    raw = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")  # json source skips blanks
        .withColumn(
            "j",
            F.from_json(
                "value",
                JSONL_PAGES_WIRE,
                {
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": "_corrupt",
                },
            ),
        )
    )
    clean = raw.filter(
        F.col("j._corrupt").isNull() & F.col("j.url").isNotNull()
    ).select(
        F.col("j.url").alias("url"),
        F.try_to_timestamp(F.col("j.warc_ts")).alias("warc_ts"),
        # absent/null html_b64 stays NULL html (absent ≠ empty bytes),
        # matching the undecodable-base64 degrade-to-NULL path below
        F.try_to_binary(F.col("j.html_b64"), F.lit("base64")).alias(
            "html"
        ),
        F.col("j.text").alias("text"),
        F.col("j.lang").alias("lang"),
    )
    if not with_corrupt:
        return clean
    corrupt = raw.filter(
        F.col("j._corrupt").isNotNull() | F.col("j.url").isNull()
    ).select(
        F.col("j.url").alias("url"),
        F.col("value").alias("raw_line"),
        F.when(F.col("j._corrupt").isNotNull(), F.lit("malformed json"))
        .otherwise(F.lit("missing url"))
        .alias("reason"),
    )
    return clean, corrupt


# URL → host, the grouping key of every per-site web pipeline policy
# (RefinedWeb/C4 run URL filtering and per-site quotas as stage one,
# before any content work). No trailing '/': path-less urls
# (https://example.com) are common in real crawls and a '/'-anchored
# pattern would extract '' for ALL of them, collapsing unrelated hosts
# into one quota bucket. Userinfo and port are STRIPPED — raw-authority
# extraction would let 'https://u@bad.example/' or
# 'https://bad.example:8080/x' slip past a 'bad.example' blocklist
# entry and split one host across quota buckets. (This is host-level,
# not PSL registrable-domain: sub.example.co.uk stays distinct from
# example.co.uk — a public-suffix collapse needs the PSL list, which
# is a broadcast-join policy choice left to the caller.)
DOMAIN_PAT = r"^https?://(?:[^/?#@]*@)?([^/:?#]+)"


def domain_col(url: Column | str) -> Column:
    url = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(url, DOMAIN_PAT, 1)


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus profile: (domain, n_pages, total_tokens,
    n_langs). One groupBy with map-side partial agg; the zipf head
    domain IS the AQE skew-split case — partials keep the shuffle one
    row per (domain, partition)."""
    return (
        pages.select(
            domain_col(url_col).alias("domain"),
            F.size(F.split(F.col(text_col), " ", -1)).alias("_nt"),
            "lang",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum("_nt").cast("long").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key: Column,
    order_by: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Quota sampling: keep at most ``k`` rows per key, ranked by
    ``order_by`` (mega-domain mitigation — a handful of hosts dominate
    any web crawl, and uncapped they dominate the training mix too).

    One shuffle on the key; the rank is a windowed row_number, so the
    head key's partition sorts all its rows — for web-crawl zipf heads
    pre-prune first (e.g. a warc_ts freshness bound) or salt the key
    and take k per salt then re-rank the k·S survivors; both keep the
    sorted set bounded. The deterministic tiebreak must make
    ``order_by`` a TOTAL order or ranks are engine/partitioning-
    dependent.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def blocklist_filter(
    pages: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Stage-one URL filtering: drop every page whose registrable
    domain appears in the blocklist (the C4 badlist / RefinedWeb
    URL-filter step — the cheapest gate in the pipeline, so it runs
    FIRST, before any content work touches the bytes).

    ``blocklist`` needs a ``domain`` column. Broadcast LEFT ANTI join:
    real blocklists are O(100k-1M) domains — a few MB, far under the
    broadcast threshold — so the corpus side never shuffles; the
    filter runs map-side against the broadcast hash relation and
    composes with scan pruning (only ``url`` plus whatever columns the
    consumer selects are read).
    """
    bl = F.broadcast(
        blocklist.select(F.col("domain").alias("_bl_domain")).distinct()
    )
    return (
        pages.withColumn("_dom", domain_col(url_col))
        .join(bl, F.col("_dom") == F.col("_bl_domain"), "left_anti")
        .drop("_dom")
    )
