"""Deterministic synthetic `pages` table (seed=42, no external data).

BASELINE.json input_hint: ``url:string, warc_ts:timestamp, html:binary,
text:string, lang:string``. Every row is a pure function of (seed,
row_id), so generation is embarrassingly parallel and INDEPENDENT of
partitioning — the same row ids produce the same bytes whether generated
on 1 core or 1000 executors (`spark.range(n)` + `mapInPandas`).

Skew is deliberate (FIXTURES.md §1): domains are zipf-ranked so a few
mega-domains hold a large share of rows (exercises url-hash repartition
+ AQE skew handling, SURVEY §2 X6), and gazetteer entities are
zipf-ranked so head entities dominate (salted-aggregation test). Some
pages carry >10 entities (cap test), and text includes leading/double
spaces (byte-identical-join test).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kgp import schemas
from kgp.constants import SYNTH_SEED
from kgp.gazetteer import PAGES_GAZETTEER

_FILLER = (
    "the a of and to in on for with from by at as is was are were has have "
    "had said new old big small fast slow data table query engine shuffle "
    "partition column row batch stream merge sort hash join scan filter "
    "group window agg key value index vector graph node edge triple page "
    "crawl web text html link site host fetch parse token term corpus"
).split()

_DOMAINS = [f"site{i:03d}.example.com" for i in range(50)]
_LANGS = ["en", "en", "en", "en", "es", "de", "zh", "fr"]  # ~50%+ en weight
_EPOCH_2024 = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())
_SECONDS_2024 = 366 * 24 * 3600

# zipf-ish weights over domains / gazetteer entries
_DOMAIN_W = 1.0 / np.arange(1, len(_DOMAINS) + 1) ** 1.2
_DOMAIN_W /= _DOMAIN_W.sum()
_GAZ_SURFACES = [s for s, _, _ in PAGES_GAZETTEER]
_GAZ_W = 1.0 / np.arange(1, len(_GAZ_SURFACES) + 1) ** 1.1
_GAZ_W /= _GAZ_W.sum()


# near-duplicate injection: every 37th page is a perturbed copy of its
# predecessor (~9% of tokens swapped ⇒ 3-shingle Jaccard ≈ 0.55-0.8),
# so fuzzy-dedup gates over pages match on REAL pairs, not 0 = 0.
# 37 ∤ 1, so a dup's base is never itself a dup (no recursion chains).
_NEAR_DUP_EVERY = 37
_NEAR_DUP_TOKEN_STRIDE = 11


def page_row(row_id: int, seed: int = SYNTH_SEED) -> dict:
    """Generate one page — pure function of (seed, row_id)."""
    rng = np.random.default_rng(seed * 1_000_003 + row_id)
    domain = _DOMAINS[rng.choice(len(_DOMAINS), p=_DOMAIN_W)]
    url = f"https://{domain}/p/{row_id}"
    if row_id > 0 and row_id % _NEAR_DUP_EVERY == 0:
        words = page_row(row_id - 1, seed)["text"].split(" ")
        for i in range(
            _NEAR_DUP_TOKEN_STRIDE // 2, len(words), _NEAR_DUP_TOKEN_STRIDE
        ):
            words[i] = str(rng.choice(_FILLER))
    else:
        n_words = int(rng.integers(30, 150))
        words = list(rng.choice(_FILLER, size=n_words))
        # entity injection: zipf-ranked draw, 0..25 mentions per page
        n_ents = min(int(rng.zipf(1.6)) - 1, 25)
        for _ in range(n_ents):
            surface = _GAZ_SURFACES[rng.choice(len(_GAZ_SURFACES), p=_GAZ_W)]
            pos = int(rng.integers(0, len(words) + 1))
            words.insert(pos, surface)
    text = " ".join(words)
    # whitespace quirks: double space / leading space on some pages
    if rng.random() < 0.10:
        cut = int(rng.integers(1, max(2, len(text) - 1)))
        text = text[:cut] + " " + text[cut:]
    if rng.random() < 0.05:
        text = " " + text
    ts = datetime.fromtimestamp(
        _EPOCH_2024 + int(rng.integers(0, _SECONDS_2024)), tz=timezone.utc
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
        "text": text,
        "lang": str(rng.choice(_LANGS)),
    }


def synth_pages_pdf(n: int, seed: int = SYNTH_SEED, start: int = 0) -> pd.DataFrame:
    """Local pandas generator (oracle tests, DuckDB comparisons)."""
    rows = [page_row(i, seed) for i in range(start, start + n)]
    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True).dt.tz_localize(None)
    return pdf


def synth_pages(
    spark: SparkSession, n: int, seed: int = SYNTH_SEED, partitions: int | None = None
) -> DataFrame:
    """Distributed generator: spark.range(n) → mapInPandas(page_row).

    Scales to any n: each task materialises only its own id-range.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["id"].tolist()
            rows = [page_row(int(i), seed) for i in ids]
            pdf = pd.DataFrame(rows)
            pdf["warc_ts"] = pd.to_datetime(
                pdf["warc_ts"], utc=True
            ).dt.tz_localize(None)
            yield pdf

    rng_df = spark.range(0, n, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=schemas.PAGES)


# bump when page_row semantics change — keys the materialized-parquet
# cache so stale snapshots of an older generator are never reused
PAGES_SYNTH_VERSION = "v2"
_PAGES_CACHE_DIR = "/tmp/kgp_pages"


def pages_parquet_path(n: int, seed: int = SYNTH_SEED) -> str:
    return f"{_PAGES_CACHE_DIR}/{PAGES_SYNTH_VERSION}_n{n}_seed{seed}"


def _publish_atomic(tmp: str, path: str) -> None:
    """Atomically promote a fully-written tmp dir to the cache path.

    os.rename of a directory is atomic on one filesystem, so readers
    either see no cache dir or a complete one with _SUCCESS — never a
    half-written glob. If a concurrent writer won the race (dest now
    exists), keep the winner and discard our tmp."""
    import os
    import shutil

    try:
        os.rename(tmp, path)
    except OSError:
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise


def publish_fixture_parquet(dest: str, table) -> None:
    """The ONE fixture-publish protocol, shared by every local
    materializer (pages here, embeddings in operators/embed.py,
    lineage ledger in lineage.py): write <dest>/part-local.parquet +
    _SUCCESS into a pid-keyed tmp sibling, clear a crashed
    pre-atomic dest (exists without marker), then atomic-rename into
    place via _publish_atomic. Concurrent writers race safely — the
    loser discards its tmp."""
    import os
    import shutil

    import pyarrow.parquet as pq

    marker = os.path.join(dest, "_SUCCESS")
    tmp = f"{dest}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "part-local.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass
    if os.path.exists(dest) and not os.path.exists(marker):
        shutil.rmtree(dest, ignore_errors=True)
    _publish_atomic(tmp, dest)


def materialize_pages(
    spark: SparkSession, n: int, seed: int = SYNTH_SEED
) -> str:
    """Write the synthetic pages table to parquet once (keyed by
    generator version + n + seed) and return the path.

    Both the Spark queries AND their DuckDB oracle twins read THIS
    parquet, so the two engines compare over identical bytes — the
    generator runs once per (n, seed) instead of once per query, and
    generation nondeterminism is structurally impossible to leak into
    the comparison. At 100 TB the analog is the ingest job writing the
    Iceberg pages table that every downstream query shares.
    """
    import os
    import shutil

    path = pages_parquet_path(n, seed)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # write to a pid-keyed tmp sibling, then atomic-rename into
        # place: a concurrent bench/driver pair can never glob a
        # half-written directory or delete each other's in-flight write
        tmp = f"{path}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        # deterministic layout: partition count depends only on n, not
        # on the creating session's core count — otherwise whichever
        # config first fills the cache freezes the input parallelism
        # every later benchmark sees
        synth_pages(
            spark, n, seed, partitions=_layout_partitions(n)
        ).write.mode("overwrite").parquet(tmp)
        # a legacy dest without _SUCCESS (pre-atomic crash) blocks the
        # rename — clear it first; post-atomic, dest either has
        # _SUCCESS (another writer won) or doesn't exist
        if os.path.exists(path) and not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            shutil.rmtree(path, ignore_errors=True)
        _publish_atomic(tmp, path)
    return path


def _layout_partitions(n: int) -> int:
    return max(1, min(64, n // 250))


def ensure_pages_parquet_local(n: int, seed: int = SYNTH_SEED) -> str:
    """Materialize the pages parquet WITHOUT a SparkSession (pandas +
    pyarrow) if it doesn't exist yet — same rows (page_row is the
    single source of truth), microsecond timestamps to match the
    Spark writer. Lets oracle_sql() guarantee the DuckDB side can read
    the table even if the driver evaluates an oracle before running
    the corresponding Spark query."""
    import os

    path = pages_parquet_path(n, seed)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import pyarrow as pa

        pdf = synth_pages_pdf(n, seed)
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
        publish_fixture_parquet(
            path, pa.Table.from_pandas(pdf, preserve_index=False)
        )
    return path


def pages_scale_for_sf(sf_dir: str) -> int:
    """Page count matched to the driver scale factor (FIXTURES.md §1)."""
    if "0.001" in sf_dir:
        return 500
    if "0.01" in sf_dir:
        return 5_000
    if "0.1" in sf_dir:
        return 50_000
    return 5_000
