"""spark-submit entry point: incremental KG construction over a
growing pages directory (Structured Streaming, SURVEY §2.9).

Cluster usage:

    zip -r kgp.zip kgp
    spark-submit --py-files kgp.zip jobs/stream_kg.py \
        --input  s3://bucket/pages/   \
        --output s3://bucket/triples/ \
        --compact

Local / sandbox demo (synthesises --batches waves of pages landing in
the input directory, then drains them):

    python jobs/stream_kg.py --synth 2000 --batches 3 --output /tmp/o

Semantics: each invocation drains every page file the streaming
checkpoint has not yet processed (`availableNow` trigger) and exits —
the cron-style incremental-ingest shape. File-level exactly-once
comes from the checkpoint; row-level idempotence under crash REPLAY
comes from the date-partition-pruned anti-join in
kgp.streaming.start_kg_stream. A url re-crawled on a LATER ingest
date legitimately appends fresh rows; --compact runs the cross-date
(subj, pred, obj) reconciliation (min ingest_date wins) after the
drain. The reference's closest twin is the ingest worker loop,
/root/reference/src/worker/ingest_worker.py:17-45, which re-processes
one video per request with no incremental bookkeeping.
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python jobs/stream_kg.py` runs: make the repo root importable
# (under spark-submit, --py-files kgp.zip provides the package instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages parquet directory (watched)")
    ap.add_argument("--output", required=True,
                    help="output root: triples land in <output>/triples "
                         "(date-partitioned parquet)")
    ap.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir "
                         "(default: <output>/_checkpoint; must stay "
                         "OUTSIDE the sink dir — the replay-dedup "
                         "anti-join reads the sink as parquet)")
    ap.add_argument("--synth", type=int, default=0,
                    help="demo: generate N synthetic pages as input")
    ap.add_argument("--batches", type=int, default=1,
                    help="demo: split --synth pages into this many "
                         "arrival waves")
    ap.add_argument("--compact", action="store_true",
                    help="run cross-date (subj,pred,obj) compaction "
                         "after the drain")
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit)")
    args = ap.parse_args(argv)

    from kgp.session import get_spark
    from kgp.streaming import compact_triples_sink, start_kg_stream

    spark = get_spark("kgp-stream-kg", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    sink_dir = os.path.join(args.output, "triples")
    pages_dir = args.input
    if args.synth:
        from kgp.synth import synth_pages

        pages_dir = os.path.join(args.output, f"synth_pages_{args.synth}")
        # each wave appends files to the watched dir, simulating
        # crawl batches landing over time; generation is skipped when
        # the dir already exists (else a rerun would append duplicate
        # input files — harmless to the sink thanks to the dedup
        # anti-join, but it burns a no-op drain pass). All waves land
        # in a tmp dir published by one atomic rename, so a crash
        # mid-generation can't leave a partial corpus that a rerun
        # would silently accept as complete.
        if not os.path.exists(pages_dir):
            tmp_dir = f"{pages_dir}.tmp-{os.getpid()}"
            pages = synth_pages(spark, args.synth)
            per = max(1, args.batches)
            for b in range(per):
                pages.filter(
                    f"pmod(xxhash64(url), {per}) = {b}"
                ).coalesce(4).write.mode("append").parquet(tmp_dir)
            os.rename(tmp_dir, pages_dir)
    if not pages_dir:
        ap.error("--input or --synth required")

    checkpoint = args.checkpoint or os.path.join(args.output, "_checkpoint")
    query = start_kg_stream(spark, pages_dir, sink_dir, checkpoint)
    query.awaitTermination()  # availableNow: returns when drained

    progress = query.lastProgress or {}
    # a drain that found no new files never creates the sink (normal
    # on the first cron run before any crawl lands) — _read_sink
    # returns None instead of raising PATH_NOT_FOUND
    from kgp.streaming import _read_sink

    sink = _read_sink(spark, sink_dir)
    if sink is None:
        print(f"drained batch_id={progress.get('batchId')} "
              f"sink_rows=0 distinct_triples=0 (no input yet)")
        spark.stop()
        return 0
    n_rows = sink.count()
    n_keys = sink.select("subj", "pred", "obj").distinct().count()
    print(f"drained batch_id={progress.get('batchId')} "
          f"sink_rows={n_rows} distinct_triples={n_keys}")
    if args.compact:
        removed = compact_triples_sink(spark, sink_dir)
        print(f"compacted: removed {removed} cross-date duplicates")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
