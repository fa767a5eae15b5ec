"""spark-submit entry point: pages parquet → KG tables, resumable.

Cluster usage (north rule: "runs via spark-submit --py-files on
multi-executor clusters"):

    zip -r kgp.zip kgp
    spark-submit --py-files kgp.zip jobs/build_kg.py \
        --input  s3://bucket/pages/  \
        --output s3://bucket/kg_out/ \
        --repartition 4096

Local / sandbox usage (synthesises the input when --synth N is given):

    python jobs/build_kg.py --synth 50000 --output /tmp/kg_out

Rerunning with the same --output resumes: committed stages are skipped
(lineage ledger + _SUCCESS markers — kgp.checkpoint). Exit code 0 only
after the triples/entities stages commit; the lineage summary prints
per stage. The reference's worker CLI twin is
/root/reference/src/worker/ingest_worker.py:17-45.
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python jobs/build_kg.py` runs: make the repo root importable
# (under spark-submit, --py-files kgp.zip provides the package instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages parquet path")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic pages as input")
    ap.add_argument("--repartition", type=int, default=0,
                    help="url-hash repartition width before extraction")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit)")
    args = ap.parse_args(argv)

    from kgp.checkpoint import build_kg_pipeline
    from kgp.lineage import run_stats
    from kgp.session import get_spark

    spark = get_spark("kgp-build-kg", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    from kgp import fsutil

    pages_path = args.input
    if args.synth:
        from kgp.synth import synth_pages

        # cache path keyed by N: a resumed --output with a different
        # --synth must regenerate, not silently reuse the stale count
        pages_path = f"{args.output}/_synth_pages_{args.synth}"
        if not fsutil.exists(spark, f"{pages_path}/_SUCCESS"):
            synth_pages(spark, args.synth).write.mode(
                "overwrite"
            ).parquet(pages_path)
    if not pages_path:
        ap.error("--input or --synth required")

    # Resume safety: the stage ledger is keyed by stage name only, so
    # committed stages from a PREVIOUS input would be skipped even
    # though their outputs reflect the old input. Record the input
    # path and refuse a mismatched resume (fail loudly; a silently
    # stale KG with exit code 0 is the worst outcome). Marker I/O
    # goes through the Hadoop FS so it works on hdfs://s3a:// outputs
    # (--repartition changes layout only, not stage content, so it is
    # deliberately NOT part of the contract).
    prev = fsutil.resume_marker_guard(
        spark, f"{args.output}/_input_path", pages_path
    )
    if prev is not None:
        print(
            f"ERROR: output dir {args.output} holds committed "
            f"stages for input '{prev}', but this run reads "
            f"'{pages_path}'. Use a fresh --output (or delete the "
            "old one) — resuming would keep stages built from the "
            "previous input.",
            file=sys.stderr,
        )
        spark.stop()
        return 2

    runner = build_kg_pipeline(
        spark,
        pages_path,
        args.output,
        run_id=args.run_id,
        repartition=args.repartition or None,
    )
    print(f"run_id={runner.run_id} executed={runner.executed} "
          f"skipped={runner.skipped}")
    run_stats(spark, args.output).orderBy("stage", "status").show(
        50, truncate=False
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
