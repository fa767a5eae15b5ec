"""Scaling-efficiency evidence (north rule: efficiency ≥ 0.8 from N to
4N executors; driver instruction: evidence with local[8] vs local[32]
on the same input).

Runs the flagship FUSED physical plan (and the composable operator
chain for reference) over the SAME materialized pages parquet at two
parallelism levels, each in a FRESH JVM (subprocess) so executor
thread pools, codegen caches, and shuffle state don't leak between
runs. Noise control (the sandbox microVM's effective CPU fluctuates
~3x with host neighbors): untimed warmup, min-of-3 per subprocess,
and INTERLEAVED legs across 2 outer rounds with per-leg minima.
Reports docs/sec at both levels and efficiency = (T_N/T_4N)/(4N/N).

Usage: python BENCH/scaling.py [n_pages]   (default 50_000 ≈ sf0.1)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time
n_cores = int(sys.argv[1]); pages_path = sys.argv[2]
from kgp.session import get_spark
spark = get_spark("kgp-scaling", cores=n_cores,
                  extra_conf={"spark.sql.shuffle.partitions": str(n_cores),
                              "spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
from kgp.operators.ner import gazetteer_df, mentions_relational
from kgp.operators.segment import extract_docs
from kgp.operators.triples import build_entities, build_triples, cap_mentions
from kgp.plans.pipeline import build_kg_fused

pages = spark.read.parquet(pages_path)

def run_fused():
    t, e = build_kg_fused(pages)
    return t.count(), e.count()

def run_composable():
    docs = extract_docs(pages)
    m = mentions_relational(docs, gazetteer_df(spark))
    capped = cap_mentions(m)
    return build_triples(capped).count(), build_entities(capped).count()

out = {"cores": n_cores}
for name, run in (("fused", run_fused), ("composable", run_composable)):
    run()                      # warmup: codegen compile
    best = None
    for _ in range(3):         # min-of-3: sandbox VM CPU fluctuates
        t0 = time.perf_counter()
        nt, ne = run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = best
    out["triples"] = nt
print(json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages_path = os.path.join(
        tempfile.gettempdir(), f"kgp_scaling_pages_{n_pages}"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gen = (
            "from kgp.session import get_spark\n"
            "from kgp.synth import synth_pages\n"
            "s = get_spark('gen', cores=32,"
            " extra_conf={'spark.ui.enabled':'false'})\n"
            f"synth_pages(s, {n_pages}).write.mode('overwrite')"
            f".parquet({pages_path!r})\n"
            "s.stop()\n"
        )
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=repo)

    # Interleave the legs (8,32,8,32,8,32) and take the per-leg best:
    # host-CPU slow windows last minutes, so running all of one leg's
    # repetitions back-to-back would bias whichever leg caught the
    # slow window. Interleaving gives both legs samples from the same
    # host conditions. (Each subprocess already takes min-of-3
    # internally; the outer loop adds cross-window sampling.)
    results = {}
    for _round in range(2):
        for cores in (8, 32):
            # -c keeps sys.path[0] = cwd (= repo): `import kgp` resolves
            out = subprocess.run(
                [sys.executable, "-c", RUNNER, str(cores), pages_path],
                check=True, cwd=repo, capture_output=True, text=True,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            if cores not in results:
                results[cores] = r
            else:
                for k in ("fused", "composable"):
                    results[cores][k] = min(results[cores][k], r[k])

    t8, t32 = results[8]["fused"], results[32]["fused"]
    c8, c32 = results[8]["composable"], results[32]["composable"]
    speedup = t8 / t32
    efficiency = speedup / (32 / 8)
    eff_c = (c8 / c32) / (32 / 8)
    summary = {
        "metric": "kg_pipeline_scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "fraction",
        "n_pages": n_pages,
        "docs_per_sec_8c": round(n_pages / t8, 1),
        "docs_per_sec_32c": round(n_pages / t32, 1),
        "sec_8c": round(t8, 3),
        "sec_32c": round(t32, 3),
        "speedup_8_to_32": round(speedup, 3),
        "composable_sec_8c": round(c8, 3),
        "composable_sec_32c": round(c32, 3),
        "composable_efficiency": round(eff_c, 3),
        "triples": results[32]["triples"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so (per the driver
instruction) the SAME job runs over the SAME materialized input at two
parallelism levels in fresh JVMs: `local[8]` (N) vs `local[32]` (4N).

Job: the flagship FUSED physical plan (kgp/plans/pipeline.py, the
production plan per PLANS.md) — pages({n_pages}) → in-row
segment/extract/NER/cap (S3/S4/F1/P3/A1/T4) → triples (J1/S6) +
entities (S5), both outputs counted. The composable operator chain is
measured alongside for reference. Input parquet pre-materialized so
generation isn't measured. Methodology: untimed codegen warmup; each
subprocess takes min-of-3 timed runs; legs are INTERLEAVED
(8,32,8,32) across 2 outer rounds with per-leg minima — the sandbox
microVM's effective CPU fluctuates ~3× with host neighbors, and
interleaving keeps one leg from absorbing a slow window.

| pipeline | 8 cores (N) | 32 cores (4N) | speedup | efficiency |
|---|---|---|---|---|
| fused (flagship) | {t8:.3f}s ({n_pages / t8:,.0f} docs/s) | {t32:.3f}s ({n_pages / t32:,.0f} docs/s) | {speedup:.2f}× | **{efficiency:.3f}** |
| composable chain | {c8:.3f}s | {c32:.3f}s | {c8 / c32:.2f}× | {(c8 / c32) / 4:.3f} |

**Flagship scaling efficiency: {efficiency:.3f}**
(threshold ≥ 0.8 {"MET" if efficiency >= 0.8 else "NOT met"}).

Interpretation: in the fused plan everything up to the output dedups
is a single narrow codegen stage (scan → in-row segment/match/cap →
explode); the only wide operations are the triple distinct and entity
agg, both with map-side partial aggregation. Nothing serializes on the driver, so
throughput tracks cores until the shuffle fabric saturates; at real
cluster scale the same plan shape distributes because no stage needs
co-residency beyond its shuffle key.

Reproduce: `python BENCH/scaling.py {n_pages}`.
"""
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
