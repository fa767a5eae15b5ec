"""Scaling-efficiency evidence (north rule: efficiency ≥ 0.8 from N to
4N executors; driver instruction: evidence with local[8] vs local[32]
on the same input).

Runs the flagship KG pipeline (pages → docs → mentions → cap →
triples + entities) over the SAME materialized pages parquet at two
parallelism levels, each in a FRESH JVM (subprocess) so executor
thread pools, codegen caches, and shuffle state don't leak between
runs. Each leg reports the BEST of 3 timed runs after warmup: the
sandbox microVM's effective CPU fluctuates with host neighbors
(observed 3x swings on identical runs), and the minimum is the
least-interfered measurement. Reports docs/sec at both levels and
efficiency = (T_N / T_4N) / (4N / N).

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

pages = spark.read.parquet(pages_path)
def run():
    docs = extract_docs(pages)
    m = mentions_relational(docs, gazetteer_df(spark))
    capped = cap_mentions(m)
    return build_triples(capped).count(), build_entities(capped).count()
run()                      # warmup: codegen compile
best = None; nt = ne = 0
for _ in range(3):         # best-of-3: the sandbox VM's effective CPU
    t0 = time.perf_counter()   # fluctuates with host neighbors; the
    nt, ne = run()             # minimum is the least-interfered run
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cores": n_cores, "sec": best, "triples": nt,
                  "entities": ne}))
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

    results = {}
    for cores in (8, 32):
        # -c keeps sys.path[0] = cwd (= repo) so `import kgp` resolves
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, str(cores), pages_path],
            check=True, cwd=repo, capture_output=True, text=True,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cores] = json.loads(line)

    t8, t32 = results[8]["sec"], results[32]["sec"]
    speedup = t8 / t32
    efficiency = speedup / (32 / 8)
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
        "triples": results[32]["triples"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so (per the driver
instruction) the SAME job runs over the SAME materialized input at two
parallelism levels in fresh JVMs: `local[8]` (N) vs `local[32]` (4N).

Job: flagship KG pipeline — pages({n_pages}) → segment/extract (S3/S4)
→ gazetteer NER (F1/P3) → cap (A1/T4) → triples (J1/S6) + entities
(S5), both outputs counted. Input parquet pre-materialized so
generation isn't measured. Methodology: untimed codegen warmup, then
each leg reports the BEST of 3 timed runs — the sandbox microVM's
effective CPU fluctuates with host neighbors (observed 3× swings on
identical runs), so the minimum is the least-interfered measurement.

| cores | wall (s) | docs/sec |
|---|---|---|
| 8 (N)   | {t8:.3f} | {n_pages / t8:,.1f} |
| 32 (4N) | {t32:.3f} | {n_pages / t32:,.1f} |

**Speedup 8→32: {speedup:.2f}×; scaling efficiency: {efficiency:.3f}**
(threshold ≥ 0.8 {"MET" if efficiency >= 0.8 else "NOT met"}).

Interpretation: every stage is either a narrow projection
(segmentation — zero shuffle), a broadcast join (gazetteer — no big-
side shuffle), or a key-partitioned shuffle with map-side partial
aggregation (cap window, dedup). Nothing serializes on the driver, so
throughput tracks cores until the shuffle fabric saturates; at real
cluster scale the same plan shape distributes because no stage needs
co-residency beyond its shuffle key.

Reproduce: `python BENCH/scaling.py {n_pages}`.
"""
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
