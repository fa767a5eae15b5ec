"""Wide-leg graph-op probe at the LARGER graph config (default 8M
nodes / 32M edges) — round-4 left this config red: the local[32] leg
exited 52 (SparkExitCode.OOM) at 24g driver heap while local[8]
passed; commit 8af2067 raised the harness heap to 48g but the round
ended before a green run landed. This probe answers exactly that
question: do integer PageRank (distributed loop) and degree-oriented
triangle counting complete BOTH legs at 48g, and at what per-core
efficiency?

Same protocol as BENCH/scaling_ops.py (fresh JVM per leg via
spark-submit --py-files kgp.zip, 4×cores shuffle partitions, 4 MB
scan splits, tmpfs shuffle dirs, noop-sink drain, untimed warmup),
restricted to the two graph ops so a failure here cannot cost a
full multi-op run. ONE round (this is a memory-viability probe with
an efficiency reading attached, not the committed scaling table —
that is scaling_ops.py at the documented 2M/8M config).

Usage: python BENCH/graph_wide_probe.py [n_nodes] [n_edges]
       (defaults 8_000_000 / 32_000_000)
Prints one JSON line and rewrites the GRAPH_WIDE section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

WIDE_BEGIN = "<!-- GRAPH_WIDE:BEGIN -->"
WIDE_END = "<!-- GRAPH_WIDE:END -->"

RUNNER = r"""
import json, sys, time
n_cores = int(sys.argv[1]); edges_path = sys.argv[2]
from kgp.session import get_spark
spark = get_spark(
    "kgp-graph-wide", cores=n_cores,
    extra_conf={"spark.sql.shuffle.partitions": str(4 * n_cores),
                "spark.ui.enabled": "false",
                "spark.sql.files.maxPartitionBytes": "4m",
                "spark.sql.files.openCostInBytes": "524288",
                "spark.local.dir": f"/dev/shm/kgp_graph_wide_{n_cores}"})
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from kgp.operators.graph import pagerank_int, triangle_counts

edges = spark.read.parquet(edges_path)
edges.count()
tiny_e = edges.limit(2000).localCheckpoint()
def _noop(df):
    df.write.format("noop").mode("overwrite").save()
_noop(pagerank_int(tiny_e, iters=3, small_graph_threshold=0))
_noop(triangle_counts(tiny_e, orient="degree"))

out = {"cores": n_cores, "rows": {}}
for name, run in (
    ("pagerank", lambda: pagerank_int(
        edges, iters=3, small_graph_threshold=0)),
    ("triangles", lambda: triangle_counts(edges, orient="degree")),
):
    t0 = time.perf_counter()
    df = run()
    _noop(df)
    out[name] = time.perf_counter() - t0
    out["rows"][name] = df.count()
print(json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    edges_path = os.path.join(
        tempfile.gettempdir(), f"kgp_scaling_edges_{n_nodes}_{n_edges}"
    )
    if not os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        gen = (
            "from kgp.session import get_spark\n"
            "from pyspark.sql import functions as F\n"
            "s = get_spark('gen', cores=32,"
            " extra_conf={'spark.ui.enabled':'false'})\n"
            f"(s.range(0, {n_edges}, numPartitions=128)"
            f".select(F.pmod(F.xxhash64('id', F.lit(1)), {n_nodes})"
            ".alias('src'),"
            f" F.pmod(F.xxhash64('id', F.lit(2)), {n_nodes})"
            ".alias('dst'))"
            ".filter('src != dst')"
            ".write.mode('overwrite')"
            f".parquet({edges_path!r}))\n"
            "s.stop()\n"
        )
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=repo)

    work = tempfile.mkdtemp(prefix="kgp_graph_wide_")
    zip_path = shutil.make_archive(
        os.path.join(work, "kgp"), "zip", root_dir=repo, base_dir="kgp"
    )
    runner_path = os.path.join(work, "graph_wide_leg.py")
    with open(runner_path, "w") as f:
        f.write(RUNNER)
    spark_submit = shutil.which("spark-submit")
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    legs = {}
    for cores in (8, 32):
        if spark_submit:
            cmd, cwd = [
                spark_submit, "--master", f"local[{cores}]",
                "--driver-memory", heap,
                "--py-files", zip_path,
                runner_path, str(cores), edges_path,
            ], work
        else:
            cmd, cwd = [
                sys.executable, "-c", RUNNER, str(cores), edges_path,
            ], repo
        out = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stdout[-2000:])
            sys.stderr.write(out.stderr[-6000:])
            raise SystemExit(
                f"leg local[{cores}] exited {out.returncode} "
                f"(heap {heap}, {n_nodes} nodes / {n_edges} edges)"
            )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        legs[cores] = json.loads(line)
        shutil.rmtree(
            f"/dev/shm/kgp_graph_wide_{cores}", ignore_errors=True
        )

    sys.path.insert(0, repo)
    from kgp.substrate import substrate_control

    substrate = substrate_control(repeats=3)

    ops = {}
    for op in ("pagerank", "triangles"):
        assert legs[8]["rows"][op] == legs[32]["rows"][op], op
        eff = (legs[8][op] / legs[32][op]) / 4
        ops[op] = {
            "sec_8c": round(legs[8][op], 2),
            "sec_32c": round(legs[32][op], 2),
            "efficiency": round(eff, 3),
            "eff_norm": round(eff / substrate["ceiling"], 3),
            "rows": legs[32]["rows"][op],
        }
    summary = {
        "metric": "graph_wide_probe",
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "heap": heap,
        "ops": ops,
        "substrate": substrate,
        "both_legs_green": True,
    }
    print(json.dumps(summary))

    lines = [
        WIDE_BEGIN,
        "",
        "## Wide-leg graph probe (larger graph config)",
        "",
        f"Round 4's open defect: at {n_nodes:,} nodes / {n_edges:,} "
        f"edges the local[32] leg OOM'd (exit 52) at 24g driver heap. "
        f"This probe re-ran BOTH legs at the committed {heap} heap "
        f"(BENCH/graph_wide_probe.py — same fresh-JVM spark-submit "
        f"protocol, tmpfs shuffle, noop drain, one round): **both "
        f"legs completed green**. Single-round readings (the "
        f"committed per-op table above is the 2-round harness at the "
        f"documented 2M-node config; this section exists to close the "
        f"OOM, not to replace it):",
        "",
        "| operator | 8 cores (N) | 32 cores (4N) | efficiency | "
        "substrate-normalized | output rows |",
        "|---|---|---|---|---|---|",
    ]
    for op, v in ops.items():
        lines.append(
            f"| {op} ({n_nodes / 1e6:.0f}M nodes / "
            f"{n_edges / 1e6:.0f}M edges) | {v['sec_8c']:.1f}s "
            f"| {v['sec_32c']:.1f}s | {v['efficiency']:.3f} "
            f"| {v['eff_norm']:.3f} | {v['rows']:,} |"
        )
    lines += [
        "",
        f"Substrate control for this run (median of 3): ceiling "
        f"{substrate['ceiling']:.3f} ({substrate['repeats']}). "
        f"Memory shape note: the 24g OOM was 4× concurrent task "
        f"threads over string-free but wide integer shuffles plus the "
        f"localCheckpointed loop-invariant edge table resident in the "
        f"single local-mode JVM; a real cluster spreads the same "
        f"blocks over executors, so the heap requirement here is a "
        f"local-mode artifact (documented, and sized: {heap} clears "
        f"it).",
        "",
        f"Reproduce: `python BENCH/graph_wide_probe.py {n_nodes} "
        f"{n_edges}`.",
        "",
        WIDE_END,
    ]
    block = "\n".join(lines)
    baseline_md = os.path.join(repo, "BENCH", "BASELINE.md")
    with open(baseline_md) as f:
        cur = f.read()
    if WIDE_BEGIN in cur:
        cur = re.sub(
            re.escape(WIDE_BEGIN) + ".*?" + re.escape(WIDE_END),
            block, cur, flags=re.S,
        )
    else:
        cur = cur.rstrip() + "\n\n" + block + "\n"
    with open(baseline_md, "w") as f:
        f.write(cur)


if __name__ == "__main__":
    main()
