"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Sandbox substitute for N vs 4N executors (per driver instruction): the same
job, same input, two local parallelism levels — local[8] (N) and local[32]
(4N). Runs the packaged artifact via spark-submit --py-files so the measured
path is the shipped path, then writes BENCH/BASELINE.md.

    python bench_scaling.py [--turns 2000000] [--n 8] [--fourn 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
CURATED_MARKER = "<!-- curated below: preserved across bench_scaling.py runs -->"


def run_once(cpus: int, input_dir: str, zip_path: str, turns: int) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_graft_local")
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--conf", "spark.sql.shuffle.partitions=%d" % (cpus * 2),
        "--conf", "spark.default.parallelism=%d" % cpus,
        "--conf", "spark.driver.memory=%s" % os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={local_dir}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--py-files", zip_path,
        os.path.join(ROOT, "spinterps_spark", "cli.py"),
        "rollup", "--input", input_dir, "--out", out_dir,
        "--waves", "1", "--salt", "16",
    ]
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MALLOC_MMAP_THRESHOLD_="1073741824",
        MALLOC_TRIM_THRESHOLD_="1073741824",
    )
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    wall = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"spark-submit local[{cpus}] failed")
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    metrics["submit_wall_sec"] = wall
    metrics["cpus"] = cpus
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", 2_000_000)))
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--fourn", type=int, default=32)
    ap.add_argument("--runs", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", 1)),
                    help="legs per parallelism level; best throughput kept "
                    "(this VM shows transient hypervisor steal up to ~14%% — "
                    "documented in BASELINE.md; best-of filters it)")
    args = ap.parse_args()

    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "make_package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    input_dir = tempfile.mkdtemp(prefix="scale_input_")
    subprocess.run(
        [
            "spark-submit", "--master", f"local[{args.fourn}]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=%s" % os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "--py-files", zip_path,
            os.path.join(ROOT, "spinterps_spark", "cli.py"),
            "synth", "--turns", str(args.turns), "--out", input_dir,
        ],
        check=True, capture_output=True, text=True,
    )

    def best_of(cpus: int) -> dict:
        runs = [run_once(cpus, input_dir, zip_path, args.turns)
                for _ in range(max(args.runs, 1))]
        best = max(runs, key=lambda m: m["points_per_sec"])
        best["all_points_per_sec"] = [round(m["points_per_sec"], 1) for m in runs]
        return best

    m_n = best_of(args.n)
    m_4n = best_of(args.fourn)
    shutil.rmtree(input_dir, ignore_errors=True)

    thr_n = m_n["points_per_sec"]
    thr_4n = m_4n["points_per_sec"]
    eff = thr_4n / ((args.fourn / args.n) * thr_n)

    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "queries": {
            f"throughput_local[{args.n}]": round(thr_n, 1),
            f"throughput_local[{args.fourn}]": round(thr_4n, 1),
            f"wall_local[{args.n}]": round(m_n["wall_sec"], 1),
            f"wall_local[{args.fourn}]": round(m_4n["wall_sec"], 1),
        },
        "n_turns": m_n["n_turns"],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    # this script owns only the header block; curated sections (round-over-
    # round table, gorilla metrics, negative results, methodology caveats)
    # live below the marker and survive re-runs
    md_path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    curated = ""
    if os.path.exists(md_path):
        old = open(md_path).read()
        if CURATED_MARKER in old:
            curated = old[old.index(CURATED_MARKER):]
    with open(md_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

Protocol (BASELINE.md): same job (full retention cascade: 1m/1h/1d rollup +
spine + IDW gap-fill + Gorilla chunks, via `spark-submit --py-files
dist/spinterps_spark.zip`), same deterministic input
({m_n['n_turns']} turns, seed=42), two local parallelism levels as the
sandbox substitute for N vs 4N executors.

| metric | value | config |
|---|---|---|
| throughput @ N | {thr_n:.1f} rolled-up points/sec | local[{args.n}] |
| throughput @ 4N | {thr_4n:.1f} rolled-up points/sec | local[{args.fourn}] |
| scaling efficiency | {eff:.3f} (target >= 0.8) | T({args.fourn}) / ({args.fourn // args.n} x T({args.n})) |
| exactness gate | enforced by pytest oracle suite (tests/) | bit-for-bit vs NumPy oracle |

Pipeline wall: {m_n['wall_sec']:.1f}s @ local[{args.n}], {m_4n['wall_sec']:.1f}s @ local[{args.fourn}].
Runs per leg: {args.runs} (best-of kept; all throughputs
local[{args.n}]={m_n.get('all_points_per_sec')},
local[{args.fourn}]={m_4n.get('all_points_per_sec')} — this VM shows
transient hypervisor steal; single-shot legs can vary ±20%).

"""
        )
        if curated:
            f.write(curated)


if __name__ == "__main__":
    main()
