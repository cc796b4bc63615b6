"""spark-submit scaling protocol — the north_rule's literal deployment
shape: ``spark-submit --py-files dist/qfilter_spark.zip`` driving the
build+probe filter lifecycle at two cluster sizes (local[N] vs local[4N]
as the sandbox stand-in for N vs 4N executors), with throughput at both
plus the scaling efficiency.

Each rep launches a FRESH spark-submit process tree, taskset-pinned to the
currently-idlest CPUs (same discipline as bench.py's in-process protocol:
host steal is bursty and non-uniform across vCPUs). Best-of-k per side;
efficiency = (best 4N throughput) / (best N throughput) / 4, capped at 1.0
(superlinear = steal-degraded small side, not super-scaling).

Usage:
    python scripts/submit_scaling.py            # k=3 reps/side, 100k docs
    QFS_SUBMIT_DOCS=20000 QFS_SUBMIT_REPS=2 python scripts/submit_scaling.py

Prints one JSON line.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from bench import _idlest_cpus, ensure_corpus, log  # noqa: E402
from package_pyfiles import build_zip  # noqa: E402


def run_job(spark_submit: str, zip_path: str, cores: int, mode: str,
            corpus: str, table: str) -> dict:
    cpus = _idlest_cpus(cores)
    cmd = [
        "taskset", "-c", ",".join(map(str, cpus)),
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={max(8, cores)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=2048",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_job.py"), mode, corpus, table,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from spark-submit {mode} at local[{cores}]:\n"
        + out.stderr[-2000:])


def side_throughput(spark_submit, zip_path, cores, corpus, workdir) -> float:
    """One rep: fresh build + probe via spark-submit; M n-grams/s over the
    whole lifecycle (timed regions exclude JVM/session startup — a real
    cluster's executors are long-lived)."""
    table = os.path.join(workdir, f"filter_{cores}")
    shutil.rmtree(table, ignore_errors=True)
    b = run_job(spark_submit, zip_path, cores, "build", corpus, table)
    p = run_job(spark_submit, zip_path, cores, "probe", corpus, table)
    assert b["ok"] and p["ok"], (b, p)
    return (b["n_ngrams"] + p["n_probed"]) / (
        (b["build_secs"] + p["probe_secs"]) * 1e6)


def main():
    n_docs = int(os.environ.get("QFS_SUBMIT_DOCS", "100000"))
    reps = int(os.environ.get("QFS_SUBMIT_REPS", "3"))
    cores_n = int(os.environ.get("QFS_SUBMIT_CORES_N", "1"))
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    corpus = ensure_corpus(n_docs)
    zip_path = build_zip(os.path.join(REPO, "dist", "qfilter_spark.zip"))
    t0 = time.time()
    samples = {cores_n: [], 4 * cores_n: []}
    with tempfile.TemporaryDirectory() as d:
        for rep in range(reps):
            for cores in (cores_n, 4 * cores_n):  # alternating, like bench
                thr = side_throughput(spark_submit, zip_path, cores, corpus, d)
                samples[cores].append(round(thr, 3))
                log(f"rep {rep} spark-submit local[{cores}]: {thr:.2f} M n-grams/s")
    best_n = max(samples[cores_n])
    best_4n = max(samples[4 * cores_n])
    speedup = best_4n / best_n
    print(json.dumps({
        "protocol": "spark-submit --py-files, fresh process tree per rep, "
                    "taskset-pinned idlest CPUs, best-of-k per side",
        "n_docs": n_docs,
        "cores_n": cores_n, "cores_4n": 4 * cores_n,
        "samples_n": samples[cores_n], "samples_4n": samples[4 * cores_n],
        "m_ngrams_per_sec_n": best_n, "m_ngrams_per_sec_4n": best_4n,
        "spark_speedup": round(speedup, 3),
        "efficiency_raw": round(min(1.0, speedup / 4), 3),
        "wall_secs": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
