"""Scaling evidence through the LITERAL north-rule mechanism:
`spark-submit --py-files deduper_spark.zip` at two parallelism levels.

tools/bench_scaling.py measures the same job in-process; this wrapper
reruns the comparison through the actual deployment path — package the
engine into a zip, launch a real spark-submit subprocess from OUTSIDE
the repo (imports must resolve from the shipped zip), and time the
pipeline at local[8] and local[32] with the same per-leg load gating
and alternating order. The timed window is submit_dedup's own "sec"
(synth excluded; --warmup excludes one-time JVM/Arrow/worker-fork
startup, the same steady-state exclusion every other bench applies).

Usage: python tools/bench_submit_scaling.py [n] [--reps=2]
       [--gate-load=X] [--levels=8,32] [--append-log=P]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from benchlib import build_zip, flag_args, flag_value, positional_n, wait_idle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(zip_path: str, cpus: int, n: int, workdir: str) -> dict:
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", f"local[{cpus}]",
         "--conf", f"spark.sql.shuffle.partitions={cpus}",
         "--conf", "spark.driver.memory=48g",
         # sized to the SANDBOX corpus, same rationale as bench_scaling
         "--conf", "spark.sql.adaptive.advisoryPartitionSizeInBytes=2m",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_dedup.py"),
         "--synth", str(n), "--run-id", f"submit_scale{cpus}",
         "--psnr-mode", "audit", "--no-json", "--warmup"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"spark-submit local[{cpus}] failed:\n"
                           f"{proc.stderr[-3000:]}")
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"report"' in ln][-1]
    out = json.loads(line)
    return {"cpus": cpus, "n": n, "sec": out["sec"],
            "images_per_sec": round(n / out["sec"], 1),
            "dupe_count": out["report"]["dupe_count"]}


def main() -> None:
    n = positional_n(sys.argv, 100_000)
    lo, hi = 8, 32
    reps = 2
    gate = None
    log_path = None
    for a in flag_args(sys.argv):
        if a.startswith("--levels="):
            lo, hi = (int(x) for x in flag_value(a).split(","))
        if a.startswith("--reps="):
            reps = int(flag_value(a))
        if a.startswith("--gate-load="):
            gate = float(flag_value(a))
        if a.startswith("--append-log="):
            log_path = flag_value(a)

    with tempfile.TemporaryDirectory() as tmp:
        zip_path = os.path.join(tmp, "deduper_spark.zip")
        build_zip(REPO, zip_path)
        runs: dict[int, list[dict]] = {lo: [], hi: []}
        for i in range(reps):
            order = (lo, hi) if i % 2 == 0 else (hi, lo)
            for cpus in order:
                load_before = wait_idle(gate)
                r = run_leg(zip_path, cpus, n, tmp)
                r["load_before"] = load_before
                runs[cpus].append(r)
                if log_path:
                    with open(log_path, "a") as f:
                        f.write(json.dumps({"rep": i, **r}) + "\n")
            print(f"rep {i}: " + "  ".join(
                f"local{c} {runs[c][-1]['sec']}s" for c in (lo, hi)),
                flush=True)

    def med(rs):
        return sorted(rs, key=lambda r: r["sec"])[len(rs) // 2]

    r_lo, r_hi = med(runs[lo]), med(runs[hi])
    eff = (r_hi["images_per_sec"] / r_lo["images_per_sec"]) / (hi / lo)
    print(json.dumps({
        "mechanism": "spark-submit --py-files",
        "n": n, "levels": [lo, hi], "reps": reps,
        "secs": {str(c): [r["sec"] for r in runs[c]] for c in (lo, hi)},
        "median_lo": r_lo, "median_hi": r_hi,
        "scaling_efficiency": round(eff, 3)}, indent=2))
    assert r_lo["dupe_count"] == r_hi["dupe_count"], \
        "parallelism changed results!"


if __name__ == "__main__":
    main()
