#!/usr/bin/env python
"""Two-parallelism scaling evidence (the north rule's N vs 4N criterion).

Runs the headline pipeline (bench.py BENCH_PIPELINE_ONLY=1) in separate
processes at local[N] and local[4N] on the SAME pre-generated input, reports
throughput at both plus scaling efficiency = T_N / (4 * T_4N), and writes
BENCH/BASELINE.md.  Wall-clock timing excludes session startup and input
generation (bench.py times only the pipeline actions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", "32000"))
LOW = int(os.environ.get("BENCH_CPUS_LOW", "2"))
HIGH = int(os.environ.get("BENCH_CPUS_HIGH", "8"))


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_IMAGES=str(N_IMAGES),
        BENCH_PIPELINE_ONLY="1",
        # this harness already repeats per level (best_of); don't multiply by
        # bench.py's own min-of-N
        BENCH_REPEATS="1",
    )
    load0 = _loadavg()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py produced no JSON at cpus={cpus}; stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-15:])
        )
    r = json.loads(lines[-1])
    # co-tenant contention disclosure: loadavg before/after, minus our own
    # expected load — reps that ran dirty are visible in the history
    r["loadavg_before"], r["loadavg_after"] = load0, _loadavg()
    return r


REPS = int(os.environ.get("BENCH_REPS", "2"))


def best_of(runs: list[dict]) -> dict:
    """min-of-N walls: the host VM shows sporadic co-tenant contention
    bursts; min over interleaved reps is the noise-robust estimator."""
    best = dict(min(runs, key=lambda r: r["zonal_wall_s"]))
    best["queries"] = dict(best["queries"])
    best["queries"]["image_sample_pipeline"] = min(
        r["queries"]["image_sample_pipeline"] for r in runs
    )
    best["rep_walls"] = [
        (r["zonal_wall_s"], r["queries"]["image_sample_pipeline"],
         r["loadavg_before"], r["loadavg_after"])
        for r in runs
    ]
    return best


def main() -> None:
    # warm the shared input cache once (generation excluded from timing anyway)
    run_once(HIGH)
    # INTERLEAVE the levels so a contention burst cannot poison every rep of
    # one level while leaving the other clean (which would skew the ratio)
    low_runs, high_runs = [], []
    for _ in range(REPS):
        low_runs.append(run_once(LOW))
        high_runs.append(run_once(HIGH))
    low = best_of(low_runs)
    high = best_of(high_runs)
    allcores = best_of(
        [run_once(int(os.environ.get("BENCH_CPUS_MAX", str(os.cpu_count() or 32))))
         for _ in range(REPS)]
    )
    t_low = low["zonal_wall_s"]
    t_high = high["zonal_wall_s"]
    factor = HIGH / LOW
    eff = t_low / (factor * t_high)
    s_low = low["queries"]["image_sample_pipeline"]
    s_high = high["queries"]["image_sample_pipeline"]
    eff_sample = s_low / (factor * s_high)
    report = {
        "n_images": N_IMAGES,
        "cpus_low": LOW,
        "cpus_high": HIGH,
        "zonal_wall_s_low": t_low,
        "zonal_wall_s_high": t_high,
        "images_per_sec_low": round(N_IMAGES / t_low, 2),
        "images_per_sec_high": round(N_IMAGES / t_high, 2),
        "scaling_efficiency_zonal": round(eff, 3),
        "sample_wall_s_low": s_low,
        "sample_wall_s_high": s_high,
        "scaling_efficiency_sample": round(eff_sample, 3),
        "images_per_sec_allcores": round(N_IMAGES / allcores["zonal_wall_s"], 2),
        "allcores": int(os.environ.get("BENCH_CPUS_MAX", str(os.cpu_count() or 32))),
        "rep_walls_low": low["rep_walls"],
        "rep_walls_high": high["rep_walls"],
        "rep_walls_allcores": allcores["rep_walls"],
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(report) + "\n")
    if os.environ.get("BENCH_WRITE_MD", "0") != "1":
        return  # BASELINE.md is curated by hand from scaling_runs.jsonl
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH baseline — rasteret_spark engine

Headline metric (per `/root/repo/BASELINE.json`): **images/sec end-to-end**
through header-cache enrichment -> cell-cover AOI join (salted) -> exact
polygon refine -> tile-window decode + scanline mask -> zonal reduce, over
the synthetic image table ({N_IMAGES} images, 200 AOIs).

Two-parallelism scaling evidence (`local[{LOW}]` vs `local[{HIGH}]` on the
same machine and identical input — the sandbox stand-in for N vs 4N
executors; the timed job is pure pipeline, startup/generation excluded):

| parallelism | zonal wall (s) | images/sec | point-sample wall (s) |
|---|---|---|---|
| local[{LOW}]  | {t_low:.2f} | {N_IMAGES / t_low:.1f} | {s_low:.2f} |
| local[{HIGH}] | {t_high:.2f} | {N_IMAGES / t_high:.1f} | {s_high:.2f} |

Scaling efficiency (T_N / ({factor:.0f} x T_4N)):
  zonal pipeline **{eff:.3f}**, point-sample pipeline **{eff_sample:.3f}**
  (target >= 0.8).

Absolute throughput using every core of this box
(local[{report['allcores']}]): **{report['images_per_sec_allcores']:.0f} images/sec**
end-to-end.  N vs 4N is measured at 2 vs 8 cores because a single box shares
one memory-bandwidth/IO domain: beyond ~8 local cores the decode pipeline
becomes bandwidth-bound, which a real 4N-executor cluster (4x independent
machines) does not suffer — the low-core pair isolates the algorithmic
scaling the rule targets while the all-core row reports peak single-box
throughput.

Reference single-node baseline (rasteret, `BASELINE.md`): ~8.4-9.9
patches/sec on Major-TOM keyed access; this engine's decode+join+zonal path
sustains {N_IMAGES / t_high:.0f} images/sec at local[{HIGH}] and
{report['images_per_sec_allcores']:.0f} images/sec at local[{report['allcores']}].

Generated by `scripts/bench_scaling.py` on {report['ts']}.
"""
        )


if __name__ == "__main__":
    main()
