#!/usr/bin/env python3
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Scaling mode (--scaling): runs the full transcript pipeline on the SAME
synthesized input at local[8] and local[32] in separate JVMs (sandbox proxy
for N vs 4N executors, per BASELINE.md) and writes BENCH/BASELINE.md with
turns/sec at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def transcripts_path(sf: float) -> str:
    """Deterministic synthetic transcripts sized to the scale factor,
    cached under .bench_cache (generation is seeded ⇒ reusable)."""
    n_convs = max(2000, int(200000 * sf))
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{n_convs}_seed42.parquet")
    if not os.path.exists(path):
        from qamd_spark import synth

        synth.write_parquet(path, n_convs=n_convs, seed=42, hot_conv_turns=2000)
    return path


def run_benchmarks() -> dict:
    from qamd_spark import pipeline, session
    from qamd_spark.config import QamdConfig
    import __spark_entry__ as E

    sf = _sf_from_dir(SF_DIR)
    spark = session.get_spark(
        "qamd-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    cfg = QamdConfig()
    tpath = transcripts_path(sf)
    timings: dict[str, float] = {}
    n_turns = 0

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: full transcript pipeline (score+dedup+conv agg+decide)
    def _pipeline():
        from pyspark.sql import functions as F

        # a single small parquet file is one input split — repartition so
        # the Python scoring stage parallelizes (a real 100TB table has
        # thousands of splits and never needs this)
        df = spark.read.parquet(tpath).repartition(CPUS * 2)
        labeled = pipeline.label(df, cfg)
        row = labeled.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("keep").cast("long")).alias("k")
        ).collect()[0]
        return row["n"]

    n_turns = timed("transcript_pipeline", _pipeline)

    # operator benchmarks over the driver tables at this SF
    for name in [
        "odd_char_ratio",
        "stopword_fraction",
        "dedup_exact",
        "summary_report",
        "ann_cosine_topk",
        "minhash_dedup",
        "fingerprint",
    ]:
        q = E.queries()[name]
        timed(name, lambda q=q: q(spark, SF_DIR).count())

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "qamd_pipeline_plus_ops_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / timings["transcript_pipeline"], 1),
        "cpus": CPUS,
    }


SCALING_N_CONVS = 150000  # ~1.5M turns: >=60s of work at local[8]
                          # (BASELINE.md protocol), compute-dominated


def scaling_input() -> str:
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_n{SCALING_N_CONVS}_seed42.parquet")
    if not os.path.exists(path):
        from qamd_spark import synth

        synth.write_parquet(path, n_convs=SCALING_N_CONVS, seed=42, hot_conv_turns=5000)
    return path


def _scaling_child(cpus: int) -> dict:
    """Run the pipeline once at a given core count in a fresh JVM."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from qamd_spark import pipeline, session
from qamd_spark.config import QamdConfig
import bench
tpath = bench.scaling_input()
spark = session.get_spark('qamd-scale', master='local[{cpus}]', shuffle_partitions={cpus})
cfg = QamdConfig()
# warmup: JVM codegen + spawn all Python workers (full-width small job)
pipeline.label(spark.read.parquet(tpath).limit(50000).repartition({cpus} * 2), cfg).count()
df = spark.read.parquet(tpath).repartition({cpus} * 2)
t0 = time.perf_counter()
labeled = pipeline.label(df, cfg)
n = labeled.count()
dt = time.perf_counter() - t0
print(json.dumps({{"cpus": {cpus}, "n_turns": n, "sec": round(dt,3),
                   "turns_per_sec": round(n/dt,1)}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"scaling child (local[{cpus}]) produced no result")
    return json.loads(lines[-1])


def run_scaling(trials: int = 3) -> None:
    """Interleaved multi-trial scaling run; best (min wall) per config.

    The sandbox is a shared host with external load (observed 3x wall-time
    swings between identical runs), so a single trial per config is
    meaningless. Interleaving decorrelates drift; min-wall is the standard
    noise-robust estimator for a deterministic workload.
    """
    lo, hi = 8, 32
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(trials):
        runs[lo].append(_scaling_child(lo))
        runs[hi].append(_scaling_child(hi))
    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in runs.items()}
    eff = (best[hi]["turns_per_sec"] / best[lo]["turns_per_sec"]) / (hi / lo)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    trial_rows = "\n".join(
        f"| local[{c}] trial {i} | {r['sec']} | {r['turns_per_sec']} |"
        for c in (lo, hi)
        for i, r in enumerate(runs[c])
    )
    md = f"""# BENCH/BASELINE.md — two-parallelism scaling run

Sandbox proxy for N→4N executors (BASELINE.md protocol): the same full
transcript pipeline (score + scrub + langid + perplexity + dedup + conv
aggregates + keep/drop) on the SAME deterministic synthetic input
({best[lo]['n_turns']} turns), in fresh JVMs at local[{lo}] and local[{hi}],
{trials} interleaved trials per config (shared noisy host — see bench.py),
best trial reported.

| config | turns | wall sec (best) | turns/sec (best) |
|---|---|---|---|
| local[{lo}] | {best[lo]['n_turns']} | {best[lo]['sec']} | {best[lo]['turns_per_sec']} |
| local[{hi}] | {best[hi]['n_turns']} | {best[hi]['sec']} | {best[hi]['turns_per_sec']} |

**Scaling efficiency ({lo}→{hi} cores, x{hi//lo}): {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)

All trials:

| run | wall sec | turns/sec |
|---|---|---|
{trial_rows}

Input: `{scaling_input()}`; AQE on (advisory 8m), maxPartitionBytes 32m,
shuffle.partitions = cores; labels verified partition-count invariant.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(
        json.dumps(
            {"best_lo": best[lo], "best_hi": best[hi], "scaling_efficiency": round(eff, 3)}
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_benchmarks()))
