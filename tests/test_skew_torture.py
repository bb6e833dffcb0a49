"""Empirical skew-torture (r3 VERDICT item 4) at pytest scale.

bench.run_skew(scale=10) builds 1/10-size twins of the full torture
corpora (one 10^4-copy duplicate text, one 10^4-turn conversation, one
source holding 90% of 11k docs, ~60k-turn transcript tables) and runs
the four headline ops interleaved uniform/skew on the shared test
session. The full-scale (1e5-copy / 1e5-turn / 600k-turn) run is
`python bench.py --skew`, which writes BENCH/SKEW.md; this marked test
pins the same ≤1.5x contract where CI can afford it.

Host-noise honesty: interleaved min-of-2 per variant (the protocol
BENCH/ANALYSIS.md validated against this sandbox's 3x inter-window
drift); marked `skew` so noisy hosts can deselect.
"""

import pytest

import bench


@pytest.mark.skew
def test_skew_torture_ratios_within_bound(spark):
    results = bench.run_skew(scale=10, runs=2, spark=spark)
    assert set(results) == {
        "transcript_pipeline", "dedup_exact", "minhash_dedup", "setsim_join",
        "simhash_neardup", "levenshtein_neardup",
    }
    bad = {n: r for n, r in results.items() if not r["ok"]}
    assert not bad, f"skew ratio over {bench.SKEW_BOUND}x: {bad}"


@pytest.mark.skew
def test_cross_set_leakage_dup_train_skew(spark):
    """r5 skew guard: a dup-heavy train corpus (ONE vector embedded 1e4
    times at pytest scale) must not blow up the leak detector's bucket
    join — identical train vectors collapse to their min-id
    representative before signatures, so the skew/uniform wall ratio
    stays bounded and the best match for a probe of the duplicated
    vector is the GROUP MINIMUM id (the lossless-collapse contract)."""
    import time

    import numpy as np

    from qamd_spark.ops import similarity as sim

    n, copies, dim = 12_000, 10_000, 16
    rng = np.random.RandomState(5)
    base = rng.standard_normal((n, dim))
    uni_rows = [(i, base[i].tolist()) for i in range(n)]
    # skew: ids [0, copies) all share vector base[0]; rest distinct
    skew_rows = [
        (i, base[0 if i < copies else i].tolist()) for i in range(n)
    ]
    probes = [(100_000 + i, base[i * 7 % n].tolist()) for i in range(300)]
    schema = "vec_id long, embedding array<double>"
    uni = spark.createDataFrame(uni_rows, schema)
    skw = spark.createDataFrame(skew_rows, schema)
    prb = spark.createDataFrame(probes, schema)

    def run(train):
        return sim.cross_set_leakage(
            train, prb, threshold=0.999, bits=12, n_tables=8, dim=dim
        )

    run(uni).count(); run(skw).count()  # warm
    tu = ts = 1e18
    for _ in range(2):  # interleaved min-of-2 (host-drift honesty)
        t0 = time.perf_counter(); run(uni).count(); tu = min(tu, time.perf_counter() - t0)
        t0 = time.perf_counter(); ns = run(skw).count(); ts = min(ts, time.perf_counter() - t0)
    assert ts / tu <= 1.5, (tu, ts)
    # correctness under the collapse: every probe finds its planted
    # source; probes of base[0] (i*7%n < copies) resolve to id 0 — the
    # min of the 1e4-copy group — never an arbitrary copy
    got = {r["probe_id"]: r["train_id"] for r in run(skw).collect()}
    assert ns == len(got)
    for pid, tid in got.items():
        src = ((pid - 100_000) * 7) % n
        assert tid == (0 if src < copies else src), (pid, tid, src)
