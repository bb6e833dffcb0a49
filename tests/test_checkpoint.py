import pytest

from qamd_spark import checkpoint, pipeline
from qamd_spark.config import QamdConfig


@pytest.fixture()
def cfg():
    # small bucket count so the test runs few jobs
    return QamdConfig(n_buckets=6)


def test_full_run_writes_all_manifests(spark, synth_path, tmp_path, cfg):
    out = str(tmp_path / "out")
    written = checkpoint.run_with_checkpoints(
        spark, synth_path, out, cfg, bucket_batch=3
    )
    assert {m.bucket for m in written} == set(range(6))
    total = sum(m.n_rows for m in written)
    assert total == spark.read.parquet(synth_path).count()
    # data round-trip
    got = spark.read.parquet(out + "/data")
    assert got.count() == total


def test_crash_and_resume_equals_single_run(spark, synth_path, tmp_path, cfg):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    checkpoint.run_with_checkpoints(spark, synth_path, out_a, cfg, bucket_batch=2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.run_with_checkpoints(
            spark, synth_path, out_b, cfg, bucket_batch=2, fail_after_buckets=3
        )
    resumed = checkpoint.run_with_checkpoints(
        spark, synth_path, out_b, cfg, bucket_batch=2
    )
    # resume only re-runs the missing buckets
    assert len(resumed) <= 6 - 3 + 1
    a = (
        spark.read.parquet(out_a + "/data")
        .select("conv_id", "turn_idx", "keep", "scrubbed_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(out_b + "/data")
        .select("conv_id", "turn_idx", "keep", "scrubbed_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["keep"].to_numpy() == b["keep"].to_numpy()).all()
    sa = a["scrubbed_text"].fillna("\x00")
    sb = b["scrubbed_text"].fillna("\x00")
    assert (sa.to_numpy() == sb.to_numpy()).all()


def test_config_change_invalidates_manifests(spark, synth_path, tmp_path):
    out = str(tmp_path / "c")
    cfg1 = QamdConfig(n_buckets=6)
    checkpoint.run_with_checkpoints(spark, synth_path, out, cfg1, bucket_batch=6)
    cfg2 = QamdConfig(n_buckets=6, settings={**cfg1.settings, "perplexity": None})
    # different config fingerprint ⇒ all buckets re-run
    rerun = checkpoint.run_with_checkpoints(spark, synth_path, out, cfg2, bucket_batch=6)
    assert {m.bucket for m in rerun} == set(range(6))
