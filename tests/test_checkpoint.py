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


def test_salted_repartition_spreads_hot_conversation(spark, synth_path):
    """north_rule skew handling: after the salted write repartition, a hot
    conversation's rows spread over ~salt_buckets tasks instead of one."""
    from pyspark.sql import functions as F

    cfg = QamdConfig()
    labeled = pipeline.label(spark.read.parquet(synth_path), cfg)
    salted = pipeline.salted_repartition(labeled, cfg)
    # On this tiny fixture AQE legitimately coalesces the whole shuffle to
    # one partition (it only ever MERGES small partitions; at scale a hot
    # conversation's salt groups are large and stay separate) — turn
    # coalescing off to observe the salt's hash spread itself.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # conv00000 is the synth hot conversation (120 turns here)
        parts = (
            salted.filter(F.col("conv_id") == "conv00000")
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert parts > 1, "hot conversation pinned to a single partition"
    assert parts <= cfg.salt_buckets
