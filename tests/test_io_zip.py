import subprocess
import sys
import zipfile

from qamd_spark import io as qio
from qamd_spark import report
from qamd_spark.config import QamdConfig


def test_read_table_parquet_path(spark, synth_path):
    df = qio.read_table(spark, synth_path)
    assert df.count() > 0


def test_iceberg_ref_without_runtime_errors(spark):
    import pytest

    if qio.iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="iceberg runtime not on the classpath"):
        qio.read_table(spark, "iceberg:db.transcripts")


def test_table_fingerprint_changes_with_content(spark, synth_path, tmp_path):
    from qamd_spark import synth

    fp1 = qio.table_fingerprint(spark, synth_path)
    other = str(tmp_path / "other.parquet")
    synth.write_parquet(other, n_convs=5, seed=1)
    fp2 = qio.table_fingerprint(spark, other)
    assert fp1 != fp2
    assert fp1 == qio.table_fingerprint(spark, synth_path)


def test_metadata_stats(spark, synth_path, synth_pdf):
    df = spark.read.parquet(synth_path)
    meta = report.metadata_stats(df)
    assert meta["raw_case_count"] == len(synth_pdf)
    assert meta["case_count"] == synth_pdf["conv_id"].nunique()
    assert meta["variable_count"] == 6
    assert meta["role_occurrences"]["user"] > 0


def test_make_zip_importable(tmp_path):
    out = tmp_path / "qamd_spark.zip"
    subprocess.run(
        [sys.executable, "scripts/make_zip.py", str(out)], check=True, cwd="/root/repo"
    )
    names = zipfile.ZipFile(out).namelist()
    assert "qamd_spark/pipeline.py" in names
    assert "oracle/oracle.py" in names
    # the zip is importable standalone (spark-submit --py-files contract)
    code = (
        f"import sys; sys.path.insert(0, {str(out)!r}); "
        "import qamd_spark.config as c; print(len(c.RULE_REGISTRY))"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.returncode == 0 and int(r.stdout.strip()) >= 16
