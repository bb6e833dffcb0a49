import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qamd_spark import session as qsession  # noqa: E402
from qamd_spark import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = qsession.get_spark("qamd-tests", master="local[4]", shuffle_partitions=8)
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def synth_pdf():
    return synth.generate(n_convs=60, seed=42, hot_conv_turns=120)


@pytest.fixture(scope="session")
def synth_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    synth.write_parquet(str(p), n_convs=60, seed=42, hot_conv_turns=120)
    return str(p)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "skew: empirical skew-torture timing tests (wall-clock sensitive; "
        "deselect with -m 'not skew' on noisy hosts)",
    )
