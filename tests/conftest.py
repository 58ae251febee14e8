from __future__ import annotations

import pytest

from data_validator_spark.fixtures.clips import ClipsConfig, write_fixture
from data_validator_spark.session import build_session

N_ROWS = 6000


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        cores=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def clips_cfg() -> ClipsConfig:
    return ClipsConfig(n_rows=N_ROWS, n_partitions=6, seed=42, max_synth_ms=800)


@pytest.fixture(scope="session")
def fixture_paths(spark, clips_cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clipsfx"))
    return write_fixture(spark, clips_cfg, out)


@pytest.fixture(scope="session")
def clips(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["clips"])


@pytest.fixture(scope="session")
def transcripts_ref(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["transcripts_ref"])


@pytest.fixture(scope="session")
def golden(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["golden"])
