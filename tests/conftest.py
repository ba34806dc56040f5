from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    from d6tstack_spark.session import get_spark

    s = get_spark(app_name="d6tstack_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from d6tstack_spark.datagen import write_transcripts

    out = tmp_path_factory.mktemp("transcripts")
    return write_transcripts(str(out), sf=0.001)
