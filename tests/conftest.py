from __future__ import annotations

import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pii_redactor_spark.session import get_spark

    s = get_spark(app_name="pii-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root():
    os.makedirs("/root/repo/.cache", exist_ok=True)
    d = tempfile.mkdtemp(prefix="pii_spark_test_", dir="/root/repo/.cache")
    yield d
    shutil.rmtree(d, ignore_errors=True)
