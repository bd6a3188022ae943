from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hurricanedb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # default.parallelism=8 (TEST session only; bench/product sessions
    # keep the machine-sized default): tests run on KB-scale fixtures
    # where per-task scheduling overhead dominates — a local[32] default
    # turned an 8-row nested-loop join into 32x32=1024 tasks (~19s of
    # pure scheduling, measured round-16). Every partition-count
    # assertion in the suite reads sc.defaultParallelism dynamically.
    spark = get_spark(
        "hurricanedb-tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
