from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_processing_spark.session import get_spark  # noqa: E402
from reddit_processing_spark.sources.fixtures import ensure_fixture  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_dir() -> str:
    return ensure_fixture("tiny")


@pytest.fixture(scope="session")
def small_dir() -> str:
    return ensure_fixture("small")
