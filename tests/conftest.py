from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from claims_data_spark.session import get_spark

    # Test-session sizing (round 11): suite data is tiny (fixtures +
    # sf0.001), so per-action wall is TASK-COUNT floor, not compute —
    # measured 0.22 s/action at 2 shuffle partitions vs 0.71 s at 8
    # (3.2x) with identical values. 2 partitions (never 1) keeps every
    # multi-partition code path — partial aggregation, exchange
    # hashing, partitioning-invariance tests — honest. Do NOT also cap
    # spark.default.parallelism / leafNodeDefaultParallelism: those
    # govern scan splits and spread()'s target, and capping them ran
    # the CPU-heavy fixture tests (production md5 streams, profile
    # drift, bucketed writes) on 2 cores — measured +160 s across the
    # suite. Production defaults in session.get_spark are unchanged;
    # this is the test harness only.
    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=2,
    )
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
