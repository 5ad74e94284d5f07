from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from logzoom_spark.session import get_spark

    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def turns(spark):
    from logzoom_spark.transcripts import load_turns

    return load_turns(spark, SF0001).cache()


@pytest.fixture(scope="session")
def tiny_turns(spark):
    """Handcrafted hostile fixture: KV/JSON/garbled/empty text, unicode,
    NUL bytes, missing tools, duplicate-ish conversations."""
    import datetime as dt

    rows = [
        # (conv_id, turn_idx, role, text, tool, ts)
        ("c1", 0, "user", 'seq=1 level=INFO log_type=log_type1 latency_ms=5 msg="a"', None,
         dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", 'seq=2 level=ERROR log_type=log_type1 latency_ms=9 msg="b"',
         None, dt.datetime(2024, 1, 1, 0, 2, 0)),
        ("c1", 2, "tool", '{"message":"m3","log_type":"log_type2","level":"WARN","latency_ms":7}',
         "bash", dt.datetime(2024, 1, 1, 0, 4, 0)),
        ("c2", 0, "system", "garbled \x00 nul ✓ 日本語 line\nsecond\ttab", "metrics_probe",
         dt.datetime(2024, 1, 1, 0, 6, 0)),
        ("c2", 1, "user", "", None, dt.datetime(2024, 1, 1, 1, 0, 0)),
        ("c2", 2, "user", 'level=INFO log_type=log_type2 latency_ms=1 msg="x"', "search",
         dt.datetime(2024, 1, 1, 2, 0, 0)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
