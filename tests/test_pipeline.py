"""End-to-end pipeline tests: config → build → run_batch → sink files +
aggregates vs the Python oracle (SURVEY.md §5.2-3)."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json

from pyspark.sql import functions as F

from logzoom_spark.pipeline import config_from_dict, default_config, run_batch
from logzoom_spark.aggregate import window_counts

from .oracle_py import parse_row, route_allows, window_counts as oracle_windows

import pytest


def test_run_batch_sink_rows_match_oracle(spark, turns, tmp_path):
    out = str(tmp_path / "out")
    cfg = default_config()
    res = run_batch(spark, turns, cfg, out_dir=out)

    rows = [parse_row(r.asDict()) for r in turns.collect()]
    expected = {
        "sink_redis_a": sum(route_allows(r, {"log_type": "log_type1"}) for r in rows),
        "sink_redis_b": sum(route_allows(r, {"log_type": "log_type2"}) for r in rows),
        "sink_s3": sum(
            route_allows(r, {"log_type": "log_type1", "level": "ERROR"}) for r in rows
        ),
        "sink_es": len(rows),  # rules ignored
        "sink_tcp": 0,  # missing key rejects everything
        "sink_ws": len(rows),
    }
    assert {k: v["rows"] for k, v in res.items()} == expected


def test_redis_copy_queues_identical(spark, turns, tmp_path):
    out = str(tmp_path / "o2")
    run_batch(spark, turns, out_dir=out)

    def queue_hash(sink, q):
        lines = []
        for fn in glob.glob(f"{out}/{sink}/queue={q}/*.json"):
            with open(fn) as f:
                lines += f.read().splitlines()
        return hashlib.md5("\n".join(sorted(lines)).encode()).hexdigest(), len(lines)

    h1, n1 = queue_hash("sink_redis_a", "q1")
    h2, n2 = queue_hash("sink_redis_a", "q2")
    assert n1 > 0 and (h1, n1) == (h2, n2)


def test_s3_gzip_text_roundtrip(spark, turns, tmp_path):
    out = str(tmp_path / "o3")
    run_batch(spark, turns, out_dir=out)
    src = {
        (r.conv_id, r.turn_idx): r.text
        for r in turns.collect()
    }
    n = 0
    for fn in glob.glob(f"{out}/sink_s3/time_slice=*/*.gz"):
        with gzip.open(fn, "rt") as f:
            for line in f:
                d = json.loads(line)
                assert src[(d["conv_id"], d["turn_idx"])] == d["text"]
                n += 1
    assert n > 0


def test_aggregates_match_python_oracle(spark, turns, tmp_path):
    out = str(tmp_path / "o4")
    run_batch(spark, turns, out_dir=out)
    got = {
        (r.role, r.window_start): r.cnt
        for r in spark.read.parquet(f"{out}/aggregates/sink_es/by_role").collect()
    }
    want = oracle_windows([r.asDict() for r in turns.collect()], "role", 300)
    assert got == {k: v for k, v in want.items()}


def test_window_counts_equals_spark_window_function(spark, turns):
    """Our epoch-bucket arithmetic must equal F.window()'s tumbling start."""
    a = window_counts(turns, "role", 300)
    b = (
        turns.groupBy("role", F.window(F.col("ts").cast("timestamp"), "300 seconds"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "role",
            F.unix_timestamp("window.start").cast("bigint").alias("window_start"),
            "cnt",
        )
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_config_from_dict_roundtrip(spark, turns, tmp_path):
    cfg = config_from_dict(
        {
            "routes": [
                {"name": "r1", "output": "s_a", "rules": {"log_type": "log_type1"}},
                {"name": "r2", "output": "s_b", "rules": {}, "enforce_rules": False},
            ],
            "sinks": {
                "s_a": {"type": "tcp"},
                "s_b": {"type": "es"},
            },
        }
    )
    res = run_batch(spark, turns, cfg, out_dir=str(tmp_path / "o5"))
    assert res["s_b"]["rows"] == turns.count()
    assert 0 < res["s_a"]["rows"] < turns.count()


def test_config_validation():
    with pytest.raises(ValueError):
        config_from_dict(
            {"routes": [{"output": "x"}, {"output": "x"}], "sinks": {"x": {"type": "tcp"}}}
        )
    with pytest.raises(ValueError):
        config_from_dict({"routes": [{"output": "ghost"}], "sinks": {}})
