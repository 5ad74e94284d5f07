"""End-to-end pipeline tests: config → build → run_batch → sink files +
aggregates vs the Python oracle (SURVEY.md §5.2-3)."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

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


def test_example_yaml_roundtrip(spark, turns, tmp_path):
    """examples/pipeline.yml loads and runs; the s3 sink inherits the '<='
    sample bound by default (s3.go:308 quirk) without the author asking."""
    from pathlib import Path

    from logzoom_spark.pipeline import config_from_yaml

    cfg = config_from_yaml(str(Path(__file__).parent.parent / "examples/pipeline.yml"))
    assert set(cfg.sinks) == {
        "type1_redis", "type2_redis", "errors_s3", "all_es", "tail_tcp", "live_ws",
    }
    by_sink = {r.sink: r for r in cfg.routes}
    assert by_sink["errors_s3"].sample_bound == "le"  # derived from sink type
    assert by_sink["type1_redis"].sample_bound == "lt"
    assert by_sink["all_es"].enforce_rules is False
    res = run_batch(spark, turns, cfg, out_dir=str(tmp_path / "oyml"))
    assert res["all_es"]["rows"] == turns.count()
    assert 0 < res["errors_s3"]["rows"] <= res["type1_redis"]["rows"]


def test_stacked_sampling_compounds(spark, turns):
    """Ingest gate × sink gate must compound like the reference's
    independent per-event RandInt (server/rand.go:8-11): 50% × 50% ≈ 25%,
    not min(50,50)=50. Regression for the shared-seed bug (ADVICE r1)."""
    from logzoom_spark.pipeline import PipelineConfig, build
    from logzoom_spark.route import Route
    from logzoom_spark import sinks as sk

    cfg = PipelineConfig(
        routes=[
            Route("rA", "sA", {}, sample_pct=50.0),
            Route("rB", "sB", {}, sample_pct=50.0),
        ],
        sinks={"sA": sk.SinkSpec("sA", "tcp"), "sB": sk.SinkSpec("sB", "tcp")},
        ingest_sample_pct=50.0,
    )
    _, branches = build(spark, turns, cfg, persist=False)
    n = turns.count()
    n_a, n_b = branches["sA"].count(), branches["sB"].count()
    assert 0.15 * n < n_a < 0.35 * n  # compounded ≈ 25%, not 50%
    assert 0.15 * n < n_b < 0.35 * n
    # distinct seeds ⇒ the two sinks pick different (overlapping) subsets
    a_ids = {(r.conv_id, r.turn_idx) for r in branches["sA"].select("conv_id", "turn_idx").collect()}
    b_ids = {(r.conv_id, r.turn_idx) for r in branches["sB"].select("conv_id", "turn_idx").collect()}
    assert a_ids != b_ids and a_ids & b_ids


def test_sink_ddl_artifact(spark, turns):
    """sink_ddl: the index-template analog — every sink's schema renders as
    an Iceberg CREATE TABLE with the kind's partition transform."""
    from logzoom_spark import sinks as sk
    from logzoom_spark.parse import parse_turns

    parsed = parse_turns(turns)
    cfg = default_config()
    ddls = sk.all_sink_ddls(cfg.sinks, parsed)
    assert set(ddls) == set(cfg.sinks)
    es = ddls["sink_es"]
    assert "CREATE TABLE IF NOT EXISTS logzoom.sinks.sink_es" in es
    assert "PARTITIONED BY (days(ts))" in es and "USING iceberg" in es
    assert "index_day STRING" in es and "ts TIMESTAMP" in es
    assert "PARTITIONED BY (hours(ts))" in ddls["sink_s3"]
    assert "PARTITIONED BY (queue)" in ddls["sink_redis_a"]
    assert "PARTITIONED BY" not in ddls["sink_tcp"]
    # line format column present for tcp
    assert "line STRING" in ddls["sink_tcp"]


def test_config_validation():
    with pytest.raises(ValueError):
        config_from_dict(
            {"routes": [{"output": "x"}, {"output": "x"}], "sinks": {"x": {"type": "tcp"}}}
        )
    with pytest.raises(ValueError):
        config_from_dict({"routes": [{"output": "ghost"}], "sinks": {}})


def test_lineage_columns_from_file_metadata(spark, tmp_path):
    """iceberg.with_lineage_columns: `_file`/`_pos` provenance via the
    file-source _metadata struct — real row positions on plain parquet
    (SURVEY §1.2 row 3; the row-level refinement of the group manifest)."""
    from logzoom_spark import iceberg

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(2).write.parquet(p)
    df = iceberg.with_lineage_columns(spark.read.parquet(p))
    rows = df.collect()
    assert len(rows) == 100
    assert all(r._file.endswith(".parquet") for r in rows)
    # row_index restarts at 0 within each file and is dense
    by_file = {}
    for r in rows:
        by_file.setdefault(r._file, []).append(r._pos)
    for poss in by_file.values():
        assert sorted(poss) == list(range(len(poss)))
    # DDL artifact renders the bucketed/day-partitioned spec
    ddl = iceberg.create_table_ddl("cat.db.turns", buckets=32)
    assert "PARTITIONED BY (days(ts), bucket(32, conv_id))" in ddl
    assert "USING iceberg" in ddl


def test_turns_format_roundtrip(spark, turns, tmp_path):
    """sources.read_turns: jsonl and csv land byte-identical turns (incl.
    hostile text) back into the canonical schema; malformed lines are
    counted via source_ok, not dropped."""
    from logzoom_spark import sources

    base = turns.limit(300)
    want = {(r.conv_id, r.turn_idx): r.text for r in base.collect()}

    jdir = str(tmp_path / "j")
    base.coalesce(1).write.json(jdir)
    jback = sources.read_turns(spark, jdir, "jsonl")
    got_j = {(r.conv_id, r.turn_idx): r.text for r in jback.collect()}
    assert got_j == want
    assert jback.filter("NOT source_ok").count() == 0

    cdir = str(tmp_path / "c")
    base.coalesce(1).write.option("header", True).option("escape", '"').csv(cdir)
    cback = sources.read_turns(spark, cdir, "csv")
    got_c = {(r.conv_id, r.turn_idx): r.text for r in cback.collect()}
    # CSV representational limits: embedded newlines need multiLine, and
    # empty string vs null is ambiguous — jsonl is the faithful format;
    # assert byte-equality on the unambiguous subset + row accounting
    safe = {k: v for k, v in want.items() if v and "\n" not in v}
    for k, v in safe.items():
        assert got_c[k] == v
    assert cback.count() >= len(safe)

    bad = tmp_path / "badj"
    bad.mkdir()
    (bad / "part-000.json").write_text(
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "ok", "tool": null, "ts": "2024-01-01T00:00:00"}\n'
        "this is not json\n"
    )
    b = sources.read_turns(spark, str(bad), "jsonl")
    assert b.count() == 2
    assert b.filter("NOT source_ok").count() == 1

    # partially-malformed row: conv_id parses but turn_idx has the wrong
    # type — PERMISSIVE sets _corrupt_record, and the strict accounting
    # must count it malformed (ADVICE r2: OR-ing conv_id.isNotNull() let
    # these rows pass as ok)
    part = tmp_path / "partialj"
    part.mkdir()
    (part / "part-000.json").write_text(
        '{"conv_id": "c9", "turn_idx": "not-an-int", "role": "user", '
        '"text": "x", "tool": null, "ts": "2024-01-01T00:00:00"}\n'
    )
    p = sources.read_turns(spark, str(part), "jsonl")
    rows = p.collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] == "c9" and rows[0]["source_ok"] is False


def test_write_es_salted_multi_file_days(spark, turns, tmp_path):
    """The ES writer must not funnel a whole daily index through one task:
    with tasks_per_day > 1 each index_day dir holds multiple files (salted
    repartition — same layout write_s3 uses via files_per_slice), and the
    rows round-trip intact."""
    from logzoom_spark.sinks import write_es

    df = turns.withColumn("source", F.lit("src1"))
    out = str(tmp_path / "es_salted")
    # at test scale AQE folds the tiny salted partitions back together
    # (they're far below the 64 MB advisory size); at 100 TB a day is
    # thousands of advisory units and the fanout survives. Disable
    # coalescing here to observe the layout the salt produces.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        write_es(df, out, tasks_per_day=4, max_records_per_file=100000)
    finally:
        spark.conf.set(coalesce_key, old)
    days = glob.glob(f"{out}/index_day=*")
    assert days, "no daily index dirs written"
    per_day = {d: len(glob.glob(f"{d}/part-*.json")) for d in days}
    assert max(per_day.values()) > 1, f"one writer task per day: {per_day}"
    back = spark.read.json(f"{out}")
    assert back.count() == turns.count()


def test_spark_submit_py_files_launch(tmp_path):
    """The north rule's literal launch path: package logzoom_spark into a
    zip and run the full batch pipeline via spark-submit --py-files
    (scripts/submit.sh). Catches zip-packaging breaks (a module importable
    from the checkout but missing from the wheel-less zip, or any hidden
    dependency on the repo cwd) that the in-process suite can't see."""
    import os
    import subprocess

    out_dir = tmp_path / "submit_out"
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_DRIVER_MEM="4g",
    )
    res = subprocess.run(
        ["bash", str(REPO / "scripts" / "submit.sh"), str(out_dir)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    # driver prints one JSON line: {sink: {"rows": N}}
    payload = None
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            payload = json.loads(line)
    assert payload is not None, res.stdout[-2000:]
    assert set(payload) == {
        "sink_redis_a", "sink_redis_b", "sink_s3", "sink_es", "sink_tcp", "sink_ws",
    }
    # ES ignores rules (elasticsearch.go:146-153) ⇒ every parsed turn routed
    assert payload["sink_es"]["rows"] > 0
    # missing rule key ⇒ reject (s3.go:303) ⇒ tcp sink gets nothing
    assert payload["sink_tcp"]["rows"] == 0
    # sink files actually landed on disk from the submitted job
    assert glob.glob(str(out_dir / "sink_es" / "**" / "*"), recursive=True)


def test_completed_groups_rejects_pre_upgrade_manifest(spark, tmp_path):
    """A manifest written before n_groups tracking must fail the n_groups
    check with the actionable ValueError, not an unresolved-column
    AnalysisException (round-3 advice)."""
    from logzoom_spark.lineage import completed_groups

    mdir = str(tmp_path / "old_manifest")
    spark.createDataFrame(
        [(0, "es", "done")], "group_id int, sink string, status string"
    ).write.parquet(mdir)
    with pytest.raises(ValueError, match="predates n_groups"):
        completed_groups(spark, mdir, n_groups=8)
    # without the check the old manifest still resumes
    assert completed_groups(spark, mdir) == {0}
