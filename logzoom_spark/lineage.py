"""Per-partition checkpointed lineage: resumable batch runs.

North-rule requirement: at 10^12-turn scale any stage must be resumable
without reprocessing completed partitions. The unit of resume is a
*conv-hash bucket group*: turns are assigned to `n_groups` deterministic
buckets by xxhash64(conv_id); each group is processed as its own job
(all sinks + aggregates), and a manifest row is committed only after the
whole group's writes succeed. A restart reads the manifest and skips
completed groups.

Reference analogs: the lumberjack ACK protocol (input/filebeat/
parser.go:44-54, 214-217 — progress acknowledged only after delivery)
and the Redis input's requeue-unacked-on-restart at-least-once resume
(input/redis/redis.go:54-59). On a real cluster the manifest lives in an
Iceberg table and group boundaries align with Iceberg partition buckets;
here it is a parquet directory with one file per completed group (the
write of that file is the atomic commit point).

Group count trades resume granularity against per-job overhead: with
10^12 turns and n_groups=4096, one group ≈ 244M turns — a few minutes of
cluster work lost in the worst crash, while healthy runs pay only 4096
driver-side job submissions.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import PipelineConfig, build, default_config


class InjectedFailure(RuntimeError):
    """Raised by the failure-injection hook in tests."""


GROUP_COL = "_lz_group"


def with_group(turns: DataFrame, n_groups: int) -> DataFrame:
    return turns.withColumn(
        GROUP_COL, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_groups)).cast("int")
    )


def completed_groups(
    spark: SparkSession, manifest_dir: str, n_groups: int | None = None
) -> set[int]:
    """Group ids already committed. ONLY a missing manifest path reads as
    'first run' — any other failure (FS hiccup, corrupt file, permission)
    raises, because silently returning empty would restart the whole run
    and double-write every completed group. When ``n_groups`` is given,
    a manifest written under a different group count raises: group ids
    from one modulus don't describe the same row sets under another, so
    resuming across counts would silently lose or duplicate rows."""
    from pyspark.errors import AnalysisException

    try:
        mf = spark.read.parquet(manifest_dir)
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            return set()
        raise
    done = mf.filter(F.col("status") == "done")
    if n_groups is not None:
        if "n_groups" not in mf.columns:
            # manifests written before n_groups tracking can't prove the
            # modulus matches — same actionable error as a mismatch, not
            # an unresolved-column AnalysisException
            raise ValueError(
                f"manifest at {manifest_dir} predates n_groups tracking; "
                "cannot verify the group count matches. Re-run without the "
                "n_groups check only if the original count is known equal, "
                "or start a fresh out_dir."
            )
        seen = {r[0] for r in done.select("n_groups").distinct().collect()}
        if seen and seen != {n_groups}:
            raise ValueError(
                f"manifest at {manifest_dir} was written with n_groups={sorted(seen)}; "
                f"resuming with n_groups={n_groups} would change the group→rows "
                "mapping and lose/duplicate data. Re-run with the original count "
                "or start a fresh out_dir."
            )
    return {r.group_id for r in done.select("group_id").collect()}


def _commit_group(
    spark: SparkSession,
    manifest_dir: str,
    group_id: int,
    n_groups: int,
    rows_in: int,
    sink_rows: dict[str, int],
    elapsed_s: float,
) -> None:
    rows = [
        (group_id, n_groups, sink, rows_in, n, "done", float(elapsed_s))
        for sink, n in sink_rows.items()
    ]
    df = spark.createDataFrame(
        rows,
        "group_id int, n_groups int, sink string, rows_in bigint, rows_out bigint, "
        "status string, elapsed_s double",
    )
    # one file per group commit: the atomic resume checkpoint
    df.coalesce(1).write.mode("append").parquet(manifest_dir)


def run_resumable(
    spark: SparkSession,
    turns: DataFrame,
    cfg: PipelineConfig | None = None,
    out_dir: str = "/tmp/logzoom_out",
    n_groups: int = 8,
    fail_after_groups: int | None = None,
) -> dict:
    """Run the full pipeline group-by-group with manifest checkpointing.

    Re-invoking with the same ``out_dir`` (and the SAME ``n_groups`` —
    the manifest records and enforces it) skips groups whose manifest rows
    exist: completed groups are never reprocessed, and their predicate
    filters them out of every stage. Cost honesty: each *remaining* group
    is its own pass over the source — the hash predicate cannot prune
    parquet files unless the table is physically bucketed by the same
    hash (the Iceberg `bucket(N, conv_id)` layout in iceberg.py, or a
    `repartition_salted` rewrite), so on an unbucketed source a healthy
    run costs ~n_groups scans and ``run_batch`` is the faster path;
    resumability is what the extra scans buy.
    ``fail_after_groups`` injects a crash for the resumability test.
    """
    from .pipeline import drain_branch

    cfg = cfg or default_config()
    manifest_dir = f"{out_dir}/_lineage"
    done = completed_groups(spark, manifest_dir, n_groups)
    grouped = with_group(turns, n_groups)

    processed, skipped = [], []
    for g in range(n_groups):
        if g in done:
            skipped.append(g)
            continue
        t0 = time.time()
        sub = grouped.filter(F.col(GROUP_COL) == g).drop(GROUP_COL)
        upstream, branches = build(spark, sub, cfg)
        try:
            sink_rows: dict[str, int] = {}
            for sink_name, branch in branches.items():
                sink_rows[sink_name] = drain_branch(
                    branch, cfg.sinks[sink_name], cfg, out_dir, sink_name,
                    suffix=f"/group={g}",
                )
            # count AFTER the branch writes: the cache is already built by
            # the first write action, so this is a cheap cached scan, not
            # the serial pre-materialization barrier run_batch avoids
            rows_in = upstream.count()
        finally:
            upstream.unpersist()
        _commit_group(spark, manifest_dir, g, n_groups, rows_in, sink_rows, time.time() - t0)
        processed.append(g)
        if fail_after_groups is not None and len(processed) >= fail_after_groups:
            raise InjectedFailure(f"injected failure after groups {processed}")
    return {"processed": processed, "skipped": skipped, "n_groups": n_groups}


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/_lineage")
