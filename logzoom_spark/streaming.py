"""Structured Streaming mode: the same pipeline builder under readStream.

The reference is stream-native (goroutine channels); the rebuild's batch
DAG reruns unchanged inside ``foreachBatch``: one cached micro-batch fans
out to every sink — the exact analog of Buffer.Publish delivering each
event to every subscriber (buffer/buffer.go:62-68), with Structured
Streaming's checkpoint WAL standing in for the lumberjack ACK
(parser.go:44-54) / redismq MultiAck (input/redis/redis.go:66-73)
at-least-once contract — upgraded to exactly-once file state by writing
each sink's epoch to its own overwrite-mode `epoch=<id>` directory (a
crash between two branch writes re-runs the epoch idempotently instead of
double-appending the branches that already committed).

Flush-interval parity: the reference's 10 s ES flush / 5 s Redis flush /
10 s S3 roll (SURVEY.md §6) map to ``trigger(processingTime=...)``; tests
use ``availableNow`` to drain deterministically.

The stateful operator (#12, distinct sources with 600 s TTL) becomes a
watermarked max-aggregate: state is evicted by the watermark exactly like
the reference's ticker-based eviction (websocket.go:119-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import sinks as sk
from .pipeline import PipelineConfig, build, default_config

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_turns_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-based streaming source over transcript parquet (stands in for
    the Kafka/Filebeat wire; swap format for production)."""
    return (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def foreach_batch_writer(cfg: PipelineConfig, out_dir: str, fault_hook=None):
    """One micro-batch → all sinks, from a single cached upstream.

    Each sink's write lands in its own ``epoch=<id>`` directory with
    OVERWRITE mode — the group-commit pattern from lineage.py. foreachBatch
    re-delivers an epoch after a mid-batch crash (the checkpoint WAL only
    commits once `process` returns), so a blind append would double-write
    every sink that succeeded before the crash; overwriting the epoch
    directory makes the re-run idempotent per branch, upgrading the
    at-least-once re-delivery to exactly-once *file state*. Readers see a
    partitioned layout (`sink/epoch=N/...`) Spark's partition discovery
    handles transparently.

    ``fault_hook(sink_name, epoch_id)`` (tests only) runs after each
    sink's write — raising from it simulates a crash between two branch
    writes inside one epoch.

    Trade-off at scale: epoch directories accumulate (one per
    micro-batch per sink). A long-running deployment compacts old epochs
    into the sink's coarse partitions on a schedule — exactly the job
    ``ops.maintenance.compaction_plan`` plans — after which the epoch dir
    is no longer needed for idempotency (its batch is far behind the
    checkpoint). On Iceberg the same write is a snapshot-atomic append
    and the epoch dir layer disappears entirely."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        upstream, branches = build(spark, batch_df, cfg)
        try:
            for sink_name, branch in branches.items():
                spec = cfg.sinks[sink_name]
                path = f"{out_dir}/{sink_name}/epoch={int(epoch_id)}"
                sk.WRITERS[spec.kind](branch, path, mode="overwrite", **spec.options)
                if fault_hook is not None:
                    fault_hook(sink_name, int(epoch_id))
        finally:
            upstream.unpersist()

    return process


def run_streaming(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
    processing_time: str = "10 seconds",  # ES flush-interval parity
    dedup_watermark: str | None = None,
    fault_hook=None,
):
    """Start the streaming pipeline; returns the StreamingQuery.

    ``dedup_watermark`` (e.g. "1 hour") inserts the streaming exact-dedup
    stage before the pipeline, collapsing at-least-once redeliveries to
    exactly-once results with state bounded by the watermark."""
    cfg = cfg or default_config()
    stream = read_turns_stream(spark, input_dir)
    if dedup_watermark is not None:
        stream = streaming_dedup(stream, watermark=dedup_watermark)
    writer = (
        stream.writeStream.foreachBatch(foreach_batch_writer(cfg, out_dir, fault_hook))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def _discover_partition_cols(epoch_dir: str) -> tuple[str, ...]:
    """Partition column names from an epoch dir's `name=value` directory
    nesting (depth order) — so compaction reproduces the source layout by
    default instead of silently flattening partition dirs into data
    fields (mixed directory depths under one sink break Spark's partition
    discovery)."""
    import os

    cols: list[str] = []
    cur = epoch_dir
    while True:
        subs = [
            e for e in os.listdir(cur)
            if "=" in e and os.path.isdir(os.path.join(cur, e))
        ]
        if not subs:
            return tuple(cols)
        name = subs[0].split("=", 1)[0]
        cols.append(name)
        cur = os.path.join(cur, subs[0])


def compact_epochs(
    spark: SparkSession,
    sink_dir: str,
    fmt: str = "json",
    partition_cols: tuple[str, ...] | None = None,
    keep_last: int = 1,
    compression: str | None = None,
) -> dict:
    """Fold old ``epoch=N`` directories into one — the maintenance job the
    epoch-idempotent writer needs on a long-running stream (one dir per
    micro-batch per sink otherwise accumulates forever).

    The newest ``keep_last`` epochs are left untouched (they may still be
    re-run on recovery); everything older is read back, rewritten as a
    single consolidated epoch dir (clustered on ``partition_cols`` —
    the anti-small-files write, same as the sinks), and the originals are
    removed. Readers see the identical partition layout with fewer
    directories and the same rows.

    Crash-safety protocol: (1) the consolidated output is fully written to
    a temp dir with a MANIFEST naming the source epochs, (2) sources are
    deleted, (3) the temp dir is renamed to the target epoch. A re-run
    after a crash first recovers any leftover temp dir: with a manifest it
    finishes steps 2-3 (the temp holds the only copy of any
    already-deleted source, so it is adopted, never overwritten); without
    one the write never finished and no source was deleted, so the temp
    is discarded. No interleaving of crashes and re-runs can lose rows;
    a crash inside step 2 leaves duplicates only until the next run.
    On Iceberg this whole function is `rewrite_data_files` (one atomic
    snapshot commit) and the epoch layer disappears.

    Local/HDFS-mounted filesystems only (os/shutil path ops — raises on a
    missing dir rather than reporting an empty success); an object-store
    deployment drives the same protocol through the Hadoop FileSystem
    API, or uses the Iceberg path.

    Returns {"compacted": [...epoch ids...], "target": id, "rows": n}.
    """
    import json
    import os
    import shutil

    prefix = "epoch="
    tmp = f"{sink_dir}/_compacting"
    manifest = f"{tmp}/_COMPACTED_EPOCHS.json"

    def finish(merged: list[int]) -> None:
        for e in merged:
            p = f"{sink_dir}/{prefix}{e}"
            if os.path.exists(p):
                shutil.rmtree(p)
        os.rename(tmp, f"{sink_dir}/{prefix}{max(merged)}")

    if os.path.exists(tmp):
        if os.path.exists(manifest):
            # previous run finished its write: adopt, never overwrite —
            # the temp may hold the only copy of already-deleted epochs
            with open(manifest) as f:
                merged = json.load(f)
            n = spark.read.format(fmt).load(tmp).count()
            finish(merged)
            return {"compacted": merged, "target": max(merged), "rows": n}
        shutil.rmtree(tmp)  # write never completed; sources are intact

    entries = os.listdir(sink_dir)  # raises on a missing/typo'd sink_dir
    epochs = sorted(
        int(e[len(prefix):]) for e in entries
        if e.startswith(prefix) and e[len(prefix):].isdigit()
    )
    to_merge = epochs[:-keep_last] if keep_last > 0 else epochs
    if len(to_merge) < 2:
        return {"compacted": [], "target": None, "rows": 0}
    target = max(to_merge)
    paths = [f"{sink_dir}/{prefix}{e}" for e in to_merge]
    if partition_cols is None:
        partition_cols = _discover_partition_cols(paths[0])
    reader = spark.read.format(fmt).option("basePath", sink_dir)
    df = reader.load(paths).drop("epoch")
    writer = df
    if partition_cols:
        writer = writer.repartition(*[F.col(c) for c in partition_cols])
    w = writer.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.format(fmt).save(tmp)
    n = spark.read.format(fmt).load(tmp).count()
    with open(manifest, "w") as f:
        json.dump(to_merge, f)
    finish(to_merge)
    return {"compacted": to_merge, "target": target, "rows": n}


DOCS_SCHEMA = "doc_id bigint, text string"


def streaming_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    sig_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    hasher: str = "xx",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    fault_hook=None,
):
    """Continuous corpus curation: every micro-batch of documents is
    dedup'd against the STANDING signature table (exact fingerprints +
    LSH bands — ``ops.dedup.dedup_incremental``), survivors land in
    ``out_dir``, and the survivors' signatures are committed to
    ``sig_dir`` so the NEXT micro-batch dedups against them too. The
    standing corpus' text is never re-read; per-batch work is O(batch).

    Exactly-once file state via the same epoch-dir protocol as
    ``foreach_batch_writer``: both the survivor docs and their signature
    rows go to overwrite-mode ``epoch=<id>`` directories, so a crash
    between the two writes re-runs the epoch idempotently — a re-delivered
    epoch can never double-append signatures (the failure mode of a blind
    append: every re-delivery would permanently shrink future batches'
    survivor sets by their own ghosts).

    Returns the StreamingQuery."""
    import os

    from .ops.dedup import build_signatures, dedup_incremental

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        others = [
            e
            for e in (os.listdir(sig_dir) if os.path.exists(sig_dir) else [])
            # exclude THIS epoch's dir: after a crash between the sig write
            # and the checkpoint commit, the re-delivered epoch would
            # otherwise find its own signatures in `standing`, flag every
            # batch doc as a duplicate of itself, and overwrite the epoch
            # with empty survivors — silently losing the whole batch
            if e.startswith("epoch=") and e != f"epoch={int(epoch_id)}"
        ]
        if others:
            standing = s.read.option("basePath", sig_dir).parquet(
                *[f"{sig_dir}/{e}" for e in others]
            ).drop("epoch")
        else:
            standing = build_signatures(
                s.createDataFrame([], DOCS_SCHEMA), hasher=hasher
            )
        batch_df = batch_df.persist()
        try:
            verdicts, survivor_sigs = dedup_incremental(
                batch_df, standing, hasher=hasher
            )
            survivors = batch_df.join(
                verdicts.filter(F.col("survives") == 1).select("doc_id"),
                "doc_id",
                "left_semi",
            )
            survivors.write.mode("overwrite").parquet(
                f"{out_dir}/epoch={int(epoch_id)}"
            )
            survivor_sigs.write.mode("overwrite").parquet(
                f"{sig_dir}/epoch={int(epoch_id)}"
            )
            if fault_hook is not None:
                # tests: raising here crashes AFTER both writes but BEFORE
                # the checkpoint commit — the epoch re-delivers on restart
                fault_hook(int(epoch_id))
        finally:
            batch_df.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="10 seconds")
    )
    return writer.start()


def streaming_bloom_gate(
    spark: SparkSession,
    input_dir: str,
    sig_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    m_bits: int = 4096,
    n_hashes: int = 4,
    max_files_per_trigger: int = 1,
    gate_stats: list | None = None,
):
    """Bloom-gated streaming exact dedup — the 100 TB operating mode of
    `ops.sketch.bloom_build`: each micro-batch's fingerprints probe the
    STANDING bloom filter (OR-merge of every prior epoch's word table,
    ≤ m_bits/31 broadcast rows no matter how many documents the corpus
    holds); sketch-NEGATIVES are definitely new and skip membership work
    entirely, and only the sketch-POSITIVES run the exact anti-join
    confirmation against the standing fingerprint table (Bloom has false
    positives, never false negatives — so survivors are byte-identical
    to full exact dedup, pytest-proven, while the expensive join's probe
    side shrinks to the positive sliver). Survivors' docs, fingerprints
    AND bloom words land in overwrite-mode ``epoch=<id>`` dirs — the
    same idempotent-redelivery protocol as `streaming_incremental_dedup`
    (a re-run epoch can't see its own signatures or double-OR its own
    bits).

    ``gate_stats`` (tests): a list that receives one
    (epoch, batch_rows, sketch_positive_rows) tuple per epoch — evidence
    the gate actually bypasses the join for the negative majority.

    Returns the StreamingQuery."""
    import os

    from .ops.sketch import bloom_build, bloom_merge, bloom_probe

    fp_expr = F.md5(F.coalesce(F.col("text"), F.lit("")))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        eid = int(epoch_id)
        others = [
            e
            for e in (os.listdir(sig_dir) if os.path.exists(sig_dir) else [])
            if e.startswith("epoch=") and e != f"epoch={eid}"
        ]
        batch = batch_df.select("doc_id", "text", fp_expr.alias("fp")).persist()
        try:
            # intra-batch first-occurrence (min doc_id per fp)
            w = Window.partitionBy("fp").orderBy("doc_id")
            firsts = batch.withColumn("rn", F.row_number().over(w)).filter(
                F.col("rn") == 1
            )
            if others:
                bloom_dirs = [f"{sig_dir}/{e}/bloom" for e in others]
                standing_bloom = bloom_merge(
                    s.read.option("basePath", sig_dir).parquet(*bloom_dirs).select(
                        "word_idx", "word"
                    )
                )
                verdicts = bloom_probe(
                    standing_bloom, firsts.select("fp"), "fp",
                    m_bits=m_bits, n_hashes=n_hashes,
                )
                flagged = firsts.join(
                    verdicts.filter(F.col("maybe_present")), "fp", "left_semi"
                ).persist()
                negatives = firsts.join(flagged.select("fp"), "fp", "left_anti")
                standing_fps = s.read.option("basePath", sig_dir).parquet(
                    *[f"{sig_dir}/{e}/fps" for e in others]
                ).select("fp")
                confirmed_new = flagged.join(standing_fps, "fp", "left_anti")
                survivors = negatives.unionByName(confirmed_new)
                n_flagged = flagged.count()
                flagged.unpersist()
            else:
                survivors = firsts
                n_flagged = 0
            survivors = survivors.select("doc_id", "text", "fp").persist()
            try:
                survivors.select("doc_id", "text").write.mode("overwrite").parquet(
                    f"{out_dir}/epoch={eid}"
                )
                survivors.select("fp").write.mode("overwrite").parquet(
                    f"{sig_dir}/epoch={eid}/fps"
                )
                bloom_build(
                    survivors, "fp", m_bits=m_bits, n_hashes=n_hashes
                ).write.mode("overwrite").parquet(f"{sig_dir}/epoch={eid}/bloom")
                if gate_stats is not None:
                    gate_stats.append((eid, batch.count(), n_flagged))
            finally:
                survivors.unpersist()
        finally:
            batch.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_queue_stream(
    spark: SparkSession, input_dir: str, batch_files: int = 1
) -> DataFrame:
    """Queue-shaped source: one text line per queued message, consumed in
    bounded batches — the redismq MultiGet contract (input/redis/redis.go:
    49-66: poll up to 10,000 messages, process, MultiAck). Here a file is a
    queue segment; ``batch_files`` bounds how many segments one micro-batch
    consumes (the MultiGet batch bound), and the checkpoint WAL is the ack:
    a message is never re-delivered after its batch commits, and always
    re-delivered if the job dies before the commit (at-least-once)."""
    return (
        spark.readStream.option("maxFilesPerTrigger", batch_files)
        .text(input_dir)
        .withColumnRenamed("value", "payload")
    )


def decode_queue_messages(msgs: DataFrame, json_decode: bool = True) -> DataFrame:
    """`json_decode` toggle parity (input/redis/redis.go:75-93):

    - ``json_decode=True``: each payload must be a JSON event; undecodable
      payloads are DROPPED — but counted via an observe metric where the
      reference drops them silently (redis.go:85-88 `continue`s without
      even a log line). The event's text rides in `$.text`.
    - ``json_decode=False``: the raw payload IS the event text; nothing is
      dropped.

    Works on both batch and streaming DataFrames (observe is supported on
    streams; counts surface per micro-batch in QueryProgress)."""
    if not json_decode:
        return msgs.select(F.col("payload").alias("text"))
    decoded = msgs.select(
        F.get_json_object("payload", "$.text").alias("text"),
        F.get_json_object("payload", "$.conv_id").alias("conv_id"),
        F.get_json_object("payload", "$.turn_idx").try_cast("int").alias("turn_idx"),
    )
    observed = decoded.observe(
        "queue_decode",
        F.count(F.lit(1)).alias("msgs_in"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("msgs_dropped"),
    )
    return observed.filter(F.col("text").isNotNull())


def streaming_distinct_sources(
    turns_stream: DataFrame, ttl: str = "10 minutes", bucket: str = "10 minutes"
) -> DataFrame:
    """Stateful distinct-source aggregate with watermark eviction —
    the streaming twin of aggregate.distinct_sources_ttl (reference
    websocket.go:111-138: map[source]→last_seen, 600 s TTL)."""
    return (
        turns_stream.withColumn("source", F.concat(F.lit("conv://"), F.col("conv_id")))
        .withWatermark("ts", ttl)
        .groupBy(F.window("ts", bucket), "source")
        .agg(F.max("ts").alias("last_seen_ts"))
    )


def stateful_sessionize(
    turns_stream: DataFrame, gap_seconds: int = 1800, state_ttl_minutes: int = 60
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: assign a
    per-conversation session id that survives ACROSS micro-batches (a gap
    > ``gap_seconds`` between consecutive turns starts a new session).

    This is the streaming twin of the batch `sessionize_gaps` window query
    — but where the batch version sees the whole conversation at once, the
    stream carries (last_ts, session_counter) as typed state per conv_id,
    exactly like the reference's long-lived per-source state maps
    (output/websocket/websocket.go:111-138). Arrow-batched: one pandas
    frame per (group, batch), no per-row Python.

    Rows are expected in turn_idx order within a group per batch (Spark
    delivers all of a group's batch rows together; the function sorts
    defensively).

    State is BOUNDED: each conversation's (last_ts, counter) entry is
    evicted after ``state_ttl_minutes`` of processing-time inactivity —
    the unbounded-state trap of NoTimeout on an infinite key space (one
    state row per conv_id ever seen) is exactly what the reference's
    ticker-based 600 s map eviction avoids (websocket.go:119-138). A
    conversation resuming after eviction restarts its session counter at
    0 — acceptable for a gap-based sessionizer since any turn after the
    TTL is also past `gap_seconds`, i.e. a new session anyway."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, turn_idx int, session_id bigint"
    state_schema = "last_ts double, sess long"
    ttl_ms = state_ttl_minutes * 60 * 1000

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"conv_id": [], "turn_idx": [], "session_id": []})
            return
        last_ts, sess = state.get if state.exists else (None, 0)
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values("turn_idx")
        epochs = pdf["ts"].map(lambda t: t.timestamp())
        out_sess = []
        for e in epochs:
            if last_ts is not None and e - last_ts > gap_seconds:
                sess += 1
            last_ts = e
            out_sess.append(sess)
        state.update((last_ts, sess))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": pdf["turn_idx"].to_numpy(),
                "session_id": out_sess,
            }
        )

    return (
        turns_stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            assign, out_schema, state_schema, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_rate_counts(
    turns_stream: DataFrame, bucket: str = "1 second", watermark: str = "30 seconds"
) -> DataFrame:
    """Events/sec per sink-key — the ratecounter analog
    (elasticsearch.go:180-183) as a watermarked tumbling count."""
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket), "role")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def streaming_dedup(
    turns_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup on the event identity (conv_id, turn_idx):
    at-least-once sources redeliver on recovery (redismq requeues unacked
    batches, input/redis/redis.go:66-73); this collapses redeliveries to
    exactly-once *results*. `dropDuplicatesWithinWatermark` bounds the
    dedup state by event time — old keys age out with the watermark instead
    of growing forever (the unbounded-state trap of plain dropDuplicates
    on an infinite stream)."""
    return turns_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def streaming_response_join(turns_stream: DataFrame, max_delay: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream join: each user turn joined to its
    assistant response (the next turn_idx in the conversation) arriving
    within ``max_delay``. Both sides carry watermarks and the join has a
    time-range condition, so state for unmatched turns is evicted once the
    watermark passes — the bounded-state contract stream-stream joins
    require. Emits per-pair response latency in seconds."""
    u = (
        turns_stream.filter(F.col("role") == "user")
        .select("conv_id", "turn_idx", F.col("ts").alias("u_ts"))
        .withWatermark("u_ts", max_delay)
    )
    a = (
        turns_stream.filter(F.col("role") == "assistant")
        .select(
            F.col("conv_id").alias("a_conv_id"),
            F.col("turn_idx").alias("a_turn_idx"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", max_delay)
    )
    joined = u.join(
        a,
        (F.col("conv_id") == F.col("a_conv_id"))
        & (F.col("a_turn_idx") == F.col("turn_idx") + 1)
        & (F.col("a_ts") >= F.col("u_ts"))
        & (F.col("a_ts") <= F.col("u_ts") + F.expr(f"INTERVAL {max_delay}")),
    )
    return joined.select(
        "conv_id",
        "turn_idx",
        (F.unix_timestamp("a_ts") - F.unix_timestamp("u_ts")).cast("bigint").alias(
            "response_latency_s"
        ),
    )


def streaming_conv_fingerprints(
    turns_stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of ``ops.dedup.conv_fingerprints``: a watermarked
    session-window aggregate assembles each conversation's fingerprint —
    the same per-turn md5 chain in stable (turn_idx) order, so a
    streaming fingerprint is byte-identical to the batch one for the same
    turns — and emits it once the conversation's session closes (no turn
    for ``gap``). State is one in-flight chain per open conversation,
    evicted by the watermark. Digest-first like the batch twin: each
    turn collapses to its 32-hex md5 before the stateful aggregate, so
    per-conversation session state is ~36 B/turn regardless of text
    size."""
    digests = turns_stream.select(
        "conv_id", "turn_idx", "ts", F.md5("text").alias("_t_md5")
    )
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "_t_md5")))
    return (
        digests.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.md5(
                F.concat_ws("", F.transform(ordered, lambda s: s["_t_md5"]))
            ).alias("conv_fp"),
        )
    )


def streaming_conv_dedup(
    spark: SparkSession,
    input_dir: str,
    fp_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    fault_hook=None,
):
    """Streaming conversation dedup: session-closed fingerprints
    (`streaming_conv_fingerprints` — ONE stateful operator) flow into a
    ``foreachBatch`` that anti-joins each batch against the STANDING
    fingerprint table and commits survivors + their fingerprints to
    epoch-idempotent ``epoch=<id>`` dirs — the exact protocol of
    ``streaming_incremental_dedup`` (a crash between writes re-runs the
    epoch idempotently; a re-delivered epoch never sees its own ghosts).

    Deliberately NOT the chained-stateful formulation (session agg →
    dropDuplicatesWithinWatermark in one query): measured here, the
    downstream dedup's late-row filter silently DROPS sessions whose
    end falls at/under the already-advanced watermark when they finally
    emit — losing originals, not duplicates — and its key state expires
    after the watermark delay, so a duplicate arriving later than the
    delay slips through. The standing-table design has neither failure
    mode: dedup state is the fingerprint table (digest-only, append-only,
    compactable via ``compact_epochs``), and its horizon is unbounded.

    Batch/stream delta (inherent): batch ``conv_dedup`` keeps the MIN
    conv_id per fingerprint; a stream keeps the first-COMMITTED
    conversation (within one batch, the min conv_id — deterministic).

    Returns the StreamingQuery."""
    import os

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        others = [
            e
            for e in (os.listdir(fp_dir) if os.path.exists(fp_dir) else [])
            if e.startswith("epoch=") and e != f"epoch={int(epoch_id)}"
        ]
        batch_df = batch_df.persist()
        try:
            fresh = batch_df
            if others:
                standing = (
                    s.read.option("basePath", fp_dir)
                    .parquet(*[f"{fp_dir}/{e}" for e in others])
                    .select("conv_fp")
                )
                fresh = batch_df.join(standing, "conv_fp", "left_anti")
            # within-batch duplicates: keep min conv_id (batch-identical rule)
            w = Window.partitionBy("conv_fp")
            fresh = (
                fresh.withColumn("_keep", F.min("conv_id").over(w))
                .filter(F.col("conv_id") == F.col("_keep"))
                .drop("_keep")
            )
            fresh.write.mode("overwrite").parquet(f"{out_dir}/epoch={int(epoch_id)}")
            fresh.select("conv_fp").write.mode("overwrite").parquet(
                f"{fp_dir}/epoch={int(epoch_id)}"
            )
            if fault_hook is not None:
                fault_hook(int(epoch_id))
        finally:
            batch_df.unpersist()

    stream = read_turns_stream(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger
    )
    fps = streaming_conv_fingerprints(stream, gap, watermark)
    writer = fps.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="10 seconds")
    )
    return writer.start()


def streaming_flap_suppress(
    alerts_stream: DataFrame,
    key_col: str = "log_type",
    cooldown_s: int = 14400,
    state_ttl_minutes: int = 24 * 60,
) -> DataFrame:
    """Streaming twin of ops.sre.flap_suppress: per key, emit an alert
    iff ``cooldown_s`` elapsed since the LAST EMITTED one — the running
    decision-dependent scan, with the last-kept timestamp carried as
    typed state across micro-batches via ``applyInPandasWithState``
    (Alertmanager's `repeat_interval`, public analogue).

    Equals the batch operator whenever arrival order respects event-time
    order across batches (within a batch, rows are event-time sorted
    before the scan) — the pytest drives both on the same data and
    asserts identical kept sets.

    State is one BIGINT per key (bounded by alert-key cardinality, not
    volume) and is evicted after ``state_ttl_minutes`` of inactivity;
    a key resuming after eviction re-fires immediately, which is the
    safe failure mode for an alert de-duplicator (duplicate page, never
    a suppressed real page)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, ts_us bigint, kept int"
    state_schema = "last_kept long"
    cool_us = int(cooldown_s) * 1_000_000
    ttl_ms = state_ttl_minutes * 60 * 1000

    def scan(key, pdfs, state: GroupState):
        import pandas as pd

        (k,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({key_col: [], "ts_us": [], "kept": []})
            return
        (last,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs)).sort_values("ts_us")
        kept = []
        for t in pdf["ts_us"]:
            ok = last is None or t >= last + cool_us
            kept.append(1 if ok else 0)
            if ok:
                last = int(t)
        state.update((last,))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {key_col: k, "ts_us": pdf["ts_us"].to_numpy(), "kept": kept}
        )

    return (
        alerts_stream.select(
            key_col, F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            scan, out_schema, state_schema, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_template_novelty(
    spark: SparkSession,
    input_dir: str,
    tpl_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    fault_hook=None,
):
    """The "new log signature" alert feed: every micro-batch's lines are
    masked to templates (ops.templates.mask_template) and anti-joined
    against the STANDING template table; templates never seen before are
    emitted (with the batch's line count and earliest event time) and
    committed to the standing table so the NEXT batch treats them as
    known. The streaming twin of `log_template_mine`'s first_day novelty
    signal, with the same epoch-dir exactly-once protocol as
    `streaming_incremental_dedup`: emissions and standing-table commits
    go to overwrite-mode ``epoch=<id>`` dirs (this epoch's own dir is
    excluded when loading the standing set), so a crash between the two
    writes re-runs the epoch idempotently and a template can neither be
    double-announced nor suppressed by its own ghost.

    State is the template VOCABULARY (bounded by log-format diversity,
    not volume): the standing table stays broadcast-sized forever.

    Returns the StreamingQuery."""
    import os

    from .ops.templates import mask_template

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        others = [
            e
            for e in (os.listdir(tpl_dir) if os.path.exists(tpl_dir) else [])
            if e.startswith("epoch=") and e != f"epoch={int(epoch_id)}"
        ]
        if others:
            standing = s.read.option("basePath", tpl_dir).parquet(
                *[f"{tpl_dir}/{e}" for e in others]
            ).select("template")
        else:
            standing = s.createDataFrame([], "template string")
        batch_tpl = (
            batch_df.filter(F.col("text").isNotNull())
            .select(
                mask_template(F.col("text")).alias("template"),
                F.col("ts").cast("timestamp").alias("_ts"),
            )
            .groupBy("template")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                F.unix_timestamp(F.min("_ts")).cast("bigint").alias("first_seen"),
            )
        )
        new = batch_tpl.join(F.broadcast(standing), "template", "left_anti")
        new.write.mode("overwrite").parquet(f"{out_dir}/epoch={int(epoch_id)}")
        new.select("template").write.mode("overwrite").parquet(
            f"{tpl_dir}/epoch={int(epoch_id)}"
        )
        if fault_hook is not None:
            fault_hook(int(epoch_id))

    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="10 seconds")
    )
    return writer.start()


def streaming_burn_rate(
    turns_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slo_den: int = 4,
) -> DataFrame:
    """Streaming twin of the short-window half of ops.sre.burn_rate_alerts:
    watermarked tumbling error-budget burn per window — the live feed the
    multiwindow pager consumes (the long-window side joins downstream
    against the standing rollup, exactly as the batch operator does
    against the day aggregate). Stateless parse + one watermarked
    windowed aggregate; integer-exact burn in ×100.

    Returns (window, n_lines, n_err, burn_x100)."""
    from .parse import parse_turns

    base = parse_turns(turns_stream, with_attrs=False).filter(
        F.col("level").isNotNull()
    )
    return (
        base.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum((F.col("level") == "ERROR").cast("int"))
            .cast("bigint")
            .alias("n_err"),
        )
        .withColumn(
            "burn_x100", F.expr(f"(n_err * {slo_den} * 100) div n_lines")
        )
    )


def streaming_rate_limit(
    events_stream: DataFrame,
    limit: int = 3,
    window_s: int = 60,
    state_ttl_minutes: int = 24 * 60,
) -> DataFrame:
    """Streaming twin of route.rate_limit_verdicts: per user, admit the
    first `limit` events of each fixed `window_s`-second window; the
    (current window, arrivals seen) pair is typed state carried across
    micro-batches via ``applyInPandasWithState`` — the ingest throttle
    running live instead of as a replay audit.

    Equals the batch verdicts whenever arrival order respects event-time
    order across batches (within a batch, rows are sorted by
    (ts_us, event_id) before the scan) — the pytest drives both on the
    same data and asserts identical per-event verdicts, including a
    window whose quota is exhausted across a batch boundary.

    State is two BIGINTs per user (bounded by user cardinality, not
    volume), evicted after ``state_ttl_minutes`` idle; a user resuming
    after eviction starts a fresh window, which can only over-admit one
    window — the safe failure mode for a throttle."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if limit < 1 or window_s < 1:
        raise ValueError(f"need limit >= 1 and window_s >= 1, got {limit}/{window_s}")
    out_schema = "user_id bigint, event_id bigint, ts_us bigint, admitted int"
    state_schema = "win long, cnt long"
    ttl_ms = state_ttl_minutes * 60 * 1000

    def scan(key, pdfs, state: GroupState):
        import pandas as pd

        (u,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"user_id": [], "event_id": [], "ts_us": [], "admitted": []}
            )
            return
        win, cnt = state.get if state.exists else (None, 0)
        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        verdicts = []
        for t in pdf["ts_us"]:
            w = int(t) // 1_000_000 // window_s
            if w != win:
                win, cnt = w, 0
            ok = cnt < limit
            cnt += 1
            verdicts.append(1 if ok else 0)
        state.update((win, int(cnt)))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": u,
                "event_id": pdf["event_id"].to_numpy(),
                "ts_us": pdf["ts_us"].to_numpy(),
                "admitted": verdicts,
            }
        )

    return (
        events_stream.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            scan,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
