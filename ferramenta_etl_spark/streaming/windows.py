"""Structured Streaming mirrors of the batch event-time operators.

The reference has no streaming at all (SURVEY.md §2.4) — its only
incrementality is the re-runnable ON CONFLICT batch load. Here the same
windowed aggregations that run in batch (plans/extensions.py) run as
streams: file source → watermark → windowed agg → sink, with
``dropDuplicatesWithinWatermark`` as the streaming analog of the
idempotent keyed sink (SURVEY.md §7 phase 4).

Tests drive these with Trigger.AvailableNow against the parquet fixtures
and assert equality with the batch plans — the guarantee that batch and
streaming share one semantics (the Dataflow-model promise).

Scale posture: watermark bounds state; session windows use the built-in
session_window (state-store backed, mergeable); sinks are exactly-once
per checkpoint on replayable sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tsql import epoch_ms, sum2
from ..sources.tables import EXPECTED_SCHEMAS


def stage_single_file(src: str, prefix: str) -> str:
    """Spark's file stream source only accepts directories; a single-file
    fixture is exposed through a read-only symlink staging directory
    (nothing copied). In production the source is simply the ingest
    directory and this helper is a no-op. Shared by every stream source
    so staging fixes land once."""
    import hashlib
    import os
    import tempfile

    if not os.path.isfile(src):
        return src
    d = os.path.join(
        tempfile.gettempdir(),
        prefix + "_" + hashlib.md5(src.encode()).hexdigest()[:8],
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(src))
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def stream_ddl(table: str, overrides: dict[str, str] | None = None) -> str:
    """Render EXPECTED_SCHEMAS[table] as a readStream DDL string, with
    per-column type overrides — ONE source of truth for stream and batch
    schemas, so a retyped column in the catalog can't silently drift
    from a hand-rolled stream schema."""
    overrides = overrides or {}
    return ", ".join(
        f"{f.name} {overrides.get(f.name, f.dataType.simpleString())}"
        for f in EXPECTED_SCHEMAS[table].fields
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture, normalized to the same
    shape as the batch loader (sources/tables.py): ``ts`` may arrive as a
    plain timestamp[us] or as TIMESTAMP(NANOS) surfaced as int64 (under
    nanosAsLong, see session.py) depending on the fixture writer; a cheap
    batch footer probe picks the matching stream schema so stream and
    batch read identical values."""
    src = f"{sf_dir}/events.parquet"
    ts_dtype = dict(spark.read.parquet(src).dtypes).get("ts", "timestamp")
    src = stage_single_file(src, "ferramenta_stream")
    raw = spark.readStream.schema(
        stream_ddl("events", {"ts": ts_dtype})
    ).parquet(src)
    if ts_dtype == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype == "timestamp_ntz":
        # session TZ is pinned to UTC, so NTZ -> TIMESTAMP is a pure
        # reinterpretation; keeps watermark/window types uniform
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _agg(df: DataFrame):
    return (
        F.count(F.lit(1)).alias("n_events"),
        sum2(F.col("value")).alias("sum_value"),
    )


def tumbling_agg_stream(events: DataFrame, size: str = "15 minutes", watermark: str = "1 hour") -> DataFrame:
    ev = events.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", size).alias("win"))
        .agg(*_agg(ev))
        .select(epoch_ms(F.col("win.start")).alias("win_start_ms"), "n_events", "sum_value")
    )


def sliding_agg_stream(
    events: DataFrame,
    size: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    ev = events.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", size, slide).alias("win"))
        .agg(*_agg(ev))
        .select(epoch_ms(F.col("win.start")).alias("win_start_ms"), "n_events", "sum_value")
    )


def session_agg_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful operator via the built-in mergeable session window
    (state-store backed; for bespoke state use applyInPandasWithState
    with the same shape)."""
    ev = events.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(*_agg(ev))
        .select(
            "user_id",
            epoch_ms(F.col("win.start")).alias("session_start_ms"),
            epoch_ms(F.col("win.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


def interval_join_stream(
    events: DataFrame,
    left_type: str = "signup",
    right_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: pair each ``right_type``
    event with every ``left_type`` event by the same user in the
    preceding ``within`` interval.

    This is the stateful streaming join proper: both sides buffer in the
    state store, and the event-time range condition plus the watermarks
    give Spark the bound it needs to EVICT — a left row older than
    (right watermark - within) can never match again and is dropped.
    Without the time-range predicate the state would grow forever; with
    it, state is O(events inside the watermark horizon), the same
    discipline as the windowed aggregations above.

    Batch equivalence: running the identical plan over a bounded
    DataFrame (tests) gives exactly the inner-join-with-range semantics
    — one more batch==stream contract."""
    l = (
        events.filter(F.col("event_type") == left_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        events.filter(F.col("event_type") == right_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        epoch_ms(F.col("l_ts")).alias("left_ts_ms"),
        epoch_ms(F.col("r_ts")).alias("right_ts_ms"),
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming idempotency: drop duplicate keys arriving within the
    watermark horizon — the streaming analog of the keyed
    write_ignore_conflicts sink (state bounded by the watermark, unlike
    an unbounded dropDuplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_ignore_conflicts(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint_dir: str,
    order_by: list[str] | None = None,
):
    """Keyed idempotent STREAMING load: every microbatch flows through
    sinks.write_ignore_conflicts, so a replayed batch (checkpoint
    recovery, reprocessing, at-least-once sources) appends zero
    duplicate keys — ``ON CONFLICT DO NOTHING`` as a streaming sink,
    stronger than dropDuplicatesWithinWatermark because idempotency
    holds against everything ALREADY IN THE SINK, not just rows inside
    the watermark horizon. Drains with AvailableNow and blocks until
    done; returns rows appended across the run's batches."""
    from ..sinks import write_ignore_conflicts

    appended = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        appended["n"] += write_ignore_conflicts(
            batch_df, path, keys, order_by or ()
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, query_name: str) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink and
    return the result as a DataFrame (test/driver harness helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming and _has_agg(stream_df) else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def materialize_rollup_stream(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    size: str = "15 minutes",
    watermark: str = "1 hour",
) -> int:
    """The STREAMING maintenance loop of the continuous aggregate
    (pipeline/rollup.py): tumbling windows in APPEND output mode — the
    engine emits each window exactly once, when the event-time
    watermark passes its end, i.e. 'closed windows only' is enforced by
    Structured Streaming's own finalization rather than the batch
    path's explicit watermark filter — flowing through the keyed
    idempotent sink (first-writer-wins on win_start_ms), so checkpoint
    replays and at-least-once sources append zero duplicates to the
    rollup table ``serve_rollup`` reads.

    Drains with AvailableNow and returns windows appended. Windows
    still inside the watermark horizon at end-of-input do NOT emit
    (they haven't closed); serve_rollup's live side owns them — run
    the stream again as more data lands, exactly like re-running the
    batch materializer with an advanced watermark.

    At 100 TB this replaces the 'recompute the rollup nightly' job
    with per-microbatch increments whose state is one row per OPEN
    window, bounded by the watermark horizon."""
    from ..sinks import write_ignore_conflicts

    agg = tumbling_agg_stream(events, size, watermark)
    appended = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        appended["n"] += write_ignore_conflicts(
            batch_df, path, keys=["win_start_ms"]
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]
