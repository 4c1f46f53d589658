"""Continuous aggregate (hypertable-rollup analog) over event time.

The TimescaleDB/Druid pattern on Spark primitives:

- ``materialize_rollup``: aggregate events into tumbling windows and
  idempotently append ONLY the windows that have closed (window end <=
  the watermark). Closed windows are immutable, so the keyed
  first-writer-wins sink (``write_ignore_conflicts``) is exactly the
  right consistency model — re-materializing after new data arrives
  appends only newly-closed windows, never rewrites old ones.
- ``serve_rollup``: answer the windowed query as materialized windows
  UNION a live aggregation of only the raw events past the watermark —
  so the expensive scan is bounded by the un-materialized tail, not
  corpus history.

At 100 TB the materialized side is a tiny windows table (one row per
window) while raw events stay in cold storage; the serve path reads
|tail| raw rows. A scheduler (the job registry, or the streaming sink in
streaming/windows.py) advances the watermark; here it is an explicit
argument so batch tests can pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tsql import epoch_ms, sum2
from ..sinks import write_ignore_conflicts

_MS = {"15 minutes": 15 * 60 * 1000, "30 minutes": 30 * 60 * 1000,
       "1 hour": 60 * 60 * 1000, "1 day": 24 * 60 * 60 * 1000}


def _window_ms(size: str) -> int:
    if size not in _MS:
        raise ValueError(f"unsupported window size {size!r}; known: {sorted(_MS)}")
    return _MS[size]


def _windowed_agg(events: DataFrame, size: str) -> DataFrame:
    return (
        events.groupBy(F.window("ts", size).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum2(F.col("value")).alias("sum_value"),
        )
        .select(
            epoch_ms(F.col("win.start")).alias("win_start_ms"),
            "n_events",
            "sum_value",
        )
    )


def materialize_rollup(
    events: DataFrame,
    path: str,
    size: str = "15 minutes",
    watermark_ms: int | None = None,
) -> int:
    """Append all CLOSED windows (end <= watermark) to the rollup table;
    returns windows appended. Without a watermark, everything
    materializes (a final backfill over a finished dataset)."""
    agg = _windowed_agg(events, size)
    if watermark_ms is not None:
        agg = agg.filter(F.col("win_start_ms") + _window_ms(size) <= watermark_ms)
    return write_ignore_conflicts(agg, path, keys=["win_start_ms"])


def serve_rollup(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    size: str = "15 minutes",
    watermark_ms: int | None = None,
) -> DataFrame:
    """The windowed aggregation, answered as materialized ∪ live tail.

    Events in a window that straddles the watermark were NOT
    materialized (the window hadn't closed), so the live side recomputes
    every window whose START is past the last closed boundary — the scan
    is pruned to ts >= floor(watermark, size) - 0, which partition
    pruning turns into a directory filter on a date-partitioned events
    table."""
    materialized = spark.read.parquet(path)
    if watermark_ms is None:
        return materialized
    # reuse the already-loaded relation for the frontier probe: a
    # second read-plus-aggregate of the same windows table per serve
    # call is pure waste (review r11)
    mat_max = materialized.agg(F.max("win_start_ms")).first()[0]
    live_start_ms = live_boundary_ms(
        spark, path, size, watermark_ms, _mat_max=mat_max
    )
    if live_start_ms is None:
        return _windowed_agg(events, size)
    wms = _window_ms(size)
    # epoch_ms comparison is total over TIMESTAMP and TIMESTAMP_NTZ ts
    # columns; on a date-partitioned events table ALSO pre-filter the
    # partition column so pruning reaches the directory listing — get
    # the cut from live_boundary_ms (round-11 probe: a 99%-materialized
    # day-partitioned history serves 2.7x faster than full recompute
    # BECAUSE of that directory-level prune, result-identical; see
    # SCALING.md "Round-11")
    live = _windowed_agg(
        events.filter(epoch_ms(F.col("ts")) >= F.lit(live_start_ms)), size
    )
    mat = materialized.filter(F.col("win_start_ms") + wms <= watermark_ms)
    return mat.unionByName(live)


_UNREAD = object()  # sentinel: "probe the table yourself"


def live_boundary_ms(
    spark: SparkSession,
    path: str,
    size: str = "15 minutes",
    watermark_ms: int | None = None,
    _mat_max: object = _UNREAD,
) -> int | None:
    """First event-time millisecond the LIVE side of ``serve_rollup``
    must scan (None = no windows materialized yet, live owns
    everything). Public so a caller with a date/hour-partitioned events
    table can pre-prune its raw scan ON THE PARTITION COLUMN with the
    same cut serve_rollup applies to ``ts`` — that turns the tail scan
    into a directory filter, the piece that makes serve O(tail) at
    100 TB.

    The boundary comes from what was ACTUALLY materialized, not from
    serve's watermark alone: if serve's watermark ran ahead of the last
    materialize, windows that closed in between exist in neither side
    unless the live scan backs up to cover them. The max over the
    rollup table is metadata-scale (one row per window)."""
    wms = _window_ms(size)
    mat_max = (
        spark.read.parquet(path).agg(F.max("win_start_ms")).first()[0]
        if _mat_max is _UNREAD
        else _mat_max  # serve_rollup passes its already-probed max
    )
    if mat_max is None:
        return None
    if watermark_ms is None:
        return mat_max + wms
    # A window [s, s+W) belongs to the mat side iff it is present
    # (s <= mat_max) and closed (s+W <= watermark); live owns the rest.
    wm_boundary = ((watermark_ms - wms) // wms + 1) * wms
    return min(mat_max + wms, wm_boundary)


def cascade_rollup(
    spark: SparkSession,
    fine_path: str,
    coarse_path: str,
    fine_size: str = "15 minutes",
    coarse_size: str = "1 hour",
    watermark_ms: int | None = None,
    final: bool = False,
) -> int:
    """Materialize a COARSER rollup from a finer one — the TimescaleDB
    continuous-aggregate-on-continuous-aggregate cascade (15 m → 1 h →
    1 d). Reads the fine WINDOWS table (one row per fine window), never
    raw events, so each resolution costs O(windows) regardless of
    corpus size; idempotent via the same keyed first-writer-wins sink.

    Only coarse windows whose EVERY fine constituent has closed
    materialize: the effective watermark is min(caller's watermark,
    end of the last fine window present) — or the frontier alone when
    no watermark is given — so a fine window still owned by the live
    tail can never be baked into a coarse aggregate missing its
    contribution. ``final=True`` is the explicit FINAL-BACKFILL
    escape hatch (review r11): the caller asserts the dataset is
    finished and the fine level fully materialized, so EVERY coarse
    window bakes — including the trailing partial one, which under the
    frontier rule could never close (data rarely ends on a coarse
    boundary). Explicit because baking it from a PARTIALLY
    materialized fine level would freeze a wrong row forever under
    first-writer-wins.

    sum_value re-aggregates EXACTLY: each fine sum_value is
    cents/100.0, so floor(x*100+0.5) recovers the integer cents, the
    cascade sums longs, and divides once at the edge — double-summing
    drift cannot accumulate across levels.

    Watermark contract caveat (shared with the whole rollup family):
    an event arriving LATER than the watermark that closed its window
    is lost — at the fine level first-writer-wins drops it if its
    window materialized, and a window that closed EMPTY (no row
    written) would gain a late-only row on a re-materialize while any
    already-baked coarse parent stays frozen. Late data behind the
    watermark violates the watermark; pick the watermark delay to make
    that impossible, as Structured Streaming does."""
    wms_f = _window_ms(fine_size)
    wms_c = _window_ms(coarse_size)
    if wms_c % wms_f != 0:
        raise ValueError(
            f"coarse size {coarse_size!r} must be a whole multiple of "
            f"fine size {fine_size!r}"
        )
    fine = spark.read.parquet(fine_path)
    fine_max = fine.agg(F.max("win_start_ms")).first()[0]
    if fine_max is None:
        return 0
    closed_through = fine_max + wms_f  # end of the last fine window
    if final:
        eff_wm = None  # explicit backfill: bake every window present
    elif watermark_ms is None:
        eff_wm = closed_through
    else:
        eff_wm = min(watermark_ms, closed_through)
    cents = F.floor(F.col("sum_value") * 100 + F.lit(0.5)).cast("long")
    agg = (
        fine.groupBy(
            (F.floor(F.col("win_start_ms") / wms_c) * wms_c)
            .cast("long")
            .alias("win_start_ms")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
    )
    if eff_wm is not None:
        agg = agg.filter(F.col("win_start_ms") + wms_c <= eff_wm)
    return write_ignore_conflicts(agg, coarse_path, keys=["win_start_ms"])
