"""Continuous-aggregate rollup: materialize closed windows idempotently,
serve materialized ∪ live tail, and the result is EXACTLY the direct
aggregation — at any watermark position."""

from pyspark.sql import functions as F

from ferramenta_etl_spark.functions.tsql import epoch_ms
from ferramenta_etl_spark.pipeline.rollup import (
    _windowed_agg,
    materialize_rollup,
    serve_rollup,
)
from ferramenta_etl_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r[c] for c in sorted(df.columns)) for r in df.collect())


def test_rollup_serve_equals_direct(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.select(
        F.min(epoch_ms("ts")), F.max(epoch_ms("ts"))
    ).first()
    mid = (lo + hi) // 2
    path = str(tmp_path / "rollup")

    n1 = materialize_rollup(ev, path, watermark_ms=mid)
    assert n1 > 0
    # idempotent: same watermark appends nothing
    assert materialize_rollup(ev, path, watermark_ms=mid) == 0

    served = serve_rollup(spark, ev, path, watermark_ms=mid)
    direct = _windowed_agg(ev, "15 minutes")
    assert _rows(served) == _rows(direct)

    # advance the watermark: only newly-closed windows append, and the
    # serve result STILL equals direct
    later = mid + 6 * 60 * 60 * 1000
    n2 = materialize_rollup(ev, path, watermark_ms=later)
    assert n2 > 0
    served2 = serve_rollup(spark, ev, path, watermark_ms=later)
    assert _rows(served2) == _rows(direct)

    # final backfill (no watermark): everything materialized, serving
    # without a watermark reads the table alone
    materialize_rollup(ev, path)
    assert _rows(serve_rollup(spark, ev, path)) == _rows(direct)


def test_rollup_serve_watermark_ahead_of_materialize(spark, sf_dir, tmp_path):
    """Serve with a watermark AHEAD of the last materialize: windows that
    closed between the two watermarks are in neither the table nor the
    naive watermark-derived tail — the live boundary must back up to the
    materialized high-water mark so the gap is recomputed live."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.select(F.min(epoch_ms("ts")), F.max(epoch_ms("ts"))).first()
    early = lo + (hi - lo) // 4
    late = lo + 3 * (hi - lo) // 4
    path = str(tmp_path / "rollup_gap")
    assert materialize_rollup(ev, path, watermark_ms=early) > 0
    served = serve_rollup(spark, ev, path, watermark_ms=late)
    assert _rows(served) == _rows(_windowed_agg(ev, "15 minutes"))


def test_rollup_watermark_inside_first_window(spark, sf_dir, tmp_path):
    """Degenerate watermark (before any window closes): nothing
    materializes and the live side answers everything."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.select(F.min(epoch_ms("ts"))).first()[0]
    path = str(tmp_path / "rollup_edge")
    assert materialize_rollup(ev, path, watermark_ms=lo) == 0
    served = serve_rollup(spark, ev, path, watermark_ms=lo)
    assert _rows(served) == _rows(_windowed_agg(ev, "15 minutes"))


def test_epoch_ms_rejects_raw_long(spark):
    """A raw bigint ts (e.g. nanosAsLong parquet that skipped loader
    normalization) must be a LOUD plan-time error, not a silently-wrong
    seconds interpretation (cast BIGINT->TIMESTAMP reads seconds)."""
    import pytest

    df = spark.createDataFrame([(1_755_100_000_123_456_789,)], "ts long")
    with pytest.raises(Exception, match="TIMESTAMP_NTZ|DATATYPE_MISMATCH"):
        df.select(epoch_ms("ts")).collect()


def test_live_boundary_ms_edges(spark, sf_dir, tmp_path):
    """The public cut (round 11): None before any materialize; mat_max +
    window when serve has no watermark; min(mat-driven, wm-driven)
    otherwise — and pre-pruning the raw scan with it is
    result-identical to serving the full relation."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.pipeline.rollup import (
        live_boundary_ms,
        materialize_rollup,
        serve_rollup,
    )
    from ferramenta_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    lo, hi = ev.agg(epoch_ms(F.min("ts")), epoch_ms(F.max("ts"))).first()
    path = str(tmp_path / "r")
    w = 15 * 60 * 1000

    # empty rollup table: boundary undefined, live owns everything
    materialize_rollup(ev, path, "15 minutes", watermark_ms=lo)  # 0 windows
    assert live_boundary_ms(spark, path, "15 minutes", hi) is None

    wm = lo + (hi - lo) * 6 // 10
    materialize_rollup(ev, path, "15 minutes", watermark_ms=wm)
    cut = live_boundary_ms(spark, path, "15 minutes", wm)
    # boundary is window-aligned and covers the straddling window
    assert cut % w == 0 and cut <= wm
    # no watermark at serve: next window after the materialized max
    mat_max = spark.read.parquet(path).agg(F.max("win_start_ms")).first()[0]
    assert live_boundary_ms(spark, path, "15 minutes", None) == mat_max + w
    # a serve watermark far AHEAD of the last materialize must back the
    # scan up to the materialized frontier, not trust the watermark
    assert live_boundary_ms(spark, path, "15 minutes", hi) == mat_max + w

    # pre-pruning the raw side at the cut == serving the full relation
    pruned = ev.filter(epoch_ms(F.col("ts")) >= cut)
    a = serve_rollup(spark, ev, path, "15 minutes", watermark_ms=wm)
    b = serve_rollup(spark, pruned, path, "15 minutes", watermark_ms=wm)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_stream_materialize_then_serve_equals_batch(spark, sf_dir, tmp_path):
    """The full continuous-aggregate loop (round 11): the STREAMING
    maintainer materializes closed windows (append-mode emission +
    idempotent keyed sink), serve_rollup answers mat ∪ live tail, and
    the result equals the one-shot batch aggregation. A second stream
    run over the same input appends zero (checkpoint + keyed sink)."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.pipeline.rollup import (
        _windowed_agg,
        serve_rollup,
    )
    from ferramenta_etl_spark.sources import load_table
    from ferramenta_etl_spark.streaming.windows import (
        materialize_rollup_stream,
        stream_events,
    )

    path = str(tmp_path / "rollup")
    ev_stream = stream_events(spark, sf_dir)
    n1 = materialize_rollup_stream(
        ev_stream, path, str(tmp_path / "ckpt1"), watermark="1 hour"
    )
    assert n1 > 0  # the fixture spans >> 1 hour: most windows closed

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hi = ev.agg(epoch_ms(F.max("ts"))).first()[0]
    # the stream's final event-time watermark: max(ts) - delay
    served = serve_rollup(
        spark, ev, path, "15 minutes", watermark_ms=hi - 3_600_000
    )
    full = _windowed_agg(ev, "15 minutes")
    assert served.exceptAll(full).isEmpty() and full.exceptAll(served).isEmpty()

    # replay: fresh checkpoint, same input -> keyed sink appends zero
    n2 = materialize_rollup_stream(
        stream_events(spark, sf_dir), path, str(tmp_path / "ckpt2"),
        watermark="1 hour",
    )
    assert n2 == 0


def test_cascade_rollup_equals_direct_and_respects_fine_frontier(
    spark, sf_dir, tmp_path
):
    """15m -> 1h cascade (round 11): re-aggregating the fine WINDOWS
    table equals the direct 1-hour aggregation of raw events for every
    fully-covered hour; an hour whose fine constituents are not all
    materialized never appears; reruns append zero; non-multiple sizes
    are rejected."""
    import pytest
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.pipeline.rollup import (
        _windowed_agg,
        cascade_rollup,
        materialize_rollup,
    )
    from ferramenta_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    lo, hi = ev.agg(epoch_ms(F.min("ts")), epoch_ms(F.max("ts"))).first()
    fine_p, coarse_p = str(tmp_path / "m15"), str(tmp_path / "h1")
    HOUR = 3_600_000

    # fine materialized only through a 60% watermark
    wm = lo + (hi - lo) * 6 // 10
    materialize_rollup(ev, fine_p, "15 minutes", watermark_ms=wm)
    n = cascade_rollup(spark, fine_p, coarse_p, "15 minutes", "1 hour")
    assert n > 0

    got = spark.read.parquet(coarse_p)
    fine_max = (
        spark.read.parquet(fine_p).agg(F.max("win_start_ms")).first()[0]
    )
    frontier = fine_max + 15 * 60 * 1000
    # every produced hour is fully covered by closed fine windows
    assert got.filter(F.col("win_start_ms") + HOUR > frontier).count() == 0
    # and equals the direct hourly aggregation on those hours
    direct = _windowed_agg(ev, "1 hour").filter(
        F.col("win_start_ms") + HOUR <= frontier
    )
    assert got.exceptAll(direct).isEmpty() and direct.exceptAll(got).isEmpty()

    # rerun appends zero (keyed first-writer-wins)
    assert cascade_rollup(spark, fine_p, coarse_p, "15 minutes", "1 hour") == 0

    # advancing the fine frontier lets the remaining hours cascade in —
    # except the trailing hour whose last 15m constituents end past the
    # fine frontier: the cascade correctly withholds a coarse window
    # until EVERY constituent has closed, so compare at its frontier
    materialize_rollup(ev, fine_p, "15 minutes", watermark_ms=hi + HOUR)
    n2 = cascade_rollup(spark, fine_p, coarse_p, "15 minutes", "1 hour")
    assert n2 > 0
    got2 = spark.read.parquet(coarse_p)
    frontier2 = (
        spark.read.parquet(fine_p).agg(F.max("win_start_ms")).first()[0]
        + 15 * 60 * 1000
    )
    direct_all = _windowed_agg(ev, "1 hour").filter(
        F.col("win_start_ms") + HOUR <= frontier2
    )
    assert (
        got2.exceptAll(direct_all).isEmpty()
        and direct_all.exceptAll(got2).isEmpty()
    )

    with pytest.raises(ValueError, match="whole multiple"):
        cascade_rollup(spark, fine_p, coarse_p, "1 hour", "15 minutes")


def test_rollup_cascade_boundary_sweep(spark, tmp_path):
    """Window-boundary adversarial sweep: events exactly ON 15m/1h
    boundaries, one tick before/after, and duplicate timestamps —
    materialize + cascade + serve must reassemble the direct
    aggregation at EVERY watermark position across a window edge."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from ferramenta_etl_spark.functions.tsql import epoch_ms
    from ferramenta_etl_spark.pipeline.rollup import (
        _windowed_agg,
        cascade_rollup,
        materialize_rollup,
        serve_rollup,
    )

    base = datetime(2024, 3, 1)
    rows = []
    for k, dt in enumerate(
        [
            base,                                   # exactly on both edges
            base + timedelta(minutes=15),           # on a 15m edge
            base + timedelta(minutes=15, seconds=-1),
            base + timedelta(minutes=15, seconds=1),
            base + timedelta(hours=1),              # on the 1h edge
            base + timedelta(hours=1, microseconds=-1000),
            base + timedelta(hours=1, microseconds=1000),
            base + timedelta(hours=2, minutes=44, seconds=59),
            base + timedelta(hours=2, minutes=45),
            base + timedelta(hours=2, minutes=45),  # duplicate ts
            base + timedelta(hours=3, minutes=59, seconds=59),
        ]
    ):
        rows.append((k, dt, 1.25 * (k + 1)))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    lo = ev.agg(epoch_ms(F.min("ts"))).first()[0]
    W, H = 15 * 60 * 1000, 3_600_000

    for i, wm in enumerate(
        [lo + W, lo + W + 1, lo + H, lo + H - 1, lo + 4 * H]
    ):
        fine_p = str(tmp_path / f"f{i}")
        coarse_p = str(tmp_path / f"c{i}")
        materialize_rollup(ev, fine_p, "15 minutes", watermark_ms=wm)
        served = serve_rollup(spark, ev, fine_p, "15 minutes", watermark_ms=wm)
        direct = _windowed_agg(ev, "15 minutes")
        assert served.exceptAll(direct).isEmpty(), ("serve", wm)
        assert direct.exceptAll(served).isEmpty(), ("serve", wm)

        cascade_rollup(spark, fine_p, coarse_p, "15 minutes", "1 hour",
                       watermark_ms=wm)
        mat = spark.read.parquet(fine_p)
        if mat.count() == 0:
            continue
        frontier = mat.agg(F.max("win_start_ms")).first()[0] + W
        want = _windowed_agg(ev, "1 hour").filter(
            F.col("win_start_ms") + H <= min(wm, frontier)
        )
        got = spark.read.parquet(coarse_p)
        assert got.exceptAll(want).isEmpty(), ("cascade", wm)
        assert want.exceptAll(got).isEmpty(), ("cascade", wm)
