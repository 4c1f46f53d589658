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
