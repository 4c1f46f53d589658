"""Streaming == batch: the Structured Streaming mirrors must produce
exactly the batch plans' results when drained with AvailableNow."""

import pytest

from ferramenta_etl_spark.plans import extensions
from ferramenta_etl_spark.streaming import (
    dedup_within_watermark,
    run_available_now,
    session_agg_stream,
    sliding_agg_stream,
    stream_events,
    tumbling_agg_stream,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "stream_fn,batch_name",
    [
        (tumbling_agg_stream, "events_tumbling_agg"),
        (sliding_agg_stream, "events_sliding_agg"),
        (session_agg_stream, "events_session_agg"),
    ],
)
def test_stream_matches_batch(spark, sf_dir, tmp_path, stream_fn, batch_name):
    ev = stream_events(spark, sf_dir)
    assert ev.isStreaming
    out = run_available_now(
        stream_fn(ev), str(tmp_path / "ckpt"), f"q_{batch_name}"
    )
    batch = extensions.QUERIES[batch_name](spark, sf_dir)
    assert _sorted_rows(out) == _sorted_rows(batch)


def test_dedup_within_watermark(spark, sf_dir, tmp_path):
    ev = stream_events(spark, sf_dir)
    deduped = dedup_within_watermark(ev, keys=["user_id", "event_type"])
    out = run_available_now(deduped, str(tmp_path / "ckpt2"), "q_dedup")
    # one row per (user_id, event_type) that occurs
    assert out.count() == out.select("user_id", "event_type").distinct().count()
    assert out.count() > 0
