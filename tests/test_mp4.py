"""MP4 box-tree metadata codec (operators/mp4.py, VERDICT r10 #7):
build/parse roundtrips over both FullBox versions, structural-corruption
guards, and the Spark routing through extract_media_features."""

import struct

import pytest

from ferramenta_etl_spark.operators.mp4 import (
    MP4Meta,
    build_mp4_bytes,
    parse_mp4_metadata,
)


def test_roundtrip_v0_and_v1():
    for v1 in (False, True):
        raw = build_mp4_bytes(
            width=320, height=240, duration_ms=5500,
            video_codec="avc1", audio_codec="mp4a", version1=v1,
        )
        m = parse_mp4_metadata(raw)
        assert m == MP4Meta("isom", 1000, 5500, 2, 320, 240, "avc1", "mp4a")


def test_video_only_and_codec_variants():
    m = parse_mp4_metadata(
        build_mp4_bytes(width=640, height=360, video_codec="hvc1",
                        audio_codec=None, major_brand="mp42")
    )
    assert m.n_tracks == 1
    assert (m.width, m.height) == (640, 360)
    assert m.video_codec == "hvc1"
    assert m.audio_codec is None
    assert m.major_brand == "mp42"


def test_duration_uses_mvhd_timescale():
    m = parse_mp4_metadata(
        build_mp4_bytes(duration_ms=3333, timescale=90_000)
    )
    assert m.timescale == 90_000
    # floor((3333*90000//1000) * 1000 / 90000)
    assert m.duration_ms == 3333


def test_largesize_and_to_eof_boxes():
    raw = bytearray(build_mp4_bytes())
    # rewrite the trailing mdat as a 64-bit largesize box
    mdat_at = raw.rindex(b"mdat") - 4
    payload = raw[mdat_at + 8:]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(
        ">Q", 16 + len(payload)
    ) + payload
    assert parse_mp4_metadata(bytes(raw[:mdat_at]) + large).width == 64
    # size==0: mdat extends to EOF
    eof = struct.pack(">I", 0) + b"mdat" + payload
    assert parse_mp4_metadata(bytes(raw[:mdat_at]) + eof).width == 64


@pytest.mark.parametrize(
    "mutate",
    [
        lambda r: r[:20],  # truncated mid-ftyp/moov
        lambda r: r[8:],  # no leading ftyp
        lambda r: r.replace(b"moov", b"mooX", 1),  # moov gone
        lambda r: r.replace(b"mvhd", b"mvhX", 1),  # mvhd gone
        # child box size overruns its parent
        lambda r: r[: r.index(b"tkhd") - 4]
        + struct.pack(">I", 1 << 24)
        + r[r.index(b"tkhd"):],
    ],
)
def test_corruption_raises_value_error(mutate):
    raw = build_mp4_bytes()
    with pytest.raises(ValueError):
        parse_mp4_metadata(mutate(raw))


def test_zero_timescale_rejected():
    raw = bytearray(build_mp4_bytes())
    at = raw.index(b"mvhd") + 4 + 4 + 8  # fullbox hdr + creation/mod
    raw[at : at + 4] = struct.pack(">I", 0)
    with pytest.raises(ValueError):
        parse_mp4_metadata(bytes(raw))


def test_builder_guards():
    for kw in ({"width": 0}, {"height": -1}, {"timescale": 0},
               {"duration_ms": -5}):
        with pytest.raises(ValueError):
            build_mp4_bytes(**kw)


def test_sniff_routes_mp4():
    from ferramenta_etl_spark.operators.containers import sniff_container

    assert sniff_container(build_mp4_bytes()) == "mp4"


def test_extract_media_features_real_mp4_dims(spark):
    """End-to-end Spark routing: attach_mp4_media fixtures flow through
    extract_media_features and surface the REAL tkhd dims (not the
    fake's byte-length arithmetic); a corrupted payload nulls out."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.containers import attach_mp4_media
    from ferramenta_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    media = attach_mp4_media(docs).withColumn(
        "media_type", F.lit("video")
    )
    feats = {
        r.doc_id: r
        for r in extract_media_features(media).collect()
    }
    dims = [(64, 48), (320, 240), (640, 360), (128, 96)]
    for did in range(8):
        w, h = dims[did % 4]
        assert (feats[did].width, feats[did].height) == (w, h)
        assert feats[did].byte_len > 0

    # corrupt one payload: moov stripped -> null features, batch intact
    bad = media.withColumn(
        "media",
        F.when(F.col("doc_id") == 3,
               F.substring(F.col("media"), 1, 24)).otherwise(
            F.col("media")
        ),
    )
    out = {r.doc_id: r for r in extract_media_features(bad).collect()}
    assert out[3].width is None and out[3].checksum is None
    assert out[2].width == 640  # neighbors unharmed


def test_parse_accepts_non_bytes_without_semantic_change():
    """Round-12 ADVICE fix: bytes payloads are parsed uncopied; bytearray
    and memoryview payloads are normalized and parse identically."""
    raw = build_mp4_bytes(width=320, height=240, duration_ms=1500)
    a = parse_mp4_metadata(raw)
    b = parse_mp4_metadata(bytearray(raw))
    c = parse_mp4_metadata(memoryview(raw))
    assert a == b == c


# ------------------------------------------------- sample tables (r12)


def test_sample_tables_roundtrip_with_remainder_run():
    """stts round-trip including the remainder run: 1500 ms over 7
    frames at timescale 1000 -> deltas 214x6 + 216, summing EXACTLY to
    the track duration; stss round-trips the keyframe pattern."""
    from ferramenta_etl_spark.operators.mp4 import parse_mp4_sample_tables

    raw = build_mp4_bytes(
        duration_ms=1500, timescale=1000, n_frames=7, keyframes=(1, 4, 7)
    )
    t = parse_mp4_sample_tables(raw)
    assert t is not None
    assert t.media_timescale == 1000
    assert t.n_samples == 7
    assert sum(c * d for c, d in t.stts_runs) == 1500
    assert t.stts_runs == ((6, 214), (1, 216))
    assert t.keyframes == (1, 4, 7)
    times = t.sample_times_ms()
    assert times == [0, 214, 428, 642, 856, 1070, 1284]


def test_sample_tables_absent_and_no_stss():
    from ferramenta_etl_spark.operators.mp4 import parse_mp4_sample_tables

    # pre-r12 metadata-only layout: no stts -> None (nothing to plan)
    assert parse_mp4_sample_tables(build_mp4_bytes()) is None
    # stts without stss: all samples sync (keyframes None)
    t = parse_mp4_sample_tables(build_mp4_bytes(n_frames=10))
    assert t is not None and t.keyframes is None and t.n_samples == 10


def test_sample_tables_corruption_and_builder_guards():
    from ferramenta_etl_spark.operators.mp4 import parse_mp4_sample_tables

    raw = bytearray(build_mp4_bytes(n_frames=10, keyframes=(1, 5)))
    at = bytes(raw).find(b"stts")
    # entry_count inflated past the box end -> overrun
    struct.pack_into(">I", raw, at + 8, 10_000)
    with pytest.raises(ValueError, match="stts"):
        parse_mp4_sample_tables(bytes(raw))
    with pytest.raises(ValueError, match="keyframes requires"):
        build_mp4_bytes(keyframes=(1,))
    with pytest.raises(ValueError, match="ascending unique"):
        build_mp4_bytes(n_frames=5, keyframes=(3, 2))
    with pytest.raises(ValueError, match="ascending unique"):
        build_mp4_bytes(n_frames=5, keyframes=(1, 9))


def test_keyframe_schedule_lands_on_keyframes(spark):
    """VERDICT r11 #8 done-criterion: an MP4 with a KNOWN keyframe
    pattern scheduled via the real stts/stss tables — every scheduled
    sample is a sync sample, each 1 s target maps to the latest
    keyframe at-or-before it, and the whole plan matches a pure-Python
    reference."""
    import pandas as pd  # noqa: F401 (arrow path)

    from ferramenta_etl_spark.operators.multimodal import (
        keyframe_sample_schedule,
    )

    # 100 frames over 10 s (delta 100 ms), keyframes every 30 starting
    # at 1 -> sync samples 0,30,60,90 (0-based), times 0/3000/6000/9000
    raw = build_mp4_bytes(
        duration_ms=10_000, timescale=1000, n_frames=100,
        keyframes=tuple(range(1, 101, 30)),
    )
    df = spark.createDataFrame([(7, bytearray(raw))], "doc_id long, media binary")
    got = {
        (r.sample_idx, r.t_ms)
        for r in keyframe_sample_schedule(df, every_ms=1000).collect()
    }
    # targets 0..9000: 0-2999 -> kf 0; 3000-5999 -> kf 30; etc.
    assert got == {(0, 0), (30, 3000), (60, 6000), (90, 9000)}

    # no-stss container: every sample is sync -> exact 1 s grid
    raw2 = build_mp4_bytes(duration_ms=5_000, timescale=1000, n_frames=50)
    df2 = spark.createDataFrame([(8, bytearray(raw2))], "doc_id long, media binary")
    got2 = sorted(
        (r.sample_idx, r.t_ms)
        for r in keyframe_sample_schedule(df2, every_ms=1000).collect()
    )
    assert got2 == [(0, 0), (10, 1000), (20, 2000), (30, 3000), (40, 4000)]


def test_keyframe_schedule_corrupt_and_fixture_spine(spark):
    """Corrupt containers surface as one null row; the attach_mp4_media
    fixture spine (real GOP-patterned stss, every 5th doc all-sync)
    yields a schedule whose every row is a sync sample of its doc."""
    from ferramenta_etl_spark.operators.containers import attach_mp4_media
    from ferramenta_etl_spark.operators.mp4 import parse_mp4_sample_tables
    from ferramenta_etl_spark.operators.multimodal import (
        keyframe_sample_schedule,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 40))], "doc_id long, media binary"
    )
    rows = keyframe_sample_schedule(bad, every_ms=500).collect()
    assert [(r.doc_id, r.sample_idx, r.t_ms) for r in rows] == [(1, None, None)]

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = attach_mp4_media(docs)
    sched = keyframe_sample_schedule(media, every_ms=1000).collect()
    assert sched and all(r.sample_idx is not None for r in sched)
    blobs = {r.doc_id: bytes(r.media) for r in media.collect()}
    by_doc = {}
    for r in sched:
        by_doc.setdefault(r.doc_id, set()).add(r.sample_idx)
    for did, picked in by_doc.items():
        t = parse_mp4_sample_tables(blobs[did])
        sync = (
            set(range(t.n_samples))
            if t.keyframes is None
            else {k - 1 for k in t.keyframes}
        )
        assert picked <= sync, f"doc {did}: non-sync samples {picked - sync}"
        assert 0 in picked  # frame-0 coverage: target 0 always schedules
    with pytest.raises(ValueError, match="every_ms"):
        keyframe_sample_schedule(bad, every_ms=0)


def test_keyframe_schedule_nondefault_columns_and_sample_bomb(spark):
    """Review-r12 fixes: (a) non-default id/media column names work (the
    kernel reads post-alias names); (b) an 8-byte stts declaring 2^32
    samples — which passes box-bounds checks because the count is a free
    field — yields the corrupt null row instead of expanding a multi-GB
    list in the executor."""
    from ferramenta_etl_spark.operators.multimodal import (
        keyframe_sample_schedule,
    )

    raw = build_mp4_bytes(duration_ms=3000, timescale=1000, n_frames=30,
                          keyframes=(1, 16))
    df = spark.createDataFrame(
        [(5, bytearray(raw))], "video_id long, payload binary"
    )
    got = sorted(
        (r.doc_id, r.sample_idx, r.t_ms)
        for r in keyframe_sample_schedule(
            df, every_ms=1000, media_col="payload", id_col="video_id"
        ).collect()
    )
    # keyframes at samples 0 and 15 (times 0 and 1500); targets 0/1000/
    # 2000 snap to 0, 0, 15
    assert got == [(5, 0, 0), (5, 15, 1500)]

    bomb = bytearray(build_mp4_bytes(n_frames=10))
    at = bytes(bomb).find(b"stts")
    struct.pack_into(">I", bomb, at + 12, 0xFFFFFFFF)  # first run count
    struct.pack_into(">I", bomb, at + 16, 1)  # delta 1 tick
    bdf = spark.createDataFrame(
        [(9, bytes(bomb))], "doc_id long, media binary"
    )
    rows = keyframe_sample_schedule(bdf, every_ms=1000).collect()
    assert [(r.doc_id, r.sample_idx, r.t_ms) for r in rows] == [(9, None, None)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_samples"):
        keyframe_sample_schedule(bdf, max_samples=0)


def test_sample_tables_byteflip_fuzz():
    """Deterministic byte-flip fuzz over the sample-table path: any
    single-byte corruption either parses to a structurally sane result
    or raises ValueError — never another exception type and never an
    unbounded expansion (n_samples is just a declared count; the
    EXPANSION bound lives in keyframe_sample_schedule's max_samples
    guard, so here we only sanity-check declared fields)."""
    import random

    from ferramenta_etl_spark.operators.mp4 import parse_mp4_sample_tables

    base = build_mp4_bytes(
        duration_ms=4000, timescale=1000, n_frames=40,
        keyframes=(1, 11, 21, 31),
    )
    rng = random.Random(1234)
    for _ in range(400):
        raw = bytearray(base)
        for _ in range(rng.randint(1, 3)):
            raw[rng.randrange(len(raw))] = rng.randrange(256)
        try:
            t = parse_mp4_sample_tables(bytes(raw))
        except ValueError:
            continue  # the documented corruption contract
        if t is None:
            continue  # video trak or stts no longer recognizable
        assert t.media_timescale > 0
        assert t.n_samples == sum(c for c, _ in t.stts_runs)
        if t.keyframes is not None:
            assert list(t.keyframes) == sorted(set(t.keyframes))
            assert all(1 <= k <= t.n_samples for k in t.keyframes)
