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
