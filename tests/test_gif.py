"""GIF codec (operators/gif.py): REAL-WORLD decode validation (system
GIFs written by external encoders — the evidence that the LZW
width-change convention is the wire convention, not merely
self-consistent), exact lossless roundtrips incl. interlace and 12-bit
dictionary growth, structural 89a features, the corruption fuzz
contract, and Spark-side routing."""

import glob
import os

import numpy as np
import pytest

from ferramenta_etl_spark.operators.gif import (
    decode_gif_bytes,
    encode_gif_bytes,
)

_SYSTEM_GIFS = sorted(glob.glob("/usr/share/doc/*/html/*.gif"))


def _pattern(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3 + xx + seed) % 256, (xx * 2) % 256, (yy * 5) % 256], axis=2
    ).astype(np.uint8)
    # posterize to <= 8*8*4 = 256 colors (the attach_gif_media rule)
    return img & np.array([0xE0, 0xE0, 0xC0], dtype=np.uint8)


@pytest.mark.skipif(not _SYSTEM_GIFS, reason="no system GIFs on this box")
def test_decodes_real_world_gifs():
    """Files written by real external encoders must decode with sane
    geometry — pins the late-change LZW width convention against the
    actual wire format (an early-change decoder fails every one of
    these at the first width boundary)."""
    decoded = 0
    for f in _SYSTEM_GIFS[:10]:
        out = decode_gif_bytes(open(f, "rb").read())
        assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
        assert out.shape[0] >= 1 and out.shape[1] >= 1
        decoded += 1
    assert decoded > 0


def test_lossless_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(4)
    for trial in range(12):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
        img = _pattern(h, w, seed=trial)
        for interlace in (False, True):
            out = decode_gif_bytes(encode_gif_bytes(img, interlace=interlace))
            assert (out == img).all(), (trial, h, w, interlace)


def test_roundtrip_forces_12bit_growth_and_clear():
    """A large low-entropy image drives the LZW dictionary to the
    12-bit cap and through CLEAR resets — still bit-exact."""
    img = np.zeros((400, 400, 3), dtype=np.uint8)
    img[::3, ::5] = [32, 64, 128]
    img[1::7, 2::9] = [224, 0, 192]
    out = decode_gif_bytes(encode_gif_bytes(img))
    assert (out == img).all()


def test_89a_extensions_and_subframe_compose():
    """Hand-spliced GCE/comment extension blocks must be skipped
    structurally, and a frame smaller than the logical screen composes
    on the global background color."""
    img = _pattern(16, 16)
    base = bytearray(encode_gif_bytes(img))
    # splice a Graphic Control Extension + comment right after the
    # global color table (before the image descriptor 0x2C)
    at = base.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = bytes(base[:at]) + gce + comment + bytes(base[at:])
    out = decode_gif_bytes(spliced)
    assert (out == img).all()

    # sub-frame: hand-build a 4x4 frame at (2,1) on an 8x6 screen
    import struct

    pal = b"\x10\x20\x30" + b"\xff\x00\x00" + b"\x00" * (2 * 3 - 0)
    hdr = b"GIF89a" + struct.pack("<HHBBB", 8, 6, 0x80, 0, 0)
    # global table: 2 entries -> flags size field 0 -> 2<<0 = 2 colors
    frame_idx = np.ones((4, 4), dtype=np.uint8)  # all color 1 (red)
    from ferramenta_etl_spark.operators.gif import _lzw_encode

    lzw = _lzw_encode(2, frame_idx.reshape(-1))
    desc = b"\x2c" + struct.pack("<HHHHB", 2, 1, 4, 4, 0) + bytes([2])
    blocks = b""
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        blocks += bytes([len(c)]) + c
    data = hdr + pal[:6] + desc + blocks + b"\x00\x3b"
    out = decode_gif_bytes(data)
    assert out.shape == (6, 8, 3)
    assert (out[1:5, 2:6] == [255, 0, 0]).all()  # the frame
    assert (out[0, 0] == [0x10, 0x20, 0x30]).all()  # background color 0


def test_corruption_fuzz():
    """Random corruption must either decode or raise ValueError — the
    contract shared with PNG/JPEG/WAV."""
    base = bytearray(encode_gif_bytes(_pattern(20, 24), interlace=True))
    rng = np.random.default_rng(23)
    for trial in range(300):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.integers(1, 6)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif mode == 1:
            data = data[: rng.integers(6, len(data))]
        else:
            at = rng.integers(6, len(data))
            data[at:at] = bytes(rng.integers(0, 256, rng.integers(1, 24)))
        try:
            out = decode_gif_bytes(bytes(data))
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"trial {trial}: non-ValueError {type(e).__name__}: {e}"
            ) from e
        assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3


def test_encoder_guards():
    with pytest.raises(ValueError, match="256"):
        rng = np.random.default_rng(0)
        encode_gif_bytes(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        encode_gif_bytes(np.zeros((0, 4, 3), dtype=np.uint8))


def test_decode_images_routes_gif(spark):
    """attach_gif_media -> decode_images: GIF rows reproduce the
    POSTERIZED pattern exactly (lossless), via the same magic-byte
    routing as PNG/JPEG; extract_media_features returns real dims."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.containers import (
        attach_gif_media,
        decode_images,
    )
    from ferramenta_etl_spark.operators.multimodal import (
        attach_fake_raw_images,
        extract_media_features,
    )

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    decoded = {r.doc_id: r for r in decode_images(attach_gif_media(docs)).collect()}
    truth = {r.doc_id: r for r in attach_fake_raw_images(docs).collect()}
    for did, want in truth.items():
        got = decoded[did]
        assert (got.width, got.height) == (want.width, want.height), did
        gp = np.frombuffer(bytes(got.media), dtype=np.uint8)
        wp = np.frombuffer(bytes(want.media), dtype=np.uint8).copy()
        wp = (
            wp.reshape(-1, 3) & np.array([0xE0, 0xE0, 0xC0], dtype=np.uint8)
        ).reshape(-1)
        assert (gp == wp).all(), did

    media = attach_gif_media(docs).withColumn("media_type", F.lit("image"))
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    for did, want in truth.items():
        assert (feats[did].width, feats[did].height) == (
            want.width,
            want.height,
        ), did


def test_subframe_composes_on_declared_bg_index():
    """The logical screen descriptor's background-color-index byte picks
    the compose color (ADVICE r10 — was hardcoded to global entry 0);
    an out-of-table index falls back to entry 0."""
    import struct

    from ferramenta_etl_spark.operators.gif import _lzw_encode

    pal = b"\x10\x20\x30" + b"\xff\x00\x00"  # 0: teal-ish, 1: red
    frame_idx = np.zeros((4, 4), dtype=np.uint8)  # frame all color 0
    lzw = _lzw_encode(2, frame_idx.reshape(-1))
    blocks = b""
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        blocks += bytes([len(c)]) + c
    desc = b"\x2c" + struct.pack("<HHHHB", 2, 1, 4, 4, 0) + bytes([2])

    # bg index 1 -> border must be RED, not entry 0
    hdr = b"GIF89a" + struct.pack("<HHBBB", 8, 6, 0x80, 1, 0)
    out = decode_gif_bytes(hdr + pal + desc + blocks + b"\x00\x3b")
    assert (out[1:5, 2:6] == [0x10, 0x20, 0x30]).all()  # the frame
    assert (out[0, 0] == [0xFF, 0x00, 0x00]).all()  # declared bg = 1

    # out-of-table bg index (7 with a 2-entry table) -> entry-0 fallback
    hdr_bad = b"GIF89a" + struct.pack("<HHBBB", 8, 6, 0x80, 7, 0)
    out = decode_gif_bytes(hdr_bad + pal + desc + blocks + b"\x00\x3b")
    assert (out[0, 0] == [0x10, 0x20, 0x30]).all()
