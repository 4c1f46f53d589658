"""Real compressed-container decode (VERDICT r08 #1): PNG via stdlib
zlib inflate + per-scanline unfilter, WAV via the stdlib ``wave``
module. Fixtures are written with the SAME stdlib (wave writer; a
minimal chunk+CRC PNG writer over zlib), and the decoded output is
pinned against the existing raw-media oracles — the resize/audio
pipelines must produce identical results whether fed raw fixtures or
decoded containers."""

import struct
import zlib

import numpy as np
import pytest

from ferramenta_etl_spark.operators.containers import (
    PNG_MAGIC,
    attach_png_media,
    attach_wav_media,
    decode_audio,
    decode_images,
    decode_png_bytes,
    decode_wav_bytes,
    encode_png_bytes,
    encode_wav_bytes,
    sniff_container,
)


def _rand_img(seed, h=13, w=9):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_raw(w, h, color_type, channels, pixels, extra_chunks=b""):
    """Hand-built PNG for color types the RGB encoder doesn't emit:
    filter 0 scanlines over the given (h, w*channels) uint8 sample
    array."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    lines = b"".join(
        b"\x00" + pixels[y].tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + extra_chunks
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )


def test_sniff_container_magics():
    img = _rand_img(0, 4, 4)
    assert sniff_container(encode_png_bytes(img)) == "png"
    assert sniff_container(encode_wav_bytes(np.zeros(8, np.int16), 8000)) == "wav"
    assert sniff_container(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_container(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8) == "mp4"
    assert sniff_container(b"plain text payload here") is None
    assert sniff_container(None) is None
    assert sniff_container(b"short") is None


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    """Encode with each PNG filter, decode, compare pixel-exact — all
    five unfilter paths (None/Sub/Up/Average/Paeth) are exercised."""
    img = _rand_img(filter_type, 17, 11)
    got = decode_png_bytes(encode_png_bytes(img, filter_type=filter_type))
    assert got.dtype == np.uint8 and got.shape == img.shape
    assert np.array_equal(got, img)


def test_png_grayscale_and_alpha_color_types():
    rng = np.random.default_rng(3)
    h, w = 6, 5
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    # color type 0 (gray): replicate to RGB
    got = decode_png_bytes(_png_raw(w, h, 0, 1, gray.reshape(h, w)))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # color type 4 (gray+alpha): alpha dropped
    ga = np.zeros((h, w * 2), dtype=np.uint8)
    ga[:, 0::2] = gray
    ga[:, 1::2] = 200
    got = decode_png_bytes(_png_raw(w, h, 4, 2, ga))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # color type 6 (RGBA): alpha dropped
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rgba = np.concatenate(
        [rgb, np.full((h, w, 1), 77, np.uint8)], axis=2
    ).reshape(h, w * 4)
    got = decode_png_bytes(_png_raw(w, h, 6, 4, rgba))
    assert np.array_equal(got, rgb)


def test_png_palette_color_type():
    pal = np.array(
        [[250, 1, 2], [3, 240, 5], [6, 7, 230], [9, 9, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    raw = _png_raw(
        4, 2, 3, 1, idx, extra_chunks=_chunk(b"PLTE", pal.tobytes())
    )
    assert np.array_equal(decode_png_bytes(raw), pal[idx])
    # out-of-range palette index fails loudly
    bad_idx = np.array([[0, 9, 0, 0], [0, 0, 0, 0]], dtype=np.uint8)
    bad = _png_raw(4, 2, 3, 1, bad_idx, extra_chunks=_chunk(b"PLTE", pal.tobytes()))
    with pytest.raises(ValueError, match="palette index"):
        decode_png_bytes(bad)


def test_png_corruption_fails_loudly():
    img = _rand_img(5, 8, 8)
    good = encode_png_bytes(img, filter_type=2)
    # flip one IDAT byte: CRC check must reject, not decode garbage
    ihdr_end = 8 + 12 + 13
    bad = bytearray(good)
    bad[ihdr_end + 12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_bytes(bytes(bad))
    with pytest.raises(ValueError):
        decode_png_bytes(good[: len(good) // 2] )
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_bytes(b"nope" * 10)
    # 16-bit depth and interlace are named unsupported
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    raw16 = PNG_MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)
    ) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png_bytes(raw16)


def test_wav_roundtrip_mono_16bit():
    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, size=400, dtype=np.int16)
    got, rate = decode_wav_bytes(encode_wav_bytes(pcm, 16000))
    assert rate == 16000
    assert np.array_equal(got, pcm)


def test_wav_stereo_downmix_and_8bit():
    import io
    import wave

    pcm = np.array([-30000, -1, 0, 1, 30000, 123], dtype=np.int16)
    # duplicated channels: downmix reproduces the mono signal exactly
    got, rate = decode_wav_bytes(encode_wav_bytes(pcm, 8000, channels=2))
    assert np.array_equal(got, pcm)
    # distinct channels: per-frame mean (float, round-half-even)
    left = np.array([100, 200], dtype=np.int16)
    right = np.array([200, 301], dtype=np.int16)
    inter = np.empty(4, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    got, _ = decode_wav_bytes(buf.getvalue())
    assert got.tolist() == [150, 250]  # 250.5 rounds half-even to 250
    # 8-bit unsigned: recentered and scaled
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    got, _ = decode_wav_bytes(buf.getvalue())
    assert got.tolist() == [-32768, 0, 32512]


# ------------------------------------------------- Spark-side pinning --


def _docs(spark, n=24):
    return spark.range(n).selectExpr("id AS doc_id")


def test_decode_images_matches_raw_fixtures_per_pixel(spark):
    """PNG containers -> decode_images == the raw-RGB fixtures the
    per-pixel resize oracle already runs on: byte-for-byte identical
    payloads and dims for every doc (filter types 0-4 cycle by id)."""
    from ferramenta_etl_spark.operators.multimodal import attach_fake_raw_images

    docs = _docs(spark)
    raw = {
        r.doc_id: (bytes(r.media), r.width, r.height)
        for r in attach_fake_raw_images(docs).collect()
    }
    dec = {
        r.doc_id: (bytes(r.media), r.width, r.height)
        for r in decode_images(attach_png_media(docs)).collect()
    }
    assert raw == dec


def test_resize_on_decoded_equals_resize_on_raw(spark):
    """The EXISTING per-pixel resize path consumes decoded PNG output
    end-to-end and produces the identical result."""
    from ferramenta_etl_spark.operators.multimodal import (
        attach_fake_raw_images,
        resize_images,
    )

    docs = _docs(spark, 12)
    a = {
        r.doc_id: (bytes(r.media), r.width, r.height)
        for r in resize_images(attach_fake_raw_images(docs), 16, 12).collect()
    }
    b = {
        r.doc_id: (bytes(r.media), r.width, r.height)
        for r in resize_images(decode_images(attach_png_media(docs)), 16, 12).collect()
    }
    assert a == b


def test_decode_audio_matches_raw_fixtures_per_sample(spark):
    """WAV containers (mono and duplicated-stereo) -> decode_audio ==
    the raw-PCM fixtures, sample-for-sample; audio_features agree."""
    from ferramenta_etl_spark.operators.audio import (
        attach_fake_raw_audio,
        audio_features,
    )

    docs = _docs(spark)
    raw = {
        r.doc_id: (bytes(r.media), r.sample_rate)
        for r in attach_fake_raw_audio(docs).collect()
    }
    dec = {
        r.doc_id: (bytes(r.media), r.sample_rate)
        for r in decode_audio(attach_wav_media(docs)).collect()
    }
    assert raw == dec
    fa = {
        r.doc_id: (r.n_samples, r.rms, r.peak)
        for r in audio_features(attach_fake_raw_audio(docs)).collect()
    }
    fb = {
        r.doc_id: (r.n_samples, r.rms, r.peak)
        for r in audio_features(decode_audio(attach_wav_media(docs))).collect()
    }
    assert fa == fb


def test_decode_operators_null_out_non_containers(spark):
    rows = [(1, b"not media at all"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    for r in decode_images(df).collect():
        assert r.media is None and r.width is None
    for r in decode_audio(df).collect():
        assert r.media is None and r.sample_rate is None


def test_extract_media_features_routes_by_magic(spark):
    """The feature extractor: real dims for PNG, (n_samples, rate) for
    WAV, the documented fake for unknown payloads, all-null for a
    corrupt container that sniffs as PNG."""
    from ferramenta_etl_spark.operators.multimodal import extract_media_features

    img = _rand_img(42, 10, 7)
    png = encode_png_bytes(img, filter_type=4)
    pcm = np.arange(-50, 50, dtype=np.int16)
    wav = encode_wav_bytes(pcm, 22050)
    corrupt = bytearray(png)
    corrupt[40] ^= 0x55
    text = b"just some text bytes"
    rows = [
        (1, bytes(png), "image"),
        (2, bytes(wav), "audio"),
        (3, bytes(corrupt), "image"),
        (4, text, "image"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media binary, media_type string"
    )
    got = {r.doc_id: r for r in extract_media_features(df).collect()}
    assert (got[1].width, got[1].height) == (7, 10)  # real decoded dims
    assert got[1].checksum == sum(img.tobytes()[:64]) % (1 << 31)
    assert (got[2].width, got[2].height) == (100, 22050)
    assert got[2].checksum == sum(pcm.tobytes()[:64]) % (1 << 31)
    assert got[3].width is None and got[3].checksum is None  # corrupt
    n = len(text)  # fake path unchanged for unknown payloads
    assert (got[4].byte_len, got[4].width, got[4].height) == (
        n, n % 640, (n * 7) % 480,
    )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_png_roundtrip_randomized_shapes(h, w, filter_type, seed):
    """Randomized dims including the 1x1 / 1xN / Nx1 edges where the
    Sub/Paeth left-neighbor and Up upper-neighbor terms vanish."""
    img = _rand_img(seed, h, w)
    got = decode_png_bytes(encode_png_bytes(img, filter_type=filter_type))
    assert np.array_equal(got, img)


@given(
    n=st.integers(1, 64),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_randomized(n, rate, channels, seed):
    pcm = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16
    )
    got, got_rate = decode_wav_bytes(encode_wav_bytes(pcm, rate, channels))
    assert got_rate == rate
    assert np.array_equal(got, pcm)


def test_png_decoder_corruption_fuzz():
    """Random corruption of a valid PNG must either decode or raise
    ValueError — never struct.error/zlib.error/IndexError. The Spark
    wrappers catch Exception broadly (batches were never at risk);
    this pins the FUNCTION's documented contract ("raises ValueError
    on anything unsupported") for library callers. Fuzz-found guards:
    chunk-CRC truncation, 13-byte IHDR, zlib-invalid IDAT."""
    import numpy as np

    from ferramenta_etl_spark.operators.containers import (
        decode_png_bytes,
        encode_png_bytes,
    )

    yy, xx = np.mgrid[0:16, 0:20]
    img = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, (yy * 5) % 256], axis=2
    ).astype(np.uint8)
    base = bytearray(encode_png_bytes(img, filter_type=4))
    rng = np.random.default_rng(7)
    for trial in range(300):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.integers(1, 6)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif mode == 1:
            data = data[: rng.integers(9, len(data))]
        else:
            at = rng.integers(8, len(data))
            data[at:at] = bytes(rng.integers(0, 256, rng.integers(1, 24)))
        try:
            out = decode_png_bytes(bytes(data))
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"trial {trial}: non-ValueError {type(e).__name__}: {e}"
            ) from e
        assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3


def test_wav_decoder_corruption_fuzz():
    """Random corruption of a valid WAV must either decode or raise
    ValueError — the stdlib ``wave`` reader otherwise leaks wave.Error,
    EOFError, and (fuzz-found) a BARE RuntimeError from its internal
    Chunk.seek on corrupt chunk sizes; decode_wav_bytes normalizes all
    of them to the shared ValueError contract."""
    import numpy as np

    from ferramenta_etl_spark.operators.containers import (
        decode_wav_bytes,
        encode_wav_bytes,
    )

    pcm = (np.sin(np.linspace(0, 50, 2000)) * 20000).astype(np.int16)
    base = bytearray(encode_wav_bytes(pcm, 8000, channels=2))
    rng = np.random.default_rng(11)
    for trial in range(300):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:
            for _ in range(rng.integers(1, 6)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif mode == 1:
            data = data[: rng.integers(4, len(data))]
        else:
            at = rng.integers(0, len(data))
            data[at:at] = bytes(rng.integers(0, 256, rng.integers(1, 24)))
        try:
            out, rate = decode_wav_bytes(bytes(data))
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"trial {trial}: non-ValueError {type(e).__name__}: {e}"
            ) from e
        assert out.dtype == np.int16 and rate > 0
