"""Baseline JPEG codec (operators/jpeg.py — VERDICT r09 #3): per-pixel
oracles with INDEPENDENT arithmetic, roundtrip bounds, every decoder
path (4:4:4 / 4:2:0 / grayscale / restart markers), corrupt-input
policy, and the Spark-side routing through decode_images and
extract_media_features."""

import numpy as np
import pytest

from ferramenta_etl_spark.operators.jpeg import (
    _ZIGZAG,
    decode_jpeg_bytes,
    encode_jpeg_bytes,
)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + xx + seed) % 256, (xx * 2 + seed) % 256, (yy * 5) % 256],
        axis=2,
    ).astype(np.uint8)


def _direct_idct(coef):
    """Textbook 4-nested-loop T.81 IDCT — deliberately NOT the decoder's
    matrix formulation, so the two implementations cross-check."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s
    return out


def test_constant_blocks_exact():
    """Analytic DC oracle: for a constant image v, the decoded pixel is
    exactly round(round(8*(v-128)/q00) * q00 / 8 + 128) — pins quant,
    dequant, IDCT normalization, and level shift with arithmetic that
    never touches the codec."""
    for quality in (50, 90, 100):
        for v in range(0, 256, 7):
            img = np.full((8, 8, 3), v, dtype=np.uint8)
            data, blocks, qtabs, _ = encode_jpeg_bytes(
                img, quality=quality, return_coeffs=True
            )
            q00 = int(qtabs[0][0, 0])
            # the Y plane of a gray-constant RGB is the same constant;
            # its quantized DC must be one of the two integers flanking
            # 8*(v-128)/q00 (float assoc decides exact halves)
            d = int(blocks[0][0][0][0])
            assert abs(d - 8 * (v - 128.0) / q00) <= 0.5 + 1e-9
            # decoded pixel: round(d*q00/8 + 128) in exact integer
            # arithmetic (eighths); a true .5 boundary may land either
            # way in the decoder's float path
            val = d * q00 + 128 * 8
            base, rem = val // 8, val % 8
            allowed = {base, base + 1} if rem == 4 else (
                {base + 1} if rem > 4 else {base}
            )
            allowed = {min(255, max(0, a)) for a in allowed}
            out = decode_jpeg_bytes(data)
            assert out.shape == (8, 8, 3)
            assert (out == out[0, 0, 0]).all(), (quality, v)
            assert int(out[0, 0, 0]) in allowed, (quality, v, allowed, out[0, 0])


def test_decoder_matches_independent_idct():
    """Full-pipeline oracle: decode == independent direct-formula IDCT
    of the file's own quantized coefficients (+ the same upsample/color
    conventions), within +-1 (float association at the uint8 rounding
    boundary). Exercises Huffman tables, bitstream, zigzag, dequant."""
    rng = np.random.default_rng(3)
    img = (_gradient(24, 40).astype(int) + rng.integers(-20, 20, (24, 40, 3))).clip(
        0, 255
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0", "4:2:2"):
        data, blocks, qtabs, samp = encode_jpeg_bytes(
            img, quality=80, subsampling=sub, return_coeffs=True
        )
        h, w = img.shape[:2]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        planes = []
        for ci, rows in enumerate(blocks):
            q = qtabs[min(ci, len(qtabs) - 1)]
            hc, vc = samp[ci]
            plane = np.zeros((len(rows) * 8, len(rows[0]) * 8))
            for by, row in enumerate(rows):
                for bx, zz in enumerate(row):
                    coef = np.zeros(64)
                    coef[_ZIGZAG] = zz
                    px = _direct_idct(coef.reshape(8, 8) * q) + 128.0
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
            plane = np.repeat(plane, vmax // vc, axis=0)
            plane = np.repeat(plane, hmax // hc, axis=1)
            planes.append(plane[:h, :w])
        y, cb, cr = planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=2,
        )
        want = np.clip(np.round(rgb), 0, 255).astype(np.int64)
        got = decode_jpeg_bytes(data).astype(np.int64)
        assert np.abs(got - want).max() <= 1, sub


@pytest.mark.parametrize("sub,qual,max_err", [
    ("4:4:4", 95, 4), ("4:4:4", 75, 12), ("4:2:0", 95, 16),
    ("4:2:2", 95, 16),
])
def test_roundtrip_bounds(sub, qual, max_err):
    img = _gradient(40, 56)
    out = decode_jpeg_bytes(encode_jpeg_bytes(img, quality=qual, subsampling=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= max_err
    assert err.mean() <= 3.0


def test_odd_dims_and_grayscale_and_restarts():
    """Non-MCU-aligned dims must crop exactly; grayscale replicates to
    RGB; restart markers (DRI/RSTn) decode with DC-predictor resets."""
    g = ((np.add.outer(np.arange(37) * 7, np.arange(53) * 3)) % 256).astype(
        np.uint8
    )
    out = decode_jpeg_bytes(encode_jpeg_bytes(g, quality=90, restart_interval=2))
    assert out.shape == (37, 53, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() <= 3.0

    img = _gradient(19, 21)
    for rst in (0, 1, 3):
        out = decode_jpeg_bytes(
            encode_jpeg_bytes(img, quality=92, subsampling="4:2:0",
                              restart_interval=rst)
        )
        assert out.shape == (19, 21, 3)
        assert np.abs(out.astype(int) - img.astype(int)).mean() <= 4.0


def test_corrupt_and_unsupported_raise():
    img = _gradient(16, 16)
    data = encode_jpeg_bytes(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg_bytes(b"\x00\x01\x02")  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg_bytes(data[: len(data) // 2])  # truncated
    # flip SOF0 -> SOF2 (progressive): loud refusal, not garbage
    prog = bytearray(data)
    idx = prog.find(b"\xff\xc0")
    assert idx > 0
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_bytes(bytes(prog))


def test_decode_images_routes_mixed_png_jpeg(spark):
    """One binary column holding PNG and JPEG payloads: decode_images
    routes both by magic bytes; JPEG rows agree with the known pattern
    to the lossy tolerance, PNG rows exactly; junk rows go null."""
    from ferramenta_etl_spark.operators.containers import (
        attach_jpeg_media,
        attach_png_media,
        decode_images,
    )
    from ferramenta_etl_spark.operators.multimodal import attach_fake_raw_images

    docs = spark.range(0, 12).select(F_col("id").alias("doc_id"))
    pngs = attach_png_media(docs.filter("doc_id % 2 = 0"))
    jpgs = attach_jpeg_media(docs.filter("doc_id % 2 = 1"))
    junk = spark.createDataFrame(
        [(100, bytearray(b"\x00" * 64))], "doc_id long, media binary"
    )
    decoded = decode_images(pngs.unionByName(jpgs).unionByName(junk))
    rows = {r.doc_id: r for r in decoded.collect()}
    truth = {
        r.doc_id: r
        for r in attach_fake_raw_images(docs).collect()
    }
    assert rows[100].media is None  # junk -> null row
    for did, want in truth.items():
        got = rows[did]
        assert (got.width, got.height) == (want.width, want.height), did
        gp = np.frombuffer(bytes(got.media), dtype=np.uint8).astype(int)
        wp = np.frombuffer(bytes(want.media), dtype=np.uint8).astype(int)
        if did % 2 == 0:  # PNG: lossless
            assert (gp == wp).all(), did
        else:  # JPEG q95: bounded loss
            assert np.abs(gp - wp).mean() <= 4.0, did


def test_media_features_real_jpeg_dims(spark):
    """extract_media_features returns DECODED dims for JPEG payloads
    (not the fake's byte-length arithmetic), and all-null features for
    a corrupt JPEG — same policy as PNG/WAV."""
    from ferramenta_etl_spark.operators.containers import attach_jpeg_media
    from ferramenta_etl_spark.operators.multimodal import (
        attach_fake_raw_images,
        extract_media_features,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    media = attach_jpeg_media(docs).withColumn("media_type", F.lit("image"))
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    dims = {r.doc_id: r for r in attach_fake_raw_images(docs).collect()}
    for did, want in dims.items():
        assert (feats[did].width, feats[did].height) == (
            want.width,
            want.height,
        ), did
    corrupt = media.select(
        "doc_id",
        F.concat(
            F.substring("media", 1, 24),
            F.lit(bytearray(b"\xff\xff\xff\xff")),
        ).alias("media"),
        "media_type",
    )
    bad = extract_media_features(corrupt).collect()
    assert all(r.width is None and r.checksum is None for r in bad)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_decoder_corruption_fuzz():
    """Random byte flips / truncations / splices of a valid JPEG must
    either decode (some corruption lands in pixels) or raise ValueError
    — never any other exception type and never garbage shapes. The
    Spark wrappers' null-row nets catch Exception broadly, so batches
    were never at risk; this pins the FUNCTION's documented contract
    ("raises ValueError on non-baseline or corrupt input") for library
    callers, and the decompression-bomb guard it drove matters before
    any exception: a corrupted SOF must not allocate 100 GB."""
    rng = np.random.default_rng(17)
    base = bytearray(encode_jpeg_bytes(_gradient(24, 32), quality=85,
                                       subsampling="4:2:0",
                                       restart_interval=2))
    for trial in range(300):
        data = bytearray(base)
        mode = trial % 3
        if mode == 0:  # flip 1-4 random bytes
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif mode == 1:  # truncate
            data = data[: rng.integers(2, len(data))]
        else:  # splice a random chunk
            at = rng.integers(0, len(data))
            data[at:at] = bytes(rng.integers(0, 256, rng.integers(1, 16)))
        try:
            out = decode_jpeg_bytes(bytes(data))
        except ValueError:
            continue
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"trial {trial}: non-ValueError {type(e).__name__}: {e}"
            ) from e
        assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3


def test_annex_k_reserves_all_ones_code():
    """T.81 Annex K (ADVICE r10): no emitted table may assign the
    all-ones code word of its maximum length to a real symbol — the
    1-bit end-of-scan padding must never form a valid code for strict
    third-party decoders. Sweeps adversarial frequency shapes (uniform
    ties, Zipf, singletons, two-symbol) over both Huffman and the
    flat-code fallback."""
    import random

    from ferramenta_etl_spark.operators.jpeg import _canonical_table

    rng = random.Random(11)
    cases = [
        {0: 5},
        {0: 1, 1: 1},
        {s: 1 for s in range(176)},          # max tie pressure
        {s: s + 1 for s in range(64)},
        {s: 2 ** min(s, 20) for s in range(40)},  # deep skew
    ]
    for _ in range(40):
        n = rng.randint(1, 176)
        cases.append({s: rng.randint(1, 10_000) for s in range(n)})
    # a shape whose plain Huffman depth exceeds 16 -> flat fallback
    cases.append({s: 2 ** s for s in range(30)})
    for freqs in cases:
        bits, ordered, codes = _canonical_table(freqs)
        assert set(ordered) == set(freqs)
        assert sum(bits) == len(freqs)
        max_len = max(length for _, length in codes.values())
        for sym, (code, length) in codes.items():
            if length == max_len:
                assert code != (1 << length) - 1, (
                    f"all-ones code at max length {length} "
                    f"assigned to real symbol {sym}"
                )
