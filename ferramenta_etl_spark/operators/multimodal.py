"""Multimodal (image/audio/video) column plumbing.

Media is modeled as an opaque ``binary`` column plus typed metadata —
the Spark-side machinery (schema, Arrow batching, mapInPandas signature,
partitioning) is real and tested; the codec step is a deterministic fake
behind ``decode_media``, clearly marked, because no image/audio libraries
exist in this container. Swap ``_fake_decode`` for PIL/librosa/pyav calls
and nothing else changes.

Design points for 100 TB:
- bytes never leave the JVM except through Arrow record batches
  (``mapInPandas``), sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- feature extraction is embarrassingly parallel: no shuffle at all —
  output partitioning == input partitioning;
- metadata lives in fixed columns (not a map) so Parquet stats/pruning
  apply to e.g. ``byte_len`` range filters.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: UTF-8 bytes of the
    text stand in for encoded media; type assigned round-robin. The fake
    container metadata (``n_frames``) is derived deterministically from
    byte length — what a real demuxer would read from the header."""
    media = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        media.alias("media"),
        # pmod, not %: Spark's % keeps the dividend's sign, so a
        # negative doc_id would index element_at at 0 (runtime error) or
        # negatively (silent from-the-end lookup); null ids stay null
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.pmod(F.col("doc_id"), F.lit(len(MEDIA_TYPES))) + 1).cast("int"),
        ).alias("media_type"),
        (F.length(media) / 40 + 1).cast("int").alias("n_frames"),
    )


def _fake_decode(media_type: str, raw: bytes | None) -> dict:
    """FAKE CODEC — deterministic stand-in for image/audio/video decode.
    Real implementation would dispatch to PIL / soundfile / pyav here.
    Kept arithmetic-only so oracles can reproduce it. A NULL payload
    (failed upstream fetch) yields all-null features — one bad row must
    not TypeError the whole Arrow batch."""
    if raw is None:
        return {"byte_len": None, "width": None, "height": None, "checksum": None}
    n = len(raw)
    return {
        "byte_len": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "checksum": sum(raw[:64]) % (1 << 31),  # real byte access
    }


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    The UDF sees pandas DataFrames of (doc_id, media, media_type); bytes
    arrive as Python ``bytes`` through Arrow with zero row-at-a-time
    pickling. Narrow op: no shuffle.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            feats = [
                _fake_decode(mt, raw)
                for mt, raw in zip(pdf["media_type"], pdf["media"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def letterbox_dims(
    width: Column | str,
    height: Column | str,
    target_w: int,
    target_h: int,
) -> Column:
    """Aspect-preserving fit-inside-box geometry as a pure JVM-side
    expression: struct(out_w, out_h) with the larger relative dimension
    pinned to the box and the other scaled, floor-rounded, floored at 1.
    This is the real distributed piece of a resize pipeline — per-image
    target geometry at scan speed — with only the pixel resampling left
    to the codec stub below."""
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    scale = F.least(
        F.lit(float(target_w)) / w.cast("double"),
        F.lit(float(target_h)) / h.cast("double"),
    )
    out_w = F.greatest(F.floor(w.cast("double") * scale), F.lit(1)).cast("long")
    out_h = F.greatest(F.floor(h.cast("double") * scale), F.lit(1)).cast("long")
    return F.struct(out_w.alias("out_w"), out_h.alias("out_h"))


def frame_sample_schedule(
    media_df: DataFrame,
    every_n: int = 30,
    n_frames_col: str = "n_frames",
    id_col: str = "doc_id",
) -> DataFrame:
    """The sampling PLAN for video frame extraction: one (doc_id,
    frame_idx) row per frame to decode — every ``every_n``-th frame,
    always including frame 0. A JVM-side sequence+explode projection
    (no shuffle, no Python): at 100 TB the schedule is what Spark
    parallelizes and prunes; the codec stub below consumes it.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    # media with no frames (n_frames <= 0) or unknown frame count (NULL)
    # schedules NOTHING — the old greatest(n-1, 0) clamp told the decoder
    # to fetch frame 0 of a zero-frame container, and a NULL count was
    # silently dropped by the inner explode with no visible policy
    idx = F.when(
        F.col(n_frames_col) >= 1,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
    )
    return (
        media_df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))
        .select(id_col, F.col("frame_idx").cast("int").alias("frame_idx"))
    )


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — STUB: the container has no imaging library.
    The Spark plumbing (signature, schema) is the real contract;
    target geometry comes from letterbox_dims."""

    def batches(it: Iterator) -> Iterator:
        raise NotImplementedError(
            "resize requires an imaging library (PIL/opencv) not present "
            "in this environment; plug the codec into this mapInPandas body"
        )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )
    return media_df.mapInPandas(batches, schema)


def frame_sample_stub(media_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB (no pyav in container); contract only."""

    def batches(it: Iterator) -> Iterator:
        raise NotImplementedError(
            "frame sampling requires pyav/ffmpeg, not present in this "
            "environment; plug the demuxer into this mapInPandas body"
        )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media_df.mapInPandas(batches, schema)
