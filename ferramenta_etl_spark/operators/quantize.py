"""Embedding quantization: int8 storage for 100 TB vector corpora.

A float64 Spark array costs ~8 bytes/dim on the wire and in parquet; a
100 TB corpus of 768-dim embeddings spends most of its bytes there.
Symmetric per-vector int8 quantization (`q = round(x * 127 / amax)`,
one float32 scale per vector) cuts storage and shuffle bytes ~4-8x
while keeping cosine rankings nearly intact — the standard first rung
of the vector-compression ladder (below PQ/OPQ, which need trained
codebooks).

Everything is a pure SQL projection (codegen, no UDF, no shuffle):
quantize/dequantize are map-only passes, and scoring against quantized
vectors runs the integer dot fold on tinyint arrays directly — the
scale factors multiply once per PAIR, not once per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Replace ``vec_col`` with (tinyint array, float scale). Zero
    vectors get scale 0 and an all-zero code (dequantizes to zeros).
    scale = amax/127, so dequantization is ``code * scale``."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    # scale MUST be a materialized column before the code transform: an
    # outer expression referenced inside a HOF lambda re-evaluates per
    # element (the amax fold would run dim times per row — measured 3x
    # on the whole quantized-topk bench entry; see hof-lambda trap notes
    # in operators/text._gram_zip)
    with_scale = df.withColumn(scale_col, (amax / F.lit(127.0)).cast("double"))
    scale = F.col(scale_col)
    # the guard must be "finite AND positive": NaN compares GREATER than
    # 0 in Spark, so a NaN amax (corrupt vector) would take the quantize
    # branch and abort on the tinyint cast. Non-finite vectors get
    # scale 0 + all-zero code — the downstream zero-norm policy then
    # drops them from every ranking.
    usable = scale > 0
    for bad in (F.isnan(scale), scale == F.lit(float("inf"))):
        usable = usable & ~bad
    code = F.when(usable, F.transform(
        v, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return (
        with_scale.withColumn(
            scale_col, F.when(usable, scale).otherwise(F.lit(0.0))
        )
        .withColumn(q_col, code)
        .drop(vec_col)
    )


def dequantize(q: Column, scale: Column) -> Column:
    """array<double> reconstruction: code * scale per element."""
    return F.transform(q, lambda c: c.cast("double") * scale)


def _int_dot(a: str, b: str) -> str:
    """Integer dot fold over two tinyint arrays — the accumulator stays
    a BIGINT (128*128*dim fits for any realistic dim), so the fold is
    pure integer codegen; the float scales enter once at the end."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    query_id_col: str = "query_id",
    query_q_col: str = "query_q",
    query_scale_col: str = "query_scale",
) -> DataFrame:
    """Brute-force cosine top-k entirely in the quantized domain.

    cos(a, b) ~= (Sa*Sb*intdot(qa, qb)) / (Sa*|qa| * Sb*|qb|) — the
    scales cancel, so the score is intdot/(|qa|*|qb|) on integer codes:
    the per-pair hot loop is an integer multiply-add fold, no float math
    until the final division. Same two-phase top-k + id tiebreak shape
    as the exact operator (operators/similarity.cosine_topk)."""
    from .topk import grouped_topk

    # zero-norm policy via the SCALE column: scale > 0 iff the code
    # vector is nonzero (the amax element always maps to +-127), so the
    # filter is an O(1) column test. Filtering on __cn itself would
    # duplicate the integer-dot fold (filter + projection both evaluate
    # it -- measured 2.5x on the bench entry).
    c = corpus.filter(F.col(scale_col) > 0).select(
        F.col(id_col),
        F.col(q_col),
        F.expr(f"sqrt(CAST({_int_dot(q_col, q_col)} AS DOUBLE))").alias("__cn"),
    )
    q = queries.filter(F.col(query_scale_col) > 0).select(
        F.col(query_id_col),
        F.col(query_q_col),
        F.expr(
            f"sqrt(CAST({_int_dot(query_q_col, query_q_col)} AS DOUBLE))"
        ).alias("__qn"),
    )
    sim = F.expr(
        f"round(CAST({_int_dot(query_q_col, q_col)} AS DOUBLE) / (__qn * __cn), 6)"
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col), F.col(id_col), sim.alias("sim")
    )
    order = [F.col("sim").desc(), F.col(id_col).asc()]
    return grouped_topk(scored, [query_id_col], order, k).select(
        query_id_col, id_col, "sim", "rnk"
    )
