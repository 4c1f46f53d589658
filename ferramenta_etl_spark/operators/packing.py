"""Sequence packing: group token-bounded chunks into fixed-budget
training sequences (the pre-training "packing" step that turns a
curated corpus into dense ~budget-token model inputs).

Greedy in-order packing is inherently sequential — a bin boundary
depends on every size before it — so it cannot be a window expression.
The scale shape: hash-shard the corpus, pack each shard independently
with an Arrow-batched applyInPandas (the task-description-sanctioned
path for semantics Spark's operators can't express), and namespace
sequence ids by shard. Shards are the parallelism unit AND the memory
bound: each holds ~corpus/n_shards chunks, tunable; ordering inside a
shard is total (doc_id, chunk_idx), so the packing is deterministic
across reruns and input partitioning — the same property the sampling
module guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    chunks: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 256,
    token_col: str = "n_chunk_tokens",
    order_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Assign every chunk to a packed sequence: output = input columns +
    ``seq_id`` (global, shard-namespaced) + ``seq_tokens`` (the
    sequence's total).

    Guarantees: every chunk lands in exactly one sequence; a sequence
    exceeds ``budget_tokens`` only when a SINGLE chunk does (it gets a
    sequence of its own — callers that forbid this should re-chunk with
    chunk_tokens <= budget); packing is first-fit in (doc_id, chunk_idx)
    order within a shard, so consecutive chunks of one document stay
    adjacent whenever the budget allows.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    a, b = order_cols
    sharded = chunks.withColumn(
        "__shard", F.pmod(F.hash(F.col(a)), F.lit(n_shards)).cast("int")
    )
    out_schema = T.StructType(
        list(chunks.schema.fields)
        + [
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_tokens", T.LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values([a, b], kind="mergesort").reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        seq_local, acc = 0, 0
        seq_ids = []
        for n in pdf[token_col]:
            n = int(n)
            if acc > 0 and acc + n > budget_tokens:
                seq_local += 1
                acc = 0
            acc += n
            seq_ids.append(seq_local)
        pdf = pdf.drop(columns=["__shard"])
        # shard-namespaced global id: shard * 2^40 + local sequence
        pdf["seq_id"] = [(shard << 40) + s for s in seq_ids]
        pdf["seq_tokens"] = pdf.groupby("seq_id")[token_col].transform("sum")
        return pdf

    return sharded.groupBy("__shard").applyInPandas(pack, out_schema)
