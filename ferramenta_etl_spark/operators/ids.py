"""Scalable row-ID assignment for corpus construction.

Training-data pipelines constantly need document ids — embedding-matrix
row indices, shard-local offsets, join keys for fixture-less corpora.
The naive Spark answers both fail at 100 TB: ``row_number() OVER ()``
is a single-partition global sort (one task sees every row), and
``monotonically_increasing_id`` is neither dense nor stable (ids jump
by 2^33 between partitions and change with partitioning). Two honest
alternatives:

- ``dense_ids``: exactly 0..N-1, assigned with ONE metadata-scale count
  job (per-partition row counts -> driver offsets, numPartitions rows)
  plus one narrow map — no shuffle, no global sort. Ids follow the
  current partition layout: deterministic for a fixed input layout
  (re-running on the same files gives the same ids) but NOT stable
  under repartitioning — the documented contract, same class as
  ``zipWithIndex``. Use when the requirement is "dense and unique
  now" (matrix rows, shard offsets).
- ``content_ids``: ``xxhash64`` of the content columns — stable across
  partitioning, reruns, and engines, NOT dense, and collides with
  probability ~n²/2^65 (≈2.7e-9 at a billion rows). ``id_collisions``
  is the audit: the colliding groups, metadata-sized unless something
  is actually wrong. Use when the requirement is "the same document
  always gets the same id".

The two compose: content id for identity, dense id for layout.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame, id_col: str = "row_id", checkpoint: bool = False
) -> DataFrame:
    """Append ``id_col``: dense 0..N-1 longs in partition-then-row
    order. Cost: one count-by-partition job (numPartitions result rows)
    + one narrow mapInPandas — the input is scanned twice but never
    shuffled. The two scans must see the same rows per partition: pass
    ``checkpoint=True`` to pin nondeterministic lineage (shuffles with
    ties, sampling, current-timestamp filters) via an eager
    localCheckpoint before counting — same playbook as ``train_bpe``.
    Either way the assign pass re-verifies each partition's row count
    against the counted value and raises loudly on a shift (the silent
    failure mode is ids that are duplicated/non-dense); a partition
    that counted non-empty but arrives EMPTY on the second scan is the
    one shift this per-partition check cannot see — that is what
    ``checkpoint=True`` is for. The id column is appended LAST in the
    schema."""
    if id_col in df.columns:
        raise ValueError(f"column {id_col!r} already exists")
    if "__pid" in df.columns:
        # the same loud failure as an id_col clash — silently
        # overwriting and dropping a caller's column is worse
        raise ValueError("dense_ids reserves the column name '__pid'")
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    tagged = df.withColumn("__pid", F.spark_partition_id())
    counts = dict(
        tagged.groupBy("__pid").count().collect()
    )  # numPartitions rows — metadata-scale by construction
    offsets = {}
    acc = 0
    # sorted() is LOAD-BEARING for the determinism contract, not for
    # uniqueness (disjoint offsets are dense+unique in any order): the
    # counts arrive in collect() order, which Spark does not pin across
    # runs — iterating unsorted would assign different ids per run
    # (mutation-tested: the uniqueness tests can't catch it because
    # in-session collect order happens to be stable)
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    from pyspark.sql.types import StructType

    # copy before .add: StructType.add MUTATES in place, and df.schema
    # is the DataFrame's cached instance — appending to it directly
    # would corrupt the INPUT's visible schema
    out_schema = StructType(list(df.schema.fields)).add(id_col, "long", False)

    def assign(it: Iterator) -> Iterator:
        seen = 0
        pid = None
        base = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if base is None:
                # every row of a mapInPandas partition shares one pid
                pid = int(pdf["__pid"].iloc[0])
                base = offsets[pid]
            out = pdf.drop(columns=["__pid"])
            out[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield out
        # post-hoc guard: the offsets were sized from scan 1's counts;
        # if nondeterministic lineage shifted this partition's row
        # count between the two jobs, the ids just assigned overlap the
        # next partition's range (or leave a hole) — fail loudly
        # instead. (A brand-new pid already KeyErrors on offsets[].)
        if pid is not None and seen != counts[pid]:
            raise ValueError(
                f"dense_ids: partition {pid} had {counts[pid]} rows at "
                f"count time but {seen} at assign time — input lineage "
                "is nondeterministic; rerun with checkpoint=True"
            )

    return tagged.mapInPandas(assign, out_schema)


def content_ids(
    df: DataFrame,
    cols: Sequence[str],
    id_col: str = "content_id",
) -> DataFrame:
    """Append ``id_col``: xxhash64 over ``cols`` — stable across
    partitioning/reruns/engines (the id IS a pure function of content).
    Distinct contents collide with ~n²/2^65 probability; run
    ``id_collisions`` before trusting the ids as unique keys."""
    if not cols:
        raise ValueError("content_ids needs at least one content column")
    if id_col in df.columns:
        raise ValueError(f"column {id_col!r} already exists")
    return df.withColumn(id_col, F.xxhash64(*[F.col(c) for c in cols]))


def id_collisions(
    df: DataFrame,
    cols: Sequence[str],
    id_col: str = "content_id",
) -> DataFrame:
    """(id, n_contents) for ids held by MORE THAN ONE distinct content —
    the ``content_ids`` audit. Empty means the ids are safe as unique
    keys for this corpus; one groupBy exchange on the id, output sized
    by actual collisions (normally zero rows)."""
    return (
        df.groupBy(F.col(id_col))
        .agg(
            F.count_distinct(*[F.col(c) for c in cols]).alias("n_contents")
        )
        .filter(F.col("n_contents") > 1)
    )
