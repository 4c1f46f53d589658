"""General as-of join: attach the latest (or next) state to each event.

The naive formulation — join on key + range predicate, then keep the
max-time match per left row — shuffles a candidate set that grows with
every (event, earlier-state) pair and re-sorts it per key: quadratic in
states-per-key. The scale-correct plan is the union+last_value idiom
(the same one the registered `asof_join` query uses, here generalized
to any schema): union both sides tagged, ONE hash shuffle on the key,
one ordered window pass that forward-fills the most recent right-side
payload, then keep the left rows. Cost is a single exchange of
|left| + |right| rows regardless of how many states precede each event.

Semantics match pandas.merge_asof (the differential oracle in
tests/test_asof_generic.py): direction="backward" attaches the right
row with the greatest on-value <= the left row's (ties included),
"forward" the smallest >= it; ``tolerance`` bounds |left.on -
matched.on|; unmatched left rows keep NULL right columns (left join).
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _warn_empty_by(op: str) -> None:
    """``by=[]`` is legitimate (a global as-of / global sessionization is
    a real use) but compiles to a SINGLE-PARTITION window — the one Spark
    plan shape this package otherwise refuses to produce silently (the
    flagship global sort is opt-in for the same reason). Warn loudly so
    nobody ships it at scale by accident."""
    warnings.warn(
        f"{op}: empty `by` serializes the whole input through ONE "
        "partition (a global window has no partition key). Fine for "
        "small inputs; at scale, pass a partitioning key or pre-bucket.",
        UserWarning,
        stacklevel=3,
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on numeric/orderable column
    ``on`` within ``by`` groups. Right-side columns (everything except
    ``on`` and ``by``) must not collide with left's — rename first
    (raises ValueError), so the output carries both unprefixed plus
    ``matched_on`` = the matched right row's on-value (NULL when
    unmatched; handy for lag/staleness features). NULL on-values never
    match (right) and never receive matches (left) — same policy as a
    SQL range predicate — but NULL-on LEFT rows are KEPT in the output
    with NULL right columns (row-count-preserving left-join semantics;
    they bypass the window pass entirely and union back at the end).

    ``by=[]`` (global as-of) is supported but warns: it serializes
    through a single-partition window.

    Determinism caveat: if the right side carries DUPLICATE (by, on)
    rows with different payloads, which one wins is partition-order-
    dependent (pandas merge_asof has the same hole — it picks by input
    order). Deduplicate the right side first (latest_per_key) when that
    matters; a payload-struct tiebreak can't be pushed into the window
    order here because payloads may contain unorderable types
    (arrays)."""
    if not list(by):
        _warn_empty_by("asof_join")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}"
        )
    by = list(by)
    right_payload = [c for c in right.columns if c != on and c not in by]
    clash = set(right_payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"right payload columns collide with left: {sorted(clash)} — "
            "rename before asof_join"
        )
    left_payload = [c for c in left.columns if c != on and c not in by]

    # one struct carries the whole right payload plus its on-value, so a
    # single last_value() forward-fills everything atomically (separate
    # last_value per column could mix rows if right has NULL cells)
    state = F.struct(
        F.col(on).alias("__t"), *[F.col(c) for c in right_payload]
    )
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        state.alias("__state"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
    )
    l_tagged = left.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__state"].dataType).alias("__state"),
        *left_payload,
    )
    # ties: the right row sorts BEFORE the left row at equal __on
    # (side 0 < 1), so "<=" ties are included, matching merge_asof
    order = [F.col("__on").asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__on").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).withColumn(
        "__match", F.last("__state", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col("__on") - F.col("__match.__t")
            if direction == "backward"
            else F.col("__match.__t") - F.col("__on")
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(tolerance), F.col("__match")),
        )
    matched = out.select(
        *by,
        F.col("__on").alias(on),
        *left_payload,
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
        F.col("__match.__t").alias("matched_on"),
    )
    # NULL-on left rows never match but ARE output rows (left-join,
    # row-count preserving — ADVICE r08): they skip the window pass and
    # union back here with NULL right columns. The union is plan-level
    # only — no extra exchange.
    null_left = left.filter(F.col(on).isNull()).select(
        *by,
        F.col(on),
        *left_payload,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_payload
        ],
        F.lit(None).cast(right.schema[on].dataType).alias("matched_on"),
    )
    return matched.unionByName(null_left)
