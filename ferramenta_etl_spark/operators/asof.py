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

``asof_join_multi`` fuses SEVERAL as-of lookups (each with its own
right side, direction and tolerance) into that SAME single exchange:
all sides union once, the first window shuffles on the key, and every
further window is sort-only because Spark's Window only requires
ClusteredDistribution(by) — already satisfied by the first window's
output partitioning. This is the fix for the r9 `asof_join` bench
regression (VERDICT r09 #1): two chained generic calls paid two full
union+window shuffles; the fused form pays one, regardless of how many
right sides are attached.

Semantics match pandas.merge_asof (the differential oracle in
tests/test_asof_generic.py): direction="backward" attaches the right
row with the greatest on-value <= the left row's (ties included),
"forward" the smallest >= it, "nearest" whichever of the two is closer
(exact-distance ties go backward); ``tolerance`` bounds |left.on -
matched.on|; unmatched left rows keep NULL right columns (left join).
"nearest" costs one extra SORT-ONLY window over the same union — both
directional fills share the single exchange, like any further fused
spec.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence
from dataclasses import dataclass

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


@dataclass(frozen=True)
class AsofSpec:
    """One right side of a fused as-of join.

    ``tiebreak`` names an ORDERABLE right column used to break duplicate
    (by, on) right rows deterministically: the row with the SMALLEST
    tiebreak value wins. Without it, duplicate (by, on) right rows are
    partition-order-dependent (pandas merge_asof has the same hole — it
    picks by input order) and the caller must deduplicate first.
    ``matched_on`` names the output column carrying the matched right
    row's on-value (NULL when unmatched; handy for staleness features).
    """

    right: DataFrame
    direction: str = "backward"
    tolerance: float | int | None = None
    tiebreak: str | None = None
    matched_on: str = "matched_on"


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
    order). Deduplicate the right side first (latest_per_key), or pass
    a ``tiebreak`` column via :func:`asof_join_multi`, when that
    matters."""
    return asof_join_multi(
        left,
        [AsofSpec(right=right, direction=direction, tolerance=tolerance)],
        on=on,
        by=by,
    )


def asof_join_multi(
    left: DataFrame,
    specs: Sequence[AsofSpec],
    on: str,
    by: Sequence[str],
) -> DataFrame:
    """Fused as-of join: attach N right sides to ``left`` in ONE
    exchange. All sides union tagged; the first window hash-shuffles on
    ``by``; each subsequent window re-sorts locally but does NOT
    re-shuffle (Window preserves child partitioning and only requires
    ClusteredDistribution(by) — asserted by
    tests/test_asof_generic.py::test_asof_multi_single_exchange).

    Each spec's payload columns (everything in its right except ``on``
    and ``by``) must be disjoint from the left's columns, every other
    spec's payload, and every ``matched_on`` name — rename first
    (raises ValueError). Specs with a ``tiebreak`` resolve duplicate
    (by, on) right rows to the smallest tiebreak value (deterministic);
    specs without inherit merge_asof's partition-order dependence."""
    if not list(by):
        _warn_empty_by("asof_join_multi")
    by = list(by)
    specs = list(specs)
    if not specs:
        raise ValueError("asof_join_multi needs at least one AsofSpec")

    left_payload = [c for c in left.columns if c != on and c not in by]
    matched_names: list[str] = []
    payloads: list[list[str]] = []
    taken = set(left.columns)
    for i, s in enumerate(specs):
        if s.direction not in ("backward", "forward", "nearest"):
            raise ValueError(
                f"spec {i}: direction must be backward|forward|nearest, "
                f"got {s.direction!r}"
            )
        pay = [c for c in s.right.columns if c != on and c not in by]
        if s.tiebreak is not None and s.tiebreak not in pay:
            raise ValueError(
                f"spec {i}: tiebreak {s.tiebreak!r} is not a right payload"
                " column"
            )
        clash = (set(pay) | {s.matched_on}) & taken
        if clash:
            raise ValueError(
                f"spec {i}: output columns collide: {sorted(clash)} — "
                "rename before asof_join_multi"
            )
        taken |= set(pay) | {s.matched_on}
        if s.matched_on in matched_names:
            raise ValueError(f"duplicate matched_on name {s.matched_on!r}")
        matched_names.append(s.matched_on)
        payloads.append(pay)

    # one struct per right side carries its whole payload plus the
    # on-value, so a single last_value() forward-fills everything
    # atomically (separate last_value per column could mix rows when a
    # right payload has NULL cells)
    def _state_col(i: int, s: AsofSpec, pay: list[str]) -> F.Column:
        return F.struct(
            F.col(on).alias("__t"), *[F.col(c) for c in pay]
        ).alias(f"__state_{i}")

    state_types = {}
    branches = []
    for i, s in enumerate(specs):
        r = s.right.filter(F.col(on).isNotNull())
        cols = [*[F.col(c) for c in by], F.col(on).alias("__on"),
                F.lit(0).alias("__side")]
        proj = r.select(*cols, _state_col(i, s, payloads[i]))
        state_types[i] = proj.schema[f"__state_{i}"].dataType
        branches.append((i, s, proj))

    def _full_branch(i: int | None, base_cols: DataFrame) -> DataFrame:
        """Pad a branch out to the union schema: every state struct
        (null except its own), every tiebreak ordering column, and the
        left payload (null on right branches)."""
        out = base_cols
        for j, s in enumerate(specs):
            if j != i:
                out = out.withColumn(
                    f"__state_{j}", F.lit(None).cast(state_types[j])
                )
            # plain ordering twin of the tiebreak: window ORDER BY can't
            # reach inside a struct column that is NULL on other branches
            if s.tiebreak is not None:
                out = out.withColumn(
                    f"__tb_{j}",
                    F.col(f"__state_{j}.{s.tiebreak}")
                    if j == i
                    else F.lit(None).cast(
                        s.right.schema[s.tiebreak].dataType
                    ),
                )
        for c in left_payload:
            if i is not None:
                out = out.withColumn(
                    c, F.lit(None).cast(left.schema[c].dataType)
                )
        return out

    unioned = None
    for i, s, proj in branches:
        b = _full_branch(i, proj)
        unioned = b if unioned is None else unioned.unionByName(b)
    l_tagged = _full_branch(
        None,
        left.filter(F.col(on).isNotNull()).select(
            *[F.col(c) for c in by],
            F.col(on).alias("__on"),
            F.lit(1).alias("__side"),
            *left_payload,
        ),
    )
    unioned = unioned.unionByName(l_tagged, allowMissingColumns=False)

    def _fill(df: DataFrame, i: int, s: AsofSpec, backward: bool, dest: str):
        # ties: the right row sorts BEFORE the left row at equal __on
        # (side 0 < 1), so "<=" / ">=" ties are included, matching
        # merge_asof. With a tiebreak, duplicate (by, on) right rows
        # order largest-first so last_value picks the SMALLEST —
        # deterministic. Other specs' rows interleave but their
        # __state_i is NULL, so ignorenulls skips them regardless of
        # position.
        order = [
            F.col("__on").asc() if backward else F.col("__on").desc(),
            F.col("__side").asc(),
        ]
        if s.tiebreak is not None:
            order.append(F.col(f"__tb_{i}").desc_nulls_first())
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            dest, F.last(f"__state_{i}", ignorenulls=True).over(w)
        )

    filled = unioned
    for i, s in enumerate(specs):
        if s.direction == "nearest":
            # nearest = both fills over the SAME union rows (the extra
            # window re-sorts but does not re-shuffle, like any further
            # fused spec); the closer match is chosen after tolerance
            filled = _fill(filled, i, s, True, f"__match_{i}_b")
            filled = _fill(filled, i, s, False, f"__match_{i}_f")
        else:
            filled = _fill(
                filled, i, s, s.direction == "backward", f"__match_{i}"
            )

    out = filled.filter(F.col("__side") == 1)
    for i, s in enumerate(specs):
        if s.direction == "nearest":
            gap_b = F.col("__on") - F.col(f"__match_{i}_b.__t")
            gap_f = F.col(f"__match_{i}_f.__t") - F.col("__on")
            b = F.col(f"__match_{i}_b")
            f_ = F.col(f"__match_{i}_f")
            if s.tolerance is not None:
                b = F.when(gap_b <= F.lit(s.tolerance), b)
                f_ = F.when(gap_f <= F.lit(s.tolerance), f_)
            # closer side wins; exact ties go BACKWARD (merge_asof's
            # nearest rule, pinned by the pandas differential test)
            out = out.withColumn(
                f"__match_{i}",
                F.when(b.isNull(), f_)
                .when(f_.isNull(), b)
                .when(gap_b <= gap_f, b)
                .otherwise(f_),
            ).drop(f"__match_{i}_b", f"__match_{i}_f")
        elif s.tolerance is not None:
            gap = (
                F.col("__on") - F.col(f"__match_{i}.__t")
                if s.direction == "backward"
                else F.col(f"__match_{i}.__t") - F.col("__on")
            )
            out = out.withColumn(
                f"__match_{i}",
                F.when(gap <= F.lit(s.tolerance), F.col(f"__match_{i}")),
            )
    matched = out.select(
        *by,
        F.col("__on").alias(on),
        *left_payload,
        *[
            c
            for i, s in enumerate(specs)
            for c in (
                *[
                    F.col(f"__match_{i}.{p}").alias(p)
                    for p in payloads[i]
                ],
                F.col(f"__match_{i}.__t").alias(s.matched_on),
            )
        ],
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
            c
            for i, s in enumerate(specs)
            for c in (
                *[
                    F.lit(None)
                    .cast(s.right.schema[p].dataType)
                    .alias(p)
                    for p in payloads[i]
                ],
                F.lit(None)
                .cast(s.right.schema[on].dataType)
                .alias(s.matched_on),
            )
        ],
    )
    return matched.unionByName(null_left)


@dataclass(frozen=True)
class AsofRole:
    """One as-of lookup carved out of a SINGLE source relation (see
    :func:`asof_self_join`). ``predicate`` selects which source rows are
    this role's state rows; ``payload`` maps output column name ->
    expression evaluated on those rows; ``tiebreak`` (an orderable
    Column, e.g. the event id) resolves duplicate (by, on) state rows to
    the SMALLEST value deterministically."""

    predicate: "F.Column"
    payload: dict
    direction: str = "backward"
    tolerance: float | int | None = None
    tiebreak: "F.Column | None" = None
    matched_on: str = "matched_on"


def asof_self_join(
    source: DataFrame,
    on: str,
    by: Sequence[str],
    left_predicate: "F.Column",
    left_payload: dict,
    roles: Sequence[AsofRole],
    keep_null_on_left: bool = True,
) -> DataFrame:
    """As-of join where left AND all right sides are ROLES of one
    relation (the common event-log case: attach the latest signup and
    the next click to every purchase — all three are rows of `events`).

    ``asof_join_multi`` on three filters of the same table scans it
    once per branch plus once for the null-on bypass: R+2 scans of a
    table that is 100 TB in the motivating deployment. This operator
    tags roles with ``when()`` projections instead of a union, so the
    WHOLE plan is: ONE scan -> ONE hash exchange on ``by`` -> one
    local sort + window per role. Null-on left rows are kept inline
    (no bypass branch): both window orders place them where no state
    row precedes them in scan order (nulls-first in each direction),
    so they fill NULL without a second scan.

    Tie semantics match :func:`asof_join_multi` / pandas merge_asof:
    at equal ``on``, a state row is visible to the left row in both
    directions (ordering key ``state.isNull()`` puts states first in
    each window's scan order). Rows satisfying several role predicates
    (or a role's and the left's) are supported — one physical row
    carries all its tags through the single sort."""
    if not list(by):
        _warn_empty_by("asof_self_join")
    by = list(by)
    roles = list(roles)
    if not roles:
        raise ValueError("asof_self_join needs at least one AsofRole")
    taken = set(by) | {on} | set(left_payload)
    for i, r in enumerate(roles):
        if r.direction not in ("backward", "forward", "nearest"):
            raise ValueError(
                f"role {i}: direction must be backward|forward|nearest,"
                f" got {r.direction!r}"
            )
        clash = (set(r.payload) | {r.matched_on}) & taken
        if clash:
            raise ValueError(
                f"role {i}: output columns collide: {sorted(clash)}"
            )
        taken |= set(r.payload) | {r.matched_on}

    on_c = F.col(on)
    relevant = left_predicate
    for r in roles:
        relevant = relevant | (r.predicate & on_c.isNotNull())
    if not keep_null_on_left:
        relevant = relevant & on_c.isNotNull()

    cols = [*[F.col(c) for c in by], on_c.alias("__on"),
            left_predicate.alias("__is_left"),
            *[F.when(left_predicate, e).alias(name)
              for name, e in left_payload.items()]]
    for i, r in enumerate(roles):
        state = F.struct(
            on_c.alias("__t"),
            *[e.alias(name) for name, e in r.payload.items()],
        )
        cols.append(
            F.when(r.predicate & on_c.isNotNull(), state).alias(f"__state_{i}")
        )
        if r.tiebreak is not None:
            cols.append(
                F.when(r.predicate & on_c.isNotNull(), r.tiebreak)
                .alias(f"__tb_{i}")
            )
    tagged = source.filter(relevant).select(*cols)

    def _fill(df, i, r, backward, dest):
        # scan order per direction; null-on left rows sort FIRST either
        # way (nulls_first both directions) so no state precedes them
        order = [
            F.col("__on").asc_nulls_first()
            if backward
            else F.col("__on").desc_nulls_first(),
            # states before left rows at equal __on: ties included
            F.col(f"__state_{i}").isNull().asc(),
        ]
        if r.tiebreak is not None:
            # duplicate (by, on) states order largest-first so
            # last_value picks the SMALLEST tiebreak — deterministic
            order.append(F.col(f"__tb_{i}").desc_nulls_first())
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            dest, F.last(f"__state_{i}", ignorenulls=True).over(w)
        )

    filled = tagged
    for i, r in enumerate(roles):
        if r.direction == "nearest":
            # both fills over the same tagged rows — the extra window is
            # sort-only (same single exchange), mirroring asof_join_multi
            filled = _fill(filled, i, r, True, f"__match_{i}_b")
            filled = _fill(filled, i, r, False, f"__match_{i}_f")
        else:
            filled = _fill(
                filled, i, r, r.direction == "backward", f"__match_{i}"
            )

    out = filled.filter(F.col("__is_left"))
    for i, r in enumerate(roles):
        if r.direction == "nearest":
            gap_b = F.col("__on") - F.col(f"__match_{i}_b.__t")
            gap_f = F.col(f"__match_{i}_f.__t") - F.col("__on")
            b = F.col(f"__match_{i}_b")
            f_ = F.col(f"__match_{i}_f")
            if r.tolerance is not None:
                b = F.when(gap_b <= F.lit(r.tolerance), b)
                f_ = F.when(gap_f <= F.lit(r.tolerance), f_)
            # closer side wins; exact ties go backward (merge_asof)
            out = out.withColumn(
                f"__match_{i}",
                F.when(b.isNull(), f_)
                .when(f_.isNull(), b)
                .when(gap_b <= gap_f, b)
                .otherwise(f_),
            ).drop(f"__match_{i}_b", f"__match_{i}_f")
        elif r.tolerance is not None:
            gap = (
                F.col("__on") - F.col(f"__match_{i}.__t")
                if r.direction == "backward"
                else F.col(f"__match_{i}.__t") - F.col("__on")
            )
            out = out.withColumn(
                f"__match_{i}",
                F.when(gap <= F.lit(r.tolerance), F.col(f"__match_{i}")),
            )
    return out.select(
        *by,
        F.col("__on").alias(on),
        *left_payload,
        *[
            c
            for i, r in enumerate(roles)
            for c in (
                *[F.col(f"__match_{i}.{p}").alias(p) for p in r.payload],
                F.col(f"__match_{i}.__t").alias(r.matched_on),
            )
        ],
    )
