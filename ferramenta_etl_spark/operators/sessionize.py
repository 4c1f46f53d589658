"""Per-row gap-based sessionization.

Spark's built-in ``session_window`` is an AGGREGATE: it yields one row
per session, so labeling the original events with their session takes a
join back against the window bounds. For feature pipelines that need
the label ON each row (position-in-session, session-relative deltas,
sequence packing by session) the lag+cumsum idiom does it in one
ordered window pass over one hash exchange — no aggregate, no
join-back.

Gap semantics match session_window exactly (the differential test pins
them): an event STRICTLY more than ``gap`` after its predecessor starts
a new session; an event exactly ``gap`` later extends the current one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import _warn_empty_by


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str],
    gap: float | int,
    session_col: str = "session_idx",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add ``session_col``: a 1-based session index per ``by`` group,
    ordered by ``ts_col`` (numeric or timestamp — ``gap`` is in the
    column's own units: seconds for timestamps). Rows with NULL
    ``ts_col`` get a NULL session (no position in time = no session),
    mirroring how session_window's groupBy drops them.

    Determinism: the index is well-defined whenever (ts_col, tiebreak)
    is a total order within each group — pass id columns as
    ``tiebreak`` when timestamps can collide. (Equal-timestamp rows
    always land in the SAME session either way — a zero gap can't
    split them — so only downstream order-sensitive features need the
    tiebreak, not the labels themselves.)

    Shape: one hash exchange on ``by``, one per-partition sort, two
    window expressions (lag + running sum) in the same window — the
    same cost as any single window query, linear at any scale.
    ``by=[]`` (one global session stream) is supported but warns: it
    serializes through a single-partition window."""
    by = list(by)
    if not by:
        _warn_empty_by("sessionize")
    ts = F.col(ts_col)
    # timestamps subtract to INTERVAL; cast both sides to epoch seconds
    # so gap arithmetic is plain numeric for either column type
    tnum = (
        ts.cast("double")
        if dict(df.dtypes)[ts_col] not in ("timestamp", "timestamp_ntz")
        else ts.cast("timestamp").cast("double")
    )
    # NULL timestamps sort LAST: sorted first (Spark's asc default)
    # they would sit at the window's head and their prev.isNull()
    # increments would shift every real session index by one per NULL
    # row; last, they only follow the labeled rows and their own labels
    # are NULLed below
    order = [tnum.asc_nulls_last()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(tnum).over(w)
    new_session = F.when(
        prev.isNull() | ((tnum - prev) > F.lit(float(gap))), 1
    ).otherwise(0)
    idx = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col, F.when(ts.isNotNull(), idx.cast("long"))
    )


def _walk_events(ts_ms, vals, gap_ms: int, cap_ms: int, final_reason: str):
    """Session walk over one already-ordered event run: yields
    (start_ms, end_ms, n_events, cents, closed_by). Shared by the
    whole-user path and the gap-block path; semantics match the
    streaming kernel's transition order (the gap check wins when an
    event breaches both bounds — a run ending at a gap closes 'gap'
    even if the breaching event also breached the cap).

    VECTORIZED (r13): the naive form is a per-event Python loop — the
    dominant constant factor of the whole operator (SCALING.md
    hot-user probe: 900k events ≈ 3 s in ONE loop). Instead: gap
    boundaries come from one ``np.diff`` (unconditional splits), and
    inside a gap segment only CAP closes remain, each found by a
    ``searchsorted`` jump to the first event strictly past start+cap —
    so the Python-level iteration count is O(sessions), not O(events),
    and per-session sums come from one cents ``cumsum``. Bot bursts
    (many events, few sessions) are exactly where that gap is largest.

    ``final_reason`` closes the last open session: 'timeout' at true
    end-of-history, 'gap' when the caller knows a > gap interval
    follows this run (the gap-block path)."""
    import numpy as np

    m = len(ts_ms)
    if m == 0:
        return []
    ts = np.asarray(ts_ms, dtype=np.int64)
    v = np.asarray(vals, dtype=np.float64)
    # scaled-cents discipline (functions.tsql.sum2): floor(v*100+0.5) as
    # int64, non-finite -> 0; cumsum gives O(1) per-session sums
    cents = np.where(np.isfinite(v), np.floor(v * 100.0 + 0.5), 0.0).astype(
        np.int64
    )
    ccents = np.concatenate(([0], np.cumsum(cents)))
    breaks = np.flatnonzero(np.diff(ts) > gap_ms) + 1
    seg_starts = np.concatenate(([0], breaks))
    seg_ends = np.concatenate((breaks, [m]))
    out = []
    last_seg = len(seg_starts) - 1
    for si, (a, b) in enumerate(zip(seg_starts, seg_ends)):
        i = int(a)
        b = int(b)
        while i < b:
            s = int(ts[i])
            # first event STRICTLY past s+cap starts the next session;
            # an event exactly at s+cap extends (side='right')
            j = int(np.searchsorted(ts[i:b], s + cap_ms, side="right")) + i
            if j < b:
                reason = "cap"
            elif si < last_seg:
                reason = "gap"
            else:
                reason = final_reason
            out.append(
                (s, int(ts[j - 1]), j - i, int(ccents[j] - ccents[i]), reason)
            )
            i = j
    return out


def capped_sessions(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    max_duration: str = "2 hours",
    tiebreak: Sequence[str] = (),
    split_hot_users: bool | str = False,
    hot_user_events: int = 1_000_000,
    bucket: str = "1 day",
) -> DataFrame:
    """Batch replay of ``streaming.capped_sessions_stream``: per-user
    sessions that close on ``gap`` inactivity OR when the next event
    would land more than ``max_duration`` after the session start (the
    breaching event starts the next session); the final open session
    per user closes with ``closed_by='timeout'`` — exactly what the
    streaming operator emits once the watermark passes end-of-input.

    The cap makes this genuinely iterative (where one session ends
    determines where the next begins — see streaming/stateful.py), so
    no window expression can produce it. Batch shape: ONE hash exchange
    on ``user_col`` (``repartition``) + an Arrow-batched
    ``mapInPandas`` kernel that concatenates each PARTITION's batches
    once and walks its users with a pandas groupby — linear in events,
    one row per session out. mapInPandas over partitions rather than
    ``applyInPandas`` per group deliberately: event sessions mean MANY
    TINY groups (thousands of users, dozens of events each), and
    per-group Arrow round-trips dominated the per-partition form 2x
    (1.04 s vs 0.60 s on the sf0.1 fixture's 1.5k users). The kernel
    must gather ALL the partition's Arrow batches before grouping — a
    user's rows can span batch boundaries
    (arrow.maxRecordsPerBatch) — so per-task memory is one partition's
    events: size ``spark.sql.shuffle.partitions`` to the cluster as
    with any shuffle. Per-user memory beyond that is one state tuple.

    HOT-USER GUARD (r13, VERDICT r12 #2): hashing by ``user_col`` alone
    funnels a pathological user (bot traffic — 90 % of a day's events
    under one id) through ONE task. But any inter-event gap > ``gap``
    is an UNCONDITIONAL session boundary — both the gap close and the
    cap close reset state AT the breaching event — so a user's timeline
    decomposes at gap boundaries into independent "gap blocks" whose
    walks never interact. The split path labels those blocks WITHOUT
    ever sorting one user's whole history in one task (a plain window
    over ``user_col`` would — the same hot-key funnel, moved from the
    walk to the sort): (1) a lag+cumsum window over ``(user,
    time-bucket)`` — ``bucket`` wide, floored at max(gap, cap) — gives
    per-bucket LOCAL block ids, with partitions bounded by arrival rate
    x bucket, never by a user's total history; (2) the bucket SUMMARY
    (one row per active user-bucket — metadata scale) chains local ids
    into global ones with a per-user prefix sum, merging a bucket's
    first block into the previous bucket's last when the boundary
    interval is <= ``gap``; (3) the walk re-keys by ``(user, global
    block)`` and closes each block's final open session with ``'gap'``
    unless it is the user's LAST block (then ``'timeout'``) —
    bit-identical output to the sequential walk, pinned by
    ``tests/test_streaming.py``. Cost: one summary aggregation + a
    co-keyed join back. ``split_hot_users='auto'`` probes
    ``max(events per user)`` first (a map-side-combined count, cheap
    relative to the walk) and routes: below ``hot_user_events`` the
    original single-exchange plan runs; above it the block plan does.
    CAVEAT: the auto probe is an EAGER Spark job at plan-CONSTRUCTION
    time — it breaks the engine's plans-build-job-free contract
    (tests/test_plans.py) and re-scans the input once per plan build,
    which is why the DEFAULT is False (the single-exchange plan) and
    auto is opt-in for callers who don't know their skew and are
    building the plan once to execute it once. Callers who DO know
    (a bot-heavy clickstream) pass True. Residual bound, documented not
    hidden: a single block can still be long — a bot pinging faster
    than ``gap`` forever never splits — so the per-task walk is bounded
    by the longest gap-free BURST, not by the user's history; see
    SCALING.md "hot-user sessionization" for the 90 %-one-user probe.

    ``sum_value`` uses the scaled-cents discipline of
    ``functions.tsql.sum2`` (floor(v*100+0.5) accumulated as ints,
    /100 at close): order-independent and drift-free, so the result is
    a pure function of the data, not of partitioning — and a DuckDB
    recursive-CTE oracle can hash-match it. Non-finite values
    contribute 0 (the NULL-sum convention), mirroring the
    ``events_session_agg`` oracle's isfinite guard.

    Rows with NULL ``ts_col`` are dropped (no position in time = no
    session, the ``sessionize`` policy). Equal timestamps within a user
    need ``tiebreak`` columns for a deterministic walk order.
    """
    from ..streaming.stateful import SESSION_SCHEMA, _duration_ms

    gap_ms = _duration_ms(gap)
    cap_ms = _duration_ms(max_duration)
    sort_cols = [ts_col, *tiebreak]
    out_cols = [f.name for f in SESSION_SCHEMA.fields]

    base = df.filter(F.col(ts_col).isNotNull()).select(
        user_col, ts_col, value_col, *tiebreak
    )

    if split_hot_users == "auto":
        hottest = (
            base.groupBy(user_col).count().agg(F.max("count")).first()[0]
        )
        split = bool(hottest and hottest > hot_user_events)
    else:
        split = bool(split_hot_users)

    def session_row(user_id, s):
        start, last, n, cents, reason = s
        return {
            "user_id": user_id,
            "session_start_ms": start,
            "session_end_ms": last,
            "n_events": n,
            "sum_value": cents / 100.0,
            "closed_by": reason,
        }

    def make_walker(group_keys, final_reason):
        """One shared mapInPandas kernel for both paths; they differ
        ONLY in the grouping key and how the final open session's close
        reason is chosen (``final_reason(group_df) -> str``). Gather the
        WHOLE partition before grouping: a group's rows can span Arrow
        batch boundaries, and a per-batch walk would split sessions
        (the streaming kernel's gather-then-sort discipline)."""

        def walk(batches):
            import pandas as pd

            chunks = [p for p in batches if len(p)]
            if not chunks:
                yield pd.DataFrame(columns=out_cols)
                return
            pdf = pd.concat(chunks)
            out: list[dict] = []
            for gk, g in pdf.groupby(group_keys, dropna=False, sort=False):
                g = g.sort_values(sort_cols, kind="mergesort")
                ts_ms = (g[ts_col].astype("int64") // 1_000_000).to_numpy()
                vals = g[value_col].to_numpy()
                user_id = gk[0] if isinstance(gk, tuple) else gk
                for s in _walk_events(
                    ts_ms, vals, gap_ms, cap_ms, final_reason(g)
                ):
                    out.append(session_row(user_id, s))
            yield pd.DataFrame(out, columns=out_cols)

        return walk

    if not split:
        return base.repartition(user_col).mapInPandas(
            make_walker(user_col, lambda g: "timeout"), schema=SESSION_SCHEMA
        )

    # --- gap-block split path -------------------------------------------
    # Assign every event a globally-consistent gap-block id WITHOUT ever
    # sorting one user's whole history in one task (the window-over-user
    # form would — same hot-key funnel, just moved from the walk to the
    # sort). Two levels:
    #   1. window over (user, time-bucket): per-bucket local blocks via
    #      lag+cumsum — partitions bounded by events-per-user-per-bucket
    #      (arrival rate x bucket), never by a user's total history;
    #   2. the BUCKET SUMMARY (one row per active user-bucket — metadata
    #      scale) gets a per-user window that decides, from adjacent
    #      min/max timestamps, whether a bucket's first block continues
    #      the previous bucket's last block (C_b), and a prefix sum
    #      turns local ids into global ones:
    #          global = start_b + local − C_b,
    #          start_b = Σ_{b'<b} (n_blocks_b' − C_b').
    #      (C_b=1 makes bucket b's first block alias the previous
    #      bucket's last — one chained id across the boundary.)
    # The summary joins back on (user, bucket) — co-keyed with the pass-1
    # shuffle — and the walk re-keys by (user, global block).
    from ..functions.tsql import epoch_ms

    bucket_ms = max(_duration_ms(bucket), gap_ms, cap_ms)
    ms = epoch_ms(ts_col)
    ev = base.withColumn("_ms", ms).withColumn(
        "_bkt", (F.col("_ms") / F.lit(bucket_ms)).cast("long")
    )
    w1 = Window.partitionBy(user_col, "_bkt").orderBy(
        F.col("_ms").asc(), *[F.col(c).asc() for c in tiebreak]
    )
    prev = F.lag("_ms").over(w1)
    local_blk = F.sum(
        F.when(prev.isNull() | ((F.col("_ms") - prev) > F.lit(gap_ms)), 1)
        .otherwise(0)
    ).over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    labeled = ev.withColumn("_lblk", local_blk)

    summary = labeled.groupBy(user_col, "_bkt").agg(
        F.min("_ms").alias("_first_ms"),
        F.max("_ms").alias("_last_ms"),
        F.max("_lblk").alias("_nblk"),
    )
    w2 = Window.partitionBy(user_col).orderBy(F.col("_bkt").asc())
    cont = F.when(
        (F.col("_first_ms") - F.lag("_last_ms").over(w2)) <= F.lit(gap_ms), 1
    ).otherwise(0)
    summary = summary.withColumn("_cont", cont).withColumn(
        "_start",
        F.coalesce(
            F.sum(F.col("_nblk") - F.col("_cont")).over(
                w2.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("_last_bkt", F.lead("_bkt").over(w2).isNull())

    # null-safe on the user key: NULL user_id is a legal group for the
    # sequential path's dropna=False groupby, so the summary join must
    # not drop it
    joined = labeled.alias("e").join(
        summary.select(
            F.col(user_col).alias("_s_user"),
            F.col("_bkt").alias("_s_bkt"),
            "_cont",
            "_start",
            "_nblk",
            "_last_bkt",
        ),
        on=(
            F.col(f"e.{user_col}").eqNullSafe(F.col("_s_user"))
            & (F.col("e._bkt") == F.col("_s_bkt"))
        ),
        how="inner",
    ).withColumn(
        "_gblk", F.col("_start") + F.col("_lblk") - F.col("_cont")
    ).withColumn(
        "_final", F.col("_last_bkt") & (F.col("_lblk") == F.col("_nblk"))
    ).select(
        f"e.{user_col}", ts_col, value_col, *tiebreak, "_gblk", "_final"
    )

    return joined.repartition(user_col, "_gblk").mapInPandas(
        make_walker(
            [user_col, "_gblk"],
            lambda g: "timeout" if bool(g["_final"].any()) else "gap",
        ),
        schema=SESSION_SCHEMA,
    )
