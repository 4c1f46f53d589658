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
