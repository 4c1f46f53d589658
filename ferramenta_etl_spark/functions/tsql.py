"""T-SQL-style scalar helpers the reference query relies on.

Each helper reproduces one expression idiom from the embedded T-SQL at
``Select de Importação de Dados.py:34-99`` (cited ``S:line``) as a Column
expression, so it stays JVM-side inside whole-stage codegen — no Python
UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def convert_103(col: Column | str) -> Column:
    """``CONVERT(VARCHAR(10), d, 103)`` -> ``dd/MM/yyyy`` (S:76, S:85-88)."""
    return F.date_format(col, "dd/MM/yyyy")


def convert_108(col: Column | str) -> Column:
    """``CONVERT(VARCHAR(8), t, 108)`` -> ``HH:mm:ss`` (S:85-88)."""
    return F.date_format(col, "HH:mm:ss")


def isnull(col: Column | str, default) -> Column:
    """T-SQL ``ISNULL(x, default)`` (S:80) == ``coalesce``."""
    c = F.col(col) if isinstance(col, str) else col
    d = default if isinstance(default, Column) else F.lit(default)
    return F.coalesce(c, d)


def concat_null_propagating(*cols: Column) -> Column:
    """T-SQL ``+`` string concat: NULL if ANY operand is NULL (S:85-88).

    Spark's ``concat`` already null-propagates, which is exactly the T-SQL
    semantic; ``concat_ws`` would silently skip NULLs and diverge
    (SURVEY.md §2 #23) — never use it for this.
    """
    return F.concat(*cols)


def dt_hr_concat(ts: Column | str) -> Column:
    """``CONVERT(...,103) + ' ' + CONVERT(...,108)`` (S:85-88).

    The testdata carries a single timestamp where the reference had a
    (date, time) pair (FIXTURES.md §B), so both halves derive from one
    column; null timestamp -> null composite, matching T-SQL.
    """
    return concat_null_propagating(convert_103(ts), F.lit(" "), convert_108(ts))


def round2_stable(col: Column) -> Column:
    """Cross-engine-stable 2-dp rounding for COMPUTED doubles (products,
    divisions). ``round(x, 2)`` differs between engines at half-cent
    boundaries (Spark rounds the exact decimal expansion of the double;
    DuckDB scales then rounds), so for derived values both the Spark plan
    and the oracle SQL use the identical two-step ``round(x*100)/100`` —
    the scaled value is bit-identical in both engines and integer rounding
    agrees (Spark HALF_UP == C round == half-away-from-zero, both signs).
    The trailing + 0.0 normalizes IEEE negative zero: DuckDB's round
    keeps -0.0 (std::round of -0.4 is -0.0), Spark's BigDecimal path
    drops the sign — adding +0.0 maps -0.0 to +0.0 in BOTH engines.
    Oracle-side mirror: (ROUND((x) * 100) / 100 + 0.0)."""
    return F.round(col * 100) / 100 + F.lit(0.0)


def round6_stable(col: Column) -> Column:
    """round2_stable's scale-then-round idiom at 6 dp — for computed
    doubles (interpolated quantiles, ratios) where plain round(x, 6)
    diverges between engines on half-ulp landings. Oracle-side mirror:
    (ROUND((x) * 1000000) / 1000000 + 0.0)."""
    return F.round(col * 1000000) / 1000000 + F.lit(0.0)


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since epoch with explicit truncation. Spark's
    ``unix_millis`` and DuckDB's ``epoch_ms`` disagree by 1 ms on
    microsecond-precision timestamps (round vs truncate); both sides of
    the oracle contract therefore use floor(epoch_us / 1000).

    The double cast (``timestamp_ntz`` then ``timestamp``) makes this
    total over TIMESTAMP_NTZ inputs (parquet ``timestamp[us]`` without tz
    infers as NTZ in Spark 4, and ``unix_micros`` rejects NTZ) while
    keeping numeric inputs a LOUD analysis error: Spark allows
    cast(BIGINT AS TIMESTAMP) — interpreting the value as SECONDS, which
    would silently corrupt a raw nanosAsLong ``ts`` column that skipped
    loader normalization — but forbids BIGINT -> TIMESTAMP_NTZ, so the
    unnormalized path fails at plan time instead. The session timezone is
    pinned to UTC, so TIMESTAMP <-> NTZ is a pure reinterpretation that
    agrees with DuckDB's naive-timestamp ``epoch_us``.

    The floor is EXACT integer math end to end: subtract the
    non-negative remainder (pmod), then divide through DECIMAL — Spark's
    decimal division is exact at this scale, and the final long cast
    truncates an already-integral value. Any double in the chain breaks
    at large |micros|: ``floor(micros / 1000.0)`` can land one ms high
    past ~year 2248 (quotient ulp), and even the subtracted numerator
    stops being representable past ~2^53. Oracle-side mirror (DuckDB
    ``//`` truncates toward zero, which equals floor here because the
    numerator is exactly divisible):
    ``(epoch_us(x) - ((epoch_us(x) % 1000) + 1000) % 1000) // 1000``."""
    c = F.col(col) if isinstance(col, str) else col
    micros = F.unix_micros(c.cast("timestamp_ntz").cast("timestamp"))
    floored = (micros - F.pmod(micros, F.lit(1000))).cast("decimal(20,0)")
    return (floored / F.lit(1000)).cast("long")


def money(col: Column | str, scale: int = 2) -> Column:
    """Round a double money column at the projection edge.

    The reference's money columns are NUMERIC (S:109-111); testdata uses
    double, so we round explicitly wherever a money value reaches an
    output schema to keep Spark/oracle value-hashes aligned
    (SURVEY.md §5.2 pitfall 2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)

def scaled_cents(col_expr: Column) -> Column:
    """A 2-dp double as an exact BIGINT cent count: ``floor(x*100 +
    0.5)``. For genuine 2-dp money, ``x*100`` lands within float
    epsilon of an integer, so this merely snaps representation error —
    and because BOTH engines evaluate the identical IEEE sequence
    (multiply, add, C/Java floor; the oracle twin is ``CAST(FLOOR(x *
    100 + 0.5) AS BIGINT)``), the derived integers agree bit-exactly
    for any double within long range (|x| < ~9.2e16; the oracle-fuzz
    suite plants half-cent landings, negatives, and 1e9 magnitudes).
    Beyond long range the engines diverge in FAILURE MODE, not value:
    Spark's FLOOR->long saturates at Long.MAX while DuckDB's
    FLOOR->BIGINT cast errors — money columns never approach that
    regime, but don't reuse this idiom for arbitrary-magnitude
    science floats. ``floor`` beats ``F.round`` here
    because Spark's HALF_UP round allocates a BigDecimal per row
    (measured 0.47 s -> 0.26 s on the group_agg scan stage at sf0.1).
    Non-finite inputs map to NULL first (matching what
    ``cast(decimal)`` used to do; an unguarded ``cast(NaN as long)`` is
    0 and ``cast(inf as long)`` clamps to Long.MAX — silent corruption,
    not null)."""
    finite = F.when(
        F.isnan(col_expr) | (F.abs(col_expr) == F.lit(float("inf"))), F.lit(None)
    ).otherwise(col_expr)
    return F.floor(finite * 100 + F.lit(0.5)).cast("long")


def sum2(col_expr) -> Column:
    """Order-independent SUM of a double money column via scaled-long
    accumulation: ``sum(cast(floor(x*100 + 0.5) as bigint)) / 100.0``. Exact
    (integer adds, no float drift), associative (map-side partial agg
    applies), and it stays in whole-stage-codegen integer arithmetic —
    measured ~3.7x faster than the previous ``decimal(18,2)``
    accumulator on the group_agg scan stage (0.96 s -> 0.26 s at sf0.1,
    where the single-row-group fixture serializes the map stage onto
    one core and the accumulator cost is fully visible). Capacity: a
    long holds ~9.2e16 currency units of cents — beyond any real money
    sum; the oracle twin is ``CAST(SUM(CAST(FLOOR(x*100 + 0.5) AS BIGINT)) AS
    DOUBLE)/100`` (sums < 2^53 are exact in the final double). Shared
    by all plans modules so the money-sum convention lives in one
    place."""
    return F.sum(scaled_cents(col_expr)) / F.lit(100.0)
