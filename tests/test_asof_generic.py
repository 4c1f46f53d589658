"""Generalized as-of join vs pandas.merge_asof — the reference
implementation of the semantics — on randomized per-key event/state
streams, both directions, with and without tolerance."""

import numpy as np
import pandas as pd
import pytest

from ferramenta_etl_spark.operators.asof import asof_join


def _fixture(seed=7, n_left=60, n_right=40, n_keys=4):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 500, n_left).astype("int64"),
            "ev": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.integers(0, 500, n_right).astype("int64"),
            "price": np.round(rng.normal(100, 5, n_right), 3),
            "st": np.arange(n_right, dtype="int64"),
        }
    )
    # merge_asof needs unique (k, t) on the right for a deterministic
    # oracle (Spark's window picks the LAST right row at equal (k, t),
    # merge_asof the last by input order — sidestep the ambiguity)
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    return left, right


def _oracle(left, right, direction, tolerance=None):
    kw = dict(tolerance=tolerance) if tolerance is not None else {}
    m = pd.merge_asof(
        left.sort_values(["t", "ev"]).reset_index(drop=True),
        right.sort_values("t").reset_index(drop=True),
        on="t",
        by="k",
        direction=direction,
        **kw,
    )
    return {
        int(r.ev): (
            None if pd.isna(r.price) else float(r.price),
            None if pd.isna(r.st) else int(r.st),
        )
        for r in m.itertuples()
    }


@pytest.mark.parametrize(
    "direction,tolerance",
    [("backward", None), ("backward", 25), ("forward", None), ("forward", 25),
     ("nearest", None), ("nearest", 25)],
)
def test_matches_pandas_merge_asof(spark, direction, tolerance):
    left, right = _fixture()
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {
        int(r.ev): (
            None if r.price is None else round(float(r.price), 3),
            None if r.st is None else int(r.st),
        )
        for r in asof_join(
            ldf, rdf, on="t", by=["k"],
            direction=direction, tolerance=tolerance,
        ).collect()
    }
    want = _oracle(left, right, direction, tolerance)
    assert set(got) == set(want)
    mismatches = {e: (got[e], want[e]) for e in want if got[e] != want[e]}
    assert not mismatches, mismatches
    # matched rows exist in both directions on this fixture
    assert any(v[0] is not None for v in got.values())
    assert any(v[0] is None for v in got.values()) or tolerance is None


def test_asof_join_guards_and_staleness(spark):
    left, right = _fixture()
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, on="t", by=["k"], direction="sideways")
    with pytest.raises(ValueError, match="collide"):
        asof_join(ldf, ldf.withColumnRenamed("t", "t2"), on="t2", by=["k"])
    out = asof_join(ldf, rdf, on="t", by=["k"]).collect()
    # matched_on carries the matched state's time: never in the future
    for r in out:
        if r.matched_on is not None:
            assert r.matched_on <= r.t
    # NULL on-values never match but ARE kept with NULL right columns
    # (row-count-preserving left join — ADVICE r08)
    ln = spark.createDataFrame(
        pd.DataFrame({"k": [0], "t": [pd.NA], "ev": [999]}).astype(
            {"t": "Int64"}
        )
    )
    rows = asof_join(ln, rdf, on="t", by=["k"]).collect()
    assert len(rows) == 1
    assert rows[0].ev == 999 and rows[0].t is None
    assert rows[0].price is None and rows[0].matched_on is None


def test_asof_preserves_left_row_count_with_null_on(spark):
    """Mixed NULL/non-NULL on-values: output row count == left row
    count, NULL-on rows carry NULL match, non-NULL rows still match."""
    left, right = _fixture()
    left.loc[left.index[:7], "t"] = pd.NA
    ldf = spark.createDataFrame(left.astype({"t": "Int64"}))
    rdf = spark.createDataFrame(right)
    out = asof_join(ldf, rdf, on="t", by=["k"]).collect()
    assert len(out) == len(left)
    null_rows = [r for r in out if r.t is None]
    assert len(null_rows) == 7
    assert all(r.price is None and r.matched_on is None for r in null_rows)
    assert any(r.price is not None for r in out)


def test_asof_empty_by_warns_single_partition(spark):
    """VERDICT r08 #5: by=[] compiles to a single-partition window —
    legitimate (global as-of) but must warn loudly."""
    left, right = _fixture(n_keys=1)
    ldf = spark.createDataFrame(left.drop(columns=["k"]))
    rdf = spark.createDataFrame(right.drop(columns=["k"]).drop_duplicates(["t"]))
    with pytest.warns(UserWarning, match="ONE\\s+partition"):
        out = asof_join(ldf, rdf, on="t", by=[])
    assert out.count() == len(ldf.collect())


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    lt=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                min_size=1, max_size=12),
    rt=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)),
                min_size=1, max_size=10),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 5]),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_matches_merge_asof_randomized(spark, lt, rt, direction, tol):
    """Randomized (key, time) streams vs pandas merge_asof — shape
    diversity beyond the seeded fixture (duplicate times across keys,
    single-row sides, all-misses under tolerance)."""
    left = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lt)],
        columns=["k", "t", "ev"],
    ).astype("int64")
    right = (
        pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(rt)],
            columns=["k", "t", "st"],
        )
        .astype("int64")
        .drop_duplicates(["k", "t"], keep="last")
        .reset_index(drop=True)
    )
    got = {
        int(r.ev): (None if r.st is None else int(r.st))
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", by=["k"], direction=direction, tolerance=tol,
        ).collect()
    }
    kw = dict(tolerance=tol) if tol is not None else {}
    m = pd.merge_asof(
        left.sort_values(["t", "ev"]).reset_index(drop=True),
        right.sort_values("t").reset_index(drop=True),
        on="t", by="k", direction=direction, **kw,
    )
    want = {
        int(r.ev): (None if pd.isna(r.st) else int(r.st))
        for r in m.itertuples()
    }
    assert got == want


def test_asof_multi_single_exchange_and_matches_chained(spark):
    """asof_join_multi fuses N right sides into ONE hash exchange
    (VERDICT r09 #1): the physical plan must contain exactly one
    `Exchange hashpartitioning` regardless of spec count, and the
    result must equal the chained two-pass formulation row for row —
    including tolerance drop and the min-tiebreak resolution of
    duplicate (k, t) right rows."""
    from ferramenta_etl_spark.operators.asof import AsofSpec, asof_join_multi

    left, right = _fixture(seed=11)
    # duplicate (k, t) right rows on purpose: tiebreak must resolve them
    dup = right.copy()
    dup["st"] = dup["st"] + 10_000
    right_dup = pd.concat([right, dup], ignore_index=True)
    ldf = spark.createDataFrame(left)
    r1 = spark.createDataFrame(
        right_dup.rename(columns={"price": "p1", "st": "s1"})
    )
    r2 = spark.createDataFrame(
        right_dup.rename(columns={"price": "p2", "st": "s2"})
    )
    fused = asof_join_multi(
        ldf,
        [
            AsofSpec(right=r1, direction="backward", tolerance=25,
                     tiebreak="s1", matched_on="m1"),
            AsofSpec(right=r2, direction="forward", tiebreak="s2",
                     matched_on="m2"),
        ],
        on="t",
        by=["k"],
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan

    # chained reference: dedup right to min-tiebreak first (the generic
    # single-spec contract), then two sequential generic calls
    from pyspark.sql import functions as F

    r1d = r1.groupBy("k", "t").agg(
        F.min_by(F.struct("p1", "s1"), "s1").alias("s")
    ).select("k", "t", "s.p1", "s.s1")
    r2d = r2.groupBy("k", "t").agg(
        F.min_by(F.struct("p2", "s2"), "s2").alias("s")
    ).select("k", "t", "s.p2", "s.s2")
    step1 = asof_join(
        ldf, r1d, on="t", by=["k"], direction="backward", tolerance=25
    ).withColumnRenamed("matched_on", "m1")
    step2 = asof_join(
        step1, r2d, on="t", by=["k"], direction="forward"
    ).withColumnRenamed("matched_on", "m2")

    key = lambda r: (r["k"], r["t"], r["ev"])
    got = {key(r): (r["p1"], r["s1"], r["m1"], r["p2"], r["s2"], r["m2"])
           for r in fused.collect()}
    want = {key(r): (r["p1"], r["s1"], r["m1"], r["p2"], r["s2"], r["m2"])
            for r in step2.collect()}
    assert got == want
    assert len(got) == len(left)


def test_asof_self_join_single_scan_matches_multi(spark):
    """asof_self_join tags roles of ONE relation instead of unioning
    filtered branches: the plan must read the source ONCE and exchange
    ONCE, and agree row-for-row with asof_join_multi over the
    equivalent filtered right sides (tiebreaks included). Also checks
    null-on left rows are kept inline with NULL matches."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.asof import (
        AsofRole,
        AsofSpec,
        asof_join_multi,
        asof_self_join,
    )

    left, right = _fixture(seed=13)
    ev = pd.concat(
        [
            left.assign(kind="L").rename(columns={"ev": "id"}),
            right.assign(kind="A")
            .rename(columns={"st": "id"})
            .drop(columns=["price"]),
            right.assign(kind="B", id=right["st"] + 5000)
            .rename(columns={"st": "drop"})
            .drop(columns=["price", "drop"]),
        ],
        ignore_index=True,
    )
    # a couple of null-on left rows: must survive with NULL matches
    ev = pd.concat(
        [ev, pd.DataFrame({"k": [0, 1], "t": [pd.NA, pd.NA],
                           "id": [9001, 9002], "kind": ["L", "L"]})],
        ignore_index=True,
    )
    ev["t"] = ev["t"].astype("Int64")
    src = spark.createDataFrame(ev)
    kind = F.col("kind")
    fused = asof_self_join(
        src,
        on="t",
        by=["k"],
        left_predicate=kind == "L",
        left_payload={"ev": F.col("id")},
        roles=[
            AsofRole(predicate=kind == "A", payload={"a_id": F.col("id")},
                     direction="backward", tolerance=25,
                     tiebreak=F.col("id"), matched_on="ma"),
            AsofRole(predicate=kind == "B", payload={"b_id": F.col("id")},
                     direction="forward", tiebreak=F.col("id"),
                     matched_on="mb"),
        ],
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Scan ExistingRDD") <= 1, plan

    ldf = src.filter(kind == "L").select("k", "t", F.col("id").alias("ev"))
    ra = src.filter(kind == "A").select("k", "t", F.col("id").alias("a_id"))
    rb = src.filter(kind == "B").select("k", "t", F.col("id").alias("b_id"))
    ref = asof_join_multi(
        ldf,
        [
            AsofSpec(right=ra, direction="backward", tolerance=25,
                     tiebreak="a_id", matched_on="ma"),
            AsofSpec(right=rb, direction="forward", tiebreak="b_id",
                     matched_on="mb"),
        ],
        on="t",
        by=["k"],
    )
    key = lambda r: (r["k"], r["t"], r["ev"])
    got = {key(r): (r["a_id"], r["ma"], r["b_id"], r["mb"])
           for r in fused.collect()}
    want = {key(r): (r["a_id"], r["ma"], r["b_id"], r["mb"])
            for r in ref.collect()}
    assert got == want
    assert got[(0, None, 9001)] == (None, None, None, None)
    assert got[(1, None, 9002)] == (None, None, None, None)


def test_asof_self_join_nearest_matches_multi(spark):
    """A nearest ROLE in the single-scan operator: still one scan and
    one exchange (the second directional fill is sort-only), and
    row-for-row equal to asof_join_multi's nearest spec — which the
    pandas differential already pins."""
    from pyspark.sql import functions as F

    from ferramenta_etl_spark.operators.asof import (
        AsofRole,
        AsofSpec,
        asof_join_multi,
        asof_self_join,
    )

    left, right = _fixture(seed=29)
    ev = pd.concat(
        [
            left.assign(kind="L").rename(columns={"ev": "id"}),
            right.assign(kind="A")
            .rename(columns={"st": "id"})
            .drop(columns=["price"]),
        ],
        ignore_index=True,
    )
    ev["t"] = ev["t"].astype("Int64")
    src = spark.createDataFrame(ev)
    kind = F.col("kind")
    fused = asof_self_join(
        src,
        on="t",
        by=["k"],
        left_predicate=kind == "L",
        left_payload={"ev": F.col("id")},
        roles=[
            AsofRole(predicate=kind == "A", payload={"a_id": F.col("id")},
                     direction="nearest", tolerance=25,
                     tiebreak=F.col("id"), matched_on="ma"),
        ],
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Scan ExistingRDD") <= 1, plan

    ldf = src.filter(kind == "L").select("k", "t", F.col("id").alias("ev"))
    ra = src.filter(kind == "A").select("k", "t", F.col("id").alias("a_id"))
    ref = asof_join_multi(
        ldf,
        [AsofSpec(right=ra, direction="nearest", tolerance=25,
                  tiebreak="a_id", matched_on="ma")],
        on="t",
        by=["k"],
    )
    key = lambda r: (r["k"], r["t"], r["ev"])
    got = {key(r): (r["a_id"], r["ma"]) for r in fused.collect()}
    want = {key(r): (r["a_id"], r["ma"]) for r in ref.collect()}
    assert got == want and len(got) > 0
    # the nearest match is genuinely two-sided on this fixture: some
    # matched_on values sit after their left row, some before
    after = sum(1 for (_, t, _e), (_, m) in got.items()
                if m is not None and t is not None and m > t)
    before = sum(1 for (_, t, _e), (_, m) in got.items()
                 if m is not None and t is not None and m < t)
    assert after > 0 and before > 0
