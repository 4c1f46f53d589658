"""The transaction-log ACID MERGE backend (sinks/txlog.py): the
executed counterpart of the reference's ON CONFLICT DO NOTHING under
concurrent writers (S:214-218). Covers the commit protocol (atomic
version publish, OCC retry), snapshot isolation (orphans invisible),
checkpoint compaction, stats-pruned conflict checks, vacuum, schema
contract, and — the reason this backend exists — a concurrent-append
race in which two writers with overlapping keys both commit and no key
is ever double-inserted."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.sinks import (
    history_txlog,
    is_txlog_table,
    read_txlog,
    snapshot_txlog,
    vacuum_txlog,
    write_ignore_conflicts,
    write_merge_txlog,
)
from ferramenta_etl_spark.sinks.txlog import (
    CHECKPOINT_INTERVAL,
    _batch_bounds,
    _overlaps,
    _write_batch,
)
from ferramenta_etl_spark.sources.tables import SchemaContractError


def _rows(spark, path):
    return {(r.k, r.v) for r in read_txlog(spark, path).collect()}


def test_nan_double_key_never_pruned_into_double_insert(spark, tmp_path):
    """r13 code-review finding: parquet footer min/max EXCLUDE NaN, so
    a file holding a NaN key reads as [1.0, 5.0] while Spark's NaN <=>
    NaN MATCHES — a batch whose non-NaN range is disjoint ([10.0, 10.0])
    would prune the file and double-insert the NaN key. The fix treats
    batch NaN like NULL (pruning disabled on that column)."""
    nan = float("nan")
    target = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1.0, "a"), (5.0, "b"), (nan, "n1")], "k double, v string"
    )
    df2 = spark.createDataFrame(
        [(10.0, "c"), (nan, "n2")], "k double, v string"
    )
    assert write_ignore_conflicts(df1, target, keys=["k"], backend="txlog") == 3
    # only 10.0 is new: the NaN key must be seen as a conflict even
    # though every file's stats range excludes it
    assert write_ignore_conflicts(df2, target, keys=["k"], backend="txlog") == 1
    got = read_txlog(spark, target).collect()
    assert len(got) == 4
    import math as _m

    assert sum(1 for r in got if _m.isnan(r.k)) == 1  # n1 won, n2 skipped
    # and the bounds helper itself reports the column unusable
    assert _batch_bounds(df2, ["k"]) == {}


def test_roundtrip_idempotent_rerun(spark, tmp_path):
    """First-writer-wins semantics end-to-end through the public sink
    API: overlapping second batch inserts only the new key; exact
    re-run inserts 0 (≙ S:217)."""
    target = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k int, v string")
    assert write_ignore_conflicts(df1, target, keys=["k"], backend="txlog") == 2
    assert write_ignore_conflicts(df2, target, keys=["k"], backend="txlog") == 1
    assert write_ignore_conflicts(df2, target, keys=["k"], backend="txlog") == 0
    assert _rows(spark, target) == {(1, "a"), (2, "b"), (3, "c")}
    assert snapshot_txlog(spark, target).version == 2  # 0-insert run: no commit
    hist = history_txlog(spark, target)
    assert [h["inserted"] for h in hist] == [1, 2]  # newest first
    assert is_txlog_table(spark, target)


def test_in_batch_dedup_and_quarantine_compose(spark, tmp_path):
    """The sink-level dedup and quarantine stages run BEFORE the txlog
    commit, exactly as on the parquet backend."""
    target = str(tmp_path / "t")
    qdir = str(tmp_path / "bad")
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (None, "bad"), (2, "y")], "k int, v string"
    )
    n = write_ignore_conflicts(
        df, target, keys=["k"], backend="txlog", bad_records_path=qdir
    )
    assert n == 2
    assert _rows(spark, target) == {(1, "x"), (2, "y")}
    assert spark.read.parquet(qdir).count() == 1


def test_naive_parquet_read_sees_nothing(spark, tmp_path):
    """The whole table lives under the hidden _txlog dir: a naive
    spark.read.parquet(table) can NEVER observe rows — committed,
    in-flight, or orphaned — so there is no partial-state window for
    foreign readers (the isolation half of ACID)."""
    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    write_merge_txlog(df, target, keys=["k"])
    with pytest.raises(Exception, match="UNABLE_TO_INFER_SCHEMA"):
        spark.read.parquet(target).count()


def test_orphaned_files_invisible_and_vacuumed(spark, tmp_path):
    """Data files without a manifest reference (a crashed writer, a
    lost OCC race) are invisible to reads and reclaimed by vacuum —
    but only past the age guard that protects in-flight writers."""
    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    write_merge_txlog(df, target, keys=["k"])
    # simulate a crash: batch written, commit never published
    orphan = spark.createDataFrame([(99, "ghost")], "k int, v string")
    entries, _ = _write_batch(orphan, target, ["k"], ["k"])
    assert len(entries) >= 1
    assert _rows(spark, target) == {(1, "a")}  # ghost invisible
    assert vacuum_txlog(spark, target, older_than_s=3600) == 0  # age-guarded
    n_deleted = vacuum_txlog(spark, target, older_than_s=0.0)
    assert n_deleted == len(entries)
    assert _rows(spark, target) == {(1, "a")}  # live data untouched


def test_checkpoint_compacts_snapshot_assembly(spark, tmp_path):
    """Past CHECKPOINT_INTERVAL commits, the snapshot reads the
    checkpoint + tail instead of replaying every commit, and the table
    content stays exact."""
    target = str(tmp_path / "t")
    n_commits = CHECKPOINT_INTERVAL + 3
    for i in range(n_commits):
        df = spark.createDataFrame([(i, f"v{i}")], "k int, v string")
        assert write_merge_txlog(df, target, keys=["k"]) == 1
    snap = snapshot_txlog(spark, target)
    assert snap.version == n_commits
    assert len(snap.files) >= n_commits  # every commit's files live
    cp = os.path.join(
        target, "_txlog", f"{CHECKPOINT_INTERVAL:020d}.checkpoint.json"
    )
    assert os.path.exists(cp)
    body = json.load(open(cp))
    assert body["version"] == CHECKPOINT_INTERVAL
    got = {r.k for r in read_txlog(spark, target).collect()}
    assert got == set(range(n_commits))


def test_stats_prune_conflict_check(spark, tmp_path):
    """File skipping: a batch whose key range is disjoint from a file's
    footer min/max must not read that file for the conflict check, and
    _overlaps is the pure predicate that proves it."""
    target = str(tmp_path / "t")
    lo = spark.range(0, 100).select(F.col("id").alias("k"), F.lit("lo").alias("v"))
    hi = spark.range(1000, 1100).select(F.col("id").alias("k"), F.lit("hi").alias("v"))
    write_merge_txlog(lo, target, keys=["k"])
    write_merge_txlog(hi, target, keys=["k"])
    snap = snapshot_txlog(spark, target)
    stats = [e["stats"]["k"] for e in snap.files if e["stats"].get("k")]
    assert stats, "local files must carry footer min/max stats"
    mid = spark.range(500, 510).select(F.col("id").alias("k"), F.lit("m").alias("v"))
    bounds = _batch_bounds(mid, ["k"])
    overlapping = [e for e in snap.files if _overlaps(e, bounds)]
    assert overlapping == []  # disjoint on both sides → zero files scanned
    assert write_merge_txlog(mid, target, keys=["k"]) == 10
    # overlapping batch still detects conflicts through the pruned scan
    edge = spark.range(99, 102).select(F.col("id").alias("k"), F.lit("e").alias("v"))
    assert write_merge_txlog(edge, target, keys=["k"]) == 2  # 99 conflicts
    assert read_txlog(spark, target).count() == 100 + 100 + 10 + 2


def test_schema_contract_enforced(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    write_merge_txlog(df, target, keys=["k"])
    renamed = spark.createDataFrame([(2, "b")], "k int, OTHER string")
    with pytest.raises(SchemaContractError, match="columns"):
        write_merge_txlog(renamed, target, keys=["k"])
    drifted = spark.createDataFrame([(2, 2.0)], "k int, v double")
    with pytest.raises(SchemaContractError, match="drift"):
        write_merge_txlog(drifted, target, keys=["k"])


def test_composite_key_and_null_keys(spark, tmp_path):
    """Composite keys conflict only when EVERY column matches, and NULL
    keys compare equal (the <=> / PK semantics the other backends pin)."""
    target = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, 10, "a"), (1, None, "n")], "k int, sub int, v string"
    )
    df2 = spark.createDataFrame(
        [(1, 10, "DUP"), (1, 20, "b"), (1, None, "DUPN")],
        "k int, sub int, v string",
    )
    assert write_merge_txlog(df1, target, keys=["k", "sub"]) == 2
    assert write_merge_txlog(df2, target, keys=["k", "sub"]) == 1
    vals = {r.v for r in read_txlog(spark, target).collect()}
    assert vals == {"a", "n", "b"}


def test_concurrent_append_race(spark, tmp_path):
    """THE reason this backend exists (VERDICT r12 #1): two writers with
    overlapping keys commit CONCURRENTLY — no lock — and the table ends
    with every key exactly once; the loser's re-check drops exactly the
    keys the winner landed, so inserted counts sum to the distinct-key
    union. Repeated 3× to let the race rotate winners."""
    for round_i in range(3):
        target = str(tmp_path / f"race{round_i}")
        a = spark.createDataFrame(
            [(i, "A") for i in range(0, 60)], "k int, v string"
        )
        b = spark.createDataFrame(
            [(i, "B") for i in range(30, 90)], "k int, v string"
        )
        results: dict[str, int] = {}
        errors: list[Exception] = []
        barrier = threading.Barrier(2)

        def run(name, df):
            try:
                barrier.wait(timeout=60)
                results[name] = write_merge_txlog(df, target, keys=["k"])
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors.append(e)

        ta = threading.Thread(target=run, args=("a", a))
        tb = threading.Thread(target=run, args=("b", b))
        ta.start(), tb.start()
        ta.join(120), tb.join(120)
        assert not errors, errors
        assert results["a"] + results["b"] == 90  # distinct union, no double
        out = read_txlog(spark, target)
        assert out.count() == 90
        assert out.select("k").distinct().count() == 90  # no key twice
        # the overlap range survived from exactly one writer per key
        overlap = {r.k: r.v for r in out.filter("k >= 30 and k < 60").collect()}
        assert len(overlap) == 30 and set(overlap.values()) <= {"A", "B"}


def test_concurrent_same_batch_inserts_once(spark, tmp_path):
    """Identical batch from two writers at once — the exact double-load
    the reference's ON CONFLICT guards against: total inserted == batch
    size, not 2×."""
    target = str(tmp_path / "same")
    df = spark.createDataFrame([(i, "x") for i in range(40)], "k int, v string")
    results: list[int] = []
    barrier = threading.Barrier(2)

    def run():
        barrier.wait(timeout=60)
        results.append(write_merge_txlog(df, target, keys=["k"]))

    ts = [threading.Thread(target=run) for _ in range(2)]
    [t.start() for t in ts]
    [t.join(120) for t in ts]
    assert sum(results) == 40
    assert read_txlog(spark, target).count() == 40
