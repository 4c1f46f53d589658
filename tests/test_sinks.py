"""Idempotent sink semantics (≙ ON CONFLICT DO NOTHING, S:214-218):
write twice -> no duplicates; conflicting keys -> first writer wins."""

import pytest
from pyspark.sql import functions as F

from ferramenta_etl_spark.sinks import ensure_table, write_ignore_conflicts
from ferramenta_etl_spark.sources import load_table
from ferramenta_etl_spark.sources.tables import SchemaContractError


@pytest.fixture()
def target(tmp_path):
    return str(tmp_path / "parcela_sink")


def test_rerun_is_noop(spark, sf_dir, target):
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    n1 = write_ignore_conflicts(li, target, keys=["l_orderkey", "l_linenumber"])
    n2 = write_ignore_conflicts(li, target, keys=["l_orderkey", "l_linenumber"])
    assert n1 > 0 and n2 == 0
    out = spark.read.parquet(target)
    assert out.count() == n1
    assert (
        out.groupBy("l_orderkey", "l_linenumber").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_fresh_sink_with_absent_parent_dir(spark, tmp_path):
    # Regression: java.io.File.createNewFile does not create parent
    # dirs, so locking a brand-new sink under a not-yet-existing
    # directory (the CLI's <sink-dir>/<table> layout on first run)
    # raised "No such file or directory" instead of acquiring.
    path = str(tmp_path / "not" / "yet" / "created" / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    n1 = write_ignore_conflicts(df, path, keys=["k"])
    n2 = write_ignore_conflicts(df, path, keys=["k"])
    assert n1 == 2 and n2 == 0


def test_first_writer_wins(spark, target):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k int, v string")
    write_ignore_conflicts(df1, target, keys=["k"])
    n = write_ignore_conflicts(df2, target, keys=["k"])
    assert n == 1  # only k=3 is new
    rows = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}  # k=2 NOT updated (DO NOTHING)


def test_null_keys_conflict_null_safe(spark, target):
    """Cross-batch NULL-key conflicts (regression, r13): the anti-join
    is <=> (anti_join_keys), matching merge_insert_condition and the
    in-batch dedup — a plain = join would re-append the NULL-keyed row
    on every rerun."""
    df = spark.createDataFrame([(None, "n"), (1, "a")], "k int, v string")
    n1 = write_ignore_conflicts(df, target, keys=["k"])
    n2 = write_ignore_conflicts(df, target, keys=["k"])
    assert n1 == 2 and n2 == 0
    assert spark.read.parquet(target).count() == 2


def test_in_batch_duplicates_collapse(spark, target):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k int, v string")
    n = write_ignore_conflicts(df, target, keys=["k"], order_by=["v"])
    assert n == 2  # deterministic pick per key


def test_schema_contract_on_append(spark, target):
    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    write_ignore_conflicts(df1, target, keys=["k"])
    bad = spark.createDataFrame([(2, "b")], "k int, OTHER string")
    with pytest.raises(SchemaContractError):
        write_ignore_conflicts(bad, target, keys=["k"])


def test_ensure_table_idempotent(spark, target):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    assert ensure_table(spark, target, df) is True
    assert ensure_table(spark, target, df) is False
    assert spark.read.parquet(target).count() == 0


def test_partitioned_sink_rerun_is_noop(spark, target):
    df = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"), ("2024-01-02", 3, "c")],
        "dt string, k int, v string",
    )
    n1 = write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"])
    n2 = write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"])
    assert n1 == 3 and n2 == 0
    out = spark.read.parquet(target)
    assert out.count() == 3
    assert sorted(out.columns) == ["dt", "k", "v"]  # partition col survives
    import os

    assert os.path.isdir(f"{target}/dt=2024-01-01")  # hive layout on disk


def test_partitioned_sink_prunes_conflict_scan(spark, target):
    """The conflict check must read ONLY the touched partitions: poison an
    untouched partition directory with a corrupt file — a whole-table key
    scan would die on it, the pruned scan never opens it."""
    import os

    day1 = spark.createDataFrame([("2024-01-01", 1, "a")], "dt string, k int, v string")
    day2 = spark.createDataFrame([("2024-01-02", 2, "b")], "dt string, k int, v string")
    write_ignore_conflicts(day1, target, keys=["dt", "k"], partition_cols=["dt"])
    write_ignore_conflicts(day2, target, keys=["dt", "k"], partition_cols=["dt"])
    bad = f"{target}/dt=2024-01-01/part-99999-corrupt.snappy.parquet"
    with open(bad, "wb") as f:
        f.write(b"this is not parquet")
    try:
        day2b = spark.createDataFrame(
            [("2024-01-02", 2, "DUP"), ("2024-01-02", 9, "new")],
            "dt string, k int, v string",
        )
        n = write_ignore_conflicts(day2b, target, keys=["dt", "k"], partition_cols=["dt"])
        assert n == 1  # k=9 only; k=2 conflict detected within the pruned day
    finally:
        os.remove(bad)
    out = spark.read.parquet(target).filter(F.col("dt") == "2024-01-02")
    assert {r.k: r.v for r in out.collect()} == {2: "b", 9: "new"}


def test_partition_cols_must_be_keys(spark, target):
    df = spark.createDataFrame([("2024-01-01", 1, "a")], "dt string, k int, v string")
    with pytest.raises(ValueError, match="subset of keys"):
        write_ignore_conflicts(df, target, keys=["k"], partition_cols=["dt"])


def test_partitioned_sink_survives_empty_first_write(spark, tmp_path):
    """A partitioned first load with ZERO rows writes no part files
    (nothing to partition) — the sink directory must not poison later
    loads with UNABLE_TO_INFER_SCHEMA (regression: hypothesis found it
    via an all-sub-shingle first batch in the dedup index)."""
    from ferramenta_etl_spark.sinks import write_ignore_conflicts

    path = str(tmp_path / "sink")
    empty = spark.createDataFrame([], "k long, p long, v string")
    assert write_ignore_conflicts(
        empty, path, keys=["k", "p"], partition_cols=["p"]
    ) == 0
    rows = spark.createDataFrame([(1, 0, "x"), (2, 1, "y")], "k long, p long, v string")
    assert write_ignore_conflicts(
        rows, path, keys=["k", "p"], partition_cols=["p"]
    ) == 2
    # and the conflict check works once data exists
    assert write_ignore_conflicts(
        rows, path, keys=["k", "p"], partition_cols=["p"]
    ) == 0


# ---------------------------------------------------------------------------
# Chaos: interrupted writes (VERDICT r05 #6). S:225/S:217's crash story
# is "lose at most the in-flight batch; a rerun inserts only new keys".
# These simulate the two ways a killed append actually manifests on a
# parquet sink: (a) a SUBSET of the batch became visible (non-atomic
# multi-file commit on an object store), (b) nothing became visible but
# orphan part files sit under _temporary/ (killed before job commit).


def test_interrupted_append_replay_plain(spark, target):
    """Crash made only part of batch 2 visible; replaying the FULL job
    (batch 1 + batch 2) must insert exactly the missing keys once."""
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b2 = spark.createDataFrame([(3, "c"), (4, "d"), (5, "e")], "k int, v string")
    write_ignore_conflicts(b1, target, keys=["k"])
    # simulated torn commit: one of batch 2's rows landed, rest lost
    b2.filter(F.col("k") == 3).write.mode("append").parquet(target)
    n = write_ignore_conflicts(b2, target, keys=["k"])
    assert n == 2  # k=4, k=5 — k=3 survived the crash and is not re-inserted
    out = spark.read.parquet(target)
    assert out.count() == 5
    assert out.groupBy("k").count().filter(F.col("count") > 1).count() == 0


def test_interrupted_append_replay_partitioned(spark, target):
    """Torn multi-partition append: the crash committed one day's
    directory but not the other; replay completes the batch exactly-once
    with the conflict scan still pruned to the touched days."""
    df = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"), ("2024-01-02", 3, "c")],
        "dt string, k int, v string",
    )
    write_ignore_conflicts(
        df.limit(0), target, keys=["dt", "k"], partition_cols=["dt"]
    )  # bootstrapped empty sink (first batch was in flight)
    # crash left only the 01-01 partition visible
    df.filter(F.col("dt") == "2024-01-01").write.mode("append").partitionBy(
        "dt"
    ).parquet(target)
    n = write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"])
    assert n == 2  # the two 01-02 rows
    out = spark.read.parquet(target)
    assert out.count() == 3
    assert (
        out.groupBy("dt", "k").count().filter(F.col("count") > 1).count() == 0
    )
    # replay of the replay is a no-op
    assert write_ignore_conflicts(df, target, keys=["dt", "k"], partition_cols=["dt"]) == 0


def test_orphan_temporary_files_do_not_poison_replay(spark, tmp_path):
    """A job killed BEFORE commit leaves real parquet part files under
    _temporary/ that no reader will ever see. The replay must treat the
    sink as data-free (regression: _has_data_files counted hidden files,
    sending the replay down the read path of a partitioned sink whose
    only visible content is the footerless bootstrap -> schema-inference
    crash)."""
    import os

    path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b")], "dt string, k int, v string"
    )
    write_ignore_conflicts(df.limit(0), path, keys=["dt", "k"], partition_cols=["dt"])
    # fabricate the killed job's leftovers: a REAL parquet file, hidden
    tmp_task_dir = f"{path}/_temporary/0/task_0/dt=2024-01-01"
    scratch = str(tmp_path / "scratch")
    df.filter(F.col("k") == 1).drop("dt").coalesce(1).write.parquet(scratch)
    os.makedirs(tmp_task_dir)
    part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
    os.rename(f"{scratch}/{part}", f"{tmp_task_dir}/{part}")
    n = write_ignore_conflicts(df, path, keys=["dt", "k"], partition_cols=["dt"])
    assert n == 2  # full batch inserted; orphan temp content ignored
    out = spark.read.parquet(path)
    assert {r.k for r in out.collect()} == {1, 2}


def test_concurrent_appends_with_overlapping_keys(spark, target):
    """The parquet race VERDICT r05 #5 asked to pin or close, closed:
    without the sink lock, two writers could both pass the anti-join
    before either appends and the same key lands twice. Eight threads
    submit overlapping key ranges concurrently (Spark job submission is
    thread-safe); the atomic-create lock serializes the whole anti-join
    + append sequences, so the final sink holds every key EXACTLY once
    and the per-writer appended counts partition the distinct key set."""
    import threading

    results: list[int | None] = [None] * 8
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            rows = [(k, f"w{i}") for k in range(i * 5, i * 5 + 15)]
            df = spark.createDataFrame(rows, "k int, v string")
            results[i] = write_ignore_conflicts(df, target, keys=["k"])
        except Exception as exc:  # noqa: BLE001 — surfaced to the assert
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    distinct_keys = set(range(7 * 5 + 15))  # union of all writers' ranges
    out = spark.read.parquet(target)
    assert out.count() == len(distinct_keys)
    assert (
        out.groupBy("k").count().filter(F.col("count") > 1).count() == 0
    )
    assert sum(results) == len(distinct_keys)  # type: ignore[arg-type]


def test_stale_sink_lock_taken_over(spark, target, tmp_path):
    """A writer that crashed while holding the lock must not wedge the
    sink forever: a lock file older than lock_stale_s is taken over."""
    import os
    import time

    lockfile = target + ".__lock__"
    open(lockfile, "w").close()
    old = time.time() - 10_000
    os.utime(lockfile, (old, old))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    n = write_ignore_conflicts(df, target, keys=["k"], lock_stale_s=600.0)
    assert n == 2
    assert not os.path.exists(lockfile)  # released after the write


def test_held_sink_lock_times_out(spark, target):
    """A FRESH foreign lock (live writer) blocks until lock_timeout_s,
    then raises the documented error instead of racing the anti-join."""
    import os

    from ferramenta_etl_spark.sinks import SinkLockTimeout

    lockfile = target + ".__lock__"
    open(lockfile, "w").close()
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(SinkLockTimeout):
        write_ignore_conflicts(df, target, keys=["k"], lock_timeout_s=0.5)
    os.remove(lockfile)


def test_deposed_holder_does_not_delete_new_lock(spark, target):
    """ADVICE r07 (medium): release is ownership-checked. If the lock was
    taken over while we held it (simulated by rewriting the token), the
    deposed holder must leave the new holder's lock in place."""
    import os

    from ferramenta_etl_spark.sinks.idempotent import _sink_lock

    lockfile = target + ".__lock__"
    with _sink_lock(spark, target, timeout_s=5.0, stale_s=600.0):
        with open(lockfile) as fh:
            ours = fh.read().strip()
        assert len(ours) == 32  # uuid4 hex token stamped on acquire
        with open(lockfile, "w") as fh:
            fh.write("someone-elses-token")
    # exit did NOT delete the foreign lock
    assert os.path.exists(lockfile)
    os.remove(lockfile)


def test_heartbeat_keeps_slow_holder_alive(spark, target):
    """ADVICE r07 (medium): a healthy holder whose critical section
    outlives stale_s is never presumed orphaned — the heartbeat refreshes
    the lock mtime, so a waiter sees a FRESH lock and times out instead
    of taking over and double-holding."""
    import os
    import time

    from ferramenta_etl_spark.sinks import SinkLockTimeout
    from ferramenta_etl_spark.sinks.idempotent import _sink_lock

    lockfile = target + ".__lock__"
    with _sink_lock(spark, target, timeout_s=5.0, stale_s=2.0):
        time.sleep(3.5)  # > stale_s: heartbeat (stale_s/4 cadence) must
        # have touched the file, so its mtime is recent
        age = time.time() - os.path.getmtime(lockfile)
        assert age < 2.0, f"heartbeat did not refresh lock (age {age:.1f}s)"
        # a contender observing the refreshed lock must TIME OUT, not
        # take over
        with pytest.raises(SinkLockTimeout):
            with _sink_lock(spark, target, timeout_s=1.0, stale_s=2.0):
                pass
    assert not os.path.exists(lockfile)  # released by the rightful owner
