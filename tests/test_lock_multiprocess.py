"""Two SEPARATE driver JVMs racing on one parquet sink — the real
cluster multi-writer scenario (two jobs on different machines appending
to the same table) that tests/test_sinks.py's thread-based chaos only
approximates from inside a single JVM. The lock primitive is an OS-level
exclusive create, so the semantics should be identical — this pins that
end-to-end: overlapping key ranges from two independent Spark processes
land every key exactly once.

A file-based barrier makes the race real: each writer signals ready,
then both poll for the other before calling write_ignore_conflicts, so
the anti-join/append critical sections genuinely overlap in time unless
the lock serializes them.
"""

import os
import subprocess
import sys


WRITER = r"""
import sys, time, os
sink, me, other, ready_dir = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.warehouse.dir", os.path.join(ready_dir, "wh" + me))
         .getOrCreate())
sys.path.insert(0, os.environ["REPO"])
from ferramenta_etl_spark.sinks import write_ignore_conflicts
lo, hi = (0, 60) if me == "a" else (40, 100)  # keys 40-59 overlap
df = spark.createDataFrame([(k, me) for k in range(lo, hi)], "k int, writer string")
open(os.path.join(ready_dir, me), "w").close()          # I'm at the line
deadline = time.time() + 120
while not os.path.exists(os.path.join(ready_dir, other)):  # wait for peer
    if time.time() > deadline:
        sys.exit(3)
    time.sleep(0.02)
n = write_ignore_conflicts(df, sink, keys=["k"])
print("WROTE", me, n, flush=True)
spark.stop()
"""


def test_two_driver_jvms_overlapping_appends(spark, tmp_path):
    sink = str(tmp_path / "shared_sink")
    ready = str(tmp_path / "barrier")
    os.makedirs(ready)
    env = {**os.environ, "REPO": os.path.dirname(os.path.dirname(__file__))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WRITER, sink, me, other, ready],
            env=env,
            cwd=str(tmp_path),
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for me, other in (("a", "b"), ("b", "a"))
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()
    # each writer reports what it inserted; together they cover 0..99
    # exactly once — the 40-59 overlap went to exactly one of them
    inserted = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WROTE"):
                _, who, n = line.split()
                inserted[who] = int(n)
    assert set(inserted) == {"a", "b"}
    assert inserted["a"] + inserted["b"] == 100
    out = spark.read.parquet(sink)
    assert out.count() == 100
    assert out.select("k").distinct().count() == 100
    # the loser's overlap rows were dropped whole: every surviving row
    # still carries the writer tag of whoever won its key
    assert out.groupBy("writer").count().count() == 2
    # lock released: no stale lock file left beside the sink
    assert not os.path.exists(sink + ".__lock__")
