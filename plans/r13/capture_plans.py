"""Capture .explain('formatted') for every bench headline query into
plans/r13/<query>_<tag>.txt (tag = before/after), for the round-13
optimization evidence trail. Run from the repo root:

    python plans/r13/capture_plans.py before [query ...]

Uses the same session/config path as bench.py so the captured plans are
the plans the bench actually executes. Plans are captured at the bench
scale (sf0.1 by default, $SPARK_GRAFT_SF_DIR) AFTER one noop execution,
so AQE-dependent queries have their build-time artifacts (mirrors,
indexes, checkpoints) in place. The committed files show the INITIAL
plan (isFinalPlan=false) — join strategies and exchange placement are
readable there; AQE runtime rewrites are quoted in OPTIMIZATION_r13.md
where they matter.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ferramenta_etl_spark.session import get_session

    spark = get_session(
        "plan-capture", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from ferramenta_etl_spark.plans.composites import add_bench_composites

    queries = dict(entry_mod.queries())
    add_bench_composites(queries)

    out_dir = os.path.dirname(os.path.abspath(__file__))
    names = [n for n in HEADLINE if n in queries and (not only or n in only)]
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = queries[name](spark, sf_dir)
        # one execution so plan-build artifacts exist and AQE numbers are real
        df.write.format("noop").mode("overwrite").save()
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
