"""The flagship query over BUCKETED fact-table mirrors: the measured
shuffle-eliminator path (VERDICT r03 #4).

A 100 TB daily pipeline does not re-shuffle its fact tables per query —
it lands them bucketed on the join key once (one write-time shuffle) and
every subsequent orderkey equi-join or aggregation reads co-located
buckets with NO exchange. The flagship plan joins orders⋈lineitem on
orderkey TWICE (the manifesto CTE's bridge join S:53 and the final
parcelas⋈header join S:92), so bucketing both tables on orderkey
removes both big-fact exchanges; sortBy(orderkey) inside buckets also
lets the sort-merge join skip its per-task sort. What remains is the
window partition on ciot_key and the join to the aggregated manifesto —
keys the orderkey layout cannot serve (a second mirror bucketed on
custkey could, if the workload justified a second copy).

The mirrors are written once per (session, dataset) at plan-build time
— bench.py's warm/timed runs then measure pure bucketed execution, the
same amortization story as the IVF/MinHash index builds. Tests assert
the bucketed plan (a) returns the identical result and (b) has strictly
fewer shuffle exchanges (tests/test_bucketing.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from ..sources.bucketing import read_bucketed, write_bucketed
from ._registry import plan_cache

# sized so a bucket is a few hundred MB at the 100 TB target per the
# bucketing module's economics; at bench scale the count just needs to
# MATCH local[32]'s cores — a bucket-cooperating join runs exactly
# one task per bucket, so 16 buckets capped those stages at half the
# machine (round-11 sweep: nb=16 1.61 s, nb=32 1.49 s broadcast-on;
# 5.04 vs 4.92 s broadcast-off)
N_BUCKETS = 32

_FACT_KEYS = (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))


@plan_cache
def bucketed_facts(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Write-once bucketed mirrors of the orderkey-joined fact tables
    for this dataset; returns {table_name: bucketed DataFrame}. Cached
    per (session, dataset, mtime) like every plan, and REWRITTEN on a
    cache miss rather than probed via tableExists — a regenerated
    fixture must regenerate its mirrors, and a catalog probe cannot see
    data staleness."""
    token = re.sub(r"\W+", "_", sf_dir).strip("_")
    out: dict[str, DataFrame] = {}
    for name, key in _FACT_KEYS:
        tbl = f"bkt_{token}_{name}"
        # a previous SESSION's warehouse directory can survive while the
        # table is absent from this session's catalog — saveAsTable then
        # fails with LOCATION_ALREADY_EXISTS; drop both halves first
        spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(
            f"{spark.conf.get('spark.sql.warehouse.dir')}/{tbl}"
        )
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
        write_bucketed(
            load_table(spark, sf_dir, name), tbl, [key], N_BUCKETS,
            sort_cols=[key],
        )
        out[name] = read_bucketed(spark, tbl)
    return out


def flagship_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTICAL flagship plan with orders/lineitem served from the
    bucketed mirrors — same semantics, fewer exchanges."""
    from .flagship import flagship

    # kwargs bypass flagship's plan cache: the variant never shadows
    # (or gets served) the plain-parquet plan
    return flagship(spark, sf_dir, tables=bucketed_facts(spark, sf_dir))
