"""Data-layout sinks: Z-order clustering and small-file compaction.

The clustering test is the data-skipping proof: after write_zordered,
every file's footer min/max covers a narrow slice of BOTH cluster
columns, so a reader's row-group pruning (which consumes exactly those
stats) skips most files for a selective predicate on either column. The
unordered baseline shows the counterfactual: every file spans ~the full
range, nothing prunes.
"""

import pyspark.sql.functions as F

from ferramenta_etl_spark.sinks.layout import (
    compact_small_files,
    file_clustering_report,
    write_zordered,
)
from ferramenta_etl_spark.sources import load_table


def _mean_coverage(report, col, lo, hi):
    """Average fraction of the full [lo, hi] domain a file's
    [min, max] spans."""
    spans = [
        (r[f"{col}_max"] - r[f"{col}_min"]) / (hi - lo)
        for r in report
        if r[f"{col}_min"] is not None
    ]
    return sum(spans) / len(spans)


def test_zorder_narrows_both_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]

    base = str(tmp_path / "plain")
    li.repartition(16).write.parquet(base)  # round-robin: no clustering
    zpath = str(tmp_path / "zorder")
    # 16 files -> the curve's 4-bit prefix splits BOTH columns twice,
    # so each file covers ~1/4 of each domain (8 files would halve only
    # one of them: the prefix bits alternate between columns)
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=16)

    cols = ["l_orderkey", "l_partkey"]
    rep_base = file_clustering_report(base, cols)
    rep_z = file_clustering_report(zpath, cols)

    # same data survived the layout change
    assert sum(r["nrows"] for r in rep_z) == sum(r["nrows"] for r in rep_base)

    for col, lo, hi in (("l_orderkey", lo_o, hi_o), ("l_partkey", lo_p, hi_p)):
        cov_base = _mean_coverage(rep_base, col, lo, hi)
        cov_z = _mean_coverage(rep_z, col, lo, hi)
        # round-robin files each span ~the whole domain; z-ordered files
        # must each cover well under half of it, on BOTH columns at once
        assert cov_base > 0.9, f"{col}: baseline unexpectedly clustered ({cov_base:.2f})"
        assert cov_z < 0.5, f"{col}: z-order did not cluster ({cov_z:.2f})"
        assert cov_z < cov_base / 2


def test_zorder_roundtrip_content(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    zpath = str(tmp_path / "z")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0
    assert li.exceptAll(back).count() == 0


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    import os

    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 40
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    # target = half the current bytes -> exactly 2 output files
    n_after = compact_small_files(spark, path, target_bytes=total // 2 + 1)
    n_disk = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == n_disk == 2
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 9_999 * 10_000


def test_export_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """Curated relation -> sharded gzip JSONL -> read back identical
    (modulo null-field omission, the JSONL corpus convention)."""
    from ferramenta_etl_spark.sinks.layout import export_jsonl
    from ferramenta_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = str(tmp_path / "export")
    n_shards = export_jsonl(docs, path, target_mb=1)
    assert n_shards >= 1
    back = spark.read.json(path)
    assert back.count() == docs.count()
    a = {(r.doc_id, r.text) for r in docs.collect()}
    b = {(r.doc_id, r.text) for r in back.collect()}
    assert a == b


def test_dataset_manifest_roundtrip_and_tamper(spark, tmp_path):
    """Manifest write → verify clean; fingerprint is layout-independent
    (2 shards vs 5 shards of the SAME lines agree); a tampered shard
    and a deleted shard are both named by the verifier."""
    import gzip
    import json
    import os

    from ferramenta_etl_spark.sinks.layout import (
        export_jsonl,
        verify_dataset_manifest,
        write_dataset_manifest,
    )

    df = spark.range(500).selectExpr("id", "id % 7 AS k", "md5(CAST(id AS STRING)) AS t")
    p2, p5 = str(tmp_path / "d2"), str(tmp_path / "d5")
    df.repartition(2).write.option("compression", "gzip").json(p2)
    df.repartition(5).write.option("compression", "gzip").json(p5)

    m2 = write_dataset_manifest(spark, p2, config={"note": "two"})
    m5 = write_dataset_manifest(spark, p5)
    assert m2["n_rows"] == m5["n_rows"] == 500
    assert m2["n_shards"] == 2 and m5["n_shards"] == 5
    assert m2["dataset_fingerprint"] == m5["dataset_fingerprint"]
    assert json.load(open(os.path.join(p2, "_manifest.json")))["config"] == {
        "note": "two"
    }
    ok, problems = verify_dataset_manifest(spark, p2)
    assert ok, problems

    # export_jsonl -> manifest -> verify, the make-dataset composition
    pe = str(tmp_path / "de")
    export_jsonl(df, pe, cluster_by=["k"], order_by=["k", "id"])
    write_dataset_manifest(spark, pe)
    ok, problems = verify_dataset_manifest(spark, pe)
    assert ok, problems

    # tamper: append one line to a shard -> rows + fingerprint flagged
    shard = sorted(
        f for f in os.listdir(p2) if f.startswith("part-")
    )[0]
    sp = os.path.join(p2, shard)
    with gzip.open(sp, "rt") as f:
        content = f.read()
    with gzip.open(sp, "wt") as f:
        f.write(content + '{"id":9999,"k":0,"t":"x"}\n')
    # drop Hadoop's local-FS .crc sidecar so the read reaches OUR
    # verifier — on the object stores the 100 TB deployment actually
    # targets there is no sidecar and the manifest is the only gate
    crc = os.path.join(p2, f".{shard}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    ok, problems = verify_dataset_manifest(spark, p2)
    assert not ok
    assert any(shard in q and "rows" in q for q in problems)
    assert any("fingerprint" in q for q in problems)

    # delete a shard -> named missing
    os.remove(os.path.join(p5, sorted(
        f for f in os.listdir(p5) if f.startswith("part-"))[0]))
    ok, problems = verify_dataset_manifest(spark, p5)
    assert not ok and any(q.startswith("missing shard") for q in problems)


def _read_shard_lines(path):
    """{partition index ('part-00000'): [lines in file order]} for a
    gzip JSONL dir (the rest of the basename is a per-run writer uuid)."""
    import gzip
    import os

    out = {}
    for f in sorted(os.listdir(path)):
        if f.startswith("part-") and f.endswith(".gz"):
            with gzip.open(os.path.join(path, f), "rt") as fh:
                out["-".join(f.split("-")[:2])] = fh.read().splitlines()
    return out


def test_export_jsonl_seeded_shuffle_deterministic(spark, tmp_path):
    """VERDICT r08 #4: shuffle_seed gives a reproducible global corpus
    order — same seed ⇒ identical per-shard line order AND identical
    manifest fingerprint; different seed ⇒ different order, same
    content; the seed is recorded in the manifest."""
    import pytest

    from ferramenta_etl_spark.sinks.layout import (
        export_jsonl,
        verify_dataset_manifest,
        write_dataset_manifest,
    )

    # >1000 rows with NON-UNIFORM line widths: sizing must not come from
    # the partitioning-dependent limit(1000) sample (review finding — a
    # different sample => different n_shards => same seed, different
    # layout); seeded exports size from an exact agg instead
    df = spark.range(2500).selectExpr(
        "id", "repeat(md5(CAST(id AS STRING)), CAST(id % 37 AS INT)) AS t"
    )
    pa, pb, pc = (str(tmp_path / d) for d in ("sa", "sb", "sc"))
    # two runs, same seed — input partitioning deliberately different
    export_jsonl(df.repartition(3), pa, target_mb=1, shuffle_seed=42)
    export_jsonl(df.repartition(11), pb, target_mb=1, shuffle_seed=42)
    la, lb = _read_shard_lines(pa), _read_shard_lines(pb)
    assert la == lb  # same shard assignment AND same in-shard order
    # a third run with a different seed: different permutation, same set
    export_jsonl(df, pc, target_mb=1, shuffle_seed=7)
    lc = _read_shard_lines(pc)
    assert lc != la
    assert sorted(x for v in lc.values() for x in v) == sorted(
        x for v in la.values() for x in v
    )
    ma = write_dataset_manifest(spark, pa, shuffle_seed=42)
    mc = write_dataset_manifest(spark, pc, shuffle_seed=7)
    assert ma["shuffle_seed"] == 42 and mc["shuffle_seed"] == 7
    # fingerprint is content-only: both permutations agree
    assert ma["dataset_fingerprint"] == mc["dataset_fingerprint"]
    ok, problems = verify_dataset_manifest(spark, pa)
    assert ok, problems
    with pytest.raises(ValueError, match="mutually exclusive"):
        export_jsonl(df, pa, shuffle_seed=1, cluster_by=["id"])


def test_dataset_card_matches_direct_computation(spark, tmp_path):
    from ferramenta_etl_spark.sinks.layout import dataset_card, write_dataset_card

    rows = [
        (0, "en", "the quick brown fox"),
        (1, "en", "the quick brown fox"),  # exact dup of 0
        (2, "pt", "uma frase qualquer aqui presente"),
        (3, "pt", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    import pytest

    card = dataset_card(df, lang_col="lang")
    assert card["n_docs"] == 4
    # ws token counts: 4 + 4 + 5 + 1 (empty string splits to [""])
    assert card["ws_tokens"] == 14
    assert card["exact_dup_docs"] == 1
    assert card["exact_dup_rate"] == pytest.approx(0.25)
    assert card["langs"] == {"en": 2, "pt": 2}
    assert len(card["quality_p10_p50_p90"]) == 3
    assert card["bpe_ish_tokens"] > 0
    # persisted artifact round-trips
    path = str(tmp_path / "ds")
    df.write.parquet(path)
    import json

    got = write_dataset_card(spark, df, path, lang_col="lang")
    back = json.loads(open(f"{path}/_card.json").read())
    assert back == got == card
