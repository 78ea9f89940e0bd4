"""Small-file compaction: plan determinism, bin-packing bounds, and
lossless rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.operators.compaction import (
    compact,
    list_data_files,
    plan_compaction,
)

SF = "/root/testdata/sf0.001"


def _fragmented_table(spark, tmp_path, n_files=12):
    src = spark.read.parquet(f"{SF}/orders.parquet")
    path = str(tmp_path / "frag")
    src.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, src.count()


def test_plan_packs_small_files_under_target(spark, tmp_path):
    path, _ = _fragmented_table(spark, tmp_path)
    files = list_data_files(spark, path)
    assert len(files) >= 10
    target = sum(s for _, s in files) // 3
    groups = plan_compaction(files, target_bytes=target)
    # every group respects the size bound and has >1 file
    for g in groups:
        assert g.total_bytes <= target
        assert len(g.files) > 1
    # deterministic: same listing -> identical plan
    again = plan_compaction(files, target_bytes=target)
    assert groups == again


def test_plan_leaves_right_sized_files_alone(spark, tmp_path):
    path, _ = _fragmented_table(spark, tmp_path, n_files=4)
    files = list_data_files(spark, path)
    big_target = max(s for _, s in files)  # every file >= 0.75*target
    assert plan_compaction(files, target_bytes=big_target) == []


def test_compact_is_lossless_and_reduces_file_count(spark, tmp_path):
    path, n_rows = _fragmented_table(spark, tmp_path)
    files = list_data_files(spark, path)
    target = sum(s for _, s in files) // 2
    groups = plan_compaction(files, target_bytes=target)
    assert groups
    out = str(tmp_path / "compacted")
    n = compact(spark, groups, out)
    assert n == len(groups)

    compacted = spark.read.parquet(out).drop("group")
    compacted_files = set(compacted.inputFiles())
    # one data file per group
    assert len(compacted_files) == len(groups)

    # rows in the compacted groups == rows of the planned input files
    planned = spark.read.parquet(*[f for g in groups for f in g.files])
    assert compacted.count() == planned.count()
    a = {tuple(r) for r in planned.collect()}
    b = {tuple(r) for r in compacted.collect()}
    assert a == b
