"""Small-file compaction: the lakehouse ``OPTIMIZE`` maintenance op.

A 100 TB table accreted by streaming ingest or per-batch appends decays
into millions of small files; scan cost then becomes task-scheduling
and footer-reading overhead rather than IO.  Compaction bin-packs small
files into ~target-size rewrite groups and rewrites each group as one
file, leaving right-sized files untouched.

Split of labor mirrors production table formats (Delta OPTIMIZE /
Iceberg rewrite_data_files):

- **Planning is metadata-scale and driver-side** — it reads the file
  *listing* (path, bytes), never the data.  First-fit-decreasing
  bin-packing with a deterministic (size desc, path asc) order makes
  plans reproducible.
- **Execution is data-scale and cluster-side** — each group is read
  and rewritten as one output file via ``coalesce(1)`` (a narrow,
  shuffle-free dependency: the group's rows never repartition, they
  just concatenate).  Groups rewrite independently, so the job
  parallelizes across groups and a failure affects one group only.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionGroup:
    group_id: int
    files: tuple[str, ...]
    total_bytes: int


def _local_path(uri: str) -> str:
    """file:/ URI (as returned by inputFiles) -> filesystem path."""
    p = urlparse(uri)
    return unquote(p.path) if p.scheme in ("file", "") else uri


def _file_size(spark: SparkSession, uri: str) -> int:
    """Size in bytes for any filesystem Spark can read (file:/, s3a://,
    hdfs://, abfs://, ...) via the Hadoop FileSystem API — still a
    metadata call, no data IO."""
    p = urlparse(uri)
    if p.scheme in ("file", ""):
        return os.path.getsize(unquote(p.path))
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getFileStatus(jpath).getLen())


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file backing a parquet table.

    Uses the scan's own file listing (``inputFiles``) so partition
    discovery/filtering match what queries actually read; sizes come
    from the filesystem (local stat or Hadoop FileSystem for object
    stores) — all metadata, no data IO.
    """
    out = []
    for f in spark.read.parquet(path).inputFiles():
        p = urlparse(f)
        if p.scheme in ("file", ""):
            out.append((unquote(p.path), _file_size(spark, f)))
        else:
            out.append((f, _file_size(spark, f)))
    return out


def plan_compaction(
    files: list[tuple[str, int]],
    target_bytes: int,
    small_ratio: float = 0.75,
) -> list[CompactionGroup]:
    """Bin-pack files smaller than ``small_ratio * target_bytes`` into
    groups of at most ``target_bytes`` (first-fit-decreasing, ties and
    order fixed by (size desc, path asc) for reproducible plans).

    Files already at/above the small threshold are left alone — never
    rewrite data that is already right-sized.  Singleton groups are
    dropped too: rewriting one small file buys nothing.
    """
    small = sorted(
        (f for f in files if f[1] < small_ratio * target_bytes),
        key=lambda f: (-f[1], f[0]),
    )
    bins: list[list[tuple[str, int]]] = []
    for f in small:
        for b in bins:
            if sum(x[1] for x in b) + f[1] <= target_bytes:
                b.append(f)
                break
        else:
            bins.append([f])
    return [
        CompactionGroup(
            group_id=i,
            files=tuple(p for p, _ in b),
            total_bytes=sum(s for _, s in b),
        )
        for i, b in enumerate(b for b in bins if len(b) > 1)
    ]


def compact(
    spark: SparkSession,
    groups: list[CompactionGroup],
    out_dir: str,
    max_concurrency: int = 8,
) -> int:
    """Rewrite each group as a single parquet file under
    ``out_dir/group=<id>/``.  ``coalesce(1)`` is a narrow dependency —
    no shuffle; the group's partitions stream-concatenate into one
    writer.  Each group's write is a one-task job, so groups are
    submitted CONCURRENTLY (Spark's scheduler interleaves jobs from
    multiple threads) — the cluster runs up to ``max_concurrency``
    single-task rewrites at once instead of idling through a serial
    loop.  Returns the number of groups rewritten; any failure
    propagates after in-flight groups finish (per-group isolation)."""
    from concurrent.futures import ThreadPoolExecutor

    def _rewrite(g: CompactionGroup) -> None:
        (
            spark.read.parquet(*g.files)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"group={g.group_id}"))
        )

    if not groups:
        return 0
    with ThreadPoolExecutor(
        max_workers=min(max_concurrency, len(groups))
    ) as pool:
        list(pool.map(_rewrite, groups))
    return len(groups)


def compaction_report(
    spark: SparkSession, groups: list[CompactionGroup]
) -> DataFrame:
    """The plan as a DataFrame: (group_id, n_files, total_bytes)."""
    rows = [
        (g.group_id, len(g.files), g.total_bytes) for g in groups
    ]
    return spark.createDataFrame(
        rows, "group_id long, n_files long, total_bytes long"
    )
