"""Global row-id assignment without a global window.

``row_number() OVER (ORDER BY ...)`` funnels every row through one
reducer — the single-partition sort that killed q41's first
implementation and kills any 100 TB job. The distributed classic used
here instead:

1. range-partition + sort locally on the total order (one range
   shuffle, all partitions sort in parallel);
2. count rows per partition (metadata-scale: one tiny job, N_partition
   rows to the driver);
3. prefix-sum the counts into per-partition offsets and add
   ``offset + local_position`` in a zero-shuffle Arrow pass.

The input is pinned with ``localCheckpoint`` so passes 2 and 3 see the
IDENTICAL partition layout (range boundaries come from sampling; an
unpinned plan could re-derive them between jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int = 32,
    id_col: str = "row_id",
) -> DataFrame:
    """Dense 0-based global ids in ``order_cols`` order (must be a
    TOTAL order — include a unique tiebreak column, or ids within ties
    become layout-dependent)."""
    parted = df.repartitionByRange(
        num_partitions, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    parted = parted.localCheckpoint(eager=True)

    counts = (
        parted.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(id_col, LongType(), False)]
    )

    def add_ids(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = bc.value.get(pid, 0)
        for pdf in batches:
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, out_schema)


__all__ = ["assign_global_ids"]
