"""Partition planner: chunk/shard-aligned range partitioning.

The reference aligns zarr chunk sizes to divide dims evenly
(``conversion/utils.py:161-189``) and groups chunks into shards
(``geozarr.py:1651-1688``).  The Spark analogue: choose partition counts
from the same divisor logic and apply one explicit ``repartitionByRange``
over the spatial keys, so

* partitions correspond to contiguous tile ranges (bbox queries prune),
* downstream groupBy on the same keys reuses the exchange,
* file sizes land near the shard target (Iceberg
  ``write.target-file-size-bytes`` analogue).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..functions import gridlib


@dataclass
class PartitionPlan:
    n_partitions: int
    rows_per_partition: int
    chunk_rows: int
    shard_rows: int


def plan_partitions(
    total_rows: int,
    target_rows_per_partition: int = 100_000,
    min_partitions: int = 1,
    max_partitions: int = 100_000,
) -> PartitionPlan:
    """Pick an aligned partition count for a keyed dataset.

    Uses the reference's aligned-chunk search so partition boundaries divide
    the key space evenly (no partial trailing partition), then the shard
    rule to group chunks when the count explodes.
    """
    if total_rows <= 0:
        return PartitionPlan(min_partitions, 0, 0, 0)
    chunk_rows = gridlib.aligned_chunk_size(total_rows, target_rows_per_partition)
    shard_rows = gridlib.shard_dimension(total_rows, chunk_rows)
    n = max(min_partitions, min(max_partitions, -(-total_rows // chunk_rows)))
    return PartitionPlan(n, chunk_rows, chunk_rows, shard_rows)


def repartition_for_grid(
    df: DataFrame,
    keys: list[str],
    total_rows: int,
    target_rows_per_partition: int = 100_000,
) -> DataFrame:
    """Explicit range repartitioning with an aligned partition count."""
    plan = plan_partitions(total_rows, target_rows_per_partition)
    return df.repartitionByRange(plan.n_partitions, *keys)
