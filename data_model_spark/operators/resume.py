"""Checkpoint / lineage / resume layer (north rule: idempotent mid-run resume).

Re-expresses the reference's band-by-band validated write + skip-if-valid
semantics (``conversion/geozarr.py:974-1183``, skip/semi + delete/anti at
``geozarr.py:1020-1056``) as table operations:

* every completed unit of work (a pyramid level, a partition range) appends
  a row to a **checkpoint table**: unit key, row count, value checksum,
  metrics (the per-partition lineage the north rule requires);
* resume = ``LEFT ANTI JOIN`` of the work plan against valid checkpoint
  rows — only missing/invalid units are recomputed;
* writes go through dynamic partition overwrite, so re-running a unit is
  idempotent (the Iceberg overwrite-by-filter analogue);
* a unit's checkpoint row is written *after* its data commit; a crash
  between the two re-runs just that unit (safe under overwrite).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import PartitionedTable, local_df

CHECKPOINT_COLS = ["unit", "n_rows", "checksum", "wall_s", "ts_epoch"]


class CheckpointLog:
    """Append-only checkpoint table over parquet (Iceberg-analogous)."""

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.path) or not any(
            not e.startswith("_") for e in os.listdir(self.path)
        ):
            return local_df(
                spark, [], "unit string, n_rows long, checksum double, wall_s double, ts_epoch long"
            )
        return spark.read.parquet(self.path)

    def record(self, spark: SparkSession, unit: str, n_rows: int, checksum: float, wall_s: float):
        self.record_many(spark, [(unit, n_rows, checksum, wall_s)])

    def record_many(self, spark: SparkSession, rows: list[tuple]):
        """Append (unit, n_rows, checksum, wall_s) lineage rows in one commit."""
        ts = int(time.time())
        local_df(
            spark,
            [(u, n, float(c), float(w), ts) for u, n, c, w in rows],
            "unit string, n_rows long, checksum double, wall_s double, ts_epoch long",
        ).coalesce(1).write.mode("append").parquet(self.path)


def pending_units(spark: SparkSession, plan: DataFrame, log: CheckpointLog) -> DataFrame:
    """Work plan (one row per unit, col ``unit``) minus valid checkpoints."""
    done = log.read(spark).select("unit").distinct()
    return plan.join(done, "unit", "left_anti")


class ResumableTileWrite:
    """The flagship sink: per-level validated, checkpointed, idempotent.

    Unit granularity = pyramid level (the reference's band loop); each unit:
    1. already checkpointed?  skip (semi/anti resume join semantics)
    2. else overwrite the level partition (idempotent), verify the written
       row count + checksum by re-reading, then checkpoint.
    """

    def __init__(self, table_path: str, checkpoint_path: str):
        self.table = PartitionedTable(table_path, ["level"])
        self.log = CheckpointLog(checkpoint_path)

    def run(self, spark: SparkSession, tiles: DataFrame, levels: list[int]) -> dict:
        plan = local_df(spark, [(f"level={lv}",) for lv in levels], "unit string")
        todo_units = {r.unit for r in pending_units(spark, plan, self.log).collect()}
        results = {"written": [], "skipped": []}
        for lv in levels:
            unit = f"level={lv}"
            if unit not in todo_units:
                results["skipped"].append(lv)
                continue
            t0 = time.time()
            level_df = tiles.filter(F.col("level") == lv)
            self.table.overwrite_partitions(level_df)
            # validation probe: re-read the committed partition, collecting
            # PER-PARTITION lineage (north rule: "per-partition lineage +
            # row-count metrics to a checkpoint table") in the same pass
            parts = (
                self.table.read(spark)
                .filter(F.col("level") == lv)
                .groupBy(F.spark_partition_id().alias("pid"))
                .agg(
                    F.count("*").alias("n"),
                    F.coalesce(F.sum("px_sum"), F.lit(0.0)).alias("chk"),
                )
                .collect()
            )
            wall = time.time() - t0
            n_total = sum(p.n for p in parts)
            chk_total = float(sum(p.chk for p in parts))
            self.log.record_many(
                spark,
                [(unit, n_total, chk_total, wall)]
                + [(f"{unit}/part={p.pid}", p.n, float(p.chk), wall) for p in parts],
            )
            results["written"].append(lv)
        return results
