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
    the key space evenly (no partial trailing partition); ``shard_rows``
    (the chunk-grouping multiple) is reported for writers that group
    chunk-aligned files.  When the chunk count exceeds ``max_partitions``
    the clamp wins and ``rows_per_partition`` reports the ACTUAL rows each
    clamped partition holds (not the no-longer-true chunk size).
    """
    if total_rows <= 0:
        return PartitionPlan(min_partitions, 0, 0, 0)
    chunk_rows = gridlib.aligned_chunk_size(total_rows, target_rows_per_partition)
    shard_rows = gridlib.shard_dimension(total_rows, chunk_rows)
    n = max(min_partitions, min(max_partitions, -(-total_rows // chunk_rows)))
    return PartitionPlan(n, -(-total_rows // n), chunk_rows, shard_rows)


def repartition_for_grid(
    df: DataFrame,
    keys: list[str],
    total_rows: int,
    target_rows_per_partition: int = 100_000,
) -> DataFrame:
    """Explicit range repartitioning with an aligned partition count."""
    plan = plan_partitions(total_rows, target_rows_per_partition)
    return df.repartitionByRange(plan.n_partitions, *keys)


def spatial_block_partition(
    df: DataFrame,
    n_partitions: int,
    level_col: str = "level",
    y_col: str = "tile_y",
    x_col: str = "tile_x",
    block: int = 8,
) -> DataFrame:
    """Deterministic spatial-block repartition for the tile write path.

    ``repartitionByRange`` needs a SAMPLING JOB over the input to pick
    boundaries — measured on this pipeline it is the write phase's
    non-scaler (median 15 s flat from 2 to 8 cores with 4.5x run-to-run
    variance, `scripts/write_phase_probe.py`), because the extra pass and
    the skew of sampled bounds serialize the write.  Hashing ``block``-row
    bands of ``tile_y`` instead costs one deterministic exchange (no
    sampling), spreads evenly over ``n_partitions``, and keeps spatially
    adjacent tiles in the same output file, so file-level min/max stats
    still prune bbox/point queries.  Probe medians: 6.3 s at 2 cores ->
    1.8 s at 8 (3.6x on 4x cores) vs range's 15 -> 15.
    """
    from pyspark.sql import functions as F

    # multi-band tile tables co-locate by band too, so a band-partitioned
    # write (partitionBy("var", "level")) emits few files per directory
    var_cols = ["var"] if "var" in df.columns else []
    return df.repartition(
        # floor, not truncate-toward-zero: scenes anchored below the grid
        # origin produce negative tile_y, and truncation would fold bands
        # [-block+1 .. block-1] into one double-width band
        n_partitions,
        *var_cols,
        F.col(level_col),
        F.floor(F.col(y_col) / block).cast("long"),
    ).sortWithinPartitions(*var_cols, level_col, y_col, x_col)


def zorder_key(
    x_col: str = "tile_x", y_col: str = "tile_y", bits: int = 14
):
    """Morton (Z-order) interleave of two tile indices as a JVM expression.

    28 shift/mask terms — stays inside whole-stage codegen, no UDF.  Used to
    cluster the tile write so parquet row-group min/max stats are tight on
    BOTH axes: a y-band sort gives tight ``tile_y`` ranges but leaves
    ``tile_x`` spanning the whole level per row group; Z-order bounds both,
    so a bbox query prunes row groups in x AND y (verified against parquet
    footer stats in tests/test_zorder.py).
    """
    from pyspark.sql import functions as F

    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return z


def zorder_partition(
    df: DataFrame,
    n_partitions: int,
    grid_bits: int,
    level_col: str = "level",
    y_col: str = "tile_y",
    x_col: str = "tile_x",
    x0: int = 0,
    y0: int = 0,
) -> DataFrame:
    """Z-order-clustered repartition: the 2-D twin of spatial_block_partition.

    ``grid_bits`` = bits per axis of the tile EXTENT (known from the layout
    metadata or one exact key aggregation — NOT sampled, so there is no
    sampling job).  ``(x0, y0)`` translate indices to the data's own origin
    before interleaving: scene tile grids usually occupy an offset subgrid
    of the global index space, and ABSOLUTE Morton codes of an offset
    region collapse into a handful of coarse z-blocks (measured: 4
    non-empty partitions from a 64-scene layout -> no write parallelism);
    with the origin removed the region is dense at the bottom of the curve
    and the z-region split spreads evenly.

    The Morton space is cut into ~``n_partitions`` CONTIGUOUS z-regions
    (partition key = ``z >> (2*grid_bits - log2(n))``); rows sort by z
    inside each partition, so every parquet row group covers one contiguous
    Morton run and its min/max stats are tight on BOTH axes (verified
    against footer stats in tests/test_zorder.py).  Same single-exchange
    cost as the y-band path.
    """
    import math

    from pyspark.sql import functions as F

    df = df.withColumn("_zx", F.col(x_col) - F.lit(x0)).withColumn(
        "_zy", F.col(y_col) - F.lit(y0)
    )
    return _z_tail(df, n_partitions, grid_bits, level_col)


def _z_tail(df: DataFrame, n_partitions: int, grid_bits: int, level_col: str) -> DataFrame:
    """Shared Morton tail: interleave _zx/_zy, split into contiguous
    z-regions, sort by z inside each partition (single source of the shift
    formula for both the scalar-origin and per-level-origin paths)."""
    import math

    from pyspark.sql import functions as F

    shift = max(0, 2 * grid_bits - max(1, math.ceil(math.log2(n_partitions))))
    z = zorder_key("_zx", "_zy", bits=grid_bits)
    return (
        df.withColumn("_z", z)
        .drop("_zx", "_zy")
        .repartition(n_partitions, F.col(level_col), F.shiftright(F.col("_z"), shift))
        .sortWithinPartitions(level_col, "_z")
        .drop("_z")
    )


def zorder_partition_auto(
    df: DataFrame,
    n_partitions: int,
    level_col: str = "level",
    y_col: str = "tile_y",
    x_col: str = "tile_x",
) -> DataFrame:
    """Z-order partition with PER-LEVEL origins + a shared grid_bits, all
    derived from the EXACT key extents (one tiny aggregation per call —
    deterministic, not sampled); empty inputs pass through unchanged.

    Per-level normalization matters when one call covers a whole pyramid:
    each level's tile indices nest inside the finer level's range, so a
    single global origin leaves every level but one offset — and offset
    regions collapse into few Morton blocks (see zorder_partition).  The
    per-level origin table is tiny (O(levels)) and broadcast-joined.
    """
    import math

    from pyspark.sql import functions as F

    stats = (
        df.groupBy(level_col)
        .agg(
            F.min(x_col).alias("_x0"),
            F.min(y_col).alias("_y0"),
            F.max(x_col).alias("_x1"),
            F.max(y_col).alias("_y1"),
        )
        .collect()
    )
    if not stats:
        return df
    extent = max(
        max(int(r._x1) - int(r._x0), int(r._y1) - int(r._y0), 1) for r in stats
    )
    grid_bits = max(1, extent.bit_length())
    spark = df.sparkSession
    from ..sources.tables import local_df

    origins = local_df(
        spark,
        [(r[0], int(r._x0), int(r._y0)) for r in stats],
        f"{level_col} int, _ox long, _oy long",
    )
    joined = df.join(F.broadcast(origins), level_col)
    joined = (
        joined.withColumn("_zx", F.col(x_col) - F.col("_ox"))
        .withColumn("_zy", F.col(y_col) - F.col("_oy"))
        .drop("_ox", "_oy")
    )
    return _z_tail(joined, n_partitions, grid_bits, level_col)


def hilbert_key(x_col: str = "tile_x", y_col: str = "tile_y", bits: int = 8):
    """Hilbert-curve index of two tile coordinates as a JVM expression.

    The locality upgrade over ``zorder_key``: consecutive Hilbert codes are
    ALWAYS 4-adjacent cells (unit steps — proven exhaustively for the full
    curve in tests/test_hilbert.py), so any contiguous code range — aligned
    or not — stays spatially compact, where Morton takes long diagonal
    jumps at power-of-two boundaries.  Databricks liquid clustering and
    modern lakehouse layouts default to Hilbert for exactly this reason;
    use it as the drop-in cluster key wherever ``zorder_key`` is used.

    Implementation: the standard per-level rotate/reflect recurrence
    (quadrant digit ``(3*rx) XOR ry``, reflection ``s-1-v`` on the lower-
    left quadrant, swap on every non-upper level), unrolled at build time
    into a pure CASE/bit-arithmetic column expression — whole-stage
    codegen, no UDF.

    NOTE the single-Column form duplicates the x/y subtrees at every
    level — the expression tree is O(3^bits) and Catalyst ANALYSIS cost
    dominates beyond ~6 bits (measured: 7-8 s planning at bits=6 vs
    ~0.2 s for ``with_hilbert``).  Use this form only for tiny grids or
    golden tests; production paths go through ``with_hilbert`` (named
    per-level intermediates, O(bits) plan size, same values).
    """
    from pyspark.sql import functions as F

    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d = F.lit(0).cast("long")
    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
        d = d + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry)
        # rotate/reflect for the next level: ry==1 -> unchanged;
        # ry==0, rx==1 -> reflect both then swap; ry==0, rx==0 -> swap
        x_next = F.when(ry == 1, x).otherwise(
            F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        )
        y_next = F.when(ry == 1, y).otherwise(
            F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        )
        x, y = x_next, y_next
    return d


def with_hilbert(
    df: DataFrame,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    bits: int = 8,
    out: str = "h",
) -> DataFrame:
    """Append the Hilbert index as column ``out`` — the production form.

    Same recurrence as ``hilbert_key`` but each level's rotated (x, y)
    and partial d are NAMED intermediate columns, one projection per
    level: plan size O(bits) instead of the single-Column form's
    O(3^bits) tree (CollapseProject leaves the chain alone because the
    per-level CASE expressions are non-cheap multi-consumer).  Values are
    identical (pinned in tests/test_hilbert.py).
    """
    from pyspark.sql import functions as F

    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    df = df.withColumns(
        {
            "_hx": F.col(x_col).cast("long"),
            "_hy": F.col(y_col).cast("long"),
            out: F.lit(0).cast("long"),
        }
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        x, y = F.col("_hx"), F.col("_hy")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
        df = df.withColumns(
            {
                out: F.col(out)
                + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry),
                "_hx": F.when(ry == 1, x).otherwise(
                    F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
                ),
                "_hy": F.when(ry == 1, y).otherwise(
                    F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
                ),
            }
        )
    return df.drop("_hx", "_hy")
