"""geozarr-spark: a PySpark-native spatial-join + tiling engine.

Brand-new implementation (not a port) of the query / data-processing
capabilities of EOPF-Explorer/data-model (``eopf-geozarr``), re-expressed
Spark-first: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for
pixel-touching kernels, explicit ``repartitionByRange`` partitioning,
broadcast + salted sort-merge joins, and a checkpoint/resume layer.

Subpackages
-----------
functions   pure deterministic geometry/planning kernels (gridlib, CRS,
            cell index, polygon geometry) — zero Spark dependencies
codecs      image byte codecs (pure-NumPy PNG, raw u16, marked lossy stub)
sources     synthetic image+caption table generator and table IO layer
operators   Spark operators: downsampling/pyramid, spatial joins, dedup,
            similarity search, text analysis, validation, resume
plans       partitioning planner (chunk/shard-aligned range partitioning)
streaming   Trigger.AvailableNow-style resumable batch entrypoints
"""

__version__ = "0.1.0"
