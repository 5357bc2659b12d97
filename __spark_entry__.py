"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (plus the training-data suites);
``oracle_sql()`` gives the DuckDB twin for each SQL-expressible one.
Registry lives in ``data_model_spark.operators.registry`` — each operator
module registers its (Spark callable, oracle SQL) pairs at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: image table -> decode -> pyramid -> global-grid tiles.

    Loads sf0.001 ``lineitem`` to anchor the run on the driver testdata
    (row-count scales the synthetic image batch), generates the
    deterministic image+caption table, cuts multiscale tiles against the
    global grid (one explicit ``repartitionByRange`` shuffle), and returns
    per-level pyramid metrics — stable schema, small row count.
    """
    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.sources import images as img_src
    from data_model_spark.sources.tables import load_table

    li_rows = load_table(spark, "/root/testdata/sf0.001", "lineitem").count()
    n_images = max(16, min(64, li_rows // 125))
    images = img_src.generate_images_df(spark, n_images)
    tiles = tiling.build_tiles(images, min_dimension=64, repartition=False)
    return tiling.tile_metrics(tiles).orderBy(F.col("level"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + training-data ops)."""
    from data_model_spark.operators.registry import all_queries

    return {name: spec.spark_fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query (others: rows-only)."""
    from data_model_spark.operators.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
