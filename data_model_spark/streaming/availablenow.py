"""Structured-Streaming entrypoint: Trigger.AvailableNow over the image table.

The reference has no streaming (SURVEY.md §2.9); what the north rule needs
is *resumable batch*, which ``resume.ResumableTileWrite`` provides.  This
module is the optional Structured-Streaming sugar: the same decode->tile
pipeline as ``readStream`` over the image parquet directory with
``Trigger.AvailableNow`` + a checkpointLocation, giving restart-exactly-once
per file through Spark's own streaming offset log — the engine code is
unchanged (``build_tiles`` is trigger-agnostic).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import tiling
from ..sources.images import IMAGE_SCHEMA


def stream_tiles_available_now(
    spark: SparkSession,
    images_path: str,
    out_path: str,
    checkpoint_path: str,
    min_dimension: int = 64,
) -> StreamingQuery:
    """Drain all currently-available image files into the tile table, once.

    Re-running after a crash resumes from the streaming checkpoint (file
    offsets), the streaming twin of the anti-join resume.
    """
    images = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(images_path)
    )
    tiles = tiling.build_tiles(images, min_dimension=min_dimension, repartition=False)
    return (
        tiles.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("level")
        .format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .start()
    )
