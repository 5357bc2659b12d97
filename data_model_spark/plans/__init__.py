from .partitioning import plan_partitions, repartition_for_grid  # noqa: F401
