from tsne_flink_spark.sources.readers import (
    read_coo_csv,
    read_distance_matrix,
    read_points,
    load_table,
)
from tsne_flink_spark.sources.writers import (
    write_embedding_csv,
    write_execution_plan,
    write_loss,
)

__all__ = [
    "read_coo_csv",
    "read_distance_matrix",
    "read_points",
    "load_table",
    "write_embedding_csv",
    "write_execution_plan",
    "write_loss",
]
