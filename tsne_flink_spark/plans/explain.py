"""Plan introspection — the reference's env.getExecutionPlan()
(Tsne.scala:89-95) mapped to Catalyst's formatted explain."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """Return the formatted physical plan as a string."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
