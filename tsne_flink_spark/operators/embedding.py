"""Working-set lifecycle: init, momentum/gain update, centering.

All math is Column-expression ``zip_with``/``transform`` chains over
ARRAY<DOUBLE> — whole-stage codegen, no Python in the hot path.

Reference: TsneHelpers.scala:198-218 (init), :341-368 (update),
:320-339 (centering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def init_working_set(
    points: DataFrame, n_components: int = 2, random_state: int = 0
) -> DataFrame:
    """(id, ...) -> (id, y, grad, gains): y ~ N(0, 1e-4), grad=0, gains=1.

    The reference accepts ``randomState`` but never seeds its RNG (quirk Q4,
    TsneHelpers.scala:204-212); here ``F.randn(seed)`` makes the init
    reproducible for a fixed partitioning.
    """
    y = F.array(
        *[F.randn(random_state + c) * F.lit(1e-4) for c in range(n_components)]
    )
    zeros = F.array(*[F.lit(0.0)] * n_components)
    ones = F.array(*[F.lit(1.0)] * n_components)
    return points.select(
        F.col("id"), y.alias("y"), zeros.alias("grad"), ones.alias("gains")
    )


def update_embedding(
    gradient: DataFrame,
    working_set: DataFrame,
    min_gain: float = 0.01,
    momentum: float = 0.5,
    learning_rate: float = 1000.0,
) -> DataFrame:
    """One momentum + adaptive-gain gradient-descent step.

    Per component c (TsneHelpers.scala:357-366):
      gain'  = max(gain*0.8, min_gain)  if sign(dY)==sign(prevGrad) else
               max(gain+0.2, min_gain)
      grad'  = momentum*prevGrad - lr*gain'*dY
      y'     = y + grad'

    The sign test is the reference's ``(g > 0) == (pg > 0)`` (zero counts as
    non-positive).  Implemented as zip_with chains — the join is the only
    shuffle, keyed on id.
    """
    g = gradient.select(F.col("id"), F.col("dy"))
    joined = g.join(working_set, "id")

    same_sign = F.zip_with(
        F.col("dy"),
        F.col("grad"),
        lambda c, p: ((c > F.lit(0.0)) == (p > F.lit(0.0))).cast("double"),
    )
    new_gains = F.zip_with(
        same_sign,
        F.col("gains"),
        lambda s, gain: F.greatest(
            F.when(s > F.lit(0.5), gain * F.lit(0.8)).otherwise(gain + F.lit(0.2)),
            F.lit(float(min_gain)),
        ),
    )
    with_gains = joined.withColumn("__new_gains", new_gains)
    # grad' = momentum*prev - lr*gain'*dy, built as two zips
    step = F.zip_with(
        F.col("__new_gains"),
        F.col("dy"),
        lambda gain, c: F.lit(-float(learning_rate)) * gain * c,
    )
    new_grad = F.zip_with(
        F.transform(F.col("grad"), lambda p: F.lit(float(momentum)) * p),
        step,
        lambda a, b: a + b,
    )
    with_grad = with_gains.withColumn("__new_grad", new_grad)
    new_y = F.zip_with(F.col("__new_grad"), F.col("y"), lambda a, b: a + b)
    return with_grad.select(
        F.col("id"),
        new_y.alias("y"),
        F.col("__new_grad").alias("grad"),
        F.col("__new_gains").alias("gains"),
    )


def _center(df: DataFrame, vec_col: str, n_components: int) -> DataFrame:
    means = df.agg(
        F.array(
            *[F.avg(F.col(vec_col)[c]) for c in range(n_components)]
        ).alias("__mean")
    )
    centered = F.zip_with(F.col(vec_col), F.col("__mean"), lambda a, b: a - b)
    out_cols = [
        centered.alias(vec_col) if c == vec_col else F.col(c) for c in df.columns
    ]
    return df.crossJoin(F.broadcast(means)).select(*out_cols)


def center_embedding(working_set: DataFrame, n_components: int = 2) -> DataFrame:
    """Subtract the mean embedding; runs every iteration
    (TsneHelpers.scala:320-329).  Global agg -> 1-row broadcast."""
    return _center(working_set, "y", n_components)


def center_input(points: DataFrame, n_components: int | None = None) -> DataFrame:
    """Center (id, features) points.  Dead code in the reference
    (quirk Q9, TsneHelpers.scala:331-339) — implemented as public surface."""
    if n_components is None:
        n_components = len(points.select("features").head()["features"])
    return _center(points, "features", n_components)
