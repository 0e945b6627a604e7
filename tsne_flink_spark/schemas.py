"""Static schemas for every record shape in the engine (SURVEY §1.4).

The reference models everything as flat Scala tuples (TsneHelpers.scala:41-230);
here each shape is a DataFrame schema.  Vectors are ``ARRAY<DOUBLE>`` so SQL
higher-order functions (``transform``/``zip_with``/``aggregate``) stay JVM-side.
"""

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

# R1 — COO sparse-matrix entry (i, j, value): input points, distances, kNN
# edges, affinities P(j|i), joint P(ij).  Reference: Tsne.scala:67,141.
COO = StructType(
    [
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("v", DoubleType(), False),
    ]
)

# R2 — assembled point (id, features).  Reference: (Int, Vector[Double]).
POINTS = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)

# Embedding point (id, y) — same shape, y has length n_components.
EMBEDDING = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("y", ArrayType(DoubleType(), False), False),
    ]
)

# R4 — optimizer working set (id, y, lastGradient, gains).
# Reference: TsneHelpers.scala:198-199.
WORKING_SET = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("y", ArrayType(DoubleType(), False), False),
        StructField("grad", ArrayType(DoubleType(), False), False),
        StructField("gains", ArrayType(DoubleType(), False), False),
    ]
)

# Loss record (iteration, loss) — replaces the reference's MapAccumulator
# side-channel (MapAccumulator.java:27-77) with a deterministic aggregate.
LOSS = StructType(
    [
        StructField("iteration", IntegerType(), False),
        StructField("loss", DoubleType(), False),
    ]
)
