"""Vector similarity expressions over array<float|double> columns.

Built-in higher-order functions (zip_with / aggregate) keep the math
JVM-side; at 100 TB the dot products run inside whole-stage codegen with
no Python worker round-trip. DuckDB twins: list_dot_product /
list_cosine_similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def lit_vec(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])
