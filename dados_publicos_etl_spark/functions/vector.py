"""Vector math over ``array<float>`` columns — pure Catalyst
expressions (no Python in the hot path).

``F.zip_with`` + ``F.aggregate`` compile to codegen'd loops over the
array, so a cosine against a broadcast query vector is a narrow map:
no shuffle, no UDF, scales linearly with rows.  Elements are widened
float->double before multiplication so results match an oracle that
does the same widening.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns (double acc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm (double)."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (double); NULL if either norm is zero."""
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: list[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(v)) for v in values])
