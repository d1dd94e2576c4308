"""Vector math over ArrayType columns — JVM-side, codegen-friendly.

KeystoneML represents features as Breeze ``DenseVector[Double]`` and runs
BLAS on per-partition matrices (reference: ``utils/MatrixUtils.scala#
rowsToMatrix``). Spark-first equivalent: ``array<double>`` columns with
higher-order functions (``aggregate``/``zip_with``/``transform``) so the
arithmetic stays inside whole-stage codegen — no Python in the hot path.
For genuinely matrix-shaped kernels use the pandas_udf paths in
``operators/learning.py`` (Arrow-batched numpy = the BLAS-3 analogue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double precision)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array columns; NULL-safe on zero norms."""
    d = dot(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, d / n)


def scale_shift(a: Column | str, mul: float = 1.0, add: float = 0.0) -> Column:
    """Elementwise x*mul + add over an array column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x.cast("double") * F.lit(mul) + F.lit(add))


def elementwise(a: Column | str, fn) -> Column:
    """Lift a Column->Column scalar fn over an array column.

    The Spark-side analogue of KeystoneML's ``Transformer.apply(f: A => B)``
    (reference: ``workflow/Transformer.scala#Transformer.apply``) for
    per-element numeric maps: stays in codegen, no UDF.
    """
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, fn)
