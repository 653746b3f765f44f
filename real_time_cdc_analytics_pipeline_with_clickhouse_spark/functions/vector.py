"""Vector (embedding) column helpers — cosine / dot / norm.

Embeddings are ``array<float>`` columns.  The arithmetic runs as
``F.aggregate`` / ``F.zip_with`` (JVM, sequential fold in index order —
deterministic, unlike a shuffled SUM) with double accumulators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
