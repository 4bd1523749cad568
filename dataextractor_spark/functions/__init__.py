"""Reusable column-expression builders (all JVM-side built-ins)."""

from dataextractor_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = ["cosine_similarity", "dot_product", "l2_norm"]
