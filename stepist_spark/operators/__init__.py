"""Composite operators built from DataFrame primitives.

Each operator is a function ``(DataFrame, ...) -> DataFrame`` designed
for 100 TB inputs: no driver-side collection, single-shuffle shapes
where possible, broadcast for small sides, LSH bucketing for the
quadratic problems (near-dup, ANN).
"""

from stepist_spark.operators import asof, dedup, multimodal, similarity, sketches, skew, topk

__all__ = ["asof", "dedup", "multimodal", "similarity", "sketches", "skew", "topk"]
