"""Composite operators built from DataFrame primitives.

Each operator is a function ``(DataFrame, ...) -> DataFrame`` designed
for 100 TB inputs: no driver-side collection, single-shuffle shapes
where possible, broadcast for small sides, LSH bucketing for the
quadratic problems (near-dup, ANN).
"""

from stepist_spark.operators import (
    anomaly,
    asof,
    attribution,
    cdc,
    clusters,
    dedup,
    graphs,
    integrity,
    layout,
    multimodal,
    privacy,
    profiling,
    regression,
    segmentation,
    sessions,
    similarity,
    sketches,
    skew,
    skyline,
    timeseries,
    topk,
)

__all__ = [
    "anomaly",
    "asof",
    "attribution",
    "cdc",
    "clusters",
    "dedup",
    "graphs",
    "integrity",
    "layout",
    "multimodal",
    "privacy",
    "profiling",
    "regression",
    "segmentation",
    "sessions",
    "similarity",
    "sketches",
    "skew",
    "skyline",
    "timeseries",
    "topk",
]
