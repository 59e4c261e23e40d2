"""Referential-integrity checking — the FK validation pass an
ingestion pipeline runs before publishing a snapshot: for each
child->parent relation, how many child rows point at a missing parent.

Spark-first shape: one LEFT ANTI join per relation, keyed on the FK —
the same co-partitioned hash join a query would use, so at 100 TB the
cost equals one keyed join per relation and the parent side can
broadcast when it is a dimension. No row ever leaves the executors;
only per-relation counts return.

Reference parity: the reference has no integrity surface (SURVEY.md
§2.2 'absent'); BASELINE.json extension.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Relation(NamedTuple):
    name: str
    child: DataFrame
    parent: DataFrame
    child_key: str
    parent_key: str


def fk_orphan_rows(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no matching parent (NULL FKs are not
    orphans — SQL FK semantics)."""
    p = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(p, child[child_key] == p["__pk"], "left_anti")
    )


def fk_report(spark: SparkSession, relations: Sequence[Relation]) -> DataFrame:
    """One row per relation: ``relation, n_child, n_orphans``."""
    parts = []
    for r in relations:
        summary = fk_orphan_rows(r.child, r.parent, r.child_key, r.parent_key).agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        total = r.child.filter(F.col(r.child_key).isNotNull()).agg(
            F.count(F.lit(1)).alias("n_child")
        )
        parts.append(
            total.crossJoin(summary).select(
                F.lit(r.name).alias("relation"), "n_child", "n_orphans"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
