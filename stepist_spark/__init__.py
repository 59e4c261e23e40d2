"""stepist_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``electronick1/stepist``.

The reference (see ``/root/reference``, surveyed in SURVEY.md) chains
Python functions ("steps") into a dataflow DAG executed record-at-a-time
over Redis queues. This engine re-expresses those capabilities —
step chaining, fan-out (Hub / factory steps), barrier reduce, filtering
via StopFlowFlag, distributed execution — as a thin, lazy composition
layer over Spark DataFrames, and adds the full relational operator
surface (joins, aggregations, windows, set ops, streaming) plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) built Spark-first.

Design stance: DataFrame-native, lazy, schema-first. Catalyst is the
planner, Tungsten the engine, Structured Streaming the worker runtime.
No row-at-a-time execution, no queue transport, no custom IR.

Contributing — the window-hygiene contract: every new operator that
windows or ranks picks its frame helper from the decision table at the
top of ``stepist_spark/operators/cumulative.py`` (bounded frame →
``whole_frame``/``grouped_frame``; raw rows → ``require_groups``;
global order over unbounded data → ``ordered_cumsum`` family). Bare
``Window.partitionBy()`` is lint-banned (``tests/test_plans.py``) and
every gate plan is swept for single-task windows; new operators also
ship a DuckDB ``*_sql`` mirror in the same module, a tag-union gate
part, and a mirror-parity unit test.
"""

from stepist_spark.session import get_spark, stop_spark
from stepist_spark.pipeline import (
    Engine,
    FlowResult,
    Hub,
    Pipeline,
    Step,
    StopFlowFlag,
    meta_value,
    with_meta,
)

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "FlowResult",
    "Hub",
    "Pipeline",
    "Step",
    "StopFlowFlag",
    "get_spark",
    "meta_value",
    "stop_spark",
    "with_meta",
]
