"""Streaming grouped top-k — bounded O(k) state per key.

The reference keeps "current best" style rollups by replaying whole
queues through a worker (`stepist/flow/workers/worker_engine.py:15-35`
— every message visits the handler, nothing is retained but the
handler's own side state). The Spark-native form is incremental: each
micro-batch folds its rows into a per-key top-k retained in the state
store, so a key that has seen a billion rows holds exactly ``k`` tuples
of state — the property that makes grouped "current leaders" viable
over an unbounded 100 TB stream where buffering rows (or re-sorting
history per trigger, as complete-mode ``row_number`` would) cannot be.

Implementation note — which arbitrary-state API: Spark 4 ships
``transformWithStateInPandas`` (typed ListState/MapState/ValueState
variables, timers, RocksDB-required) as the successor to
``applyInPandasWithState``. Its Python client speaks protobuf to a
JVM-side state server, so it needs the ``google.protobuf`` runtime —
NOT present in this environment (no package installs), and the
driver-side schema worker hard-crashes without it
(`pyspark/sql/streaming/proto/*_pb2.py``). The operator therefore uses
``applyInPandasWithState`` — the API every other stateful operator
here certifies (`streaming/barrier.py`) — whose state encoding is
JVM-side row codecs, no protobuf. The semantics certified by the s02
'topk' gate part are API-independent; on a cluster with protobuf
available, swapping the fold into a ``StatefulProcessor`` with a
ListState buffer is mechanical and keeps every contract below.

State per key: ``(seq BIGINT, heap ARRAY<STRUCT<...>>)`` with the heap
trimmed to ``k`` on every update — never row history. Run it under the
RocksDB provider (``state_store_provider(spark, "rocksdb")`` /
``StreamFlow(state_store="rocksdb")``) to keep that state off-heap —
the s02 'topk' gate does, making the round-11 provider path
load-bearing in a gate.

Emission contract: every micro-batch in which a key receives input
emits that key's FULL current top-k, stamped with ``rank`` (1-based)
and ``seq`` (how many micro-batches have touched the key so far).
After a drain, the final standings are the rows with the per-key
maximum ``seq`` — ``latest_topk`` below does exactly that — and equal
the batch ``row_number() <= k`` result over the same input, which is
the oracle the s02 'topk' gate part hash-certifies.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

# Numeric Spark SQL types whose Python values order correctly under
# tuple sort with unary negation (the descending trick).
_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def stream_topk(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    order_col: str,
    k: int,
    id_col: str,
    payload_cols: Sequence[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Maintain the per-key top-``k`` rows of a stream by ``order_col``.

    Ties on ``order_col`` break by ``id_col`` ascending, so the result
    is deterministic and equals the batch
    ``row_number() OVER (PARTITION BY key ORDER BY order [DESC], id)``
    ≤ k — which is exactly what the s02 'topk' oracle checks.

    ``order_col`` must be a non-null numeric column (tuple-sort with
    negation implements DESC); ``id_col`` non-null and unique per row.
    Output columns: ``*key_cols, order_col, id_col, *payload_cols,
    rank INT, seq BIGINT`` — see module docstring for the emission
    contract and ``latest_topk`` for final standings.
    """
    if not df.isStreaming:
        raise ValueError(
            "stream_topk is the streaming top-k; for batch use "
            "stepist_spark.operators.topk (TakeOrderedAndProject)"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = [order_col, id_col, *(payload_cols or [])]
    order_ddl = df.schema[order_col].dataType.simpleString()
    if order_ddl not in _NUMERIC:
        raise ValueError(
            f"order_col {order_col!r} is {order_ddl}; stream_topk orders "
            f"numeric columns only (one of {sorted(_NUMERIC)})"
        )
    elem_ddl = ", ".join(
        f"{c}: {df.schema[c].dataType.simpleString()}" for c in cols
    )
    state_schema = f"seq BIGINT, heap ARRAY<STRUCT<{elem_ddl}>>"
    out_schema = StructType(
        [df.schema[c] for c in keys]
        + [df.schema[c] for c in cols]
        + list(StructType.fromDDL("rank INT, seq BIGINT"))
    )

    def sort_key(t: tuple):
        # order value first (negated for descending — numeric-only by
        # construction), then id ascending as the deterministic tie-break
        return (-t[0] if descending else t[0], t[1])

    def handle(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seq, heap = state.get
            cur = [tuple(r) for r in heap]
        else:
            seq, cur = 0, []
        for pdf in pdf_iter:
            cur.extend(pdf[cols].itertuples(index=False, name=None))
        cur.sort(key=sort_key)
        cur = cur[:k]
        seq += 1
        state.update((seq, cur))
        out = pd.DataFrame(cur, columns=cols)
        for i, kc in enumerate(keys):
            out.insert(i, kc, key[i])
        out["rank"] = range(1, len(cur) + 1)
        out["seq"] = seq
        yield out

    return df.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_topk(sink_df: DataFrame, key_cols: Sequence[str] | str) -> DataFrame:
    """Final standings from a drained ``stream_topk`` sink: the rows of
    each key's LAST emission (max ``seq``), ``seq`` dropped. A batch
    helper — run it on the sink table, not inside the stream."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in keys])
    return (
        sink_df.withColumn("_mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("_mx"))
        .drop("_mx", "seq")
    )
