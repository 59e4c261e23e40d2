"""Streaming count-barrier reduce with real timeout semantics.

The reference's ReducerStep collects the N branch results of one
``hub_job_id`` in Redis (ZINCRBY arrival counter + HSET payload,
`stepist/flow/workers/reducer_engine.py:21-44`), fires the handler once
when the counter reaches N — N is encoded in the key itself as
``"<uuid4>:<N>"`` (`stepist/flow/steps/hub.py:12-14`) — and silently
drops groups that don't complete within ``reducer_job_lifetime`` (30s,
`stepist/app.py:44`; expiry at `reducer_engine.py:40-43`). Its
incomplete-barrier requeue path is bugged upstream (argument-swapped
zincrby, `reducer_engine.py:61-65`); we implement the *intended*
semantics, per SURVEY.md §7.4.

Here the barrier is ``applyInPandasWithState``: per-group state holds
the payloads seen so far; the group fires exactly once when the
expected count arrives; a processing-time timeout drops incomplete
groups — the TTL, as a principled state-store timeout instead of Redis
key expiry. State is partitioned by group key across executors, so the
barrier scales horizontally (no single Redis holding all in-flight
groups in RAM).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# State: arrival counter + payloads-so-far (each row JSON-encoded; the
# reference's wire format is also JSON, `simple_queue.py:49-51`).
_STATE_SCHEMA = "count INT, jobs ARRAY<STRING>"


def barrier_reduce(
    df: DataFrame,
    group_key: str = "hub_job_id",
    payload_cols: Sequence[str] | None = None,
    expected_count: int | None = None,
    ttl_sec: float | None = 30.0,
    reduce_fn: Callable[[str, list[dict[str, Any]]], dict[str, Any]] | None = None,
) -> DataFrame:
    """Barrier-collect a streaming DataFrame per ``group_key``.

    Emits ONE row per completed group: ``(group_key, job_list, n)``
    where ``job_list`` is the JSON-encoded payload rows (decode with
    ``F.from_json`` or hand to ``reduce_fn``). Groups not complete
    within ``ttl_sec`` of their last arrival are dropped, firing never
    — the reference's TTL-drop late-data policy.

    ``expected_count``: global N; when None, N is parsed from the key
    suffix ``"...:<N>"`` (the reference's Hub encoding,
    `stepist/flow/steps/hub.py:12-14`).

    ``ttl_sec=None`` disables the processing-time TTL entirely
    (GroupStateTimeout.NoTimeout): incomplete groups are retained until
    they complete and simply never fire otherwise. Use this for
    drain-style runs (trigger ``availableNow``), where a pending
    processing-time timer would keep the engine looping no-data
    micro-batches waiting for wall-clock expiry instead of
    terminating.

    ``reduce_fn(key, rows) -> dict``: optional driver-free reduce
    applied inside the state handler; output row is
    ``(group_key, result_json, n)`` with the result JSON-encoded in
    ``job_list[0]``.
    """
    if not df.isStreaming:
        raise ValueError(
            "barrier_reduce is the streaming barrier; for batch use "
            "stepist_spark.pipeline.ReducerStep (groupBy + collect_list)"
        )
    payload = list(payload_cols) if payload_cols else [c for c in df.columns if c != group_key]
    ttl_ms = None if ttl_sec is None else int(ttl_sec * 1000)
    # output key typed like the input key (a bigint job id stays bigint)
    key_ddl = df.schema[group_key].dataType.simpleString()
    if expected_count is None and key_ddl != "string":
        raise ValueError(
            "without expected_count the barrier parses N from a "
            f"'<id>:<N>' string key, but {group_key} is {key_ddl}; "
            "pass expected_count explicitly"
        )
    output_schema = f"group_key {key_ddl}, job_list ARRAY<STRING>, n INT"

    def handle(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        gk = key[0]
        if state.hasTimedOut:
            # TTL expiry: drop the incomplete group, emit nothing.
            state.remove()
            return
        count, jobs = state.get if state.exists else (0, [])
        jobs = list(jobs)
        for pdf in pdf_iter:
            for rec in pdf[payload].to_dict("records"):
                jobs.append(json.dumps(rec, default=str, sort_keys=True))
        count = len(jobs)

        if expected_count is not None:
            n_expected = expected_count
        else:
            try:
                n_expected = int(str(gk).rsplit(":", 1)[1])
            except (IndexError, ValueError):
                n_expected = None  # unknown N: fire only on timeout-drop (never)

        if n_expected is not None and count >= n_expected:
            state.remove()
            if reduce_fn is not None:
                out = [json.dumps(reduce_fn(gk, [json.loads(j) for j in jobs]), default=str)]
            else:
                out = jobs
            yield pd.DataFrame({"group_key": [gk], "job_list": [out], "n": [count]})
        else:
            state.update((count, jobs))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return df.groupBy(group_key).applyInPandasWithState(
        handle,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
