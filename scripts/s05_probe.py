#!/usr/bin/env python
"""s05 drain-wall regression probe (round-11 verdict #1), the committed
s03 template from round 10: min-of-3, calibrated, sibling-controlled,
with per-query micro-batch progress dumps and an ORDER permutation to
test the "m01 jpg Python-worker pool slows later streaming gates"
hypothesis.

Usage:
    python scripts/s05_probe.py            # s05 first (cold streaming)
    python scripts/s05_probe.py --m01-first  # run m01 once before s05

Prints one JSON document with: loadavg before/after, calibration_sec
(min-of-3, bench.py's exact probe), per-run s05 gate wall + PART_WALL
offsets + micro-batch shapes (batch count, trigger ms, state rows), and
the s03 sibling control. Run each permutation in its OWN process (fresh
JVM) on a quiet host; never concurrently with another Spark session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def calibrate(spark) -> float:
    from pyspark.sql.functions import col, xxhash64

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).select(
            (xxhash64(col("id")) % 97).alias("k")
        ).groupBy("k").count().collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    m01_first = "--m01-first" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from stepist_spark.queries import PART_WALL, all_queries
    from stepist_spark.queries import streaming_gates as sg
    from stepist_spark.session import get_spark, load_table

    spark = get_spark(app_name="s05_probe")
    out: dict = {
        "m01_first": m01_first,
        "sf_dir": sf_dir,
        "loadavg_before": [round(x, 2) for x in os.getloadavg()],
    }

    # bench.py's exact warmups so the first measured drain isn't billed
    # engine bring-up (parquet footers, codegen, Python/Arrow, streaming)
    load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "documents").count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).count()
    from stepist_spark.streaming.runtime import stream_shuffle_partitions

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 10)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    with stream_shuffle_partitions(spark, 2):
        wq = (
            src.groupBy().count().writeStream.format("memory")
            .queryName("_warm_stream").outputMode("complete")
            .trigger(processingTime="0 seconds").start()
        )
        deadline = time.time() + 30
        while time.time() < deadline and not wq.recentProgress:
            time.sleep(0.1)
        wq.stop()

    out["calibration_sec"] = calibrate(spark)

    registry = all_queries()
    if m01_first:
        t0 = time.perf_counter()
        registry["m01_media_features"].spark(spark, sf_dir).collect()
        out["m01_wall"] = round(time.perf_counter() - t0, 3)

    def run_gate(name: str, runs: int) -> list[dict]:
        results = []
        for _ in range(runs):
            sg.LAST_PROGRESS.clear()
            t0 = time.perf_counter()
            registry[name].spark(spark, sf_dir).collect()
            wall = round(time.perf_counter() - t0, 3)
            results.append(
                {
                    "wall": wall,
                    "part_wall": dict(PART_WALL.get(name, {})),
                    "progress": {
                        k: v for k, v in sg.LAST_PROGRESS.items()
                    },
                }
            )
        return results

    out["s05_runs"] = run_gate("s05_stream_dedup", n_runs)
    out["s03_runs"] = run_gate("s03_stream_interval_join", n_runs)
    out["calibration_sec_post"] = calibrate(spark)
    out["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
