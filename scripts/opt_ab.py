#!/usr/bin/env python
"""Round-11 optimization A/B harness: time a subset of gates solo,
min-of-N, with the bench calibration probe before and after — the
committed measurement discipline (README round-10/11 lessons: the host
is 1.3-2x bimodal, single-shot timings are junk, and sequential
same-variant repeats drift; interleave variants across processes and
compare only calibration-normalized min-of-N).

Usage:
    python scripts/opt_ab.py q25_percentile_histogram t16_vocabulary
    SPARK_GRAFT_AB_RUNS=3 python scripts/opt_ab.py s02_sliding_window

Prints one JSON line: {"gates": {name: sec}, "calibration_sec": ...,
"calibration_post_sec": ..., "loadavg_1min": [pre, post]}.
Never run concurrently with another Spark session on this host.
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
    gates = [g for g in sys.argv[1:] if not g.startswith("-")]
    if not gates:
        print("usage: opt_ab.py <gate> [gate ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3")))
    load_pre = os.getloadavg()[0]

    from stepist_spark.queries import all_queries
    from stepist_spark.session import get_spark, load_table

    spark = get_spark(app_name="opt_ab")
    # bench.py's warmup, abbreviated: touch the fact tables + one Arrow
    # pandas_udf round-trip so bring-up doesn't bill the first gate
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "documents").count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).count()

    calib = calibrate(spark)
    registry = all_queries()
    out: dict[str, float] = {}
    for name in gates:
        spec = registry[name]
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    result = {
        "gates": out,
        "total": round(sum(out.values()), 3),
        "calibration_sec": calib,
        "calibration_post_sec": calibrate(spark),
        "loadavg_1min": [round(load_pre, 2), round(os.getloadavg()[0], 2)],
        "runs": n_runs,
    }
    print(json.dumps(result, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
