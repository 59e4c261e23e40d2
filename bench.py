#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is forced with .collect() (materializes the full result on the
driver — all registered queries are aggregates/top-k, so results are small
even at large SF). A throwaway warmup query amortizes JVM/codegen startup
so per-query numbers measure the plan, not session bring-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # 1-min loadavg at start AND end (round-10 verdict #6): calibration
    # is a point sample at the start; the host is bimodal WITHIN a run,
    # so a quiet start + loaded end explains late-gate stretch that the
    # calibration ratio alone can't.
    load_before = os.getloadavg()

    from stepist_spark.queries import all_queries
    from stepist_spark.session import get_spark, load_table

    spark = get_spark(app_name="stepist_spark_bench")

    # Warmup: touch the big fact table once so JVM classloading, codegen
    # and parquet footer caching don't bill the first measured query, and
    # run one trivial Arrow-batched pandas_udf so Python worker + Arrow
    # bring-up doesn't bill the first udf-bearing query (c01 sorts first).
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "embeddings").count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).count()

    # ... and one trivial streaming drain so streaming-engine bring-up
    # (state store, streaming codegen, trigger machinery) doesn't bill
    # the first streaming gate (s01).
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

    # Host-calibration probe (round-8 verdict #2): the host is bimodal
    # (identical code benched 150s quiet vs 239s contended the same
    # morning), so cross-round comparisons need a fixed pure-CPU
    # yardstick IN the artifact. A seeded in-memory aggregate over
    # spark.range(50M) — no IO, no Python workers, one exchange — timed
    # min-of-3. Normalize round-over-round totals by the ratio of their
    # calibration_sec before reading any regression as real.
    from pyspark.sql.functions import xxhash64

    def calibrate() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(50_000_000).select(
                (xxhash64(col("id")) % 97).alias("k")
            ).groupBy("k").count().collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    calib = calibrate()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # Per-query timings at sf0.1 carry seconds-scale jitter (round-2
    # bench "regressed" unchanged plans 2.7×): run each query N times
    # and keep the MIN — the standard de-noising for wall-clock
    # microbenchmarks, since noise is strictly additive.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # registry order — the same order the driver's correctness harness
    # uses, so per-query timings line up with CORRECTNESS rows (and the
    # residual cold-plan cost lands on the first registered gate rather
    # than on whichever name sorts first)
    for name, spec in all_queries().items():
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                spec.spark(spark, sf_dir).collect()
            except Exception as exc:  # keep benching; report the failure
                failures[name] = f"{type(exc).__name__}: {exc}"[:200]
                break
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        if best is not None and name not in failures:
            timings[name] = round(best, 3)

    # Per-part timing breakdown for the fattest tag-union gates
    # (round-6 verdict #9): each gate absorbed many parts over the
    # rounds, so future growth needs attribution without same-day A/B
    # runs. A literal part filter constant-folds every other union
    # branch to an empty relation, so each timed pass executes ONLY
    # that part's subtree (shared localCheckpoints were already
    # materialized by the main timing runs above).
    breakdown_gates = [
        g
        for g in os.environ.get(
            "SPARK_GRAFT_BENCH_PARTS",
            "q25_percentile_histogram,t08_jaccard_pairs,"
            "q22_event_windows,q02_join_agg_topk,q13_scalar_string_suite,"
            "t16_vocabulary,t23_model_gates,s05_stream_dedup,"
            "s03_stream_interval_join,m01_media_features,w01_sink_roundtrip,"
            # round 11: s01/s02/s04 now drain concurrently and
            # self-report PART_WALL start/done offsets like s03/s05 —
            # additive entries, nothing removed or renamed
            "q09_grouping_multi,s01_streaming_hourly,s02_sliding_window,"
            "s04_rate_windows",
        ).split(",")
        if g
    ]
    parts_out: dict[str, dict[str, float]] = {}
    registry = all_queries()
    from stepist_spark.queries import PART_WALL

    for gname in breakdown_gates:
        spec = registry.get(gname)
        if spec is None or gname in failures:
            continue
        # streaming gates spend their time in the gate FUNCTION, not
        # the returned plan — a filter-by-part re-collect off the
        # already-materialized sinks would time ~0s. Those gates
        # self-report per-part {"start", "done"} offsets from the
        # gate's t0 (recorded during the timed runs above; offsets,
        # not durations — the parts drain CONCURRENTLY, so done-start
        # still overlaps siblings); prefer that attribution.
        if gname in PART_WALL:
            parts_out[gname] = dict(PART_WALL[gname])
            continue
        try:
            gdf = spec.spark(spark, sf_dir)
            if "part" not in gdf.columns:
                continue
            from pyspark.sql.functions import col as _col

            tags = sorted(r["part"] for r in gdf.select("part").distinct().collect())
            # parts are cheap relative to the main runs — min-of-N
            # de-noises them the same way the headline timings are
            # (round-8 verdict #3: single-shot part timings drifted 6×
            # on the contended host)
            part_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PART_RUNS", "2")))
            per: dict[str, float] = {}
            for tag in tags:
                best = None
                for _ in range(part_runs):
                    t0 = time.perf_counter()
                    gdf.filter(_col("part") == tag).collect()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                per[tag] = round(best, 3)
            parts_out[gname] = per
        except Exception as exc:
            failures[f"{gname}:parts"] = f"{type(exc).__name__}: {exc}"[:200]

    # The driver archives only the TAIL (~2 KB) of stdout; round 1's
    # headline metric was truncated off the FRONT of this line. Order
    # the big per-query dict first and the headline scalars last so a
    # front-truncated tail still shows metric/value/sf.
    out = {"queries": timings}
    if parts_out:
        out["parts"] = parts_out
    if failures:
        out["failures"] = failures
    out.update(
        {
            "metric": "total_query_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "sf": sf,
            # fixed pure-CPU probe (min-of-3): divide two rounds'
            # values by their calibration_sec ratio before reading a
            # delta as a plan change — the host is 1.3-2× bimodal
            "calibration_sec": round(calib, 3),
            # the probe re-run AFTER the sweep (round-11 lesson: the
            # r11 inflation was invisible to the start-only sample —
            # the host entered its slow mode mid-run; sf1_smoke's
            # pre/post pair is what made that legible)
            "calibration_post_sec": round(calibrate(), 3),
            "loadavg_1min": [round(load_before[0], 2), round(os.getloadavg()[0], 2)],
        }
    )
    line = json.dumps(out, separators=(",", ":"))
    print(line)
    # The driver archives only a ~2 KB TAIL of stdout, which truncates
    # the per-gate dict (round-9 verdict #6 lost the top-level queries
    # map). Persist the FULL line to bench_full_r{N}.json in the repo
    # root — N inferred as (max existing BENCH_r*.json) + 1, i.e. the
    # round currently being built — so per-gate round-over-round diffs
    # never depend on the driver's truncation. Committed per round.
    try:
        repo = os.path.dirname(os.path.abspath(__file__))
        full_path = os.environ.get("SPARK_GRAFT_BENCH_FULL_PATH")
        if not full_path:
            rounds = [
                int(m.group(1))
                for f in os.listdir(repo)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            n = (max(rounds) if rounds else 0) + 1
            full_path = os.path.join(repo, f"bench_full_r{n:02d}.json")
            # never clobber (round-10 ADVICE): a verification rerun
            # after BENCH_r{n-1}.json was committed would otherwise
            # land on the NEXT round's name and be silently overwritten
            # by that round's genuine run — suffix reruns instead
            k = 1
            while os.path.exists(full_path):
                full_path = os.path.join(repo, f"bench_full_r{n:02d}_rerun{k}.json")
                k += 1
        with open(full_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:  # never let persistence kill the bench line
        print(f"bench_full write failed: {exc}", file=sys.stderr)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
