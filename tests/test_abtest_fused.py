"""Round-11 optimization: the fused A/B-readout aggregate.

q25's welch/propz/cuped parts used to run three separate conditional
aggregates over the identical (l_returnflag IN (A, N)) row set — three
fact-table scans for one row of exact sufficient statistics each.
ab_readout_fused computes the union of the sums in ONE pass and
replays each part's original IEEE output projection over the shared
one-row frame.

These tests pin value-identity of the fused outputs against the three
original operators (whose outputs the q25 oracle hashes certify), on
both the real sf0.001 lineitem slice and a hand-built frame that
exercises the degenerate NULL paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.abtest import (
    ab_readout_fused,
    cuped_adjusted,
    two_proportion_ztest,
    welch_ttest,
)
from stepist_spark.session import load_table


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _check(df, group_col, a, b, value_col, cov_col, success_cond):
    wt_f, pz_f, cu_f = ab_readout_fused(
        df, group_col, a, b, value_col, cov_col, success_cond
    )
    wt = welch_ttest(df, group_col, a, b, value_col)
    pz = two_proportion_ztest(df, group_col, a, b, success_cond)
    cu = cuped_adjusted(df, group_col, a, b, value_col, cov_col)
    assert wt_f.columns == wt.columns
    assert pz_f.columns == pz.columns
    assert cu_f.columns == cu.columns
    assert _rows(wt_f) == _rows(wt)
    assert _rows(pz_f) == _rows(pz)
    assert _rows(cu_f) == _rows(cu)


def test_fused_matches_originals_on_lineitem(spark, sf_dir):
    li3 = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    _check(
        li3, "l_returnflag", "A", "N",
        "l_extendedprice", "l_quantity", F.col("l_quantity") >= 25,
    )


def test_fused_matches_originals_degenerate(spark):
    # constant covariate (VarX = 0 -> NULL theta/adjusted/rho2),
    # all-success group (degenerate pooled rate stays valid here),
    # n_a = 1 (welch t/df NULL)
    df = spark.createDataFrame(
        [
            ("A", 5.0, 10.0),
            ("N", 5.0, 11.0),
            ("N", 5.0, 13.0),
            ("X", 5.0, 99.0),  # filtered out
        ],
        "g string, q double, v double",
    )
    _check(df, "g", "A", "N", "v", "q", F.col("q") >= 5)


def test_fused_single_scan_plan(spark, sf_dir):
    # the fused trio's union must execute the lineitem aggregate once:
    # after the lazy localCheckpoint materializes, each output's plan
    # is a projection over a LogicalRDD scan, not a parquet aggregate
    li3 = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    wt_f, pz_f, cu_f = ab_readout_fused(
        li3, "l_returnflag", "A", "N",
        "l_extendedprice", "l_quantity", F.col("l_quantity") >= 25,
    )
    wt_f.collect()  # materializes the shared checkpoint
    for frame in (pz_f, cu_f):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan
