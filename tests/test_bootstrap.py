"""operators/bootstrap.py — deterministic Poisson bootstrap: weight
distribution sanity, replicate determinism, CI ranks, DuckDB mirror."""

import duckdb
import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.bootstrap import (
    _POIS_T,
    bootstrap_replicates,
    bootstrap_replicates_sql,
    percentile_ci,
    percentile_ci_sql,
)


@pytest.fixture(scope="module")
def data(spark):
    # values 1..400 cents-exact, ids unique
    return spark.createDataFrame(
        [(i, float(i % 40 + 1)) for i in range(400)], "rid bigint, v double"
    )


class TestPoissonWeights:
    def test_thresholds_are_poisson_cdf(self):
        import math

        from stepist_spark.functions.hashing import MINHASH_P

        cum = 0.0
        for k, t in enumerate(_POIS_T):
            cum += math.exp(-1.0) / math.factorial(k)
            assert t == int(cum * MINHASH_P)
        # the >=8 tail (folded into weight 8) is ~1e-5 of the mass
        assert _POIS_T[-1] / MINHASH_P > 0.99998

    def test_mean_weight_near_one(self, spark, data):
        reps = bootstrap_replicates(data, "v", "rid", n_boot=16)
        rows = reps.collect()
        n = data.count()
        mean_w = sum(r.n_eff for r in rows) / (16 * n)
        assert 0.9 < mean_w < 1.1  # Poisson(1) mean, 16x400 draws

    def test_deterministic_and_seed_sensitive(self, spark, data):
        a1 = sorted(map(tuple, bootstrap_replicates(data, "v", "rid").collect()))
        a2 = sorted(map(tuple, bootstrap_replicates(data, "v", "rid").collect()))
        b = sorted(
            map(tuple, bootstrap_replicates(data, "v", "rid", seed="other").collect())
        )
        assert a1 == a2
        assert a1 != b


class TestPercentileCi:
    def test_ci_brackets_true_mean(self, spark, data):
        reps = bootstrap_replicates(data, "v", "rid", n_boot=32)
        ci = percentile_ci(reps).collect()[0]
        true_mean = data.agg(F.avg("v")).collect()[0][0]
        assert ci.n_boot == 32 and ci.lo_rank == 1
        assert ci.lo_mean <= true_mean <= ci.hi_mean
        # interval is tight for n=400: ~ +-2*sd/sqrt(n)
        assert ci.hi_mean - ci.lo_mean < 4.0

    def test_ci_ranks_wider_alpha(self, spark, data):
        reps = bootstrap_replicates(data, "v", "rid", n_boot=32)
        wide = percentile_ci(reps, alpha_num=50, alpha_den=100).collect()[0]
        assert wide.lo_rank == 8  # ceil(32*0.25)
        narrow = percentile_ci(reps, alpha_num=5, alpha_den=100).collect()[0]
        assert wide.lo_mean >= narrow.lo_mean
        assert wide.hi_mean <= narrow.hi_mean

    def test_empty_input(self, spark):
        empty = spark.createDataFrame([], "rid bigint, v double")
        reps = bootstrap_replicates(empty, "v", "rid", n_boot=8)
        assert reps.count() == 0
        assert percentile_ci(reps).count() == 0


class TestDuckdbMirror:
    def test_replicates_and_ci_match(self, spark, data):
        got_r = sorted(
            map(tuple, bootstrap_replicates(data, "v", "rid", n_boot=8).collect())
        )
        got_ci = sorted(
            map(
                tuple,
                percentile_ci(
                    bootstrap_replicates(data, "v", "rid", n_boot=8)
                ).collect(),
            )
        )
        vals = ", ".join(f"({r.rid}, {r.v})" for r in data.collect())
        base = f"SELECT * FROM (VALUES {vals}) t(rid, v)"
        rep_sql = bootstrap_replicates_sql(base, "v", "rid", n_boot=8)
        duck_r = sorted(tuple(r) for r in duckdb.sql(rep_sql).fetchall())
        duck_ci = sorted(
            tuple(r) for r in duckdb.sql(percentile_ci_sql(rep_sql)).fetchall()
        )
        assert got_r == duck_r
        assert got_ci == duck_ci


class TestGroupedBootstrap:
    def test_grouped_sums_to_global(self, spark, data):
        """Weights depend only on (id, seed, b): per-group replicate
        integers must sum to the ungrouped replicate's."""
        from pyspark.sql import functions as F

        g = data.withColumn("grp", (F.col("rid") % 3).cast("string"))
        grouped = bootstrap_replicates(
            g, "v", "rid", n_boot=8, group_cols=["grp"]
        )
        rolled = {
            r.b: (r.s, r.n)
            for r in grouped.groupBy("b")
            .agg(
                F.sum("sum_scaled").alias("s"), F.sum("n_eff").alias("n")
            )
            .collect()
        }
        glob = {
            r.b: (r.sum_scaled, r.n_eff)
            for r in bootstrap_replicates(data, "v", "rid", n_boot=8).collect()
        }
        assert rolled == glob

    def test_grouped_ci_per_group(self, spark, data):
        from pyspark.sql import functions as F

        g = data.withColumn("grp", (F.col("rid") % 2).cast("string"))
        reps = bootstrap_replicates(g, "v", "rid", n_boot=16, group_cols=["grp"])
        ci = {r.grp: r for r in percentile_ci(reps, group_cols=["grp"]).collect()}
        assert set(ci) == {"0", "1"}
        for grp, row in ci.items():
            true_mean = (
                g.filter(F.col("grp") == grp).agg(F.avg("v")).collect()[0][0]
            )
            assert row.n_boot == 16
            assert row.lo_mean <= true_mean <= row.hi_mean, grp
