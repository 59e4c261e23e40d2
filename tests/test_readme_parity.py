"""Golden end-to-end parity with the reference's README examples
(`README.markdown:48-205` — the reference's only executable
specifications, per SURVEY.md §5). Each reference flow is restated as a
stepist_spark pipeline over a tiny DataFrame; where the original does
network IO (requests.get), a deterministic local "fetch" stands in and
the expected values are computed from it — the flow TOPOLOGY (chain,
worker fan-out, Hub map, reducer barrier) is what's being certified.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stepist_spark.pipeline import Engine, Hub, ReducerStep, Step

# deterministic stand-in for requests.get(url).text
PAGES = {
    "https://example.org/a": "python " * 94,
    "https://example.org/b": "python " * 264,
}


@pytest.fixture
def engine(spark):
    return Engine(spark)


class TestExample1ArithmeticChain:
    """`README.markdown:48-64`: step1(a, b) -> step2 multiplies
    (a+b) * (a-b); print(step1(5, 5)) — the reference's two-step
    synchronous flow with backwards next_step declaration."""

    def test_flow(self, engine, spark):
        @engine.step(None, name="step2")
        def step2(df):
            return df.select((F.col("a_plus_b") * F.col("a_minus_b")).alias("result"))

        @engine.step(step2, name="step1")
        def step1(df):
            return df.select(
                (F.col("a") + F.col("b")).alias("a_plus_b"),
                (F.col("a") - F.col("b")).alias("a_minus_b"),
            )

        data = spark.createDataFrame([(5, 5)], "a long, b long")
        result = step1(data)
        # reference: FlowResult keyed by final step name; (5+5)*(5-5) = 0
        assert [r["result"] for r in result.step2.collect()] == [0]


class TestExample2WorkerFanout:
    """`README.markdown:69-106`: generator step1 fans urls out, worker
    step2 fetches, step3 counts 'python'. Expected worker output 94/264
    (here from the deterministic fake pages)."""

    def test_flow(self, engine, spark):
        fetch = F.udf(lambda u: PAGES[u])  # stands in for requests.get

        @engine.step(None, name="step3")
        def step3(df):
            return df.select(
                "url",
                (F.size(F.split(F.col("text"), "python")) - 1).alias("count"),
            )

        @engine.factory_step("url", next_step=step3, name="step2")
        def step2(df):
            # factory semantics: the url column is the fan-out axis; the
            # fetch result rides along
            return df.withColumn("text", fetch(F.col("url"))).withColumn(
                "url", F.array(F.col("url"))
            )

        urls = spark.createDataFrame([(u,) for u in PAGES], "url string")
        result = step2(urls)
        counts = sorted(r["count"] for r in result.step3.collect())
        assert counts == [94, 264]


class TestExample3HubMap:
    """`README.markdown:111-157`: one upstream record set fanned to two
    branch steps via Hub; both branch results surface in the
    FlowResult (reference prints [94, 264])."""

    def test_flow(self, engine, spark):
        def counter(df):
            return df.select(
                "url", (F.size(F.split(F.col("text"), "python")) - 1).alias("count")
            )

        branch_a = Step(counter, name="step2")
        branch_b = Step(counter, name="step2_v2")

        @engine.step(Hub(branch_a, branch_b), name="step1")
        def step1(df):
            return df

        pages = spark.createDataFrame(list(PAGES.items()), "url string, text string")
        result = step1(pages)
        assert set(result) == {"step2", "step2_v2"}
        for branch in ("step2", "step2_v2"):
            assert sorted(r["count"] for r in result[branch].collect()) == [94, 264]


class TestExample4HubReducer:
    """`README.markdown:159-205`: Hub branches converge on a
    reducer_step whose handler sees the complete job_list for the
    barrier group exactly once."""

    def test_flow(self, engine, spark):
        def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            # one row per complete barrier group (batch-vectorized)
            texts_per_group = [[d["text"] for d in jl] for jl in pdf["job_list"]]
            return pd.DataFrame(
                {
                    "hub_job_id": pdf["hub_job_id"],
                    "c1": [ts[0].count("python") for ts in texts_per_group],
                    "c2": [ts[1].count("python") for ts in texts_per_group],
                }
            )

        red = ReducerStep(
            group_key="hub_job_id",
            payload_cols=["text"],
            expected_count=2,
            reduce_fn=_reduce,
            reduce_schema="hub_job_id string, c1 long, c2 long",
        )
        # two branches of one hub job, as the reference's Hub stamps
        # hub_job_id = "<uuid>:<n_branches>"
        rows = [("job-1:2", PAGES["https://example.org/a"]), ("job-1:2", PAGES["https://example.org/b"])]
        df = spark.createDataFrame(rows, "hub_job_id string, text string")
        (r,) = red.transform(df).collect()
        assert sorted([r["c1"], r["c2"]]) == [94, 264]

    def test_incomplete_barrier_never_fires(self, spark):
        red = ReducerStep(group_key="hub_job_id", expected_count=2)
        df = spark.createDataFrame([("job-2:2", "x")], "hub_job_id string, text string")
        assert red.transform(df).count() == 0
