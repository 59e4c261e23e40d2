"""Market-basket association rules (operators/association.py)."""

from __future__ import annotations

from stepist_spark.operators.association import association_rules, basket_pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket bigint, item string")


class TestBasketPairs:
    def test_unordered_distinct_pairs(self, spark):
        df = _baskets(
            spark,
            [
                (1, "a"),
                (1, "b"),
                (1, "b"),  # duplicate line collapses
                (1, "c"),
                (2, "a"),
                (2, "b"),
            ],
        )
        pairs = {
            (r["item_a"], r["item_b"])
            for r in basket_pairs(df, "basket", "item").collect()
        }
        assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
        # (a,b) appears in both baskets
        n_ab = (
            basket_pairs(df, "basket", "item")
            .filter("item_a = 'a' AND item_b = 'b'")
            .count()
        )
        assert n_ab == 2


class TestAssociationRules:
    def test_counts_confidence_lift(self, spark):
        # a co-occurs with b in 2/3 baskets; c alone once
        df = _baskets(
            spark,
            [
                (1, "a"),
                (1, "b"),
                (2, "a"),
                (2, "b"),
                (3, "a"),
                (3, "c"),
            ],
        )
        rules = {
            (r["antecedent"], r["consequent"]): r
            for r in association_rules(
                df, "basket", "item", min_pair_support=1, k=10
            ).collect()
        }
        ab = rules[("a", "b")]
        assert ab["pair_n"] == 2 and ab["ante_n"] == 3 and ab["cons_n"] == 2
        assert ab["n_baskets"] == 3
        assert ab["confidence"] == round(2 / 3, 6)
        assert ab["lift"] == 1.0  # 2*3 / (3*2)
        ba = rules[("b", "a")]
        assert ba["confidence"] == 1.0  # b always implies a
        # both directions of every surviving pair are present
        assert set(rules) == {
            ("a", "b"),
            ("b", "a"),
            ("a", "c"),
            ("c", "a"),
        }

    def test_min_support_filters(self, spark):
        df = _baskets(spark, [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")])
        rules = association_rules(df, "basket", "item", min_pair_support=2, k=10)
        got = {(r["antecedent"], r["consequent"]) for r in rules.collect()}
        assert got == {("a", "b"), ("b", "a")}

    def test_topk_cut_is_deterministic(self, spark):
        df = _baskets(
            spark,
            [(b, it) for b in range(10) for it in ("x", "y")]
            + [(b, "z") for b in range(5)],
        )
        r1 = association_rules(df, "basket", "item", 1, k=3).collect()
        r2 = association_rules(df, "basket", "item", 1, k=3).collect()
        assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
        assert len(r1) == 3


class TestItemSimilarity:
    def test_cosine_matches_reference(self, spark):
        import math

        from stepist_spark.operators.association import item_similarity

        # baskets: x&y co-occur twice; x alone once; z with y once
        rows = [
            (1, "x"), (1, "y"),
            (2, "x"), (2, "y"),
            (3, "x"),
            (4, "y"), (4, "z"),
        ]
        df = spark.createDataFrame(rows, "basket bigint, item string")
        got = {
            (r["item"], r["neighbor"]): r
            for r in item_similarity(df, "basket", "item", 1, 3).collect()
        }
        xy = got[("x", "y")]
        assert xy["pair_n"] == 2 and xy["item_n"] == 3 and xy["neighbor_n"] == 3
        assert abs(xy["cosine"] - round(2 / math.sqrt(9), 6)) < 1e-12
        # symmetric entry exists
        assert ("y", "x") in got
        # ranking: y's top neighbor is x (cos 2/3) over z (cos 1/sqrt(6))
        assert got[("y", "x")]["rank"] == 1 and got[("y", "z")]["rank"] == 2

    def test_min_support_prunes(self, spark):
        from stepist_spark.operators.association import item_similarity

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
            "basket bigint, item string",
        )
        got = {(r["item"], r["neighbor"]) for r in item_similarity(df, "basket", "item", 2, 5).collect()}
        assert ("a", "b") in got and ("a", "c") not in got
