"""PageRank fixed-point operator vs a Python integer reference."""

from __future__ import annotations

from stepist_spark.operators.graphs import in_degrees, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _py_pagerank(pairs, iterations=5, num=85, den=100, scale=10**9):
    """Driver-side reference: identical integer arithmetic."""
    nodes = sorted({n for e in pairs for n in e})
    outdeg = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (den - num) * scale // den
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for s, d in pairs:
            contrib[d] += rank[s] // outdeg[s]
        rank = {n: base + num * contrib[n] // den for n in nodes}
    return rank


class TestPageRank:
    PAIRS = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]

    def test_matches_python_reference(self, spark):
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, self.PAIRS), iterations=5).collect()
        }
        assert got == _py_pagerank(self.PAIRS, iterations=5)

    def test_zero_iterations_is_uniform(self, spark):
        got = pagerank(_edges(spark, self.PAIRS), iterations=0, scale=100).collect()
        assert {r["rank"] for r in got} == {100}
        assert len(got) == 4

    def test_partition_independent(self, spark):
        e = _edges(spark, self.PAIRS)
        a = sorted(map(tuple, pagerank(e, iterations=3).collect()))
        b = sorted(map(tuple, pagerank(e.repartition(7), iterations=3).collect()))
        assert a == b

    def test_symmetric_pair_splits_mass_evenly(self, spark):
        # two nodes pointing at each other: perfectly symmetric, so
        # ranks stay equal (and at the fixed point scale*1)
        got = pagerank(_edges(spark, [(1, 2), (2, 1)]), iterations=8).collect()
        ranks = {r["rank"] for r in got}
        assert len(ranks) == 1

    def test_dangling_node_keeps_base_only(self, spark):
        # 4 has no in-edges: after iteration 1 its rank is exactly base
        got = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, self.PAIRS), iterations=2).collect()
        }
        assert got[4] == (100 - 85) * 10**9 // 100

    def test_in_degrees_zero_filled(self, spark):
        got = {
            r["node"]: r["in_deg"]
            for r in in_degrees(_edges(spark, [(1, 2), (3, 2), (2, 1)])).collect()
        }
        assert got == {1: 1, 2: 2, 3: 0}


def _py_triangles(pairs):
    import itertools

    adj = {}
    edges = set()
    for a, b in pairs:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in edges:
            continue
        edges.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


class TestTriangleCounts:
    def _run(self, spark, pairs):
        from stepist_spark.operators.graphs import triangle_counts

        df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        return {
            r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
        }

    def test_single_triangle(self, spark):
        assert self._run(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}

    def test_clique4_and_chain(self, spark):
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (10, 11), (11, 12)]
        got = self._run(spark, pairs)
        # K4: each node is in C(3,2)=3 triangles; the chain has none
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)]
        assert self._run(spark, pairs) == {1: 1, 2: 1, 3: 1}

    def test_matches_python_brute_force(self, spark):
        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(40)]
        assert self._run(spark, pairs) == _py_triangles(pairs)


class TestNeighborhoodOverlap:
    def test_matches_python_bruteforce(self, spark):
        import itertools
        import random

        from stepist_spark.operators.graphs import neighborhood_overlap

        rng = random.Random(11)
        edges = set()
        while len(edges) < 30:
            a, b = rng.randint(1, 12), rng.randint(1, 12)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
        got = {
            (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"], r["jaccard"])
            for r in neighborhood_overlap(df).collect()
        }
        adj: dict = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        exp = {}
        for a, b in itertools.combinations(sorted(adj), 2):
            common = len(adj[a] & adj[b])
            if common >= 1:
                j = round(common / (len(adj[a]) + len(adj[b]) - common), 6)
                exp[(a, b)] = (common, len(adj[a]), len(adj[b]), j)
        assert got == exp

    def test_triangle_pair(self, spark):
        from stepist_spark.operators.graphs import neighborhood_overlap

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "src bigint, dst bigint"
        )
        got = {(r["a"], r["b"]): r["common"] for r in neighborhood_overlap(df).collect()}
        # every pair shares exactly the third vertex
        assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


class TestBfsDepths:
    def test_min_depth_on_cycle(self, spark):
        from stepist_spark.operators.graphs import bfs_depths

        # 1->2->3->1 cycle plus 3->4, 5 isolated
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "src bigint, dst bigint"
        )
        seeds = spark.createDataFrame([(1,)], "node bigint")
        got = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 5).collect()}
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_depth_bound(self, spark):
        from stepist_spark.operators.graphs import bfs_depths

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "src bigint, dst bigint"
        )
        seeds = spark.createDataFrame([(0,)], "node bigint")
        got = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 3).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_multi_seed_min_wins(self, spark):
        from stepist_spark.operators.graphs import bfs_depths

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (9, 3)], "src bigint, dst bigint"
        )
        seeds = spark.createDataFrame([(1,), (9,)], "node bigint")
        got = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 4).collect()}
        assert got[3] == 1  # via seed 9, not depth 2 via 1->2->3


class TestCheapestPathsBounded:
    def _ref(self, edges, seeds, max_hops):
        # brute force: enumerate all paths up to max_hops
        best = {s: 0 for s in seeds}
        frontier = [(s, 0) for s in seeds]
        for _ in range(max_hops):
            nxt = []
            for node, cost in frontier:
                for (a, b, w) in edges:
                    if a == node:
                        c = cost + w
                        nxt.append((b, c))
                        if b not in best or c < best[b]:
                            best[b] = c
            frontier = nxt
        return best

    def test_matches_bruteforce_with_cycle(self, spark):
        from stepist_spark.operators.graphs import cheapest_paths_bounded

        edges = [
            (1, 2, 5), (2, 3, 5), (1, 3, 20), (3, 1, 1),
            (2, 4, 100), (3, 4, 1), (4, 2, 1),
        ]
        e = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
        seeds = spark.createDataFrame([(1,)], "node bigint")
        got = {
            r["node"]: r["cost"]
            for r in cheapest_paths_bounded(e, seeds, 3).collect()
        }
        assert got == self._ref(edges, [1], 3)
        # the cheap detour 1->2->3->4 (cost 11) must beat 1->3->4 (21)
        assert got[4] == 11

    def test_matches_duckdb_mirror(self, spark):
        import duckdb

        from stepist_spark.operators.graphs import (
            cheapest_paths_bounded,
            cheapest_paths_bounded_sql,
        )

        import random

        rng = random.Random(5)
        edges = list({
            (rng.randrange(10), rng.randrange(10), rng.randrange(1, 9))
            for _ in range(40)
        })
        e = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
        seeds = spark.createDataFrame([(0,), (1,)], "node bigint")
        got = sorted(
            (r["node"], r["cost"])
            for r in cheapest_paths_bounded(e, seeds, 3).collect()
        )
        con = duckdb.connect()
        erows = ", ".join(f"({a},{b},{w})" for a, b, w in edges)
        want = sorted(
            tuple(r)
            for r in con.execute(
                cheapest_paths_bounded_sql(
                    f"SELECT * FROM (VALUES {erows}) e(src, dst, w)",
                    "SELECT * FROM (VALUES (0), (1)) s(node)",
                    3,
                )
            ).fetchall()
        )
        assert got == want


class TestKCore:
    def _edges(self, spark):
        # a 4-clique (3-core), a chain tail that peels away, a triangle
        edges = []
        clique = [1, 2, 3, 4]
        for i in clique:
            for j in clique:
                if i != j:
                    edges.append((i, j))
        edges += [(4, 5), (5, 4), (5, 6), (6, 5), (6, 7), (7, 6)]
        edges += [(10, 11), (11, 10), (11, 12), (12, 11), (12, 10), (10, 12)]
        return spark.createDataFrame(edges, "src long, dst long"), edges

    def test_peel_levels(self, spark):
        from stepist_spark.operators.graphs import kcore_membership

        df, _ = self._edges(spark)
        two = {r["node"]: r["deg_core"] for r in kcore_membership(df, 2, rounds=5).collect()}
        assert set(two) == {1, 2, 3, 4, 10, 11, 12}  # chain peeled
        assert two[10] == 2 and two[1] == 3
        three = {r["node"] for r in kcore_membership(df, 3, rounds=5).collect()}
        assert three == {1, 2, 3, 4}  # triangle (deg 2) peels at k=3

    def test_cascade_needs_multiple_rounds(self, spark):
        from stepist_spark.operators.graphs import kcore_membership

        # path 1-2-3-4-5: at k=2 the endpoints peel first, then the
        # cascade unzips the whole path — one round is NOT enough
        path = []
        for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
            path += [(a, b), (b, a)]
        df = spark.createDataFrame(path, "src long, dst long")
        after1 = kcore_membership(df, 2, rounds=1).count()
        final = kcore_membership(df, 2, rounds=4).count()
        assert after1 > 0 and final == 0  # converged peel is empty

    def test_fixpoint_extra_rounds_noop(self, spark):
        from stepist_spark.operators.graphs import kcore_membership

        df, _ = self._edges(spark)
        a = sorted(tuple(r) for r in kcore_membership(df, 2, rounds=5).collect())
        b = sorted(tuple(r) for r in kcore_membership(df, 2, rounds=8).collect())
        assert a == b

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.graphs import (
            kcore_membership,
            kcore_membership_sql,
        )

        df, edges = self._edges(spark)
        p = str(tmp_path / "kc.parquet")
        df.write.parquet(p)
        con = duckdb.connect()
        for k in (2, 3):
            got = sorted(
                tuple(r) for r in kcore_membership(df, k, rounds=5).collect()
            )
            want = sorted(
                con.execute(
                    kcore_membership_sql(f"SELECT * FROM '{p}/*.parquet'", k, 5)
                ).fetchall()
            )
            assert got == want, k
