"""Connected components: parity with a Python union-find on structured and
random graphs (chains force multi-round propagation)."""

from __future__ import annotations

import random

from chemharmony_spark.operators.graph import connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    want = _union_find(edges)
    # union-find roots are path-compressed mins only if we normalize:
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want_min = {n: comp_min[r] for n, r in want.items()}
    assert got == want_min, (got, want_min)


def test_chain_two_components_and_clique(spark):
    # a 7-node chain (needs several propagation rounds), a triangle, an
    # isolated edge — labels must be the min node of each component
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16),
             (1, 2), (2, 3), (1, 3),
             (100, 200)]
    _check(spark, edges)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(5)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_chain_descending_ids(spark):
    # worst case for min-propagation: the min id sits at the chain's end
    edges = [(i + 1, i) for i in range(12)]
    _check(spark, edges)


def _check_star(spark, edges, max_iter=30):
    from chemharmony_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    want = _union_find(edges)
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want_min = {n: comp_min[r] for n, r in want.items()}
    # the Boruvka pre-contraction must be invisible: same partition AND
    # same min-of-component ids on every graph shape
    for pre in (False, True):
        got = {
            r["node"]: r["component"]
            for r in connected_components_star(
                df, max_iter=max_iter, pre_contract=pre
            ).collect()
        }
        assert got == want_min, (pre, got, want_min)


def test_star_alg_chain_clique_isolated(spark):
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16),
             (1, 2), (2, 3), (1, 3),
             (100, 200)]
    _check_star(spark, edges)


def test_star_alg_random_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    _check_star(spark, edges)


def test_star_alg_long_chain_logarithmic_rounds(spark):
    # the adversarial case for min-label propagation: a 128-node descending
    # chain (diameter 127 would need ~127 label rounds). large/small-star
    # must solve it within a logarithmic round budget.
    edges = [(i + 1, i) for i in range(127)]
    _check_star(spark, edges, max_iter=10)


def test_star_broadcast_maps_is_size_gated(spark):
    """r5 verdict task 1: broadcast_maps must route through the size gate.
    With the threshold disabled (the 'node map too big' stand-in — the
    same conf a corpus-scale label map would fail), broadcast_maps=True
    must attach ZERO hints anywhere in the returned plan (the in-loop
    maps use the same gate), yet produce identical components. Under the
    normal threshold the tiny test maps clear the gate and the compose
    hint appears — the win is kept, only the forced-OOM path is closed."""
    from chemharmony_spark.operators.graph import connected_components_star

    edges = [(10, 11), (11, 12), (12, 13), (1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long").localCheckpoint()
    want = {
        r["node"]: r["component"]
        for r in connected_components_star(df, pre_contract=True).collect()
    }

    def hints(frame) -> int:
        return str(
            frame._jdf.queryExecution().analyzed().toString()
        ).count("ResolvedHint")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = connected_components_star(
            df, broadcast_maps=True, pre_contract=True
        )
        assert hints(gated) == 0, "gate must not force a broadcast"
        assert {r["node"]: r["component"] for r in gated.collect()} == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    hinted = connected_components_star(
        df, broadcast_maps=True, pre_contract=True
    )
    assert {r["node"]: r["component"] for r in hinted.collect()} == want
    # "small maps keep the win": the exact in-loop shape the operator
    # hints — a groupBy("u") label map over a checkpointed edge frame —
    # carries propagated stats, so the gate still attaches the hint
    # under the normal threshold. (The returned compose frame contains
    # an exceptAll whose stats are unknown; the gate declines there by
    # design and AQE broadcasts it from runtime statistics instead.)
    from pyspark.sql import functions as F

    from chemharmony_spark.hints import size_gated_broadcast

    ck = df.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).localCheckpoint()
    mins = ck.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    assert hints(size_gated_broadcast(mins).alias("x")) == 1


def test_label_propagation_deterministic_and_connected(spark, sf_dir):
    """LPA invariants: every node keeps a label that exists among the
    graph's node ids; a node and its labelmates are in the same connected
    component (labels never cross components); re-running yields the
    identical assignment (fixed tie-break => deterministic)."""
    from chemharmony_spark import queries as Q

    a = {r.node: r.lbl
         for r in Q.q146_label_propagation(spark, sf_dir).collect()}
    b = {r.node: r.lbl
         for r in Q.q146_label_propagation(spark, sf_dir).collect()}
    assert a == b
    nodes = set(a)
    assert set(a.values()) <= nodes
    # labels respect components: build components via union-find locally
    li = Q._t(spark, sf_dir, "lineitem")
    edges = Q._copurchase_edges(li).collect()
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        ra, rb = find(e.p1), find(e.p2)
        if ra != rb:
            parent[ra] = rb
    for node, lbl in a.items():
        assert find(node) == find(lbl), (node, lbl)


def test_degree_powerlaw_fit_reference(spark, sf_dir):
    """Slope/intercept equal the python closed-form OLS on the
    floor-micro'd log histogram."""
    import math
    from collections import Counter

    from chemharmony_spark import queries as Q

    r = Q.q155_degree_powerlaw(spark, sf_dir).collect()[0]
    edges = Q._copurchase_edges(Q._t(spark, sf_dir, "lineitem")).collect()
    deg = Counter()
    for e in edges:
        deg[e.p1] += 1
        deg[e.p2] += 1
    hist = Counter(deg.values())
    pts = [(math.floor(math.log(d) * 1e6), math.floor(math.log(n) * 1e6))
           for d, n in hist.items()]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r.n == n
    assert r.slope_micro == math.floor(slope * 1e6)
    assert r.intercept_micro == math.floor((sy - slope * sx) / n)


def test_item_similarity_reference(spark, sf_dir):
    """Scores equal the python cosine over co-purchase incidence and the
    neighbor relation is symmetric in score."""
    import math
    from collections import Counter, defaultdict

    from chemharmony_spark import queries as Q

    rows = Q.q167_item_similarity(spark, sf_dir).collect()
    li = Q._t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) >= 2}
    ni = Counter(p for parts in baskets.values() for p in parts)
    nij = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                nij[(a, b)] += 1
    for r in rows:
        a, b = min(r.item, r.neighbor), max(r.item, r.neighbor)
        assert nij[(a, b)] == r.nij >= 2
        want = math.floor(
            r.nij / math.sqrt(ni[r.item] * ni[r.neighbor]) * 1e6)
        assert r.sim_micro == want
        assert 1 <= r.rank <= 5


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    """No predicted pair is already an edge; scores are valid Jaccards."""
    from chemharmony_spark import queries as Q

    edges = {(e.p1, e.p2) for e in
             Q._copurchase_edges(Q._t(spark, sf_dir, "lineitem")).collect()}
    rows = Q.q168_link_prediction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r.a, r.b) not in edges
        assert r.a < r.b
        assert 0 < r.jaccard_ppm <= 1_000_000
