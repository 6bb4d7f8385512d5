"""Distributed connected components — the pairs-to-clusters step every
near-dup pipeline needs (MinHash/SimHash/containment emit PAIRS; dedup
decisions need CLUSTERS with one keeper per component).

Algorithm: iterative minimum-label propagation over the undirected edge
set. Each round every node adopts the smallest label among itself and its
neighbors; convergence when no label changes. Rounds are plain
join+groupBy (shuffle on node id, map-side combinable); lineage is cut per
round with ``localCheckpoint`` so the plan does not grow with iterations.
Round count is bounded by the component diameter — near-dup clusters are
shallow (stars/cliques), so 3-5 rounds typical. For adversarial
long-chain graphs switch to the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014 — public paper), which converges in O(log n) rounds;
the per-round dataflow below is the same building block.

Deterministic by construction (min over labels), so the result is
oracle-checkable against a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """-> (node, component) where component = min node id reachable.

    ``edges`` is undirected (direction ignored); isolated nodes absent from
    the edge set are absent from the output (join them back as their own
    singleton components if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # label propagation moves one hop per round: a component whose
        # diameter exceeds max_iter would otherwise return PARTIAL labels
        # (same component, different ids) with no signal at all
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter or use "
            "connected_components_star (doubling hops per round)"
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    broadcast_maps: bool = False,
    pre_contract: bool = False,
    driver_finish_cap: int = 0,
    self_loops: str = "singletons",
) -> DataFrame:
    """-> (node, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — converges in O(log^2 n) rounds on ANY graph shape, vs
    O(diameter) for :func:`connected_components` min-label propagation.

    Use this variant for adversarial/long-chain graphs (linked-list dup
    chains from pairwise near-dup edges); min-label stays the default for
    the shallow star/clique components LSH emits, where its per-round cost
    is lower (no edge-set rewrite, just a label join).

    large-star: every node's strictly-larger neighbors re-attach to the
    minimum of its closed neighborhood; small-star: the rest re-attach.
    Both are one groupBy + one join per round, shuffling on node id; each
    round's edge set is localCheckpoint'ed so the plan stays flat. Same
    deterministic min-root contract as ``connected_components`` (and the
    same recursive-CTE oracle applies).

    ``broadcast_maps=True`` broadcasts each round's node->min map into the
    edge-rewrite join instead of shuffling the edge set onto it — the map
    is NODE-sized (its groupBy is map-side combined to <= |V| partials per
    partition) while the edges it rewrites are PAIR-sized, so on dense
    near-dup graphs (7.1M edges over 4.8k nodes at sf0.1) this removes the
    only edge-sized shuffles in each round. The hint is SIZE-GATED
    (hints.size_gated_broadcast): it attaches only when Catalyst's plan
    estimate for the map clears the session's autoBroadcastJoinThreshold
    (stats propagate through localCheckpoint, so in-loop maps gate on
    real numbers), else the join is left unhinted and AQE picks the
    strategy from runtime shuffle statistics — a node universe that
    grows past the broadcast budget (exact-set representatives over a
    100 TB corpus) degrades to shuffle instead of forcing an executor
    OOM. Results are identical either way; leave False to skip even the
    gated hint.

    ``pre_contract=True`` prepends ONE Boruvka-style contraction round:
    every node relabels to the minimum of its closed neighborhood (a
    map-side-combined node-sized agg), edges rewrite through that label
    map, and the star loop runs on the CONTRACTED graph. Contraction
    only ever merges nodes that share an edge, so components are
    preserved exactly, and the star loop's readoff root composes back to
    the SAME min-of-component ids (the component's global minimum is its
    own closed-neighborhood minimum, so it survives contraction). On
    near-clique dedup graphs this collapses the pair-sized edge set to
    near-nothing BEFORE any edge-sized distinct/localCheckpoint: a
    k-clique contracts to a single label in the one round, so the loop's
    shuffles move label-pairs, not document-pairs (measured 10.1s ->
    ~2s on 7.1M edges / 4.8k nodes at sf0.1). The verified edge set is
    persisted here (it feeds the label agg and the rewrite), bounded by
    the registered-cache release hook.

    ``driver_finish_cap > 0`` finishes with a driver-side union-find when
    the (contracted) edge count is at or below the cap — the remaining
    label graph after contraction is cluster-sized, not row-sized, and a
    distributed star round costs ~7 fixed-overhead jobs no matter how few
    rows it moves. The cap is an explicit driver-memory bound — note the
    REAL cost of a cap-sized collect: ``collect()`` materializes Python
    Row objects (~150-300 bytes per 2-id edge, 10-20x the 16 raw bytes)
    plus the union-find parent/nodes dicts (~100 bytes per distinct
    node), so 2M edges is on the order of 0.5-1 GB of driver heap, not
    the 32 MB the raw ids suggest. Size caps against that figure; 0
    disables the path and everything stays distributed.

    ``self_loops``: what a ``u == u`` edge means. ``'singletons'``
    (default): it declares the node exists — such nodes come back as
    their own component even when no real edge touches them (same
    contract as :func:`connected_components`). This costs ONE extra pass
    over the edge frame (the self-loop scan) plus an anti-join at
    read-off — if ``edges`` is an expensive unpersisted pipeline, that
    pass re-executes it, so persist the edges or use ``'absent'``.
    ``'absent'``: the caller guarantees no self-loops exist (e.g. pairs
    built with a strict ``a < b`` join condition — every near-dup
    candidate generator in operators/dedup.py emits that shape); the
    scan and anti-join are skipped entirely, restoring the minimal
    plan. Any self-loop present anyway is silently dropped."""
    if self_loops not in ("singletons", "absent"):
        raise ValueError(
            f"self_loops must be 'singletons' or 'absent', got {self_loops!r}"
        )
    if broadcast_maps:
        from chemharmony_spark.hints import size_gated_broadcast as hint
    else:
        def hint(d: DataFrame) -> DataFrame:
            return d

    # self-loops carry no connectivity but DO declare the node exists:
    # filter them out of the star machinery (whose rounds drop u == v
    # edges anyway) but remember the nodes, and append any not otherwise
    # labeled as singletons at read-off — connected_components keeps such
    # nodes and the two variants advertise the same contract
    all_edges = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if pre_contract and self_loops == "singletons":
        # the contraction path persists the edge frame anyway (it feeds
        # the label agg AND the rewrite); persisting BEFORE the self-loop
        # split lets the singleton scan read the cache instead of
        # re-executing a possibly-expensive caller pipeline
        from chemharmony_spark.cache import registered_persist

        all_edges = registered_persist(all_edges)
    raw = all_edges.where(F.col("u") != F.col("v"))
    if self_loops == "singletons":
        selfies = (
            all_edges.where(F.col("u") == F.col("v"))
            .select(F.col("u").alias("node")).distinct()
        )

        def _with_selfloop_singletons(comp: DataFrame) -> DataFrame:
            lone = selfies.join(comp, on="node", how="left_anti")
            return comp.unionByName(
                lone.select("node", F.col("node").alias("component"))
            )
    else:  # 'absent': caller-guaranteed a < b pairs — zero-overhead path

        def _with_selfloop_singletons(comp: DataFrame) -> DataFrame:
            return comp
    lab = None
    if pre_contract:
        from chemharmony_spark.cache import registered_persist

        if self_loops != "singletons":
            # in singleton mode all_edges is already persisted above and
            # raw is a cheap filter over that cache — a second pair-sized
            # cache of near-identical rows would only evict useful blocks.
            # In 'absent' mode the persist is LOAD-BEARING, not defensive:
            # contraction reads the edge frame ~3 times (label agg via
            # sym, the rewrite join, the final distinct), and callers
            # like q123 deliberately pass the UNPERSISTED verify pipeline
            # (removing this persist was tried in r7 and measured q123 at
            # 1.38x — the verify join re-executed per read; reverted).
            # Callers that persist upstream pay one modest duplicate
            # cache for that simpler contract.
            raw = registered_persist(raw)
        sym = raw.union(
            raw.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # localCheckpoint, not persist (r7): lab is NODE-sized, and it is
        # the one CC frame whose lineage survives into every CONSUMER's
        # final plan (the label->component composition at read-off). A
        # lazy persist leaves the whole upstream pair pipeline visible in
        # downstream plans (inflating their audited shuffle counts with
        # exchanges that execute zero times once the cache fills) and
        # makes the size-gated broadcast hint below gate on ESTIMATES;
        # the eager checkpoint truncates lineage like every other CC
        # round cut and gives the gate the exact materialized size.
        lab = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("l")
        ).localCheckpoint(eager=True)
        raw = (
            raw.join(
                hint(lab.select(F.col("u").alias("__cu"),
                                F.col("l").alias("__lu"))),
                F.col("u") == F.col("__cu"),
            )
            .join(
                hint(lab.select(F.col("u").alias("__cv"),
                                F.col("l").alias("__lv"))),
                F.col("v") == F.col("__cv"),
            )
            .select(F.col("__lu").alias("u"), F.col("__lv").alias("v"))
            .where(F.col("u") != F.col("v"))
        )

    e = raw.distinct().localCheckpoint(eager=True)

    def _large_star(ed: DataFrame) -> DataFrame:
        sym = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(hint(mins), "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # orient every edge big -> small, so each node's neighbors here are
        # all smaller; m = min of the closed neighborhood
        d = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        re_smaller = (
            d.join(hint(mins), "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        re_self = mins.select(F.col("u"), F.col("m").alias("v"))
        return re_smaller.union(re_self).where(F.col("u") != F.col("v")).distinct()

    def _sig(ed: DataFrame) -> tuple:
        # (count, hash-sum) set signature: both edge frames are DEDUPED
        # (every round ends in .distinct()), so set equality reduces to
        # equal cardinality + equal sum of per-row xxhash64 — one
        # map-side-combined agg job, no shuffle of the edge set (the old
        # exceptAll test re-shuffled both full frames every round).
        # False-equal needs colliding 64-bit hash SUMS across two deduped
        # sets of identical size — negligible (~2^-64) and only ever
        # costs an early stop at an already-nearly-converged edge set.
        r = ed.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a BIGINT sum of 64-bit hashes
            # overflows (ANSI mode throws) after a handful of rows
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    sig = _sig(e)
    if driver_finish_cap and sig[0] <= driver_finish_cap:
        # Size-gated driver finish: after (pre-)contraction the remaining
        # graph has one node per CLUSTER-adjacency, not per row — on
        # near-dup corpora that's thousands of label pairs where the
        # input had millions of document pairs. Each distributed star
        # round costs ~7 fixed-overhead jobs (two aggs, two distincts,
        # two checkpoints, a signature read) regardless of size; below
        # the cap a single collect + union-find replaces the whole loop
        # (measured ~4s -> ~0.3s on 1.7k contracted edges at sf0.1).
        # The cap bounds driver memory explicitly (2M edges ~= 32 MB);
        # above it the O(log^2 n) loop below still handles any shape.
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        nodes = set()
        for row in e.collect():
            nodes.add(row[0])
            nodes.add(row[1])
            ra, rb = _find(row[0]), _find(row[1])
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        mapping = [(x, _find(x)) for x in nodes]
        from pyspark.sql.types import StructField, StructType

        utype = e.schema[0].dataType
        spark = e.sparkSession
        comp = spark.createDataFrame(
            mapping,
            StructType(
                [
                    StructField("node", utype, False),
                    StructField("component", utype, False),
                ]
            ),
        )
        if lab is not None:
            # UNCONDITIONAL broadcast, not the size-gated hint: the mapping
            # frame is RDD-backed (createDataFrame of driver rows), so
            # Catalyst reports defaultSizeInBytes and the gate can never
            # pass — the composition join then ran as a SortMergeJoin with
            # two exchanges unless AQE rescued it at runtime (observed in
            # plans/r09/q123_dedup_pipeline_before.txt). The broadcast is
            # provably bounded: the mapping was JUST collected driver-side
            # under driver_finish_cap, so shipping it back is no larger
            # than the collect the caller already accepted.
            comp = (
                lab.join(
                    F.broadcast(comp.withColumnRenamed("node", "l")),
                    on="l",
                    how="left",
                )
                .select(
                    F.col("u").alias("node"),
                    F.coalesce("component", F.col("l")).alias("component"),
                )
            )
        return _with_selfloop_singletons(comp)
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _sig(new_e)
        e = new_e
        if new_sig == sig:
            break
        sig = new_sig

    # read off components: after convergence edges form stars v -> root;
    # every non-root node appears as u exactly once, roots only as v
    roots = e.select(F.col("v").alias("node")).distinct().exceptAll(
        e.select(F.col("u").alias("node")).distinct()
    )
    comp = (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )
    if lab is not None:
        # compose node -> label -> component-of-label; labels whose
        # contracted node is isolated (their whole neighborhood agreed on
        # one minimum) never enter the star loop — they ARE the root
        comp = (
            lab.join(
                hint(comp.withColumnRenamed("node", "l")), on="l", how="left"
            )
            .select(
                F.col("u").alias("node"),
                F.coalesce("component", F.col("l")).alias("component"),
            )
        )
    return _with_selfloop_singletons(comp)
