"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; dot products via ``zip_with`` + ``aggregate``
  (sequential left fold — bit-reproducible, and the same fold DuckDB's
  ``list_reduce`` performs, so the op is oracle-checkable). At 100 TB the
  corpus side stays partitioned; only queries broadcast.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH buckets
  (signs of dot products with deterministic md5-derived hyperplanes) shrink
  the candidate set; exact rerank inside buckets. Recall < 1 by design;
  tested against brute force in tests/test_similarity.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chemharmony_spark.cache import registered_persist


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic across engines)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_pre(a: Column, b: Column) -> Column:
    """Dot product over ALREADY-double arrays (see :func:`prep_cosine`).

    The zip_with/aggregate fold outperforms a GetArrayItem-unrolled
    ``0.0 + a[0]*b[0] + ...`` sum by ~3x here (measured on the q46/q115
    pair joins at sf0.1): the fold runs one specialized primitive-array
    loop, while the unrolled tree pays per-element bounds/null checks
    and gets duplicated into both the filter and the project."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )


def prep_cosine(df: DataFrame, vec_col: str | Column,
                dv: str = "__dv", n: str = "__n",
                keep: Sequence[str | Column] = ()) -> DataFrame:
    """Project per-vector cosine ingredients ONCE before a pair join: the
    double-cast array (``dv``) and the L2 norm (``n``).

    ``cosine()`` inside a pair join re-casts both arrays and re-folds both
    norms for EVERY pair — 8 interpreted array passes per pair (higher-order
    functions never enter codegen). Factoring them per VECTOR leaves the
    per-pair work at dot_pre's two passes; measured 1.9x on the q115
    within-cell join at sf0.1. The arithmetic is unchanged expression for
    expression (same casts, same fold order), so sims stay bit-identical
    and the DuckDB oracles still match.

    ``keep`` lists the pass-through columns; ``dv``/``n`` name the outputs.
    Use ``cosine_pre`` on the join output."""
    vc = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dvx = _as_double(vc)
    nx = F.sqrt(F.aggregate(dvx, F.lit(0.0), lambda acc, x: acc + x * x))
    cols = [F.col(c) if isinstance(c, str) else c for c in keep]
    return df.select(*cols, dvx.alias(dv), nx.alias(n))


def cosine_pre(dv_a: Column, dv_b: Column, n_a: Column, n_b: Column) -> Column:
    """Cosine from prep_cosine ingredients — per-pair cost is one dot fold."""
    return dot_pre(dv_a, dv_b) / (n_a * n_b)


def group_centroid_cosine(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Cosine of every vector to its group's centroid — the curation signal
    behind embedding-based outlier pruning (vectors far from their cluster
    center are mislabeled / noise).

    Exactness design (what makes this oracle-checkable cross-engine): floats
    are quantized to integers (``floor(x * scale)``), so the centroid *sums*
    are exact and order-independent; and since ``cos(v, sum/n) ==
    cos(v, sum)`` (positive scalars cancel), the mean division never
    happens — every accumulation is integer/decimal-exact and only the final
    ``dot / (sqrt(n1) * sqrt(n2))`` runs in float, identically in any
    IEEE-754 engine. Output ``cos_micro = floor(cos * 1e6)``.

    Plan shape: one posexplode -> groupBy(group, pos) with map-side partial
    aggregation builds the (|groups| x dims)-row centroid table; everything
    else is a broadcast join + per-row array folds — the corpus is traversed
    twice, shuffled (in aggregate form) once. Fold accumulators are
    decimal(38,0), so no bound on |group| overflows.
    """
    qi = F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.floor(x * scale).cast("long"),
    )
    base = df.select(
        F.col(id_col), F.col(group_col), qi.alias("__qi")
    )
    ex = base.select(group_col, F.posexplode("__qi").alias("pos", "qv"))
    cent = ex.groupBy(group_col, "pos").agg(F.sum("qv").alias("cs"))
    cent_arr = cent.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cs"))),
            lambda s: s["cs"],
        ).alias("__cs")
    )
    DEC0 = F.lit(0).cast("decimal(38,0)")

    def fold_sq(arr: Column) -> Column:
        return F.aggregate(
            arr, DEC0,
            lambda acc, x: acc + x.cast("decimal(18,0)") * x.cast("decimal(18,0)"),
        )

    dot_ = F.aggregate(
        F.zip_with(
            F.col("__qi"), F.col("__cs"),
            lambda a, b: a.cast("decimal(18,0)") * b.cast("decimal(18,0)"),
        ),
        DEC0,
        lambda acc, x: acc + x,
    )
    cos = dot_.cast("double") / (
        F.sqrt(fold_sq(F.col("__qi")).cast("double"))
        * F.sqrt(fold_sq(F.col("__cs")).cast("double"))
    )
    return (
        base.join(F.broadcast(cent_arr), on=group_col)
        .withColumn("cos_micro", F.floor(cos * 1_000_000).cast("long"))
        .drop("__qi", "__cs")
    )


def pq_compress(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trainer: str = "lloyd",
    iters: int = 2,
    quant: int = 1 << 20,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization (Jégou et al. 2011, TPAMI — public paper):
    split each vector into ``n_subspaces`` contiguous sub-vectors, k-means
    each subspace to ``n_codes`` centroids, store one byte-ish code per
    subspace. 64-dim float32 -> 8 codes is a 32x compression; at 100 TB of
    embeddings the codebook (n_subspaces x n_codes x dims/n_subspaces
    floats) broadcasts everywhere while the corpus carries only codes.

    ``trainer='lloyd'`` (default) trains all subspaces simultaneously with
    the same deterministic integer-quantized Lloyd arithmetic as
    :func:`lloyd_kmeans` (md5-sampled seeds, quantized exact component
    sums, (d2, code) argmin tie-break) — every step is replayable in ANSI
    SQL, which is what makes q455's DuckDB oracle possible; codes are the
    seed vector ids, not dense 0..k-1, and empty cells drop out, so the
    codebook may hold fewer than n_subspaces x n_codes rows.
    ``trainer='mllib'`` keeps the pyspark.ml KMeans (k-means|| init) path
    — typically a hair better distortion, NOT SQL-replayable.

    Returns (codes_df[id, codes array<bigint>], codebook_df[subspace, code,
    centroid array<double>]) — codes are bigint because lloyd codes are
    seed CORPUS IDS (an int32 code column overflowed on the 8x soak's
    offset replica ids). Assignment is a broadcast cross-join of each
    sub-vector against its subspace's centroids — argmin via the same
    sorted-struct trick the engine uses for langid. Reconstruction error
    is bounded in tests/test_similarity.py. Training cost at 100 TB: the
    lloyd path is 1 + iters full-corpus passes with a k x dims-bounded
    shuffle each (train on a sample and pass the codebook to assign-only
    flows when even that is too much).
    """
    sub_len = dims // n_subspaces
    spark = corpus.sparkSession
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    # (id, subspace, sub-vector) — shared by lloyd training and assignment
    subs = base.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("subspace"),
                    F.slice(_as_double(F.col("v")), s * sub_len + 1, sub_len)
                    .alias("sub"),
                )
                for s in range(n_subspaces)
            ])
        ).alias("e"),
    ).select("id", F.col("e.subspace").alias("subspace"), F.col("e.sub").alias("sub"))
    dist2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("id", "subspace").orderBy(F.col("d2"), F.col("code"))

    def _cb_df(cents: dict[int, list[tuple[int, list[float]]]]) -> DataFrame:
        return spark.createDataFrame(
            [(s, c, cent) for s in range(n_subspaces) for c, cent in cents[s]],
            "subspace int, code bigint, centroid array<double>",
        )

    def _assign(cb: DataFrame) -> DataFrame:
        return (
            subs.join(F.broadcast(cb), on="subspace")
            .withColumn("d2", dist2)
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
        )

    if trainer == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        cb_rows = []
        for s in range(n_subspaces):
            sub = base.select(
                array_to_vector(
                    F.slice(_as_double(F.col("v")), s * sub_len + 1, sub_len)
                ).alias("features")
            )
            model = KMeans(k=n_codes, seed=seed + s, featuresCol="features").fit(sub)
            for c, center in enumerate(model.clusterCenters()):
                cb_rows.append((s, c, [float(x) for x in center]))
        codebook = spark.createDataFrame(
            cb_rows, "subspace int, code bigint, centroid array<double>"
        )
    elif trainer == "lloyd":
        # seeds: the n_codes smallest-md5(id) corpus vectors, sliced per
        # subspace on the driver (ONE TakeOrdered job for all subspaces)
        seed_rows = (
            base.select(
                "id", _as_double(F.col("v")).alias("vd"),
                F.md5(F.col("id").cast("string")).alias("h"),
            )
            .orderBy("h").limit(n_codes).collect()
        )
        cents = {
            s: sorted(
                (int(r.id),
                 [float(x) for x in r.vd[s * sub_len:(s + 1) * sub_len]])
                for r in seed_rows
            )
            for s in range(n_subspaces)
        }
        qd = float(quant)
        for _ in range(iters):
            # one corpus pass updates EVERY subspace: assignment keyed by
            # (subspace, code), quantized component sums collapse to at
            # most n_subspaces x n_codes x sub_len rows before collect —
            # the lloyd_kmeans arithmetic exactly (truncate-toward-zero
            # quantization, double(sum)/n/quant means)
            qi = F.transform(
                F.col("sub"), lambda x: (x * F.lit(qd)).cast("long")
            )
            rows = (
                _assign(_cb_df(cents))
                .select("subspace", "code", F.posexplode(qi).alias("pos", "qv"))
                .groupBy("subspace", "code", "pos")
                .agg(F.sum("qv").alias("sq"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            acc: dict[tuple[int, int], list] = {}
            for r in rows:
                a = acc.setdefault(
                    (int(r["subspace"]), int(r["code"])), [0] * (sub_len + 1)
                )
                a[r["pos"]] = r["sq"]
                a[sub_len] = r["n"]
            cents = {
                s: sorted(
                    (c, [float(a[i]) / a[sub_len] / qd for i in range(sub_len)])
                    for (ss, c), a in acc.items() if ss == s
                )
                for s in range(n_subspaces)
            }
        codebook = _cb_df(cents)
    else:
        raise ValueError(f"trainer must be 'lloyd' or 'mllib', got {trainer!r}")

    assigned = _assign(codebook)
    codes = assigned.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda st: st["code"],
        ).alias("codes")
    )
    return codes, codebook


def pq_reconstruct(codes: DataFrame, codebook: DataFrame) -> DataFrame:
    """Rebuild approximate vectors from PQ codes (concatenate the coded
    centroids, in subspace order) — the decode path used for ADC-style
    rescoring. Broadcast the codebook; flatten via explode + re-collect."""
    ex = codes.select(
        "id", F.posexplode("codes").alias("subspace", "code")
    )
    joined = ex.join(F.broadcast(codebook), on=["subspace", "code"])
    return joined.groupBy("id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("subspace", "centroid"))
                ),
                lambda st: st["centroid"],
            )
        ).alias("approx")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast-nested-loop join (queries tiny) -> per-row cosine
    (codegen) -> per-query top-k via row_number window partitioned by the
    query id (high-cardinality partitioning, shuffle sized |Q| x |corpus|).
    """
    q = prep_cosine(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        vec_col, dv="__qdv", n="__qn", keep=["query_id"],
    )
    c = prep_cosine(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        vec_col, dv="__cdv", n="__cn", keep=["neighbor_id"],
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            cosine_pre(F.col("__qdv"), F.col("__cdv"),
                       F.col("__qn"), F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def all_pairs_cosine(
    corpus: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine similarity above ``threshold`` via triangle
    block distribution — the distributed form of an O(n²) self-comparison
    with NO cartesian-product node in the plan.

    Each vector lands in block ``id % n_blocks``; a tiny broadcast table
    enumerates the B(B+1)/2 unordered block pairs; the left side replicates
    each vector into the block pairs where its block is the row block, the
    right side likewise for the column block, and an ordinary equi-join on
    the block-pair id co-locates exactly one copy of every vector pair.
    Work per task is |block|², spread evenly over B(B+1)/2 tasks; each side
    is replicated ≤ B times, so the shuffled volume is n·B rows — the
    standard way to scale an inherently quadratic exact comparison across
    executors (the *sub*-quadratic path is LSH candidates + verify, which
    trades recall; see lsh_bucket_topk).

    Cross-block pairs surface in one arbitrary orientation (blocks are not
    ordered by id), so the output canonicalizes to a = least, b = greatest;
    cosine is orientation-invariant down to the bit (x*y == y*x in IEEE,
    fold order fixed by element order).
    """
    spark = corpus.sparkSession
    pair_rows = [
        (bi * n_blocks + bj, bi, bj)
        for bi in range(n_blocks)
        for bj in range(bi, n_blocks)
    ]
    pairs = spark.createDataFrame(pair_rows, "p int, bi int, bj int")
    v = prep_cosine(
        corpus, vec_col,
        keep=[
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("__blk"),
        ],
    )
    left = v.join(
        F.broadcast(pairs), F.col("__blk") == F.col("bi")
    ).select("p", "bi", "bj", F.col(id_col).alias("__a"),
             F.col("__dv").alias("__va"), F.col("__n").alias("__na"))
    right = v.join(
        F.broadcast(pairs.select(F.col("p").alias("p2"), F.col("bj").alias("bj2"))),
        F.col("__blk") == F.col("bj2"),
    ).select("p2", F.col(id_col).alias("__b"),
             F.col("__dv").alias("__vb"), F.col("__n").alias("__nb"))
    # threshold predicate written INTO the join condition after the cheap
    # orientation conjunct — same conjunct-order rationale (and measured
    # win) as cluster_pruned_pairs: a separate .where(sim >= t) gets
    # pushed in FRONT of the cheap predicate and the O(dims) fold then
    # runs on pairs the orientation check would have dropped for free.
    sim = cosine_pre(F.col("__va"), F.col("__vb"),
                     F.col("__na"), F.col("__nb"))
    return (
        left.join(
            right,
            (F.col("p") == F.col("p2"))
            & ((F.col("bi") != F.col("bj")) | (F.col("__a") < F.col("__b")))
            & (sim >= threshold),
        )
        .select(
            F.least("__a", "__b").alias("a"),
            F.greatest("__a", "__b").alias("b"),
            sim.alias("sim"),
        )
    )


def lloyd_kmeans(
    corpus: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    dims: int | None = None,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column, expressed so the
    whole training run is bit-reproducible in ANSI SQL (the q115 oracle
    mirrors it in DuckDB).

    Per iteration:
    - **assign**: broadcast the k×dims centroid table against the corpus,
      squared-L2 via a sequential ``zip_with``/``aggregate`` fold, winner =
      row_number over (dist, cell_id) — ties break on cell id, so the
      argmin is total-ordered and engine-independent.
    - **update**: per-cell mean computed from *integer-quantized* component
      sums — each double component is scaled by 2^20 and truncated to a
      BIGINT, so the cross-row summation is exact integer math (no
      order-dependent FP rounding); the new component is
      double(sum)/n/2^20, identical IEEE arithmetic on any engine. The agg
      is posexplode -> ``groupBy(cell_id, pos)`` — map-side partial
      aggregation reduces every partition to k×dims rows before the
      exchange (same shuffle volume as a k-group agg with dims SUM
      columns, but a dims-independent expression tree: the wide-agg form
      paid ~2s of Catalyst/codegen per iteration at dims=64).

    New centroids are **collected (k×dims scalars) and re-inlined as
    literals** each iteration — the harmonize invariant-scalar pattern —
    so iteration N+1's plan does not embed iteration N's lineage (the q107
    composed-selector blowup). At 100 TB: assignment is a broadcast join
    (centroids are KBs), the update shuffle is k×dims regardless of corpus
    size, and the driver loop is `iters` tiny jobs. Empty cells drop out
    (standard Lloyd); seeds are the ``n_cells`` smallest-md5(id) corpus
    vectors (deterministic, engine-independent).
    """
    return _centroid_df(
        corpus.sparkSession,
        _lloyd_rows(corpus, n_cells, iters, dims, quant, id_col, vec_col),
    )


def _lloyd_rows(
    corpus: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    dims: int | None = None,
    quant: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """:func:`lloyd_kmeans`'s training loop, returning the codebook as the
    driver-side row list it already holds — internal callers
    (cluster_pruned_pairs) feed it straight to assign_cells without a
    createDataFrame/collect round trip."""
    seeds = _sampled_centroids(corpus, n_cells, id_col, vec_col).collect()
    cents: list[tuple[int, list[float]]] = [
        (int(r.cell_id), [float(x) for x in r.centroid]) for r in seeds
    ]
    if dims is None:  # the seed vectors carry the dimensionality
        dims = len(cents[0][1]) if cents else 0
    qd = float(quant)
    for _ in range(iters):
        # pass the driver-side codebook straight through — no
        # createDataFrame/collect round trip per iteration
        assigned = assign_cells(corpus, cents,
                                id_col=id_col, vec_col=vec_col)
        qi = F.transform(
            _as_double(F.col(vec_col)), lambda x: (x * qd).cast("long")
        )
        rows = (
            assigned.select("cell_id", F.posexplode(qi).alias("pos", "qv"))
            .groupBy("cell_id", "pos")
            .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, list] = {}
        for r in rows:
            acc = by_cell.setdefault(int(r["cell_id"]), [0] * (dims + 1))
            acc[r["pos"]] = r["s"]
            acc[dims] = r["n"]
        # float(s) first: double(sum)/n/2^20, the exact arithmetic the SQL
        # oracle performs (CAST(s AS DOUBLE) / n / quant)
        cents = sorted(
            (c, [float(acc[i]) / acc[dims] / qd for i in range(dims)])
            for c, acc in by_cell.items()
        )
    return cents


def _centroid_df(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(cents, "cell_id bigint, centroid array<double>")


def _sql_double(x: float) -> str:
    """SQL double literal for a finite Python float. ``repr`` is the
    shortest decimal that round-trips, and Spark's parser reads it back
    to the identical IEEE bits — one parsed text replaces one py4j
    round trip per F.lit(scalar)."""
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite centroid component: {x}")
    return repr(x) + "D"


# Max total inlined centroid literals (k x dims) before assign_cells
# switches from codegen folds to the broadcast-join plan: 64k doubles is
# well inside codegen limits (64KB method split handles it) while a
# 4096-cell x 768-dim codebook (3.1M literals) clearly is not.
_INLINE_CELL_BUDGET = 65536


def _assign_cells_join(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Broadcast cross-join + struct-min argmin fallback for large
    codebooks.

    k x row replication through a BroadcastNestedLoopJoin, then a hash
    aggregation PER ROW picks the nearest cell — the classic IVF
    assignment shape. The group key is an internal per-row id
    (``monotonically_increasing_id``), NOT ``id_col``, so duplicate ids
    in the corpus are each assigned independently — matching the inline
    literal-codebook path exactly (which is a pure per-row map). The
    corpus columns ride through the aggregation as ``first`` (every row
    in a group IS the same source row), so no join back is needed and
    the generated row id never crosses a lineage boundary. Distance
    arithmetic matches the inline fold (zip_with/aggregate of (x-c)^2,
    ties break on cell_id via the struct min) so both paths assign
    identically."""
    vec = _as_double(F.col(vec_col))
    cent = _as_double(F.col("centroid"))
    d = F.aggregate(
        F.zip_with(vec, cent, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rid = "__assign_row"
    scored = (
        corpus.withColumn(rid, F.monotonically_increasing_id())
        .join(F.broadcast(centroids))
        .withColumn("__d", d)
    )
    return (
        scored.groupBy(rid)
        .agg(
            F.min(F.struct(F.col("__d"), F.col("cell_id"))).alias("__best"),
            *[F.first(c).alias(c) for c in corpus.columns],
        )
        .select(*corpus.columns, F.col("__best.cell_id").alias("cell_id"))
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame | Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment with the codebook INLINED as literal
    expressions: the k×dims centroid table is dimension-sized by
    construction (KBs), so instead of a broadcast cross-join (k× row
    replication) + per-vector argmin window (a full hash shuffle on
    ``id_col``), each row evaluates k squared-L2 folds in whole-stage
    codegen and takes ``array_min`` over (dist, cell_id) structs — same
    total order (ties break on cell id), ZERO joins, ZERO shuffles. At
    100 TB the assignment is a pure map over the scan.

    The per-component arithmetic — sequential ``zip_with``/``aggregate``
    fold of (x-c)² — is expression-identical to the previous join
    formulation, so the DuckDB oracle that replays it stays bit-exact.

    Guards: an empty codebook raises (array_min over an empty struct
    array would yield null cell_ids instead of the old empty-join
    output), and a codebook past ``_INLINE_CELL_BUDGET`` total literals
    falls back to the broadcast-join + argmin formulation rather than
    emitting a pathological codegen expression tree.

    ``centroids`` may be the (cell_id, centroid) DataFrame or an
    already-collected sequence of ``(cell_id, [components])`` rows —
    lloyd_kmeans holds the codebook driver-side between iterations, and
    round-tripping it through createDataFrame + collect cost one fixed-
    overhead Spark job per call for nothing."""
    if isinstance(centroids, DataFrame):
        rows = centroids.select("cell_id", "centroid").collect()
        cents = sorted(
            (int(r["cell_id"]), [float(x) for x in r["centroid"]])
            for r in rows
        )
    else:
        cents = sorted(
            (int(c), [float(x) for x in v]) for c, v in centroids
        )
    if not cents:
        raise ValueError("assign_cells: empty centroids codebook")
    if sum(len(v) for _, v in cents) > _INLINE_CELL_BUDGET:
        cdf = (centroids if isinstance(centroids, DataFrame)
               else _centroid_df(corpus.sparkSession, cents))
        return _assign_cells_join(corpus, cdf, id_col, vec_col)
    vec = _as_double(F.col(vec_col))
    # ONE literal array-of-structs + ONE transform lambda, not k copied
    # fold expressions: the scoring tree is k x smaller, which cuts the
    # per-job Catalyst/analysis cost ~8x (measured 0.8s -> 0.1s per assign
    # at k=8, dims=64) while evaluating the identical per-element
    # arithmetic (zip_with (x-c)^2 fold, seed 0.0, left-to-right).
    # The matrix is rendered as ONE sql text parsed JVM-side: building it
    # from k x dims F.lit() Columns costs a py4j round trip PER SCALAR
    # (~2.5s of pure driver time at k=8, dims=64 — it dominated q115's
    # wall clock); repr() doubles round-trip exactly through the SQL
    # parser, so the literal values are bit-identical either way.
    codebook = F.expr(
        "array(" + ",".join(
            "named_struct('c',array("
            + ",".join(_sql_double(x) for x in v)
            + f"),'cell_id',CAST({c} AS BIGINT))"
            for c, v in cents
        ) + ")"
    )
    scored = F.transform(
        codebook,
        lambda ce: F.struct(
            F.aggregate(
                F.zip_with(vec, ce["c"], lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            ce["cell_id"].alias("cell_id"),
        ),
    )
    return corpus.withColumn("cell_id", F.array_min(scored)["cell_id"])


def cluster_pruned_pairs(
    corpus: DataFrame,
    threshold: float,
    n_cells: int = 8,
    iters: int = 2,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-duplicate pairs with k-means cluster pruning: train a
    Lloyd codebook (or take one), assign every vector to its nearest cell,
    and compare pairs ONLY within a cell — the equi-join on ``cell_id``
    replaces q46's full triangle-blocked O(n²).

    Recall < 1 by construction (cross-cell near-dups are unseen); this is
    the standard semantic-dedup trade (SemDeDup-style): candidate volume
    drops from n²/2 to Σ|cell|²/2. At scale, fat cells are the hazard —
    sub-block a hot cell with all_pairs_cosine's triangle scheme, or raise
    n_cells. Output is canonicalized (a < b) and deterministic."""
    from chemharmony_spark.hints import spread_scan

    if centroids is None:
        # the rows variant keeps the trained codebook driver-side; the
        # assign below inlines it as literals either way. Training reads
        # the RAW corpus: its per-iteration jobs are tiny
        # collect-terminated aggs where an added spread exchange costs
        # more latency than the parallelism buys (measured: spreading
        # the loop regressed build 1.4 s -> 2.1 s at sf0.1).
        centroids = _lloyd_rows(corpus, n_cells=n_cells, iters=iters,
                                id_col=id_col, vec_col=vec_col)
    # r9: the FINAL assignment + cosine prep is spread to core width
    # (no-op at scale; hints.spread_scan) — it feeds the in-cell pair
    # join, the operator's hot loop (measured: exec 2.0 s -> 0.5 s).
    # Value-safe: assignment is per-row, the pair set is order-free.
    # persist: the assignment + cosine prep (double cast, norm — computed
    # per VECTOR here so the per-pair work is one dot fold) feeds BOTH
    # sides of the self-join and would otherwise evaluate twice
    assigned = registered_persist(
        prep_cosine(
            assign_cells(spread_scan(corpus), centroids,
                         id_col=id_col, vec_col=vec_col),
            vec_col, keep=["cell_id", id_col],
        )
    )
    left = assigned.select(
        F.col("cell_id"), F.col(id_col).alias("a"),
        F.col("__dv").alias("__va"), F.col("__n").alias("__na"),
    )
    right = assigned.select(
        F.col("cell_id").alias("cell_id2"), F.col(id_col).alias("b"),
        F.col("__dv").alias("__vb"), F.col("__n").alias("__nb"),
    )
    # The threshold predicate is part of the JOIN CONDITION, written
    # AFTER the cheap a < b conjunct. Written as a separate .where(), the
    # optimizer pushes it into the join anyway but PREPENDS it, so the
    # O(dims) cosine fold ran for every ORDERED same-cell pair before
    # a < b could drop half of them (And short-circuits left-to-right and
    # Catalyst preserves the written conjunct order). Measured at sf0.1:
    # 2.8s -> 1.3s on the pair join, identical 11121-row output (r9 opt).
    # Survivors re-evaluate the identical expression in the projection —
    # bit-identical, and survivor counts are tiny next to candidates.
    sim = cosine_pre(F.col("__va"), F.col("__vb"),
                     F.col("__na"), F.col("__nb"))
    return (
        left.join(
            right,
            (F.col("cell_id") == F.col("cell_id2"))
            & (F.col("a") < F.col("b"))
            & (sim >= threshold),
        )
        .select("cell_id", "a", "b", sim.alias("sim"))
    )


def _hyperplane_coef(plane: int, dim: int) -> float:
    """Deterministic ±1 hyperplane coefficient from the parity of the
    first hex char of md5('p<plane>:<dim>'), computed at PLAN-BUILD time so
    the coefficients inline as plain float literals instead of 64 md5
    expression nodes per plane (n_planes x dims md5 Columns made q40's
    analysis+codegen the job: 39s for a 500-row corpus at sf0.01)."""
    import hashlib

    h = hashlib.md5(f"p{plane}:{dim}".encode()).hexdigest()
    return float((int(h[0], 16) % 2) * 2 - 1)


def signature_bits_multi(vec_col: Column, n_planes: int, dims: int,
                         n_tables: int) -> Column:
    """All ``n_tables`` LSH bucket ids at once: per-table strings of
    concatenated sign bits of dots with ``n_planes`` random hyperplanes
    (table t uses the independent plane family starting at
    ``t * n_planes``; coefficients from :func:`_hyperplane_coef`). ONE
    nested literal plane tensor + one outer transform instead of
    n_tables separate expression trees — bit-for-bit identical output to
    building each table's signature separately, but Catalyst
    parses/analyzes a single literal, which cut q40's cold first-run
    from ~12.5 s to ~4 s at sf0.01 (the corpus there is 500 rows; plan
    analysis WAS the job)."""
    arr = _as_double(vec_col)
    lit = "array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(
                _sql_double(_hyperplane_coef(t * n_planes + p, d))
                for d in range(dims)
            ) + ")" for p in range(n_planes)
        ) + ")" for t in range(n_tables)
    ) + ")"
    return F.transform(
        F.expr(lit),
        lambda table: F.array_join(
            F.transform(
                table,
                lambda cf: F.when(
                    F.aggregate(
                        F.zip_with(arr, cf, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x,
                    ) >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0")),
            ),
            "",
        ),
    )


def _sampled_centroids(corpus: DataFrame, n_cells: int,
                       id_col: str, vec_col: str) -> DataFrame:
    """Deterministic corpus-sample codebook: the n_cells vectors with the
    smallest md5(id) — stable across runs and engines."""
    hashed = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    return (
        hashed.orderBy("h").limit(n_cells)
        .select(F.col("cid").alias("cell_id"), F.col("cvec").alias("centroid"))
    )


def kmeans_centroids(corpus: DataFrame, n_cells: int = 16, seed: int = 42,
                     vec_col: str = "embedding") -> DataFrame:
    """Trained codebook: pyspark.ml KMeans over the embedding column
    (array<float> -> ml Vector -> fit -> centroid table). Deterministic for
    a fixed seed + input. At 100 TB, train on a sample and persist the
    codebook as a tiny dimension table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell_id int, centroid array<double>")


# ANN defaults, tuned to >=0.8 recall@5 on the sf0.01 fixture (the full
# recall-vs-cost grid is in SCALE.md §"ANN recall vs candidate cost"):
# LSH 4 planes x 16 tables -> 0.85; IVF probe=6/assign=3 -> 0.92.
LSH_N_PLANES = 4
LSH_N_TABLES = 16
IVF_N_PROBE = 6
IVF_CORPUS_ASSIGN = 3


def lsh_params_for_recall(target_recall: float = 0.85,
                          n_planes: int = LSH_N_PLANES,
                          assumed_sim: float = 0.45,
                          safety: float = 1.5,
                          n_probe_bits: int = 0) -> tuple[int, int]:
    """Derive (n_planes, n_tables) for a target recall from the standard
    random-hyperplane collision model (Charikar 2002, STOC — public):
    P(two vectors at cosine s share one plane's sign) = 1 - arccos(s)/pi,
    so P(same bucket in one b-plane table) = p^b and recall over L
    independent tables is 1 - (1 - p^b)^L. ``assumed_sim`` is the design
    point (the weakest neighbor you still want found); ``safety``
    multiplies L because real neighbor-similarity distributions have a
    tail below the design point (x1.5 reproduces the measured sf0.01
    grid: the formula alone says L=10 for 0.85 @ s=0.45, measurement
    needed 16). Pick n_planes from corpus size first
    (~log2(N / target_bucket_rows)); tables then buy recall at linear
    candidate cost."""
    import math

    if not 0 < target_recall < 1:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    if not -1 < assumed_sim < 1:
        # s = +-1 means exact duplicates/negations — every/no plane agrees,
        # the collision model degenerates; use exact dedup instead
        raise ValueError(f"assumed_sim must be in (-1, 1), got {assumed_sim}")
    if n_probe_bits not in (0, 1):
        # keep the model in lockstep with lsh_bucket_topk's support
        raise ValueError(f"n_probe_bits must be 0 or 1, got {n_probe_bits}")
    p = 1.0 - math.acos(assumed_sim) / math.pi
    p_table = p ** n_planes
    if n_probe_bits:
        # Hamming<=1 multi-probe: the table also hits when exactly one
        # plane disagrees — add the b * p^(b-1) * (1-p) term
        p_table += n_planes * p ** (n_planes - 1) * (1.0 - p)
    if not 0 < p_table < 1:
        raise ValueError(f"degenerate per-table hit probability {p_table}")
    tables = math.ceil(safety * math.log(1 - target_recall)
                       / math.log(1 - p_table))
    return n_planes, max(1, tables)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = IVF_N_PROBE,
             corpus_assign: int = IVF_CORPUS_ASSIGN,
             centroids: DataFrame | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into inverted-file
    cells around centroid vectors; search only each query's ``n_probe``
    nearest cells.

    Centroids here are a deterministic sample of corpus vectors (the
    ``n_cells`` smallest md5(vec_id) — stable across runs/engines); a
    production deployment would train them offline (e.g. pyspark.ml KMeans)
    and broadcast the trained codebook the same way. At scale the cell id
    becomes the corpus partition key, so probing is partition pruning.

    ``corpus_assign`` > 1 replicates each corpus vector into its R nearest
    cells (multi-assignment): recall rises sharply for R× storage while
    per-query probe cost stays proportional to n_probe·R/n_cells of the
    corpus. Measured recall@5 on the sf0.01 embeddings (n_cells=16,
    sampled centroids): R=1/probe=3 -> 0.49, R=2/probe=5 -> 0.77,
    R=3/probe=6 -> 0.92 (the tuned default); trained centroids
    (``centroids=kmeans_centroids(...)`` or :func:`lloyd_kmeans`) reach
    0.90 already at R=2/probe=5. Full grid in SCALE.md. The dedup below
    already collapses a pair found via two shared cells.
    """
    if centroids is None:
        centroids = _sampled_centroids(corpus, n_cells, id_col, vec_col)
    # per-vector (and per-centroid) cosine prep: the centroid-probe cross
    # join and the in-cell rerank both reuse one cast+norm per vector
    cent = prep_cosine(centroids, "centroid", dv="__tdv", n="__tn",
                       keep=["cell_id"])

    def assign(df, id_alias, dv_alias, n_alias, n_nearest):
        prep = prep_cosine(
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col)),
            vec_col, dv=dv_alias, n=n_alias, keep=[id_alias],
        )
        scored = prep.crossJoin(F.broadcast(cent)).withColumn(
            "csim",
            cosine_pre(F.col(dv_alias), F.col("__tdv"),
                       F.col(n_alias), F.col("__tn")),
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.col("csim").desc(), F.col("cell_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .where(F.col("crank") <= n_nearest)
            .select(id_alias, dv_alias, n_alias, "cell_id")
        )

    corpus_cells = assign(corpus, "neighbor_id", "__cdv", "__cn",
                          corpus_assign)
    query_cells = assign(queries, "query_id", "__qdv", "__qn", n_probe)
    # query_cells stays a FORCED broadcast deliberately: it is |Q| x
    # n_probe rows by construction and ``queries`` is a probe set by
    # contract (corpus-sized "queries" belong in cluster_pruned_pairs /
    # all_pairs_cosine). A size gate would mis-decline here — the frame
    # sits behind a rank window whose Catalyst estimate is unknown — and
    # needlessly shuffle the corpus-sized cell table at small scale
    # (measured: q47 2 -> 5 exchanges at sf0.001 for zero benefit).
    scored = (
        corpus_cells.join(F.broadcast(query_cells), on="cell_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            cosine_pre(F.col("__qdv"), F.col("__cdv"),
                       F.col("__qn"), F.col("__cn")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = LSH_N_PLANES, n_tables: int = LSH_N_TABLES,
                    dims: int = 64, n_probe_bits: int = 0,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: compare only vectors sharing a query's LSH bucket
    in ANY of ``n_tables`` independent hash tables (standard L-tables LSH —
    more tables buy recall with linear extra candidate cost). Defaults are
    tuned to 0.85 recall@5 on the sf0.01 fixture (was 4x4 = 0.38 before
    round 5); size them for other corpora with
    :func:`lsh_params_for_recall` + the SCALE.md grid.

    At scale the table buckets become partition keys (write the corpus
    partitioned by (table, bucket) once; every query then touches L
    partitions — partition pruning does the candidate selection for free).

    ``n_probe_bits=1`` enables multi-probe (Lv et al., VLDB 2007 —
    public): each QUERY also probes every bucket at Hamming distance 1
    from its signature (b extra buckets per table, query side only — the
    corpus still stores ONE bucket per table). More planes then shrink
    every bucket while the probe ball recovers the recall the extra
    planes would cost, so equal recall arrives with fewer candidate
    pairs — the quantity that actually scales: measured on the sf0.01
    fixture, 8 planes x 16 tables x probe-1 gives recall 0.86 with 32%
    fewer candidates than the 4 x 16 default's 0.85 (grid in SCALE.md).
    Only 0 and 1 are supported; the default stays 0 so existing plans
    and oracles are byte-identical.
    """
    if n_probe_bits not in (0, 1):
        raise ValueError(
            f"n_probe_bits must be 0 or 1, got {n_probe_bits}"
        )
    # fail loudly on a dims mismatch: zip_with null-pads the shorter
    # array, every dot fold goes NULL, every sign bit reads '0', and ALL
    # vectors silently land in one bucket — the "scale path" becomes a
    # full cross product with no error. One first()-row probe at plan
    # build catches it for the cost of a trivial job.
    probe = corpus.select(F.size(vec_col).alias("d")).first()
    if probe is not None and probe["d"] != dims:
        raise ValueError(
            f"lsh_bucket_topk: dims={dims} but {vec_col!r} arrays have "
            f"{probe['d']} elements — signatures would degenerate to one "
            f"bucket; pass dims={probe['d']}"
        )

    def with_buckets(df, id_alias, dv_alias, n_alias):
        sigs = signature_bits_multi(F.col(vec_col), n_planes, dims, n_tables)
        keep = [F.col(id_col).alias(id_alias), sigs.alias("__sigs")]
        return prep_cosine(df, vec_col, dv=dv_alias, n=n_alias, keep=keep)

    # candidates: same bucket in the same table, for ANY table — ONE
    # equi-join on (table_idx, bucket) over the posexploded signature
    # arrays. (Through round 5 this was n_tables separate join branches
    # union'd — on a bounded query set that is n_tables broadcast joins,
    # n_tables cache scans and a union-of-16 plan; at sf0.01 the fixed
    # per-stage overhead dominated and q40 was the sweep's slowest entry.
    # The explode is pipelined straight into the broadcast-join filter —
    # generate -> BHJ in one codegen stage — so the 16x row expansion
    # never materializes or shuffles; only bucket-matching candidates
    # survive to the dedup exchange, exactly as before.)
    c = with_buckets(corpus, "neighbor_id", "__cdv", "__cn")
    q = with_buckets(queries, "query_id", "__qdv", "__qn")
    c_kv = c.select(
        "neighbor_id", "__cdv", "__cn",
        F.posexplode("__sigs").alias("__tbl", "__bucket"),
    )
    if n_probe_bits:
        # expand each query signature to its Hamming<=1 ball: the exact
        # bucket plus one string per flipped bit. Query-side only and
        # literal-indexed, so the expansion is (1 + n_planes) narrow rows
        # per (query, table) — the corpus side is untouched.
        def _flip(s, i):
            return F.concat(
                F.substring(s, 1, i),
                F.when(F.substring(s, i + 1, 1) == F.lit("1"),
                       F.lit("0")).otherwise(F.lit("1")),
                F.substring(s, i + 2, n_planes - i - 1),
            )

        q_kv = (
            q.select("query_id",
                     F.posexplode("__sigs").alias("__tbl", "__sig"))
            .select(
                "query_id", "__tbl",
                F.explode(F.array(
                    F.col("__sig"),
                    *[_flip(F.col("__sig"), i) for i in range(n_planes)],
                )).alias("__bucket"),
            )
        )
    else:
        q_kv = q.select(
            "query_id", F.posexplode("__sigs").alias("__tbl", "__bucket")
        )
    # the query side stays a FORCED broadcast deliberately (the ivf_topk
    # posture): ``queries`` is a probe set by contract — corpus-sized
    # "queries" belong in all_pairs_cosine / cluster_pruned_pairs. A size
    # gate mis-declines here: without CBO a Filter-derived probe set
    # inherits the CORPUS's size estimate, the hint vanishes at exactly
    # the scale it matters, and the 16x-posexploded corpus side would
    # materialize into shuffle files before AQE could convert the join
    # back — defeating the generate->BHJ pipelining this operator is
    # built around. (The gate also re-optimizes the inlined hyperplane
    # tensor per call — the plan-analysis cost the r6 rewrite removed.)
    cand = (
        c_kv.join(F.broadcast(q_kv), on=["__tbl", "__bucket"])
        .drop("__tbl", "__bucket")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(F.broadcast(q.select("query_id", "__qdv", "__qn")),
                  on="query_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            cosine_pre(F.col("__qdv"), F.col("__cdv"),
                       F.col("__qn"), F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
