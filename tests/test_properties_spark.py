"""Property-based tests (hypothesis) for the round-2 scale-rewritten
operators: on ARBITRARY small inputs the distributed decompositions must
equal their naive single-machine definitions — the oracle suite pins them
on one data distribution; these pin the algebra.

Example counts are kept low (Spark job per example); shapes are chosen to
hit the decomposition edges: duplicate values across bucket boundaries,
single-value groups, empty-ish groups, negative/zero values.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, value) rows: few keys, values with deliberate duplicates
rows_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-50, max_value=50).map(lambda v: v / 4.0),
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(rows=rows_st)
def test_grouped_percentiles_disc_equals_naive_rank(spark, rows):
    from chemharmony_spark.operators.core import grouped_percentiles_disc

    qs = [0.25, 0.5, 0.9]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["p25"], r["p50"], r["p90"])
        for r in grouped_percentiles_disc(df, ["k"], "v", qs).collect()
    }

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = {}
    for k, grp in pdf.groupby("k"):
        vals = sorted(grp["v"].tolist())
        n = len(vals)
        want[k] = tuple(
            vals[max(1, math.ceil(q * n)) - 1] for q in qs
        )
    assert got == want


@SLOW
@given(rows=rows_st)
def test_grouped_cumsum_equals_pandas(spark, rows):
    from chemharmony_spark.operators.core import grouped_cumsum

    # unique order key per row (md5 of the row index, like the real callers)
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v double, i long").withColumn(
        "h", F.md5(F.col("i").cast("string"))
    )
    out = grouped_cumsum(
        df, ["k"], "h", "v", out_col="cum",
        bucket=F.conv(F.substring("h", 1, 2), 16, 10).cast("int"),
    )
    got = {r["i"]: r["cum"] for r in out.collect()}

    import hashlib

    pdf = pd.DataFrame(
        [(k, v, i, hashlib.md5(str(i).encode()).hexdigest())
         for i, (k, v) in enumerate(rows)],
        columns=["k", "v", "i", "h"],
    ).sort_values(["k", "h"])
    pdf["cum"] = pdf.groupby("k")["v"].cumsum()
    want = dict(zip(pdf["i"], pdf["cum"]))
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


vecs_st = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8).map(float),
        min_size=4, max_size=4,
    ).filter(lambda v: any(x != 0 for x in v)),
    min_size=2,
    max_size=14,
)


@SLOW
@given(vecs=vecs_st)
def test_all_pairs_cosine_equals_brute_force(spark, vecs):
    """The triangle-block distribution must return EXACTLY the pairs (and
    bit-identical sims) of the naive broadcast cross join using the same
    sequential-fold cosine."""
    from chemharmony_spark.operators.similarity import all_pairs_cosine, cosine

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in all_pairs_cosine(corpus, threshold=-2.0, n_blocks=3).collect()
    }

    a = corpus.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = corpus.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    want = {
        (r["a"], r["b"]): r["sim"]
        for r in a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .collect()
    }
    assert got == want  # exact: same fold arithmetic, every pair exactly once


# values with explicit None holes and duplicates; granularity sweeps the
# bucket count from 1 bucket (degenerate) past one-row-per-bucket
nullable_rows_st = st.lists(
    st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
    min_size=1,
    max_size=50,
)


@SLOW
@given(vals=nullable_rows_st, gran=st.sampled_from([1, 3, 7, 100]))
def test_global_row_number_equals_plain_window(spark, vals, gran):
    """For ANY int column with NULL holes and ANY monotone granularity,
    the bucketed decomposition must be bit-identical to
    row_number().over(Window.orderBy(v, tie)) — including the NULLS FIRST
    placement of NULL keys (the r5 join-back regression class)."""
    from pyspark.sql.window import Window

    from chemharmony_spark.operators.core import global_row_number

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v int, tie int")
    # shift keeps the DIV operand non-negative -> trunc == floor (monotone)
    got = global_row_number(
        df, ["v", "tie"], bucket=F.expr(f"(v + 40) DIV {gran}"),
        validate=True,
    )
    want = df.select(
        "tie", F.row_number().over(Window.orderBy("v", "tie")).alias("rn")
    )
    assert sorted((r.tie, r.rn) for r in got.select("tie", "rn").collect()) \
        == sorted((r.tie, r.rn) for r in want.collect())


@st.composite
def _hash_clouds(draw):
    """Clustered 64-bit hash clouds: a few random seeds, each with up to
    4 variants perturbed by 0-14 random bit flips — shaped so pairs land
    on BOTH sides of any radius in [0, 12], including duplicates
    (0 flips) and diffs straddling band boundaries."""
    rnd = draw(st.randoms(use_true_random=False))
    out = []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        seed = rnd.getrandbits(64)
        out.append(seed)
        for _ in range(draw(st.integers(min_value=0, max_value=4))):
            v = seed
            for _ in range(rnd.randint(0, 14)):
                v ^= 1 << rnd.randrange(64)
            out.append(v)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cloud=_hash_clouds(), d=st.integers(min_value=0, max_value=12))
def test_ahash_banding_strategies_equal_brute_force(spark, cloud, d):
    """For ANY clustered hash cloud and ANY radius in [0, 12], BOTH
    candidate-generation strategies (d+1 narrow pigeonhole bands and
    HmSearch 1-bit probe banding) must emit exactly the brute-force
    Hamming pair set — with and without collapse_identical. The fixed
    -seed parity test pins two radii; this pins the algebra (r8: the
    probe plan became the default at d >= 8, so its completeness proof
    carries production weight)."""
    import warnings

    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    rows = [(i, signed(v)) for i, v in enumerate(cloud)]
    want = {
        (a, b, bin(cloud[a] ^ cloud[b]).count("1"))
        for a in range(len(cloud)) for b in range(a + 1, len(cloud))
        if bin(cloud[a] ^ cloud[b]).count("1") <= d
    }
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # saturated layouts warn by design
        for probe in (0, 1):
            for collapse in (False, True):
                got = {(r.a, r.b, r.hamming)
                       for r in ahash_near_dup_pairs(
                           hashes, max_hamming=d, probe_bits=probe,
                           collapse_identical=collapse).collect()}
                assert got == want, (
                    f"probe_bits={probe} collapse={collapse} d={d}"
                )
