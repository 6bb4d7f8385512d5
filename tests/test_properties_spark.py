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


# ---------------------------------------------------------------------------
# r9 (r8 verdict task 4): property sweeps for the recall-critical candidate
# generators. PPJoin claims EXACT recall (every pair with Jaccard >= t
# shares a prefix token); MinHash/LSH claims an exact deterministic
# pipeline (md5 band hashes) whose CANDIDATES are precisely the pairs
# agreeing on some band. The fixed-fixture tests pin one corpus; these
# sweep 120+ generated corpora. The sweeps are seeded-deterministic and
# BATCHED — per-corpus token tagging makes vocabularies disjoint, so one
# Spark pass over the union equals 120 independent runs (cross-corpus
# pairs can share no token/shingle; global token frequencies reduce to
# per-corpus frequencies) — because 120 hypothesis examples would launch
# 120 separate Spark jobs for the same coverage. A small @given case
# keeps hypothesis shrinking for the PPJoin boundary shapes.


def _random_corpora(seed: int, n_corpora: int, vocab_size: int = 10,
                    min_len: int = 1, max_len: int = 10):
    """Small word-list corpora with deliberate near-dup structure: base
    docs plus 0-2 perturbed variants (drop/replace/append one word), so
    pairwise Jaccards cluster around decision boundaries instead of ~0."""
    import random

    rnd = random.Random(seed)
    corpora = []
    for _ in range(n_corpora):
        vocab = [f"w{v}" for v in range(vocab_size)]
        docs = []
        for _ in range(rnd.randint(1, 4)):
            words = [rnd.choice(vocab)
                     for _ in range(rnd.randint(min_len, max_len))]
            docs.append(words)
            for _ in range(rnd.randint(0, 2)):
                v = list(words)
                op = rnd.random()
                if op < 0.4 and len(v) > 1:
                    v.pop(rnd.randrange(len(v)))
                elif op < 0.8:
                    v[rnd.randrange(len(v))] = rnd.choice(vocab)
                else:
                    v.append(rnd.choice(vocab))
                docs.append(v)
        corpora.append(docs)
    return corpora


def _tagged_rows(corpora):
    """(doc_id, text) rows with per-corpus token tags (disjoint vocabs) and
    globally unique ids; plus {doc_id: word-list} for the Python oracle."""
    rows, words_of = [], {}
    for ci, docs in enumerate(corpora):
        for di, words in enumerate(docs):
            gid = ci * 1000 + di
            tagged = [f"c{ci}x{w}" for w in words]
            rows.append((gid, " ".join(tagged)))
            words_of[gid] = tagged
    return rows, words_of


def test_ppjoin_prefix_filter_exact_recall_sweep(spark):
    """prefix_filter_pairs candidates must CONTAIN every pair with exact
    (rational) Jaccard >= t, for every corpus and threshold in the sweep
    — the operator's exact-recall contract (dedup.py:276 docstring) —
    and the verified pipeline (jaccard_pairs filter at t) must equal the
    brute-force pair set exactly."""
    from fractions import Fraction

    from chemharmony_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )

    corpora = _random_corpora(seed=90, n_corpora=120)
    rows, words_of = _tagged_rows(corpora)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {g: frozenset(ws) for g, ws in words_of.items()}
    by_corpus: dict[int, list[int]] = {}
    for g in sets:
        by_corpus.setdefault(g // 1000, []).append(g)

    for t in (0.3, 0.6, 0.85):
        cand = {(r.a, r.b) for r in
                prefix_filter_pairs(df, "doc_id", "text",
                                    threshold=t).collect()}
        true_pairs, j_double = set(), {}
        for ids in by_corpus.values():
            for i, a in enumerate(sorted(ids)):
                for b in sorted(ids)[i + 1:]:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    j_double[(a, b)] = inter / union
                    # exact rational compare against the float t the
                    # operator computes with — no FP ambiguity in the truth
                    if Fraction(inter, union) >= Fraction(t):
                        true_pairs.add((a, b))
        missed = true_pairs - cand
        assert not missed, f"t={t}: exact-recall violated for {missed}"

        # end-to-end: candidates -> exact Jaccard verify -> filter == truth
        cand_df = spark.createDataFrame(sorted(cand), "a long, b long")
        ver = {(r.a, r.b): r.jaccard
               for r in jaccard_pairs(df, cand_df, "doc_id",
                                      "text").collect()}
        for pair, sim in ver.items():
            assert abs(sim - j_double[pair]) < 1e-12, (t, pair)
        got_final = {p for p, sim in ver.items() if sim >= t}
        want_final = {p for p, sim in j_double.items() if sim >= t}
        assert got_final == want_final, f"t={t}"


def test_minhash_lsh_pipeline_equals_python_replay_sweep(spark):
    """minhash_signatures must equal a Python replay of its declared hash
    family exactly (per band b, min over k-shingles of md5(b||':'||s) —
    lexicographic on the hex strings), and lsh_candidate_pairs must emit
    precisely the pairs agreeing on some (band, minhash) — including
    dropping docs with fewer than k words. Deterministic, so the
    'probabilistic' banding claim is pinned exactly; the aggregate
    recall floor the fixtures assert (>= 0.8 at shingle-Jaccard >= 0.9)
    is re-checked over the whole sweep."""
    import hashlib

    from chemharmony_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    n_bands, k = 4, 3
    corpora = _random_corpora(seed=91, n_corpora=120, min_len=1, max_len=12)
    rows, words_of = _tagged_rows(corpora)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    want_sig = {}
    for g, ws in words_of.items():
        if len(ws) < k:
            continue  # no shingles -> no signature rows, by contract
        shingles = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        for b in range(n_bands):
            want_sig[(g, b)] = min(
                hashlib.md5(f"{b}:{s}".encode()).hexdigest()
                for s in shingles
            )

    sigs = minhash_signatures(df, "doc_id", "text", n_bands=n_bands, k=k)
    got_sig = {(r.id, r.band): r.minhash for r in sigs.collect()}
    assert got_sig == want_sig

    got_cand = {(r.a, r.b) for r in lsh_candidate_pairs(sigs).collect()}
    buckets: dict[tuple, list[int]] = {}
    for (g, b), mh in want_sig.items():
        buckets.setdefault((b, mh), []).append(g)
    want_cand = set()
    for ids in buckets.values():
        for i, a in enumerate(sorted(ids)):
            for b_ in sorted(ids)[i + 1:]:
                want_cand.add((a, b_))
    assert got_cand == want_cand

    # sweep-level recall floor on high-similarity pairs (shingle-set
    # Jaccard >= 0.9 — what MinHash approximates)
    high, hit = 0, 0
    for ids in {g // 1000 for g in words_of}:
        members = sorted(g for g in words_of if g // 1000 == ids
                         and len(words_of[g]) >= k)
        shingle_sets = {
            g: frozenset(
                " ".join(words_of[g][i:i + k])
                for i in range(len(words_of[g]) - k + 1)
            )
            for g in members
        }
        for i, a in enumerate(members):
            for b_ in members[i + 1:]:
                inter = len(shingle_sets[a] & shingle_sets[b_])
                union = len(shingle_sets[a] | shingle_sets[b_])
                if union and inter / union >= 0.9:
                    high += 1
                    hit += (a, b_) in got_cand
    assert high >= 20, f"sweep generated only {high} high-sim pairs"
    assert hit / high >= 0.8, f"LSH recall {hit}/{high} under the 0.8 floor"


ppjoin_docs_st = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(6)]),
             min_size=1, max_size=8),
    min_size=2, max_size=8,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=ppjoin_docs_st, t=st.sampled_from([0.3, 0.5, 0.6, 0.8, 0.9]))
def test_ppjoin_exact_recall_hypothesis(spark, docs, t):
    """Shrinkable companion to the sweep: hypothesis owns the corpus shape
    (duplicate docs, single-token docs, all-same-token corpora — the
    threshold-boundary and tokenization edges fixtures can't enumerate)."""
    from fractions import Fraction

    from chemharmony_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    cand = {(r.a, r.b) for r in
            prefix_filter_pairs(df, "doc_id", "text", threshold=t).collect()}
    sets = {i: frozenset(ws) for i, ws in enumerate(docs)}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if Fraction(inter, union) >= Fraction(t):
                    assert (a, b) in cand, (a, b, t, docs[a], docs[b])
