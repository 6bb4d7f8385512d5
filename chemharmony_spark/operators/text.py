"""Text-analysis operators for training-data pipelines (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting
over the ``documents`` table).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs — so at
100 TB these run at scan speed with full predicate pushdown below them.
Semantics are deliberately engine-portable (regex + md5 only) so every
operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "die", "nicht"),
    "en": ("the", "and", "of", "is"),
    "es": ("el", "los", "que", "de"),
    "fr": ("le", "les", "des", "est"),
    "zh": ("de", "shi", "le", "bu"),
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics (keep ALL whitespace), collapse
    whitespace runs to single spaces. The whitespace class is the explicit
    [ \t\n\r] (not regex \\s — Java and RE2 disagree on \\x0B, and the
    DuckDB oracles must replay this byte-for-byte): the pre-r5 version
    DELETED newlines/tabs, gluing tokens across line breaks ('a\nb' ->
    'ab') and corrupting every downstream token-based signal."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 \t\n\r]", "")
    c = F.regexp_replace(c, "[ \t\n\r]+", " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (empties removed)."""
    return F.filter(F.split(normalize_text(col), " "), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def alnum_ratio(col: Column | str) -> Column:
    """Fraction of characters that are alphanumeric-or-space — a cheap
    quality signal (high punctuation/noise ratio -> low score). NULL for
    the empty string (under Spark 4's default ANSI mode the unguarded
    division crashed the whole job on the first empty document)."""
    c = F.col(col) if isinstance(col, str) else col
    clean_len = F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    return F.when(F.length(c) > 0, clean_len / F.length(c))


# BPE-ish pre-tokenization pattern: letter runs, digit runs, single other
# marks — approximates subword pre-splitting for token-count estimation
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Estimated token count under a BPE-style pre-tokenizer (regexp_count —
    JVM-side, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    The text twin of the harmonize content-id (reference 80_harmonize.py:40):
    same canonical content -> same id, across engines and runs.
    """
    return F.md5(normalize_text(col))


def winnowing_fingerprints(df: DataFrame, text_col: str, out_col: str = "fps",
                           k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash family, MOSS-style):
    16-bit hashes of the k-char grams of the normalized text; each window of
    ``w`` consecutive gram hashes contributes its minimum; the fingerprint
    set is the distinct, sorted window minimums.

    Pure array expressions — zero shuffles, runs at scan speed. Two
    documents sharing a sufficiently long substring share fingerprints, so
    a join on exploded fingerprints finds local (substring-level) overlap
    that whole-document hashing misses.

    DataFrame-level on purpose: each stage (norm, gram hashes, window mins)
    is materialized as a column before the next lambda references it — an
    inline expression would be re-expanded per array element (no CSE across
    lambda scopes; measured catastrophic on the minhash operator).
    """
    from pyspark.sql.types import ArrayType, IntegerType

    from chemharmony_spark.operators.dedup import token_hash16

    empty = F.array().cast(ArrayType(IntegerType()))
    norm = F.col("__winnow_norm")
    n_grams = F.length(norm) - (k - 1)
    # NB: Spark sequence(1, n) with n < 1 counts DOWN — guard explicitly
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: token_hash16(norm.substr(i, F.lit(k))).cast("int"),
        ),
    ).otherwise(empty)
    hcol = F.col("__winnow_hashes")
    n_windows = F.size(hcol) - (w - 1)
    # short-document fallback (standard winnowing choice): with 1..w-1
    # gram hashes there is no full window, but an EMPTY fingerprint set
    # would make byte-identical short documents invisible to the
    # exploded-fingerprint join — take the min of what exists instead
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(hcol, j, w)),
        ),
    ).when(F.size(hcol) >= 1, F.array(F.array_min(hcol))).otherwise(empty)
    # r9: spread the scan before the per-gram rolling-hash pass (no-op
    # at scale; hints.spread_scan)
    from chemharmony_spark.hints import spread_scan

    df = spread_scan(df)
    return (
        df.withColumn("__winnow_norm", normalize_text(text_col))
        .withColumn("__winnow_hashes", hashes)
        .withColumn(out_col, F.array_sort(F.array_distinct(mins)))
        .drop("__winnow_norm", "__winnow_hashes")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token/char/ratio quality features."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_chars_obs", F.length(text_col))
        .withColumn("alnum_ratio", alnum_ratio(text_col))
        .withColumn(
            "avg_token_len",
            F.when(
                F.col("n_tokens") > 0,
                F.aggregate(
                    F.transform(tokens(text_col), F.length),
                    F.lit(0),
                    lambda a, x: a + x,
                ) / F.col("n_tokens"),
            ),
        )
    )


# PII patterns kept deliberately engine-portable (no lookarounds/backrefs —
# runs identically under Java regex and RE2-family engines)
PII_PATTERNS: dict[str, str] = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "url": "https?://[^\\s]+",
    "phone": "\\+?[0-9][0-9()\\- ]{7,}[0-9]",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted",
               patterns: Mapping[str, str] | None = None) -> DataFrame:
    """Scrub PII-shaped spans (emails, URLs, phone numbers) before training,
    and count what was removed per category (``n_<name>`` columns).

    Pure ``regexp_replace``/``regexp_count`` chains — JVM-side, zero
    shuffles, runs at scan speed; counts let the pipeline alert on documents
    that are mostly PII rather than silently shipping holes.
    """
    patterns = dict(patterns or PII_PATTERNS)
    out = df
    red: Column = F.col(text_col)
    for name, pat in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(text_col, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn(out_col, red)


def chunk_tokens(df: DataFrame, text_col: str = "text",
                 chunk_size: int = 50,
                 keep_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Split each document's token stream into fixed-budget chunks — the
    fan-out step of a context-window packing pipeline (one row per chunk:
    ``chunk_idx``, ``n_chunk_tokens``, ``chunk_hash``).

    Per-row array arithmetic + one ``posexplode`` — no shuffle at all; the
    1->n fan-out happens inside the scan stage, so at 100 TB this runs at
    read speed and downstream stages see chunk-sized rows. Documents with
    zero tokens produce zero chunks (inner explode).
    """
    toks = F.col("__ck_toks")
    n = F.size(toks)
    n_chunks = F.floor((n - 1) / chunk_size) + 1
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(toks, i * chunk_size + 1, chunk_size),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    return (
        df.withColumn("__ck_toks", tokens(text_col))
        .select(*keep_cols, F.posexplode(chunks).alias("chunk_idx", "__ck_c"))
        .select(
            *keep_cols,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__ck_c").alias("n_chunk_tokens"),
            F.md5(F.array_join("__ck_c", " ")).alias("chunk_hash"),
        )
    )


# small English stopword set for the C4-ish stopword-ratio quality signal
EN_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "in", "is", "of", "the", "to",
)


def stopword_ratio(col: Column | str,
                   stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are common-English stopwords. C4's quality
    heuristic in reverse: natural prose has a healthy stopword ratio, while
    keyword-stuffed / boilerplate text sits near zero. Pure expressions: the
    stopword set compiles into the plan as an array literal."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in sorted(stopwords)])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(toks) > 0, hits / F.size(toks))


def repetition_features(df: DataFrame, text_col: str = "text",
                        n: int = 2) -> DataFrame:
    """Gopher-style repetition metrics over token ``n``-grams (Rae et al.
    2021, "Scaling Language Models", Table A1 — public paper): documents
    dominated by a few repeated n-grams are boilerplate/spam and get
    filtered before training.

    Adds: ``n_tokens``, ``n_ngrams``, ``n_distinct_ngrams``,
    ``top_ngram_count`` (occurrences of the modal n-gram),
    ``top_ngram_frac`` (= top_ngram_count / n_ngrams — an n-gram COUNT
    fraction, this engine's convention),
    ``top_ngram_char_frac`` (= top_ngram_count * len(top n-gram) /
    normalized characters — Table A1's actual CHARACTER-fraction
    definition; use THIS column with the paper's thresholds, the count
    fraction doesn't transfer),
    ``dup_ngram_frac`` (fraction of n-gram slots that are repeats),
    ``unique_token_ratio``.

    Scale design: everything is per-row array arithmetic — zero shuffles,
    runs at scan speed inside WholeStageCodegen. The modal-n-gram count is a
    single ``aggregate`` fold over the *sorted* gram array (longest equal
    run), not an explode + groupBy: no (doc_id, gram) shuffle, no skew from
    pathological documents. Each intermediate array is materialized as a
    column before a lambda references it (no CSE across lambda scopes).
    """
    toks = F.col("__rep_toks")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = F.col("__rep_sorted")
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit("").alias("bestg"),
    )

    def _merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            # first-sorted gram wins ties (deterministic): only a strictly
            # longer run replaces the champion
            F.when(run > acc["best"], x).otherwise(acc["bestg"]).alias("bestg"),
        )

    top = F.aggregate(sg, acc0, _merge)
    top_count = top["best"]
    top_gram = top["bestg"]
    n_grams = F.size(sg)
    n_chars = F.length(F.col("__rep_norm"))
    return (
        df.withColumn("__rep_norm", normalize_text(text_col))
        .withColumn(
            "__rep_toks",
            F.filter(F.split(F.col("__rep_norm"), " "), lambda x: x != ""),
        )
        .withColumn("__rep_sorted", F.array_sort(grams))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_ngrams", n_grams)
        .withColumn("n_distinct_ngrams", F.size(F.array_distinct(sg)))
        .withColumn("top_ngram_count", top_count)
        .withColumn(
            "top_ngram_frac",
            F.when(n_grams > 0, top_count / n_grams),
        )
        .withColumn(
            "top_ngram_char_frac",
            F.when(n_chars > 0, top_count * F.length(top_gram) / n_chars),
        )
        .withColumn(
            "dup_ngram_frac",
            F.when(n_grams > 0, (n_grams - F.col("n_distinct_ngrams")) / n_grams),
        )
        .withColumn(
            "unique_token_ratio",
            F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok),
        )
        .drop("__rep_norm", "__rep_toks", "__rep_sorted")
    )


def token_entropy(col: Column | str) -> Column:
    """Shannon entropy (nats) of the document's token distribution:
    H = ln(n) - (1/n) * sum(c_i * ln(c_i)) over per-token counts c_i.
    Low entropy = repetitive/keyword-stuffed text (the information-theoretic
    cousin of the Gopher repetition filters).

    Shuffle-free AND cross-engine exact: counts are run lengths of the
    SORTED token array (one fold), and the c*ln(c) terms are folded in
    that same sorted order — a sequential left fold, the operation DuckDB's
    ordered ``list_reduce`` reproduces bit-for-bit. A groupBy-based count
    would sum doubles in partition order and lose that.
    """
    toks = F.array_sort(tokens(col))
    n = F.size(toks)
    # run lengths of the sorted array: fold to struct(prev, run, counts[])
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.array().cast("array<int>").alias("counts"),
    )

    def _merge(acc: Column, x: Column) -> Column:
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        counts = F.when(
            same | acc["prev"].isNull(), acc["counts"]
        ).otherwise(F.concat(acc["counts"], F.array(acc["run"])))
        return F.struct(x.alias("prev"), run.alias("run"), counts.alias("counts"))

    def _finish(acc: Column) -> Column:
        return F.when(
            acc["prev"].isNotNull(),
            F.concat(acc["counts"], F.array(acc["run"])),
        ).otherwise(acc["counts"])

    counts = F.aggregate(toks, acc0, _merge, _finish)
    clnc = F.aggregate(
        counts,
        F.lit(0.0),
        lambda a, c: a + c.cast("double") * F.log(c.cast("double")),
    )
    return F.when(n > 0, F.log(n.cast("double")) - clnc / n)


def langid_scores(df: DataFrame, text_col: str = "text",
                  markers: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Stopword-marker language ID: for each candidate language, count how
    many of its marker words occur as tokens; predict the argmax
    (ties -> lexicographically first language). Pure expressions: the marker
    sets are compiled into the plan as literals (broadcast-free)."""
    markers = markers or LANG_MARKERS
    toks = tokens(text_col)
    scored = df.withColumn("__toks", toks)
    score_cols = []
    for lang, words in sorted(markers.items()):
        hits = sum(
            (F.array_contains("__toks", w).cast("int") for w in words),
            start=F.lit(0),
        )
        scored = scored.withColumn(f"__score_{lang}", hits)
        score_cols.append(lang)
    # argmax via a sorted array of (negscore, lang) structs — deterministic
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"__score_{lang}")).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in score_cols
        ]
    )
    best = F.array_sort(pairs)[0]
    # abstain when NO marker of ANY language matched: the argmax would
    # otherwise confidently emit the lexicographically first language
    # ('de') for Chinese/Russian/emoji/empty docs whose characters the
    # normalization strips entirely
    out = scored.withColumn(
        "pred_lang",
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("pred_score", -best["neg"])
    return out.drop("__toks", *[f"__score_{lang}" for lang in score_cols])
