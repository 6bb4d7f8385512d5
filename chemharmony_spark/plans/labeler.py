"""D8: magentic-style property labeler (SURVEY.md §2.11 D8).

The reference (helper/magentic_label.py:11-48, experimental — not wired into
dvc.yaml) generates a human-readable label + long description per property
and enforces *similarity* uniqueness: a new label must be Levenshtein
distance >= 3 from every previously assigned label (:11-12); collisions are
re-prompted with the similar labels in context (:33-40) until clean (:42-48).
The reference loop is fully sequential and rescans the whole label list per
proposal (O(n^2) driver work, one model call at a time).

Engine re-design (Spark-first, deterministic, offline-testable):

1. **Cache-first**: (pid, label, description) parquet keyed by pid; misses
   found by anti-join (same contract as D6/D7, plans/enrichment.py).
2. **Batch propose**: labels/descriptions for all misses generated with
   bounded concurrency — the reference's one-at-a-time loop is only needed
   for *conflicts*, not the (overwhelmingly common) clean case.
3. **Conflict detection in Spark**: one `F.levenshtein(a, b) < 3` self-join
   over (existing ∪ proposed) labels, pre-blocked on length bands
   (|len(a) - len(b)| >= 3 ⇒ distance >= 3, so only near-length pairs are
   compared) — at 1e5 labels this is a few million cheap JVM comparisons
   instead of 1e10.
4. **Sequential differentiation only over conflicts**, in deterministic pid
   order (first writer keeps the label, later ones re-prompt), with a
   banded driver-side Levenshtein for the recheck and a deterministic
   suffix fallback after ``max_rounds`` — mirroring D7's collision policy.

``label_client`` / ``differentiate_client`` / ``description_client`` are the
production LLM seams (the reference uses magentic @prompt wrappers around
GPT-4); the defaults are deterministic offline fakes with the same
signatures.

Scale: labels live on properties (~1e3-1e5 — dimension-sized by the star
schema); the fact side never touches this stage. The Spark self-join is the
only step that grows, and it is band-blocked.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chemharmony_spark.sources.readers import read_parquet_cache_if_exists

MIN_DISTANCE = 3  # reference helper/magentic_label.py:12


def levenshtein_lt(a: str, b: str, cap: int = MIN_DISTANCE) -> bool:
    """True iff edit distance(a, b) < cap. Banded DP: O(cap * min(len))
    time — the driver-side recheck used inside the differentiation loop
    (labels are short; the bulk pass stays in Spark's F.levenshtein)."""
    if abs(len(a) - len(b)) >= cap:
        return False
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j] + [0] * len(a)
        best = j
        for i, ca in enumerate(a, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
            best = min(best, cur[i])
        if best >= cap:
            return False
        prev = cur
    return prev[len(a)] < cap


@dataclass
class LabelResult:
    table: DataFrame  # pid, label, description
    n_cache_hits: int
    n_model_calls: int
    n_differentiation_calls: int


def _payload_words(prop_json: str) -> str:
    payload = json.loads(prop_json) if prop_json.startswith("{") else {}
    return " ".join(str(v) for v in list(payload.values())[:3]) or "property"


def fake_label_client(prop_json: str) -> str:
    """Deterministic offline stand-in for the invent-label prompt
    (reference :29-31): concise, lowercased, <200 chars."""
    h = hashlib.md5(prop_json.encode()).hexdigest()[:6]
    return f"{_payload_words(prop_json)} {h}".lower()[:200]


def fake_description_client(prop_json: str) -> str:
    """Stand-in for the invent-description prompt (reference :14-20)."""
    h = hashlib.md5(prop_json.encode()).hexdigest()[:8]
    return f"measures {_payload_words(prop_json).lower()} (assay {h})"


def fake_differentiate_client(prop_json: str, proposed: str,
                              similar: list[str]) -> str:
    """Stand-in for the differentiation chat-prompt (reference :33-40):
    extends the proposal with payload-derived hash material so repeated
    rounds keep diverging deterministically."""
    h = hashlib.md5(f"{proposed}|{'|'.join(sorted(similar))}".encode())
    return f"{proposed} {h.hexdigest()[:4]}".lower()[:200]


def magentic_labels(
    spark: SparkSession,
    properties: DataFrame,
    cache_path: str,
    label_client: Callable[[str], str] = fake_label_client,
    description_client: Callable[[str], str] = fake_description_client,
    differentiate_client: Callable[[str, str, list[str]], str] = fake_differentiate_client,
    max_rounds: int = 5,
    max_workers: int = 8,
) -> LabelResult:
    """Assign a similarity-unique label + description per property.

    properties: (pid, data) with data = canonical property JSON.
    Every label in the returned table (and the cache) is pairwise
    Levenshtein >= MIN_DISTANCE from every other — the reference's global
    invariant (:42-48), here also enforced against the cache across runs.
    """
    # missing path = first run; real IO errors raise (never silently
    # re-bill the labeling corpus — see read_parquet_cache_if_exists)
    cache = read_parquet_cache_if_exists(spark, cache_path)
    have_cache = cache is not None

    props = properties.select("pid", "data").distinct()
    if have_cache:
        misses = props.join(cache.select("pid"), on="pid", how="left_anti")
        existing = [r.label for r in cache.select("label").collect()]
    else:
        misses = props
        existing = []

    miss_rows = sorted(misses.collect(), key=lambda r: r.pid)  # property-scale

    # -- batch propose (concurrency-bounded; order restored by keying) -----
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        proposed = list(ex.map(
            lambda r: (r.pid, label_client(r.data).lower(),
                       description_client(r.data), r.data),
            miss_rows,
        ))
    n_calls = 2 * len(proposed)

    # -- bulk conflict detection in Spark ---------------------------------
    # Frame of every label with a total order: existing cache labels first
    # (order -1: immutable), then proposals in pid order. A pair conflicts
    # when distance < MIN_DISTANCE and the left side comes later (later
    # writer re-proposes; first writer keeps — the reference's list-append
    # semantics). Length banding makes the join near-linear.
    rows = [("", lbl, -1) for lbl in existing] + [
        (pid, lbl, i) for i, (pid, lbl, _d, _j) in enumerate(proposed)
    ]
    conflicted: set[str] = set()
    if rows:
        lbls = spark.createDataFrame(rows, "pid string, label string, ord int")
        # |len(a)-len(b)| < d is a theta predicate; make it an EQUI-join by
        # exploding the earlier side across its ±(d-1) length neighborhood —
        # a 2d-1× replication of a short-string dimension, hash-joinable.
        a = lbls.select("pid", "label", "ord", F.length("label").alias("len"))
        b = lbls.select(
            F.col("label").alias("b_label"),
            F.col("ord").alias("b_ord"),
            F.explode(
                F.sequence(
                    F.length("label") - (MIN_DISTANCE - 1),
                    F.length("label") + (MIN_DISTANCE - 1),
                )
            ).alias("len"),
        )
        near = (
            a.join(b, on="len")
            .where(
                (F.col("ord") > F.col("b_ord"))
                & (F.levenshtein("label", "b_label") < MIN_DISTANCE)
            )
            .select("pid")
            .distinct()
        )
        conflicted = {r.pid for r in near.collect()}

    # -- sequential differentiation over conflicts only --------------------
    # In-memory length-band index so each recheck touches near-length labels
    # only (the reference rescans the full list per proposal, :11-12).
    by_band: dict[int, list[str]] = {}

    def similar_to(lbl: str) -> list[str]:
        band0 = len(lbl)
        out = []
        for L in range(band0 - MIN_DISTANCE + 1, band0 + MIN_DISTANCE):
            for other in by_band.get(L, ()):
                if levenshtein_lt(lbl, other):
                    out.append(other)
        return out

    def admit(lbl: str) -> None:
        by_band.setdefault(len(lbl), []).append(lbl)

    for lbl in existing:
        admit(lbl)

    new_rows = []
    n_diff = 0
    for pid, lbl, desc, data in proposed:
        if pid in conflicted or similar_to(lbl):
            sims = similar_to(lbl)
            rounds = 0
            while sims and rounds < max_rounds:
                lbl = differentiate_client(data, lbl, sims).lower()[:200]
                n_diff += 1
                sims = similar_to(lbl)
                rounds += 1
            if sims:  # deterministic fallback, mirrors D7's suffix policy
                i = 2
                while similar_to(f"{lbl} ~{i}"):
                    i += 1
                lbl = f"{lbl} ~{i}"
        admit(lbl)
        new_rows.append((pid, lbl, desc))

    if new_rows:
        spark.createDataFrame(
            new_rows, "pid string, label string, description string"
        ).write.mode("append").parquet(cache_path)

    full = (
        spark.read.parquet(cache_path)
        if (have_cache or new_rows)
        else spark.createDataFrame([], "pid string, label string, description string")
    )
    table = full.join(props.select("pid"), on="pid", how="left_semi")
    return LabelResult(
        table=table,
        n_cache_hits=props.count() - len(miss_rows) if have_cache else 0,
        n_model_calls=n_calls,
        n_differentiation_calls=n_diff,
    )
