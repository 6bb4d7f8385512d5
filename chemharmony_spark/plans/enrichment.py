"""LLM enrichment stages (SURVEY.md §2.11 D6/D7, §7 step 6).

The reference calls GPT-4 per property to assign categories
(91_property_categories.py:47-52 w/ ThreadPoolExecutor(8), joblib disk cache
at helper/cache_helper.py:4-6,26) and titles (92_llm_property_titles.py:54-67,
sequential with a global-uniqueness loop, pickle cache keyed by md5).

Engine re-design (Spark-first, deterministic, offline-testable):

- The cache is a **parquet key-value table** keyed by the md5 of the
  canonical property JSON — the same content-address the engine uses
  everywhere, so cache hits survive re-runs and re-harmonization.
- Cache misses are found with an **anti-join** (the reference walks the
  joblib dir); only misses go to the model client.
- The model client is **pluggable**; the default is a deterministic offline
  fake so the whole stage is testable without network. The real client slots
  in behind the same callable.
- Validation + retry semantics are preserved: category must be in the
  closed category list (reference src/resources/property_categories.txt,
  validated w/ <=3 retries at cache_helper.py:13-21,29); titles must be
  globally unique (92:54-67 — inherently sequential, stays on the driver,
  but only ever over the *miss* set).

Scale: properties number ~1e3-1e5 — driver-side batched calls are fine at
any realistic scale; the heavy side (activities) never touches this stage.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chemharmony_spark.sources.readers import read_parquet_cache_if_exists

# closed category list, mirroring the *role* of the reference's
# src/resources/property_categories.txt (values are engine-specific)
DEFAULT_CATEGORIES = (
    "acute toxicity", "carcinogenicity", "cardiotoxicity", "developmental toxicity",
    "endocrine disruption", "environmental fate", "genotoxicity", "hepatotoxicity",
    "immunotoxicity", "mutagenicity", "nephrotoxicity", "neurotoxicity",
    "pharmacokinetics", "receptor binding", "reproductive toxicity", "skin irritation",
)

CATEGORY_LINE = re.compile(
    r"category:\s*(?P<category>.+?)\s*;\s*reason:\s*(?P<reason>.+?)\s*;"
    r"\s*strength:\s*(?P<strength>\d+(\.\d+)?)",
    re.IGNORECASE,
)


@dataclass
class EnrichmentResult:
    table: DataFrame  # pid + enrichment columns
    n_cache_hits: int
    n_model_calls: int


def fake_category_client(prop_json: str) -> str:
    """Deterministic offline stand-in for the LLM: derives a category,
    reason, and strength from the md5 of the property payload. Replace with
    a real model call (same signature: prop json -> raw text)."""
    import hashlib

    h = hashlib.md5(prop_json.encode()).hexdigest()
    cat = DEFAULT_CATEGORIES[int(h[:4], 16) % len(DEFAULT_CATEGORIES)]
    strength = 1 + int(h[4:6], 16) % 10
    return f"category: {cat}; reason: derived from payload {h[:8]}; strength: {strength}"


def parse_category_response(raw: str, categories: tuple[str, ...]) -> dict | None:
    """Validate one model response line (reference cache_helper.py:13-21:
    regex parse + closed-list check). Returns None if invalid -> retry."""
    m = CATEGORY_LINE.search(raw)
    if not m:
        return None
    cat = m.group("category").strip().lower()
    if cat not in categories:
        return None
    return {
        "category": cat,
        "reason": m.group("reason").strip(),
        "strength": float(m.group("strength")),
    }


def big_properties(activities: DataFrame, min_per_class: int = 100) -> DataFrame:
    """The 'big pid' filter (reference 91_property_categories.py:18-24):
    pids with at least min_per_class activities of *each* binary class —
    two-level agg, no collect."""
    counts = activities.groupBy("pid", "binary_value").count()
    mins = counts.groupBy("pid").agg(
        F.min("count").alias("mincnt"), F.count(F.lit(1)).alias("nclasses")
    )
    return mins.where((F.col("nclasses") == 2) & (F.col("mincnt") >= min_per_class)).select("pid")


def assign_categories(
    spark: SparkSession,
    properties: DataFrame,
    cache_path: str,
    client: Callable[[str], str] = fake_category_client,
    categories: tuple[str, ...] = DEFAULT_CATEGORIES,
    max_retries: int = 3,
    max_workers: int = 8,
) -> EnrichmentResult:
    """D6: property -> (category, reason, strength), cache-first.

    properties: (pid, data). The cache table is (pid, category, reason,
    strength) parquet; misses = properties anti-join cache.

    ``client`` is THE production seam (reference 91_property_categories.py:9
    calls GPT-4 here): any ``prompt -> response-text`` callable — e.g.
    ``lambda p: openai_client.chat.completions.create(...)`` or an
    Anthropic/messages call — drops in unchanged; retries, JSON validation,
    category whitelisting, and the parquet cache all wrap it. The default
    ``fake_category_client`` keeps the pipeline deterministic offline.
    """
    # missing path = first run; real IO errors raise (never silently
    # re-bill the whole cache — see read_parquet_cache_if_exists)
    cache = read_parquet_cache_if_exists(spark, cache_path)
    have_cache = cache is not None

    props = properties.select("pid", "data").distinct()
    misses = (
        props.join(cache.select("pid"), on="pid", how="left_anti")
        if have_cache
        else props
    )
    miss_rows = misses.collect()  # property-scale: small by design

    def resolve(row):
        for _ in range(max_retries):
            parsed = parse_category_response(client(row.data), categories)
            if parsed is not None:
                return (row.pid, parsed["category"], parsed["reason"],
                        parsed["strength"])
        return None  # reference drops after 3 invalid responses

    # bounded-concurrency calls, mirroring the reference's
    # ThreadPoolExecutor(max_workers=8) (91_property_categories.py:47-52);
    # results are keyed by pid so completion order doesn't matter
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        new_rows = [r for r in ex.map(resolve, miss_rows) if r is not None]
    new_rows.sort()

    if new_rows:
        new_df = spark.createDataFrame(
            new_rows, "pid string, category string, reason string, strength double"
        )
        new_df.write.mode("append").parquet(cache_path)

    full = spark.read.parquet(cache_path) if (have_cache or new_rows) else spark.createDataFrame(
        [], "pid string, category string, reason string, strength double"
    )
    table = full.join(props.select("pid"), on="pid", how="left_semi")
    return EnrichmentResult(
        table=table,
        n_cache_hits=props.count() - len(miss_rows) if have_cache else 0,
        n_model_calls=len(miss_rows),
    )


def fake_title_client(prop_json: str, taken: set[str]) -> str:
    """Deterministic title generator with collision handling hooks."""
    import hashlib

    payload = json.loads(prop_json) if prop_json.startswith("{") else {}
    base = "-".join(str(v) for v in list(payload.values())[:2]) or "property"
    h = hashlib.md5(prop_json.encode()).hexdigest()[:6]
    return f"{base}-{h}"


def assign_titles(
    spark: SparkSession,
    properties: DataFrame,
    cache_path: str,
    client: Callable[[str, set[str]], str] = fake_title_client,
    max_retries: int = 5,
) -> EnrichmentResult:
    """D7: globally-unique titles (reference 92_llm_property_titles.py:54-67).

    Uniqueness is global state -> the miss loop is sequential on the driver
    (as in the reference), ordered by pid for determinism (92's sorted
    iteration, 91:26). Cached titles are honored first; collisions on new
    titles get a deterministic numeric suffix after max_retries.

    ``client`` is the production LLM seam (reference
    92_llm_property_titles.py:27-44 via cache_helper): a
    ``(prompt, taken_titles) -> title`` callable; swap in a real API call
    and the cache/uniqueness/retry machinery is unchanged.
    """
    cache = read_parquet_cache_if_exists(spark, cache_path)
    have_cache = cache is not None

    props = properties.select("pid", "data").distinct()
    taken: set[str] = set()
    if have_cache:
        taken = {r.title for r in cache.select("title").distinct().collect()}
        misses = props.join(cache.select("pid"), on="pid", how="left_anti")
    else:
        misses = props

    miss_rows = sorted(misses.collect(), key=lambda r: r.pid)
    new_rows = []
    for r in miss_rows:
        title = None
        for attempt in range(max_retries):
            cand = client(r.data, taken)
            if cand not in taken:
                title = cand
                break
        if title is None:  # deterministic uniquification fallback
            base = client(r.data, taken)
            i = 2
            while f"{base}-{i}" in taken:
                i += 1
            title = f"{base}-{i}"
        taken.add(title)
        new_rows.append((r.pid, title, r.data))

    if new_rows:
        spark.createDataFrame(
            new_rows, "pid string, title string, prop_json_data string"
        ).write.mode("append").parquet(cache_path)

    full = spark.read.parquet(cache_path) if (have_cache or new_rows) else spark.createDataFrame(
        [], "pid string, title string, prop_json_data string"
    )
    table = full.join(props.select("pid"), on="pid", how="left_semi")
    return EnrichmentResult(
        table=table, n_cache_hits=0 if not have_cache else props.count() - len(miss_rows),
        n_model_calls=len(miss_rows),
    )
