"""Deterministic identity functions (SURVEY.md §1.4).

The reference's global identity model is md5 content hashing:
``pid = md5(canonical_json(data))`` (reference: 80_harmonize.py:39-40),
``sid = md5(canonical_json(data))`` (80_harmonize.py:54-55),
``aid = md5(concat(sid, pid, inchi, value))`` (80_harmonize.py:83).

We standardize on md5-of-content *everywhere*, replacing the reference's
nondeterministic per-source ids (``uuid::UUIDgenerate`` per group,
01_integrate_toxvaldb.R:12,21; ``monotonically_increasing_id``,
09_integrate_pubchem.py:30,41,58) — deterministic ids are what makes
re-runs idempotent and oracle hash-comparison possible.

All functions are pure Column expressions (JVM-side, whole-stage-codegen
friendly); no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_id(*cols: Column | str) -> Column:
    """md5 over the JSON rendering of the given columns, in the given order.

    Spark-first replacement for the R group-stable-UUID idiom
    (``group_by(keys) |> mutate(pid = UUIDgenerate())``,
    reference: 01_integrate_toxvaldb.R:12,21; 02:57) — same id for the same
    key tuple, deterministic across runs and engines.
    """
    struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.md5(F.to_json(struct))


def group_id(*key_cols: Column | str, sep: str = "\x1f") -> Column:
    """md5 over the concatenation of key columns with an unambiguous separator.

    Null-safe by EXPLICIT coalesce-to-'': ``concat_ws`` alone SKIPS null
    arguments entirely (no separator emitted — in Spark AND DuckDB), so
    ('a', NULL, 'b') and ('a', 'b', NULL) would collide to the same id,
    silently merging distinct key tuples (aid derivation uses a nullable
    inchi). Coalescing first keeps every position's separator, making
    the rendering positional-unambiguous; oracles mirror the COALESCE.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return F.md5(F.concat_ws(
        sep, *[F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    ))


def surrogate_aid(sid: Column | str = "sid", pid: Column | str = "pid",
                  inchi: Column | str = "inchi", value: Column | str = "value") -> Column:
    """Global activity id: md5(concat(sid, pid, inchi, value)).

    reference: 80_harmonize.py:83 (plain concat, null-unsafe there; we use
    concat_ws so a null inchi doesn't null the whole id).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in (sid, pid, inchi, value)]
    return F.md5(F.concat_ws("", *[c.cast("string") for c in cols]))


def row_id(order_by: list[Column | str] | None = None) -> Column:
    """A per-row id.

    With ``order_by``: deterministic ``row_number`` (single-partition window —
    only for small dims; reference's R idiom ``paste0(source,'-',row_number())``,
    01_integrate_toxvaldb.R:42). Without: ``monotonically_increasing_id``
    (distributed, non-reproducible — reference: 09_integrate_pubchem.py:30).
    Prefer :func:`content_id` wherever content is available.
    """
    if order_by is None:
        return F.monotonically_increasing_id()
    from pyspark.sql.window import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return F.row_number().over(Window.orderBy(*cols))
