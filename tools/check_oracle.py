"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 AND its ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, exact cell equality — floats must match bit-for-bit, which is why
engine queries compute aggregates in exact decimal and cast at the end).

Usage: python tools/check_oracle.py [query_name ...] [--sf DIR] [--jobs N]

``--jobs N`` (default 4 for a full sweep, 1 when explicit names are given)
shards the inventory round-robin across N SUBPROCESSES, each with its own
SparkSession/JVM and DuckDB connection. Separate JVMs — not threads — so
the per-query ``release_caches()`` can never drop a cached frame another
in-flight query is still consuming (the registry is process-global), and
each shard's CPU share is capped via SPARK_GRAFT_CPUS. r4 verdict task 7:
this took the full-sweep wall from ~460 s to well under the 350 s gate.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # unify null representations and value rendering
        def render(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "\x00NULL"
            if isinstance(v, float):
                return repr(v)  # bit-faithful
            if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                return "[" + ",".join(render(x) for x in v) + "]"
            return str(v)
        df[c] = s.map(render)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _run_sharded(names: list[str], sf: str, jobs: int) -> int:
    """Spawn ``jobs`` child sweeps over round-robin shards and merge their
    per-query lines. Children are full processes (own JVM + CacheManager);
    CPU split via SPARK_GRAFT_CPUS so local[32] is shared, not
    oversubscribed x jobs."""
    import os
    import subprocess

    shards = [names[i::jobs] for i in range(jobs)]
    env = dict(os.environ)
    # split the HOST's budget across shards, honouring any caller-set
    # bounds instead of assuming the 32-CPU/128 GB grading box
    host_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    env["SPARK_GRAFT_CPUS"] = str(max(2, host_cpus // jobs))
    if "SPARK_DRIVER_MEMORY" not in os.environ:
        env["SPARK_DRIVER_MEMORY"] = f"{max(4, 48 // jobs)}g"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, *shard, "--sf", sf, "--jobs", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env, cwd=str(REPO),
        )
        for shard in shards if shard
    ]
    n_pass = n_fail = n_weak = 0
    for p in procs:
        out, _ = p.communicate()
        for ln in out.splitlines():
            if ln.startswith(("pass ", "FAIL ", "weak ")):
                print(ln, flush=True)
                n_pass += ln.startswith("pass ")
                n_fail += ln.startswith("FAIL ")
                n_weak += ln.startswith("weak ")
    # a crashed shard (OOM, JVM death) must not silently shrink the gate:
    # every requested query needs exactly one result line
    missing = len(names) - (n_pass + n_fail + n_weak)
    if missing:
        print(f"FAIL  <sharding>: {missing} queries produced no result "
              f"(a shard died — rerun with --jobs 1 to localize)")
        n_fail += missing
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--jobs", type=int, default=0,
                    help="0 = auto: 4 for a full sweep, 1 for named queries")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from chemharmony_spark.session import get_spark

    if args.jobs == 0:
        args.jobs = 1 if args.names else 4
    if args.jobs > 1:
        names = args.names or list(entrymod.queries())
        return _run_sharded(names, args.sf, args.jobs)

    # sf0.01 rows fit in a handful of partitions; 32 reduce tasks per
    # exchange is pure fixed overhead at this size (measured: the sweep's
    # slow entries are Spark-side stage overhead, not DuckDB — q345's
    # oracle is 0.6 s of its 8.6 s). AQE still coalesces below this.
    spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    from chemharmony_spark.cache import release_caches

    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        finally:
            # release operator-internal persists between queries so a full
            # sweep's cache residency stays bounded (ADVICE r2)
            release_caches()
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only check)")
            n_weak += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            ns, no = normalize(sdf), normalize(odf)
            hs, ho = value_hash(ns), value_hash(no)
            if hs != ho:
                diff = (ns != no)
                bad_cols = [c for c in ns.columns if diff[c].any()]
                first_bad = diff.any(axis=1).idxmax()
                problems.append(
                    f"value-hash mismatch; cols={bad_cols}; first diff row {first_bad}: "
                    f"spark={ns.iloc[first_bad].to_dict()} oracle={no.iloc[first_bad].to_dict()}"
                )
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"pass  {name} ({dt:.1f}s, {len(sdf)} rows)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
