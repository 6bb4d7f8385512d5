"""Driver rehearsal: the closest local approximation of the grading gate.

Unlike tools/check_oracle.py (which uses the project session factory), this
creates a PLAIN SparkSession — no custom confs, no PYTHONPATH — exactly as
an external driver would, then runs entry() plus every queries()/oracle_sql()
pair and compares normalized values. Catches session-dependence bugs
(worker imports, parquet nanos handling) that the tuned session hides.

Run with: env -u PYTHONPATH python tools/rehearsal.py
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    df = df[sorted(df.columns)].copy()

    def render(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\0N"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or "ndarray" in str(type(v)):
            return "[" + ",".join(render(x) for x in v) + "]"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(render)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("rehearsal").master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import __spark_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    print("entry rows:", e.entry(spark).count())
    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    for name in qs:
        sdf = qs[name](spark, sf).toPandas()
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)}")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = _norm(sdf), _norm(odf)
        ok = len(a) == len(b) and sorted(a.columns) == sorted(b.columns) and a.equals(b)
        print(("pass " if ok else "FAIL ") + f" {name}")
        if not ok:
            fails.append(name)
    print(f"\nrehearsal: {len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
