"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and
sorted values (exact for strings/ints/bools, tolerance 0 expected
after both sides round — any nonzero diff is reported).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from japanstockdatapipeline_spark.plans import all_members, all_queries
from japanstockdatapipeline_spark.session import get_spark
from japanstockdatapipeline_spark.sources import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    out.append("NaN")
                else:
                    out.append(f"{v + 0.0:.9g}")  # -0.0 -> 0.0
            elif v is None:
                out.append("NULL")
            else:
                out.append(str(v))
        return "\x01".join(out)

    return sorted(key(r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    # queries that persist() intermediates (doc_vocab_stats and
    # friends) leave entries in the session CacheManager; identical
    # plans share one entry per sf_dir, but a harness looping over
    # MANY dirs in one session would accumulate — clear up front so
    # repeated invocations against different dirs start clean
    spark.catalog.clearCache()
    con = duck_con(sf_dir)
    failures = []
    for name, q in {**all_queries(), **all_members()}.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(q.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sn, dn = normalize(srows, scols), normalize(drows, dcols)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
            if diffs:
                problems.append(f"{len(diffs)} value diffs; first: {diffs[0]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
