"""Self-check harness: replicate the driver's correctness gate locally.

Runs every queries() entry at the given SF and compares against its
oracle_sql() via DuckDB: row count, column names, and order-insensitive
value comparison. Queries without an oracle get a rows-only check.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import minefields_kafka_streams_deduplication_spark as engine

TABLES = engine.TABLES


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and representation jitter beyond ~12 sig digits
        return float(f"{v:.12g}")
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_value(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    spark = engine.get_spark("self-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = engine.get_queries()
    oracles = engine.get_oracles()
    results = {}
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            results[name] = ("SPARK-ERROR", traceback.format_exc(limit=8))
            print(f"FAIL  {name}: SPARK-ERROR\n{results[name][1]}")
            continue
        if name not in oracles:
            results[name] = ("ROWS-ONLY", f"{len(srows)} rows")
            print(f"ok    {name}: rows-only, {len(srows)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception:
            results[name] = ("ORACLE-ERROR", traceback.format_exc(limit=4))
            print(f"FAIL  {name}: ORACLE-ERROR\n{results[name][1]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"values differ; first diffs (spark,duckdb): {diff}")
        if problems:
            results[name] = ("MISMATCH", "; ".join(problems))
            print(f"FAIL  {name}: {results[name][1][:500]}")
        else:
            results[name] = ("PASS", f"{len(srows)} rows")
            print(f"PASS  {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")

    n_pass = sum(1 for s, _ in results.values() if s == "PASS")
    n_ro = sum(1 for s, _ in results.values() if s == "ROWS-ONLY")
    n_fail = len(results) - n_pass - n_ro
    print(f"\n== {n_pass} PASS, {n_ro} rows-only, {n_fail} FAIL, of {len(results)} ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
