"""Strict oracle check: EXACT value equality (zero float tolerance)
between every Spark query and its DuckDB oracle — a stronger gate than
the driver's hash (any hashing scheme passes if this does).

Usage: python tools/check_strict.py [sf_dir] [query_name ...]
(extra args restrict the check to those queries; seconds instead of
~3 min for a subset)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import minefields_kafka_streams_deduplication_spark as engine


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0  # exact; just collapses -0.0
    if hasattr(v, "isoformat"):
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = engine.get_spark("strict-check")
    con = duckdb.connect()
    for t in engine.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = engine.get_oracles()
    queries = engine.get_queries()
    subset = sys.argv[2:]
    if subset:
        unknown = [n for n in subset if n not in oracles]
        if unknown:
            sys.exit(f"not oracle queries: {unknown}")
        oracles = {n: oracles[n] for n in subset}
    n_exact = n_diff = 0
    for name in sorted(oracles):
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            ns, nd = norm_rows(sdf.columns, srows), norm_rows(dcols, drows)
            if ns == nd:
                n_exact += 1
                print(f"EXACT {name}")
            else:
                n_diff += 1
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:2]
                print(f"DIFF  {name}: {len(ns)}/{len(nd)} rows; first: {diffs}")
        except Exception as e:
            n_diff += 1
            print(f"ERR   {name}: {str(e)[:160]}")
        spark.catalog.clearCache()
    print(f"\n== {n_exact} EXACT, {n_diff} DIFF/ERR of {len(oracles)} ==")
    spark.stop()
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
