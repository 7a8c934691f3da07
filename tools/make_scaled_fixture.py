"""Generate an N×-replicated copy of a fixture dir (default 10×) for
scale probing. Key columns are offset per replica so cardinalities grow
with the data; documents/embeddings keep identical payloads per replica
— deliberately the exact-duplicate-heavy worst case for the dedup
family (SCALING.md documents what that probe caught).

Usage: python tools/make_scaled_fixture.py [src_sf_dir] [dst_dir] [reps]
"""

from __future__ import annotations

import sys

import duckdb

SPECS = {
    "lineitem": (
        "SELECT l_orderkey + r*10000000 AS l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM t, range({r}) s(r)"
    ),
    "orders": (
        "SELECT o_orderkey + r*10000000 AS o_orderkey, o_custkey + r*15000 AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t, range({r}) s(r)"
    ),
    "customer": (
        "SELECT c_custkey + r*15000 AS c_custkey, c_name, c_nationkey, c_acctbal, "
        "c_mktsegment FROM t, range({r}) s(r)"
    ),
    "events": (
        "SELECT event_id + r*1000000 AS event_id, ts, user_id + r*1500 AS user_id, "
        "event_type, value, props FROM t, range({r}) s(r)"
    ),
    "documents": (
        "SELECT doc_id + r*10000 AS doc_id, text, lang, source, n_chars "
        "FROM t, range({r}) s(r)"
    ),
    "embeddings": (
        "SELECT vec_id + r*10000 AS vec_id, embedding, label FROM t, range({r}) s(r)"
    ),
}
COPY_AS_IS = ["region", "nation", "supplier", "part"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1ish"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for name in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{name}.parquet')) "
            f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
    for name, sql in SPECS.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{src}/{name}.parquet')"
        )
        con.execute(
            f"COPY ({sql.format(r=reps)}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        print(name, n)


if __name__ == "__main__":
    main()
