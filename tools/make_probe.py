#!/usr/bin/env python3
"""Generate a key-offset scale probe dataset from a fixture sf dir.

Usage: python3 tools/make_probe.py <srcDir> <dstDir> <mult> [relmult]

The north-star tables (documents, events, embeddings) are scaled by
<mult> key-offset copies with per-copy perturbation (so near-dup /
similarity operators see planted cross-copy structure, not byte-identical
rows that exact-dedup would collapse). The TPC-H-ish relational tables
are copied at 1x unless [relmult] > 1 is given, in which case customer /
supplier / part / orders / lineitem are scaled by key-offset copies with
per-copy price perturbation and per-copy minute date shifts (custkey /
suppkey / partkey / orderkey all offset together so every FK still joins
inside its copy — the dimension cardinality genuinely grows, which is
what the distributed-rank and broadcast-leg doctrines need stressed);
region / nation stay 1x (bounded dims by design). Deterministic — no RNG.
Driver-side tooling only (duckdb), never part of the shipped library.
"""
import os
import shutil
import sys

import duckdb

OFF = 10_000_000  # key offset per copy; far above any fixture id

DOC_SQL = """
  SELECT doc_id + CAST({k} AS BIGINT) * {OFF} AS doc_id,
         CASE WHEN {k} = 0 THEN text
              ELSE text || ' tag{k}x' || CAST(doc_id % 5 AS VARCHAR)
         END AS text,
         lang, source,
         CAST(len(CASE WHEN {k} = 0 THEN text
              ELSE text || ' tag{k}x' || CAST(doc_id % 5 AS VARCHAR)
              END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet'"""

EVT_SQL = """
  SELECT event_id + CAST({k} AS BIGINT) * {OFF} AS event_id,
         ts + INTERVAL ({k}) MINUTE AS ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet'"""

EMB_SQL = """
  SELECT vec_id + CAST({k} AS BIGINT) * {OFF} AS vec_id,
         list_transform(embedding,
           x -> CAST(x + {k} * 0.0003 AS FLOAT)) AS embedding,
         label
  FROM '{src}/embeddings.parquet'"""


CUST_SQL = """
  SELECT c_custkey + CAST({k} AS BIGINT) * {OFF} AS c_custkey,
         c_name || '#{k}' AS c_name, c_nationkey,
         round(c_acctbal + {k} * 0.01, 2) AS c_acctbal, c_mktsegment
  FROM '{src}/customer.parquet'"""

SUPP_SQL = """
  SELECT s_suppkey + CAST({k} AS BIGINT) * {OFF} AS s_suppkey,
         s_name || '#{k}' AS s_name, s_nationkey,
         round(s_acctbal + {k} * 0.01, 2) AS s_acctbal
  FROM '{src}/supplier.parquet'"""

PART_SQL = """
  SELECT p_partkey + CAST({k} AS BIGINT) * {OFF} AS p_partkey,
         p_name || ' v{k}' AS p_name, p_brand, p_type, p_size,
         round(p_retailprice + {k} * 0.01, 2) AS p_retailprice
  FROM '{src}/part.parquet'"""

ORD_SQL = """
  SELECT o_orderkey + CAST({k} AS BIGINT) * {OFF} AS o_orderkey,
         o_custkey + CAST({k} AS BIGINT) * {OFF} AS o_custkey,
         o_orderstatus,
         round(o_totalprice + {k} * 0.01, 2) AS o_totalprice,
         o_orderdate + INTERVAL ({k}) MINUTE AS o_orderdate,
         o_orderpriority
  FROM '{src}/orders.parquet'"""

LINE_SQL = """
  SELECT l_orderkey + CAST({k} AS BIGINT) * {OFF} AS l_orderkey,
         l_partkey + CAST({k} AS BIGINT) * {OFF} AS l_partkey,
         l_suppkey + CAST({k} AS BIGINT) * {OFF} AS l_suppkey,
         l_linenumber, l_quantity,
         round(l_extendedprice + {k} * 0.01, 2) AS l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate + INTERVAL ({k}) MINUTE AS l_shipdate
  FROM '{src}/lineitem.parquet'"""


def main():
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    relmult = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a mult-way UNION ALL parses as a mult-deep chain; the default depth
    # cap (1000) rejects the 5M-doc decade (mult=1000)
    con.execute("SET max_expression_depth TO 100000")

    def copies(template, m):
        return " UNION ALL ".join(
            template.format(k=k, OFF=OFF, src=src) for k in range(m))

    def emit(name, template, m):
        con.execute(f"COPY ({copies(template, m)}) TO "
                    f"'{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows ({m}x)", flush=True)

    for t in ["region", "nation"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    rel = [("customer", CUST_SQL), ("supplier", SUPP_SQL),
           ("part", PART_SQL), ("orders", ORD_SQL), ("lineitem", LINE_SQL)]
    if relmult > 1:
        for name, template in rel:
            emit(name, template, relmult)
    else:
        for name, _ in rel:
            shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    for name, template in [("documents", DOC_SQL), ("events", EVT_SQL),
                           ("embeddings", EMB_SQL)]:
        emit(name, template, mult)


if __name__ == "__main__":
    main()
