#!/usr/bin/env python3
"""Generate a key-offset scale probe dataset from a fixture sf dir.

Usage: python3 tools/make_probe.py <srcDir> <dstDir> <mult>

The north-star tables (documents, events, embeddings) are scaled by
<mult> key-offset copies with per-copy perturbation (so near-dup /
similarity operators see planted cross-copy structure, not byte-identical
rows that exact-dedup would collapse); the TPC-H-ish relational tables are
copied at 1x. Deterministic — no RNG. Driver-side tooling only (duckdb),
never part of the shipped library.
"""
import os
import shutil
import sys

import duckdb

OFF = 10_000_000  # key offset per copy; far above any fixture id

DOC_SQL = """
  SELECT doc_id + {k} * {OFF} AS doc_id,
         CASE WHEN {k} = 0 THEN text
              ELSE text || ' tag{k}x' || CAST(doc_id % 5 AS VARCHAR)
         END AS text,
         lang, source,
         CAST(len(CASE WHEN {k} = 0 THEN text
              ELSE text || ' tag{k}x' || CAST(doc_id % 5 AS VARCHAR)
              END) AS BIGINT) AS n_chars
  FROM '{src}/documents.parquet'"""

EVT_SQL = """
  SELECT event_id + {k} * {OFF} AS event_id,
         ts + INTERVAL ({k}) MINUTE AS ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet'"""

EMB_SQL = """
  SELECT vec_id + {k} * {OFF} AS vec_id,
         list_transform(embedding,
           x -> CAST(x + {k} * 0.0003 AS FLOAT)) AS embedding,
         label
  FROM '{src}/embeddings.parquet'"""


def main():
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()

    def copies(template):
        return " UNION ALL ".join(
            template.format(k=k, OFF=OFF, src=src) for k in range(mult))

    for name, template in [("documents", DOC_SQL), ("events", EVT_SQL),
                           ("embeddings", EMB_SQL)]:
        con.execute(f"COPY ({copies(template)}) TO "
                    f"'{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
