"""Deterministically inflate the driver testdata to a larger scale factor.

/root/testdata is read-only and caps at sf0.1; the full-suite scale sweep
(BENCH/local_r05_sf1.json) needs ~10x inputs. K offset-keyed copies of each
sf0.1 table preserve schema, per-copy referential integrity, and per-copy
defect structure (planted near-dups, outliers), while avoiding artificial
CROSS-copy duplicate blowups:

- fact/dim keys get `copy * KEY_OFFSET` added on every side of each FK, so
  joins stay 1:1 with the base data within each copy;
- document text gets EVERY word tagged with the copy index (`w` → `w~c`
  for copy c>0): within-copy near-dup pairs keep their exact shingle
  Jaccard (both members transform identically, word-for-word), while
  cross-copy shingle overlap is ZERO — an appended salt token is not
  enough, because MinHash/SimHash/ngram-Jaccard are by design insensitive
  to single-token edits, so salted copies would form K-cliques and pair
  counts would blow up quadratically in K (measured: the sf1 sweep stalled
  on simhash verify). n_chars is recomputed to stay consistent;
- embeddings are cyclically rotated by `copy` positions (norm-preserving,
  rotations of web-scale random vectors are near-orthogonal, so no
  cross-copy near-dup clusters — identical copies would add K^2 pairs per
  base vector, a shape the real corpus doesn't have).

Usage: python tools/gen_scaled.py [K] [SRC_DIR] [DST_DIR]
Defaults: 10 /root/testdata/sf0.1 .scratch/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

KEY_OFFSET = 100_000_000


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS c FROM range({k})")

    def write(table: str, select: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    # dims: copied as-is (queries treat them as broadcast-sized lookups)
    write("region", f"SELECT * FROM {t('region')}")
    write("nation", f"SELECT * FROM {t('nation')}")

    off = f"c * {KEY_OFFSET}"
    write("customer", f"""
        SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {t('customer')}, copies""")
    write("supplier", f"""
        SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {t('supplier')}, copies""")
    write("part", f"""
        SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {t('part')}, copies""")
    write("orders", f"""
        SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, copies""")
    write("lineitem", f"""
        SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey,
               l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM {t('lineitem')}, copies""")
    write("events", f"""
        SELECT event_id + {off} AS event_id, ts, user_id + {off} AS user_id,
               event_type, value, props
        FROM {t('events')}, copies""")
    write("documents", f"""
        SELECT doc_id + {off} AS doc_id,
               CASE WHEN c = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1~' || c, 'g')
               END AS text,
               lang, source,
               length(CASE WHEN c = 0 THEN text
                           ELSE regexp_replace(text, '(\\S+)', '\\1~' || c, 'g')
                      END) AS n_chars
        FROM {t('documents')}, copies""")
    # rotate by c: list slicing is 1-based and norm-preserving
    write("embeddings", f"""
        SELECT vec_id + {off} AS vec_id,
               (embedding[(c % len(embedding)) + 1:] || embedding[:(c % len(embedding))])::FLOAT[] AS embedding,
               label
        FROM {t('embeddings')}, copies""")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
