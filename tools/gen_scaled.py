"""Deterministically inflate the driver testdata to a larger scale factor.

/root/testdata is read-only and caps at sf0.1; the full-suite scale sweep
(BENCH/local_r05_sf1.json) needs ~10x inputs. K offset-keyed copies of each
sf0.1 table preserve schema, per-copy referential integrity, and per-copy
defect structure (planted near-dups, outliers), while avoiding artificial
CROSS-copy duplicate blowups:

- fact/dim keys get `copy * KEY_OFFSET` added on every side of each FK, so
  joins stay 1:1 with the base data within each copy;
- document text gets every NON-STOPWORD word tagged with the copy index
  (`w` → `w~c` for copy c>0): within-copy near-dup pairs keep their exact
  shingle Jaccard (both members transform identically, word-for-word),
  while cross-copy shingle overlap shrinks to stopword-only n-grams —
  hot shingles the dedup operators' document-frequency caps exclude from
  candidate generation anyway. An appended salt token is not enough
  (MinHash/SimHash/ngram-Jaccard are by design insensitive to
  single-token edits, so salted copies form K-cliques and pair counts
  blow up quadratically in K — measured: the first sf1 sweep stalled on
  simhash verify), and tagging ALL words breaks the Gopher stopword rule,
  collapsing quality-filter pass rates from ~62% to ~0.6% (measured on
  the curate bench). Gopher's own stopword list is kept verbatim so pass
  rates carry over. n_chars is recomputed to stay consistent;
- embeddings are cyclically rotated by `copy` positions (norm-preserving,
  rotations of web-scale random vectors are near-orthogonal, so no
  cross-copy near-dup clusters — identical copies would add K^2 pairs per
  base vector, a shape the real corpus doesn't have).

Usage: python tools/gen_scaled.py [K] [SRC_DIR] [DST_DIR] [TABLES]
Defaults: 10 /root/testdata/sf0.1 .scratch/sf1 <all>
TABLES: comma-separated subset (e.g. "documents" for the curate bench).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultragendataset_datachecker_spark.ops.quality import GOPHER_STOPWORDS  # noqa: E402

KEY_OFFSET = 100_000_000


def tagged_text_sql(col: str = "text") -> str:
    """Per-word copy tag that leaves Gopher stopwords untouched."""
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
        CASE WHEN c = 0 THEN {col}
             ELSE array_to_string(
                    list_transform(string_split({col}, ' '),
                      w -> CASE WHEN w IN ({stops}) THEN w
                                ELSE w || '~' || c END),
                    ' ')
        END"""


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    )
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS c FROM range({k})")

    def write(table: str, select: str) -> None:
        if only is not None and table not in only:
            return
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
    tt = tagged_text_sql()
    write("documents", f"""
        SELECT doc_id + {off} AS doc_id,
               {tt} AS text,
               lang, source,
               length({tt}) AS n_chars
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
