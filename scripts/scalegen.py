#!/usr/bin/env python3
"""Synthesize a scaled test-data slice from an existing sf dir (round-6
verdict item 2: prove near-linear growth beyond sf0.1 locally).

Replicates the fact tables R times with key shifts chosen so per-key
densities are PRESERVED, not multiplied — the properties that drive each
expensive query's complexity stay representative:

  - events:    user_id shifted per replica -> per-user event density (q81
               stream-join state, q165 funnel walks) unchanged.
  - documents: doc_id shifted AND every word deterministically re-hashed
               with a per-replica salt -> within-replica duplicate/near-dup
               structure identical to the base corpus, while cross-replica
               Jaccard collapses to ~0 (otherwise q128 would see every doc
               with R-1 exact twins -- a duplicate density the real corpus
               does not have). n_chars recomputed to stay consistent.
  - embeddings: vec_id shifted, vector dimensions circularly rotated per
               replica -> norms/distribution preserved, replicas land in
               different IVF cells instead of stacking into the same ones.
  - customer/orders/lineitem: key shifts keep join fan-outs per key fixed.
  - region/nation/supplier/part: dimensions, copied as-is.

Usage: scalegen.py <srcSfDir> <dstDir> <replicas>
"""
import sys
import duckdb

src, dst, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute(f"SET threads TO 16")

import os
os.makedirs(dst, exist_ok=True)

def copy(table):
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
                f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")

def gen(table, select_k):
    parts = " UNION ALL ".join(select_k(k) for k in range(R))
    con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")

for t in ["region", "nation", "supplier", "part"]:
    copy(t)

gen("customer", lambda k: f"""
  SELECT c_custkey + {k}::BIGINT*10000000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM read_parquet('{src}/customer.parquet')""")

gen("orders", lambda k: f"""
  SELECT o_orderkey + {k}::BIGINT*100000000 AS o_orderkey,
         o_custkey + {k}::BIGINT*10000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet')""")

gen("lineitem", lambda k: f"""
  SELECT l_orderkey + {k}::BIGINT*100000000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet')""")

# ts must stay parquet TIMESTAMP(NANOS): graft.core.Tables.events reads the
# column as raw nanos through spark.sql.legacy.parquet.nanosAsLong. DuckDB's
# COPY writes micros even from TIMESTAMP_NS, so events goes through pyarrow
# (coerce_timestamps off + format 2.6 keeps ns).
def gen_events():
    import pyarrow as pa
    import pyarrow.parquet as pq
    parts = " UNION ALL ".join(f"""
      SELECT event_id + {k}::BIGINT*1000000000 AS event_id, ts,
             user_id + {k}::BIGINT*10000000 AS user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet')""" for k in range(R))
    tbl = con.execute(parts).fetch_arrow_table()
    ts_ns = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    pq.write_table(tbl, f"{dst}/events.parquet", version="2.6")

gen_events()

def doc_text(k):
    if k == 0:
        return "text"
    return ("array_to_string(list_transform(string_split_regex(trim(text), '\\s+'), "
            f"w -> substr(md5(w || '#r{k}'), 1, 8)), ' ')")

gen("documents", lambda k: f"""
  SELECT doc_id + {k}::BIGINT*10000000 AS doc_id, {doc_text(k)} AS text, lang, source,
         CAST(length({doc_text(k)}) AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet')""")

def emb_rot(k):
    r = k % 64  # rotation modulo the embedding dim (64): k >= dim would
    if r == 0:  # slice to an empty head and corrupt the vector length
        return "embedding"
    return (f"list_concat(embedding[{r+1}:], embedding[1:{r}])::FLOAT[]")

gen("embeddings", lambda k: f"""
  SELECT vec_id + {k}::BIGINT*10000000 AS vec_id, {emb_rot(k)} AS embedding, label
  FROM read_parquet('{src}/embeddings.parquet')""")

for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print("done")
