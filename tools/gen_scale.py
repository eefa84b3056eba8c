#!/usr/bin/env python
"""Generate an R-times scale-up of a testdata directory for upward
scale benchmarking (BENCH.md "upward scale datapoint").

Usage: python tools/gen_scale.py [SRC] [DST] [R]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)

Scaling rules keep workload SHAPE constant while content scales:
  * fact-table ids offset per replica (keys stay unique, join fan
    constant); dims (region/nation/supplier/part) unchanged
  * document tokens suffixed per replica -> shingle spaces are
    DISJOINT across replicas, so the duplicate RATE stays constant
    (naive replication would multiply pair mass quadratically)
  * embedding labels namespaced per replica -> block COUNT scales,
    block size doesn't (the blocked-pair contract)
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)
con = duckdb.connect()


def src(t: str) -> str:
    return f"read_parquet('{SRC}/{t}.parquet')"


for t in ["region", "nation", "supplier", "part"]:
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

maxc, = con.sql(f"SELECT max(c_custkey)+1 FROM {src('customer')}").fetchone()
maxo, = con.sql(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()
con.execute(f"""COPY (
  SELECT c_custkey + i*{maxc} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')}, range({R}) r(i)) TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
con.execute(f"""COPY (
  SELECT o_orderkey + i*{maxo} AS o_orderkey, o_custkey + i*{maxc} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, range({R}) r(i)) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
li_cols = ", ".join(
    d[0] for d in con.sql(f"DESCRIBE SELECT * FROM {src('lineitem')}").fetchall()
    if d[0] != "l_orderkey"
)
con.execute(f"""COPY (
  SELECT l_orderkey + i*{maxo} AS l_orderkey, {li_cols}
  FROM {src('lineitem')}, range({R}) r(i)) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

maxe, = con.sql(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()
maxu, = con.sql(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()
con.execute(f"""COPY (
  SELECT event_id + i*{maxe} AS event_id, ts, user_id + i*{maxu} AS user_id,
         event_type, value, props
  FROM {src('events')}, range({R}) r(i)) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

maxd, = con.sql(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()
con.execute(f"""COPY (
  SELECT doc_id + i*{maxd} AS doc_id,
         array_to_string(list_transform(string_split(text, ' '), x -> x || '_' || i), ' ') AS text,
         lang, source, n_chars
  FROM {src('documents')}, range({R}) r(i)) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

maxv, = con.sql(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()
con.execute(f"""COPY (
  SELECT vec_id + i*{maxv} AS vec_id, embedding, label || '_' || i AS label
  FROM {src('embeddings')}, range({R}) r(i)) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
    n, = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()
    print(t, n)
