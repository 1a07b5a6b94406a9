#!/usr/bin/env python3
"""Build a scaled-up test dataset from sf0.1 for the SCALING.md ratio audit.

The driver only ships sf{0.001,0.01,0.1}; the sf0.1 -> sf1 scale-proof run
(VERDICT r13 #5) needs a 10x corpus. This constructs one at /tmp/sf1 by
REPLICATION WITH DECORRELATION, never by verbatim copy — verbatim replicas
would multiply every near-dup cluster size by the replica count and any
pairwise operator would go quadratic BY DATA CONSTRUCTION, polluting the
plan-scaling signal this audit exists to read:

  - every key column gets a per-replica stride (FKs stride together, so
    joins keep their selectivity);
  - documents: replica r > 0 suffixes every token with r's hex digit —
    vocabulary and near-dup clusters scale ~linearly (10 disjoint
    sf0.1-shaped corpora), the realistic shape of 10x more crawl;
  - part/supplier/customer names: replica tag appended, so name-blocked
    fuzzy/linkage operators see 10x DISTINCT entities, not 10 copies;
  - embeddings: the float list is rotated by r positions — same norm and
    coordinate distribution, decorrelated directions;
  - events keep their real timestamp window (10x density = 10x traffic);
  - region/nation are dimensions and do not scale.

Usage: python3 tools/make_scale.py [reps] [outdir] [srcdir]
"""
import sys
import duckdb

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({REPS})) AS r")


def emit(table, select_body):
    sql = (f"COPY (SELECT {select_body} FROM "
           f"'{SRC}/{table}.parquet' CROSS JOIN reps) "
           f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    con.execute(sql)
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

# dimensions: straight copy
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

# per-replica token suffix (hex digit of r; r=0 keeps the original text)
tok_suffix = (
    "CASE WHEN r = 0 THEN text ELSE array_to_string(list_transform("
    "list_filter(string_split(text, ' '), x -> length(x) > 0), "
    "t -> t || substr('0123456789abcdef', CAST(r AS INT) + 1, 1)), ' ') END")
emit("documents",
     f"doc_id + r * 1000000 AS doc_id, {tok_suffix} AS text, lang, source, "
     f"length({tok_suffix}) AS n_chars")

# embeddings: rotate the vector by r positions (norm-preserving decorrelation)
emit("embeddings",
     "vec_id + r * 1000000 AS vec_id, "
     "CASE WHEN r = 0 THEN embedding ELSE "
     "list_concat(embedding[(CAST(r AS INT) + 1):], "
     "embedding[:CAST(r AS INT)]) END AS embedding, label")

name_tag = lambda c: f"CASE WHEN r = 0 THEN {c} ELSE {c} || ' r' || r END"
emit("part",
     f"p_partkey + r * 1000000 AS p_partkey, {name_tag('p_name')} AS p_name, "
     "p_brand, p_type, p_size, p_retailprice")
emit("supplier",
     f"s_suppkey + r * 1000000 AS s_suppkey, {name_tag('s_name')} AS s_name, "
     "s_nationkey, s_acctbal")
emit("customer",
     f"c_custkey + r * 1000000 AS c_custkey, {name_tag('c_name')} AS c_name, "
     "c_nationkey, c_acctbal, c_mktsegment")
emit("orders",
     "o_orderkey + r * 1000000000 AS o_orderkey, "
     "o_custkey + r * 1000000 AS o_custkey, "
     "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
emit("lineitem",
     "l_orderkey + r * 1000000000 AS l_orderkey, "
     "l_partkey + r * 1000000 AS l_partkey, "
     "l_suppkey + r * 1000000 AS l_suppkey, "
     "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
     "l_returnflag, l_linestatus, l_shipdate")
emit("events",
     "event_id + r * 1000000000 AS event_id, ts, "
     "user_id + r * 1000000 AS user_id, event_type, value, props")
print("done ->", OUT)
