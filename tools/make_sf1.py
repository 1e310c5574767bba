#!/usr/bin/env python3
"""Generate soak/sf1 = 10x key-offset replication of testdata sf0.1.

The honest "same structure, 10x corpus" shape (SCALING.md sf1 soak):
  - tpch fact/dim keys offset per replica (custkey/suppkey/partkey
    +r*1e7, orderkey +r*1e8); region/nation stay single-copy dims.
  - events: event_id +r*1e8, user_id +r*1e7; ts copied verbatim
    (whatever physical encoding the generation uses - the library's
    Tables.events reader is schema-adaptive).
  - documents: doc_id +r*1e7 and a per-replica token spliced every 7
    words, so no 8-gram (shingle/decontam gram width) crosses
    replicas - dup FRACTION is preserved, dup COUNT scales linearly.
  - embeddings: vec_id +r*1e7 and a per-replica SIGNED PERMUTATION of
    the dimensions - an orthogonal map, so within-replica norms,
    cosines, dup clusters and label structure are preserved EXACTLY
    while cross-replica cosines collapse to ~0 (<< the 0.45 d5
    threshold). Replicating vectors verbatim would make every vector
    a 10-way cross-replica dup: a data artifact that reads as
    super-linear pair growth and invalidates the scaling gate.

Usage: make_sf1.py [src_dir] [out_dir] [replicas] [doc_mode]

doc_mode (default `splice`) picks the document-replication recipe:
  - splice: the sf1 recipe above (per-replica token every 7 words).
    Defeats >=8-gram sharing, but word-3-GRAM shingles between splice
    points ARE shared across replicas (5 of 8 per window -> minhash
    sim ~0.45 -> LSH collision prob ~0.15 per cross-replica pair) and
    cross-replica edit similarity stays ~0.86 >= d14's 0.8. At R=10
    that is a documented ~2x candidate-density artifact; at R=30/100
    the cross-replica pair count grows ~R^2 and would fail any linear
    scaling gate REGARDLESS of plan quality — a data artifact, not a
    plan property (the embeddings lesson at the text tier).
  - wordtag: replica r>0 appends a 4-hex-char per-replica tag to
    EVERY word (replica 0 verbatim). Within-replica word identity,
    shingle structure, frequency profile and near-dup clusters are
    preserved exactly (isomorphic under w -> w+tag); across replicas
    NO word — hence no shingle of any width — is shared, and edit
    distance between corresponding docs is >= n_words*~3.75 chars
    (~0.37 of length >> the 0.2 near-dup band). Dup FRACTION is
    preserved instead of manufacturing R-way cross-replica near-dup
    cliques. Use for the sf3/sf10 scaling probes.
"""
import hashlib
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/soak/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
DOC_MODE = sys.argv[4] if len(sys.argv) > 4 else "splice"
assert DOC_MODE in ("splice", "wordtag"), DOC_MODE
K7, K8 = 10_000_000, 100_000_000

con = duckdb.connect()


def gen(table, select_tmpl, copy_only=False):
    src = f"'{SRC}/{table}.parquet'"
    if copy_only:
        q = f"SELECT * FROM {src}"
    else:
        q = " UNION ALL ".join(
            select_tmpl.format(src=src, off7=r * K7, off8=r * K8, r=r)
            for r in range(R))
    con.execute(
        f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

gen("region", None, copy_only=True)
gen("nation", None, copy_only=True)
gen("customer", "SELECT c_custkey + {off7} AS c_custkey, c_name, "
    "c_nationkey, c_acctbal, c_mktsegment FROM {src}")
gen("supplier", "SELECT s_suppkey + {off7} AS s_suppkey, s_name, "
    "s_nationkey, s_acctbal FROM {src}")
gen("part", "SELECT p_partkey + {off7} AS p_partkey, p_name, p_brand, "
    "p_type, p_size, p_retailprice FROM {src}")
gen("orders", "SELECT o_orderkey + {off8} AS o_orderkey, "
    "o_custkey + {off7} AS o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM {src}")
gen("lineitem", "SELECT l_orderkey + {off8} AS l_orderkey, "
    "l_partkey + {off7} AS l_partkey, l_suppkey + {off7} AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate FROM {src}")
gen("events", "SELECT event_id + {off8} AS event_id, ts, "
    "user_id + {off7} AS user_id, event_type, value, props FROM {src}")
# n_chars is RECOMPUTED from the rewritten text — copying the source
# value would silently break the n_chars = len(text) invariant that
# t1/t2's mean-word-length features rely on.
if DOC_MODE == "splice":
    # every 7 words, splice a replica token: no 8-gram crosses replicas
    gen("documents", "SELECT doc_id + {off7} AS doc_id, spliced AS text, "
        "lang, source, length(spliced) AS n_chars FROM ("
        "SELECT *, regexp_replace(text, '(([^ ]+ ){{7}})', '\\1zq{r}x ', 'g') "
        "AS spliced FROM {src})")
else:
    # wordtag: replica 0 verbatim; r>0 suffixes every word with a
    # per-replica 4-hex tag — no word (so no n-gram of ANY width)
    # crosses replicas, within-replica structure isomorphic.
    def tag(r):
        return hashlib.md5(f"graft-rep-{r}".encode()).hexdigest()[:4]
    parts = []
    for r in range(R):
        src = f"'{SRC}/documents.parquet'"
        if r == 0:
            parts.append(f"SELECT doc_id, text, lang, source, n_chars FROM {src}")
        else:
            parts.append(
                f"SELECT doc_id + {r * K7} AS doc_id, tagged AS text, lang, "
                f"source, length(tagged) AS n_chars FROM (SELECT *, "
                f"regexp_replace(text, '([^ ]+)', '\\1{tag(r)}', 'g') AS tagged "
                f"FROM {src})")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows (wordtag)")

# embeddings: replica r>0 gets a seeded signed permutation of dims
tbl = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
ids = tbl.column("vec_id").to_numpy()
labels = tbl.column("label").to_numpy()
dim = vecs.shape[1]
parts = []
for r in range(R):
    rng = np.random.RandomState(1234 + r)
    if r == 0:
        v = vecs
    else:
        perm = rng.permutation(dim)
        sign = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        v = vecs[:, perm] * sign
    parts.append(pa.table({
        "vec_id": pa.array(ids + r * K7, pa.int64()),
        "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
pq.write_table(pa.concat_tables(parts), f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(ids) * R} rows (signed-permutation replicas)")
