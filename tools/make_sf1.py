"""Derive an sf1 dataset from the driver-provided sf0.1 parquet (VERDICT r3
item 7: run the full queries() + oracle suite at sf1, not just the KG
pipeline).

The driver generates sf{0.001,0.01,0.1}; nothing larger exists on disk, so
sf1 is DERIVED deterministically from sf0.1 — never synthesized from
scratch — by 10x key-shifted replication with the same per-copy
perturbation discipline as tools/bench_scale_dedup.py:

- region/nation: fixed dimensions, copied as-is (sf-invariant in TPC-H).
- customer/supplier/part/orders/lineitem: 10 copies with all keys shifted
  by copy * 10_000_000 — foreign keys shift in lockstep, so join
  cardinalities scale exactly 10x and every FK remains valid.
- events: 10 copies with event_id/user_id shifted (distinct users scale
  10x; per-user session structure identical per copy).
- documents: copy 0 verbatim; copies 1..9 append a per-copy marker word
  (near-duplicates, the structure the dedup family exists for); n_chars
  recomputed to stay consistent with the text.
- embeddings: copy 0 verbatim; copies 1..9 get the deterministic
  sinusoidal nudge (cosine ~0.999 vs the original).

Everything is DuckDB SQL — deterministic, single-pass, no Spark session —
writing /tmp/sf1/<table>.parquet.  Usage:

    python tools/make_sf1.py [out_dir]

then:

    SPARK_GRAFT_CPUS=32 python tools/check_oracles.py /tmp/sf1 [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10
SHIFT = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({K})) AS copy")

    def emit(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit("customer", f"""
        SELECT c_custkey + copy * {SHIFT} AS c_custkey,
               c_name || '#' || copy AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', copies""")
    emit("supplier", f"""
        SELECT s_suppkey + copy * {SHIFT} AS s_suppkey,
               s_name || '#' || copy AS s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', copies""")
    emit("part", f"""
        SELECT p_partkey + copy * {SHIFT} AS p_partkey,
               p_name || '#' || copy AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', copies""")
    emit("orders", f"""
        SELECT o_orderkey + copy * {SHIFT} AS o_orderkey,
               o_custkey + copy * {SHIFT} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', copies""")
    emit("lineitem", f"""
        SELECT l_orderkey + copy * {SHIFT} AS l_orderkey,
               l_partkey + copy * {SHIFT} AS l_partkey,
               l_suppkey + copy * {SHIFT} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', copies""")
    emit("events", f"""
        SELECT event_id + copy * {SHIFT} AS event_id, ts,
               user_id + copy * {SHIFT} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', copies""")
    emit("documents", f"""
        SELECT doc_id + copy * {SHIFT} AS doc_id,
               CASE WHEN copy = 0 THEN text
                    ELSE text || ' cpy' || copy END AS text,
               lang, source,
               length(CASE WHEN copy = 0 THEN text
                           ELSE text || ' cpy' || copy END)::bigint AS n_chars
        FROM '{SRC}/documents.parquet', copies""")
    emit("embeddings", f"""
        SELECT vec_id + copy * {SHIFT} AS vec_id,
               CASE WHEN copy = 0 THEN embedding
                    ELSE list_transform(
                      list_zip(embedding, range(1, 1 + len(embedding))),
                      p -> (p[1] + 0.02 * sin((vec_id + copy * {SHIFT}) * p[2]
                                              + copy))::float)
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', copies""")
    print("wrote", out)


if __name__ == "__main__":
    main()
