#!/usr/bin/env python3
"""Build a scaled-up copy of a testdata sf directory by key-offset replication.

Usage:
    python scripts/make_scaled_sf.py --src /root/testdata/sf0.1 \
        --out /tmp/sheetreader_sf1/sf1 --scale 10

TPC-H-style scaling: region/nation are fixed dimensions (copied as-is);
every other table is replicated ``scale`` times with per-replica key
offsets applied consistently to primary AND foreign keys, so per-replica
join selectivity and key cardinality ratios match the source exactly —
i.e. the scaled corpus behaves like a genuinely bigger dataset, not like
one dataset read N times.

Content handling for the training-data tables:
  - documents: replica 0 keeps the original text. For replicas > 0, docs
    with doc_id % 3 == 0 keep their text verbatim (cross-replica exact
    duplicates — a corpus at scale WOULD have a real duplicate rate, and
    dedup benchmarks over an all-unique corpus measure nothing), while the
    rest get a replica tag appended (distinct content). n_chars is
    recomputed from the final text so the metadata stays truthful.
  - embeddings: replica > 0 vectors get a tiny deterministic per-replica
    rotation-free perturbation (+r*1e-3 on one coordinate picked by
    vec_id) so ANN has near-duplicate structure without exact collisions.

Keys use a fixed stride of 10^10 per replica — far above any source key,
so replicas can never collide and provenance is readable from the key.

Everything runs inside DuckDB (no Spark session needed); a 10x scale of
sf0.1 (6M-row lineitem) builds in well under a minute.
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 10_000_000_000

FIXED = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def copy(sql: str, t: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in FIXED:
        copy(f"SELECT * FROM {src(t)}", t)

    rep = f"(SELECT i FROM range({args.scale}) t(i))"

    copy(
        f"""SELECT c_custkey + i*{STRIDE} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')}, {rep}""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + i*{STRIDE} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {src('supplier')}, {rep}""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + i*{STRIDE} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')}, {rep}""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + i*{STRIDE} AS o_orderkey,
                   o_custkey + i*{STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {rep}""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + i*{STRIDE} AS l_orderkey,
                   l_partkey + i*{STRIDE} AS l_partkey,
                   l_suppkey + i*{STRIDE} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {rep}""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + i*{STRIDE} AS event_id, ts,
                   user_id + i*{STRIDE} AS user_id, event_type, value, props
            FROM {src('events')}, {rep}""",
        "events",
    )
    copy(
        f"""SELECT doc_id + i*{STRIDE} AS doc_id,
                   CASE WHEN i = 0 OR doc_id % 3 = 0 THEN text
                        ELSE text || ' r' || i::VARCHAR END AS text,
                   lang, source,
                   length(CASE WHEN i = 0 OR doc_id % 3 = 0 THEN text
                               ELSE text || ' r' || i::VARCHAR END) AS n_chars
            FROM {src('documents')}, {rep}""",
        "documents",
    )
    copy(
        f"""SELECT vec_id + i*{STRIDE} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(
                            embedding,
                            (x, j) -> CASE
                                WHEN j - 1 = vec_id % len(embedding)
                                THEN x + i * 0.001::FLOAT ELSE x END)
                   END AS embedding,
                   label
            FROM {src('embeddings')}, {rep}""",
        "embeddings",
    )
    print(f"done: {args.out} at scale {args.scale}x of {args.src}")


if __name__ == "__main__":
    main()
