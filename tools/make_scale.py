#!/usr/bin/env python3
"""Derive an N-times-larger perf-soak dataset from a driver fixture dir.

Usage: python3 tools/make_scale.py SRC_DIR OUT_DIR COPIES [--skew-events PCT]

--skew-events PCT additionally reassigns PCT% of event rows (chosen by
a deterministic event_id hash, across all copies) to ONE hot user_id —
the adversarial key distribution for every user-keyed shuffle
(sessionization windows, interval joins, per-user aggregates). Used
for the SCALE.md skew-resilience measurements; referential integrity
is unaffected (events has no FK into the TPC-H tables).

Replicates every fact table COPIES times with per-copy key offsets so
referential integrity holds within each copy (customer<-orders<-lineitem,
part/supplier<-lineitem, documents<->embeddings). Dimension tables
(region, nation) stay single-copy, as a real scale-up would keep them.

Content columns are PERTURBED per copy so similarity-shaped workloads
(n-gram Jaccard, MinHash, cosine ANN) don't see artificial cross-copy
duplicate clusters that would make their cost superlinear for a reason
the real corpus growth wouldn't have:
  - documents.text: copy1 reverses the text, copy2 vowel-substitutes —
    both length-preserving (n_chars stays truthful), both destroying
    shingle overlap with the original;
  - embeddings.embedding: copy1 reverses the vector, copy2 negates it —
    norm-preserving direction changes, so cosine structure is new, not
    cloned.

This is a PERF tool only (SCALE.md soak evidence); correctness gates
always run against the unmodified driver fixtures.
"""
import sys

import duckdb

OFF = 10 ** 12  # beyond any fixture key; copy c shifts keys by c*OFF


def main() -> None:
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    skew_pct = 0
    if "--skew-events" in sys.argv:
        skew_pct = int(sys.argv[sys.argv.index("--skew-events") + 1])
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, select_for_copy) -> None:
        parts = " UNION ALL ".join(select_for_copy(c) for c in range(copies))
        con.sql(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def passthrough(table: str) -> None:
        con.sql(f"COPY (SELECT * FROM '{src}/{table}.parquet') "
                f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: dim copied once")

    passthrough("region")
    passthrough("nation")

    write("customer", lambda c: f"""
        SELECT c_custkey + {c * OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'""")

    write("supplier", lambda c: f"""
        SELECT s_suppkey + {c * OFF} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet'""")

    write("part", lambda c: f"""
        SELECT p_partkey + {c * OFF} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{src}/part.parquet'""")

    write("orders", lambda c: f"""
        SELECT o_orderkey + {c * OFF} AS o_orderkey,
               o_custkey + {c * OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")

    write("lineitem", lambda c: f"""
        SELECT l_orderkey + {c * OFF} AS l_orderkey,
               l_partkey + {c * OFF} AS l_partkey,
               l_suppkey + {c * OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")

    # events stores TIMESTAMP(NANOS); DuckDB's parquet writer downcasts
    # to micros, which would break the engine's nanosAsLong read path —
    # replicate via pyarrow, which round-trips the ns type.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{src}/events.parquet")
    ev_copies = []
    for c in range(copies):
        t = ev
        if c:
            t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                             pc.add(t["event_id"], c * OFF))
            t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                             pc.add(t["user_id"], c * OFF))
        ev_copies.append(t)
    ev_all = pa.concat_tables(ev_copies)
    if skew_pct:
        # deterministic hot-key injection: event_id % 100 < PCT rows all
        # become user 1 — one user now owns PCT% of the stream
        hashed = pc.subtract(
            ev_all["event_id"],
            pc.multiply(pc.divide(ev_all["event_id"], 100),
                        pa.scalar(100, ev_all["event_id"].type)))
        sel = pc.less(hashed, skew_pct)
        hot = pc.if_else(sel, pa.scalar(1, ev_all["user_id"].type),
                         ev_all["user_id"])
        ev_all = ev_all.set_column(
            ev_all.schema.get_field_index("user_id"), "user_id", hot)
        n_hot = pc.sum(pc.cast(sel, pa.int64())).as_py()
        print(f"events skew: {n_hot}/{ev_all.num_rows} rows -> user 1")
    pq.write_table(ev_all, f"{out}/events.parquet")
    print(f"events: {ev_all.num_rows} rows (pyarrow, ns preserved)")

    def doc_text(c: int) -> str:
        if c == 0:
            return "text"
        if c % 3 == 1:
            return "reverse(text)"
        return "translate(text, 'aeiouAEIOU', 'uoieaUOIEA')"

    write("documents", lambda c: f"""
        SELECT doc_id + {c * OFF} AS doc_id, {doc_text(c)} AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet'""")

    def vec(c: int) -> str:
        if c == 0:
            return "embedding"
        if c % 3 == 1:
            return "CAST(list_reverse(embedding) AS FLOAT[])"
        return "CAST(list_transform(embedding, x -> -x) AS FLOAT[])"

    write("embeddings", lambda c: f"""
        SELECT vec_id + {c * OFF} AS vec_id, {vec(c)} AS embedding, label
        FROM '{src}/embeddings.parquet'""")


if __name__ == "__main__":
    main()
