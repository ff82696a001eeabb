"""Scale up the driver's parquet fixtures by key-offset replication.

Produces an sfN directory (same schemas, same distributions, k× the
rows) from an existing fixture dir, for shuffle-dominance benchmarking
beyond the largest provided SF. Every key column is offset per replica
so referential integrity holds (orders→customer, lineitem→orders/part/
supplier, events.user_id→customer); entity names derived from keys
(Customer#…, Supplier#…) are regenerated from the NEW key so name-based
blocking keeps its real cardinality. documents/embeddings content is
replicated verbatim — replicas are exact duplicates by construction,
which the dedup suite then finds (cluster size == replication factor is
a built-in sanity check, and k² pair growth inside clusters stress-tests
the candidate-verify path).

Usage: python tools/make_sf.py [--src /root/testdata/sf0.1] [--k 10]
       [--dst /root/repo/.localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb


def counts(con, src: str) -> dict[str, int]:
    out = {}
    for t in (
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        out[t] = con.sql(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.localdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    n = counts(con, args.src)

    def copy(table: str, select_per_replica: str | None = None) -> None:
        src = f"'{args.src}/{table}.parquet'"
        if select_per_replica is None:
            sql = f"SELECT * FROM {src}"
        else:
            parts = [
                select_per_replica.format(i=i, src=src) for i in range(args.k)
            ]
            sql = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({sql}) TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(table, con.sql(f"SELECT count(*) FROM '{args.dst}/{table}.parquet'").fetchone()[0])

    # dimensions stay fixed (region/nation cardinality is part of the schema)
    copy("region")
    copy("nation")
    # SELECT * REPLACE keeps every column of whatever schema the
    # fixtures carry — only keys (and key-derived names) are rewritten
    copy(
        "customer",
        "SELECT * REPLACE (c_custkey + {i} * " + str(n["customer"]) + " AS c_custkey, "
        + "'Customer#' || lpad(CAST(c_custkey + {i} * " + str(n["customer"])
        + " AS VARCHAR), 9, '0') AS c_name) FROM {src}",
    )
    copy(
        "supplier",
        "SELECT * REPLACE (s_suppkey + {i} * " + str(n["supplier"]) + " AS s_suppkey, "
        + "'Supplier#' || lpad(CAST(s_suppkey + {i} * " + str(n["supplier"])
        + " AS VARCHAR), 9, '0') AS s_name) FROM {src}",
    )
    copy(
        "part",
        "SELECT * REPLACE (p_partkey + {i} * " + str(n["part"]) + " AS p_partkey) FROM {src}",
    )
    copy(
        "orders",
        "SELECT * REPLACE (o_orderkey + {i} * " + str(n["orders"]) + " AS o_orderkey, "
        + "o_custkey + {i} * " + str(n["customer"]) + " AS o_custkey) FROM {src}",
    )
    copy(
        "lineitem",
        "SELECT * REPLACE (l_orderkey + {i} * " + str(n["orders"]) + " AS l_orderkey, "
        + "l_partkey + {i} * " + str(n["part"]) + " AS l_partkey, "
        + "l_suppkey + {i} * " + str(n["supplier"]) + " AS l_suppkey) FROM {src}",
    )
    copy(
        "events",
        "SELECT * REPLACE (event_id + {i} * " + str(n["events"]) + " AS event_id, "
        + "user_id + {i} * " + str(n["customer"]) + " AS user_id) FROM {src}",
    )
    # SELECT * REPLACE keeps every column (documents carries extra
    # metadata columns like `source`) — only the key is offset
    copy(
        "documents",
        "SELECT * REPLACE (doc_id + {i} * " + str(n["documents"]) + " AS doc_id) FROM {src}",
    )
    copy(
        "embeddings",
        "SELECT * REPLACE (vec_id + {i} * " + str(n["embeddings"]) + " AS vec_id) FROM {src}",
    )


if __name__ == "__main__":
    main()
