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
    copy(
        "customer",
        "SELECT c_custkey + {i} * "
        + str(n["customer"])
        + " AS c_custkey, 'Customer#' || lpad(CAST(c_custkey + {i} * "
        + str(n["customer"])
        + " AS VARCHAR), 9, '0') AS c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src}",
    )
    copy(
        "supplier",
        "SELECT s_suppkey + {i} * "
        + str(n["supplier"])
        + " AS s_suppkey, 'Supplier#' || lpad(CAST(s_suppkey + {i} * "
        + str(n["supplier"])
        + " AS VARCHAR), 9, '0') AS s_name, s_nationkey, s_acctbal FROM {src}",
    )
    copy(
        "part",
        "SELECT p_partkey + {i} * "
        + str(n["part"])
        + " AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM {src}",
    )
    copy(
        "orders",
        "SELECT o_orderkey + {i} * "
        + str(n["orders"])
        + " AS o_orderkey, o_custkey + {i} * "
        + str(n["customer"])
        + " AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}",
    )
    copy(
        "lineitem",
        "SELECT l_orderkey + {i} * "
        + str(n["orders"])
        + " AS l_orderkey, l_partkey + {i} * "
        + str(n["part"])
        + " AS l_partkey, l_suppkey + {i} * "
        + str(n["supplier"])
        + " AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        + "l_returnflag, l_linestatus, l_shipdate FROM {src}",
    )
    copy(
        "events",
        "SELECT event_id + {i} * "
        + str(n["events"])
        + " AS event_id, ts, user_id + {i} * "
        + str(n["customer"])
        + " AS user_id, event_type, value, props FROM {src}",
    )
    copy(
        "documents",
        "SELECT doc_id + {i} * "
        + str(n["documents"])
        + " AS doc_id, text, lang, n_chars FROM {src}",
    )
    copy(
        "embeddings",
        "SELECT vec_id + {i} * "
        + str(n["embeddings"])
        + " AS vec_id, embedding, label FROM {src}",
    )


if __name__ == "__main__":
    main()
