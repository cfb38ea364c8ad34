"""Build a full sf1 star schema at /tmp/sf1 by replicating sf0.1 ten
times with FK-CONSISTENT disjoint id namespaces (VERDICT r8 item 6 —
the scaling-slope probe needs every driver table, not just
events/documents as in the r8 fold probe).

Replication model (copy 0 is verbatim — sf0.1 is a subset of sf1):

- region/nation stay fixed (TPC-H semantics: dimension tables don't
  scale) — every replicated customer/supplier still joins a valid
  nation.
- customer/supplier/part/orders/lineitem replicate with per-table
  offsets of max(key)+1 (the CLAUDE.md id-namespace rule), and every
  FOREIGN KEY follows its own copy's offset, so join fan-outs scale
  exactly 10x (each order keeps its one customer; each lineitem its
  one order/part/supplier).
- events replicate with fresh event_id AND fresh user_id namespaces
  over the SAME time window (denser traffic — the realistic growth
  shape for per-day aggregates; per-user sequence depth stays fixed,
  matching how a 10x-bigger service behaves, while the r8 fold probe
  separately covered the 10x-deeper-sequence case).
- documents/embeddings replicate under fresh doc/vec ids (verbatim
  duplicate text — worst case for dedup candidate generation).

Usage: python tools/sf1_build.py [outdir] [mult]   (default /tmp/sf1 10)
"""

from __future__ import annotations

import os
import sys

BASE = "/root/testdata/sf0.1"


def build(out: str = "/tmp/sf1", mult: int = 10) -> str:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def off(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{BASE}/{table}.parquet'"
        ).fetchone()[0]

    c_off = off("customer", "c_custkey")
    s_off = off("supplier", "s_suppkey")
    p_off = off("part", "p_partkey")
    o_off = off("orders", "o_orderkey")
    e_off = off("events", "event_id")
    u_off = off("events", "user_id")
    d_off = off("documents", "doc_id")
    v_off = off("embeddings", "vec_id")

    plans: dict[str, str] = {
        "region": "SELECT * FROM src",
        "nation": "SELECT * FROM src",
        "customer": ("SELECT c_custkey + {k}*%d AS c_custkey, c_name,"
                     " c_nationkey, c_acctbal, c_mktsegment FROM src"
                     % c_off),
        "supplier": ("SELECT s_suppkey + {k}*%d AS s_suppkey, s_name,"
                     " s_nationkey, s_acctbal FROM src" % s_off),
        "part": ("SELECT p_partkey + {k}*%d AS p_partkey, p_name,"
                 " p_brand, p_type, p_size, p_retailprice FROM src"
                 % p_off),
        "orders": ("SELECT o_orderkey + {k}*%d AS o_orderkey,"
                   " o_custkey + {k}*%d AS o_custkey, o_orderstatus,"
                   " o_totalprice, o_orderdate, o_orderpriority FROM src"
                   % (o_off, c_off)),
        "lineitem": ("SELECT l_orderkey + {k}*%d AS l_orderkey,"
                     " l_partkey + {k}*%d AS l_partkey,"
                     " l_suppkey + {k}*%d AS l_suppkey, l_linenumber,"
                     " l_quantity, l_extendedprice, l_discount, l_tax,"
                     " l_returnflag, l_linestatus, l_shipdate FROM src"
                     % (o_off, p_off, s_off)),
        "events": ("SELECT event_id + {k}*%d AS event_id, ts,"
                   " user_id + {k}*%d AS user_id, event_type, value,"
                   " props FROM src" % (e_off, u_off)),
        "documents": ("SELECT doc_id + {k}*%d AS doc_id, text, lang,"
                      " source, n_chars FROM src" % d_off),
        "embeddings": ("SELECT vec_id + {k}*%d AS vec_id, embedding,"
                       " label FROM src" % v_off),
    }
    for table, tmpl in plans.items():
        src = f"'{BASE}/{table}.parquet'"
        if tmpl == "SELECT * FROM src":
            sel = tmpl.replace("src", src)
        else:
            sel = " UNION ALL ".join(
                tmpl.format(k=k).replace("FROM src", f"FROM {src}")
                for k in range(mult))
        con.execute(
            f"COPY ({sel}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n}")
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, mult)
