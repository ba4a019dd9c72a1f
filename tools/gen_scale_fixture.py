"""Generate an sf1-scale documents/embeddings fixture for the 10×
scale smoke (VERDICT r3 item #8) by replicating sf0.1 with per-replica
word salting.

Rationale: the driver's fixtures stop at sf0.1 (5 000 docs / 2 000
vectors) and /root/testdata is read-only, so the 10× fixture lives
under the repo in ``tmp_scale/`` (gitignored).  Replication with a
per-replica suffix on EVERY word keeps each replica's internal
near-dup structure byte-for-byte intact (the dup pairs a dedup run
must find) while making shingles disjoint ACROSS replicas — so corpus
growth multiplies the real work linearly instead of creating one
mega-cluster of cross-replica exact dups (which would measure a
worst-case dup explosion, not scaling).

Embeddings are replicated with remapped ids and unperturbed values:
the IVF smoke measures assignment + rerank cost, which depends on
corpus size and cluster occupancy, both of which scale correctly
under replication.

Usage: python tools/gen_scale_fixture.py [replicas] [out_root]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_root = sys.argv[2] if len(sys.argv) > 2 else "tmp_scale/sf1"
    os.makedirs(out_root, exist_ok=True)
    con = duckdb.connect()

    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]

    # word-salted replicas: doc_id offset per replica; every word gets
    # an ·rK suffix so 3-gram shingles never collide across replicas
    doc_parts = []
    for k in range(replicas):
        salt = (
            "text"
            if k == 0
            else (
                "array_to_string(list_transform(string_split(text, ' '), "
                f"w -> w || '·r{k}'), ' ')"
            )
        )
        doc_parts.append(
            f"SELECT doc_id + {k * n_docs} AS doc_id, {salt} AS text, "
            f"lang, source, length({salt}) AS n_chars "
            f"FROM '{SRC}/documents.parquet'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{out_root}/documents.parquet' "
        "(FORMAT PARQUET)"
    )

    emb_parts = [
        f"SELECT vec_id + {k * n_vecs} AS vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet'"
        for k in range(replicas)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{out_root}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )

    # relational/events side (round-4 smoke extension): replicate the
    # fact tables with key offsets so every join fan-out and per-key
    # distribution is preserved exactly — 10× data, 10× real work.
    # events: user_id offset per replica (10× users, same day span —
    # rolling-DAU/corr work scales with users×days); event_id offset
    # keeps the tiebreak key unique.
    n_ev, n_usr = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()
    ev_parts = [
        f"SELECT event_id + {k * n_ev} AS event_id, ts, "
        f"user_id + {k * n_usr} AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'"
        for k in range(replicas)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(ev_parts)}) TO '{out_root}/events.parquet' "
        "(FORMAT PARQUET)"
    )

    # orders/lineitem/customer: one consistent key offset chain so
    # c⋈o⋈l fan-outs replicate exactly.
    n_ord, n_cust = con.execute(
        f"SELECT max(o_orderkey) + 1, "
        f"(SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet') "
        f"FROM '{SRC}/orders.parquet'"
    ).fetchone()
    cust_parts = [
        f"SELECT c_custkey + {k * n_cust} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"
        for k in range(replicas)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(cust_parts)}) TO '{out_root}/customer.parquet' "
        "(FORMAT PARQUET)"
    )
    ord_parts = [
        f"SELECT o_orderkey + {k * n_ord} AS o_orderkey, "
        f"o_custkey + {k * n_cust} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"
        for k in range(replicas)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(ord_parts)}) TO '{out_root}/orders.parquet' "
        "(FORMAT PARQUET)"
    )
    li_parts = [
        f"SELECT l_orderkey + {k * n_ord} AS l_orderkey, l_partkey, l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'"
        for k in range(replicas)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(li_parts)}) TO '{out_root}/lineitem.parquet' "
        "(FORMAT PARQUET)"
    )

    # dims copied as-is so register_views finds every table
    for t in ("region", "nation", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out_root}/{t}.parquet' (FORMAT PARQUET)"
        )

    d = con.execute(f"SELECT count(*) FROM '{out_root}/documents.parquet'").fetchone()[0]
    e = con.execute(f"SELECT count(*) FROM '{out_root}/embeddings.parquet'").fetchone()[0]
    ev = con.execute(f"SELECT count(*) FROM '{out_root}/events.parquet'").fetchone()[0]
    li = con.execute(f"SELECT count(*) FROM '{out_root}/lineitem.parquet'").fetchone()[0]
    print(
        f"wrote {out_root}: documents={d} embeddings={e} events={ev} "
        f"lineitem={li} ({replicas}x {SRC})"
    )


if __name__ == "__main__":
    main()
