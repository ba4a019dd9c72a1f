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

    d = con.execute(f"SELECT count(*) FROM '{out_root}/documents.parquet'").fetchone()[0]
    e = con.execute(f"SELECT count(*) FROM '{out_root}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {out_root}: documents={d} embeddings={e} ({replicas}x {SRC})")


if __name__ == "__main__":
    main()
