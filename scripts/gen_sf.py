#!/usr/bin/env python
"""Deterministic scale-up of the driver's synthetic testdata.

Replicates every table of a source sf directory ``--factor`` times with
disjoint key spaces (keys offset by copy * 1e9, referential structure
preserved), producing an sfN directory with N = factor x source-sf — used
by the round-5 sf1.0 battery run (VERDICT r4 "Next round" #4: guard
against sf0.1-only tuning). The driver's testdata is read-only, so the
scaled set lands under the repo (gitignored), one parquet FILE per table
(what both Spark and the DuckDB oracle harness expect).

Everything is deterministic (hash-arithmetic, no RNG):
- TPC-H-ish tables replicate verbatim with key offsets (dims region /
  nation are fixed-size and copied once).
- documents: each copy's word sequence is pseudo-shuffled by a per-copy
  blake2b sort key, so copies are NOT near-duplicates of each other and
  dedup result sizes scale linearly with the factor (a verbatim text
  replicate would grow pair counts quadratically — a data artifact, not
  an operator property).
- embeddings: element 0 nudged by copy * 1e-3 so replicated vectors are
  distinct (no cosine ties to break across engines).

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1]
       [--out .data/sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import hashlib
import os

OFF = 1_000_000_000

# table -> key columns to offset by copy * OFF
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def shuffle_words(text: str, copy: int) -> str:
    if copy == 0 or not text:
        return text
    words = text.split(" ")
    keyed = sorted(
        enumerate(words),
        key=lambda iw: hashlib.blake2b(
            f"{copy}:{iw[0]}:{iw[1]}".encode(), digest_size=8
        ).digest(),
    )
    return " ".join(w for _, w in keyed)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "sf1.0"
    ))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    f = args.factor

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{args.src}/{t}.parquet') "
            f"CROSS JOIN range({f}) t(k) ORDER BY k, {keys[0]}) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    # documents: python-side word pseudo-shuffle per copy
    docs = pq.read_table(f"{args.src}/documents.parquet")
    d = docs.to_pylist()
    out_rows = []
    for k in range(f):
        for r in d:
            text = shuffle_words(r["text"], k)
            out_rows.append(
                {
                    "doc_id": r["doc_id"] + k * OFF,
                    "text": text,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(text) if text is not None else r["n_chars"],
                }
            )
    pq.write_table(
        pa.Table.from_pylist(out_rows, schema=docs.schema),
        f"{args.out}/documents.parquet",
    )
    print(f"documents: {len(out_rows)} rows")

    # embeddings: nudge element 0 per copy so replicated vectors are distinct
    emb = pq.read_table(f"{args.src}/embeddings.parquet")
    e = emb.to_pylist()
    out_rows = []
    for k in range(f):
        for r in e:
            vec = list(r["embedding"])
            if k and vec:
                vec[0] = float(vec[0]) + k * 1e-3
            out_rows.append(
                {
                    "vec_id": r["vec_id"] + k * OFF,
                    "embedding": vec,
                    "label": r["label"],
                }
            )
    pq.write_table(
        pa.Table.from_pylist(out_rows, schema=emb.schema),
        f"{args.out}/embeddings.parquet",
    )
    print(f"embeddings: {len(out_rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
