"""Write a deterministically row-shuffled copy of a testdata sf dir.

Every table is re-ordered by md5 over the row's full string form, so the
copy has identical contents with a scrambled (but reproducible) physical
row order.  Running scripts/check_oracle.py --all against the copy is the
input-order-invariance sweep: both engines read the same shuffled files,
so any catalog query whose answer depends on incoming row order (a bare
limit, a first() without ordering, an order-sensitive fold) diverges from
its oracle.  Swept green (93/93) on the final round-5 code.

Usage: python scripts/make_shuffled_copy.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_shuffled"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        key = " || '|' || ".join(
            f"COALESCE(CAST({c} AS VARCHAR),'~null~')" for c in cols
        )
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' ORDER BY md5({key})) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"shuffled copy of {src} written to {dst}")


if __name__ == "__main__":
    main()
