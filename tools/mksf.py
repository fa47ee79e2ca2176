#!/usr/bin/env python3
"""Build a pseudo-sf parquet directory by unioning K id-shifted copies of
a source sf directory — the 10x scaling probe's input. Ids AND the foreign
keys that reference them are offset by copy*10^9, so uniqueness invariants
hold and join cardinalities scale with the data (copy i's lineitems point
at copy i's orders, which point at copy i's customers). Nation/region stay
single-copy dimensions, so nationkey FKs are NOT shifted. All other
columns (text, ts, user_id, embeddings) repeat, which is the realistic
shape for dedup ops (each document gains K-1 exact copies).
Usage: mksf.py <src> <dst> <K>"""
import sys, os
import duckdb

# columns to offset per copy: the table's own id plus every FK into
# another shifted table (FKs into the single-copy dims stay put)
SHIFT_COLS = {
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
}
# deterministic output order inside each copy
ORDER_COL = {
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
    "orders": "o_orderkey", "lineitem": "l_orderkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(src, dst, k):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        shift = SHIFT_COLS.get(t)
        if shift is None:
            # dimension-ish tables keep one copy
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
        sel = ", ".join(
            f"{c} + i * 1000000000 AS {c}" if c in shift else c for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM '{p}', (SELECT unnest(range({k})) AS i) copies
                  ORDER BY i, {ORDER_COL[t]})
            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
