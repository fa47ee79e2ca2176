#!/usr/bin/env python3
"""Build a pseudo-sf parquet directory by unioning K id-shifted copies of
a source sf directory — the 10x scaling probe's input. Ids are offset by
copy*10^9 so uniqueness invariants hold; all other columns (text, ts,
user_id, embeddings) repeat, which is the realistic shape for dedup ops
(each document gains K-1 exact copies). Usage: mksf.py <src> <dst> <K>"""
import sys, os
import duckdb

ID_COLS = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
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
        idc = ID_COLS.get(t)
        if idc is None:
            # dimension-ish tables keep one copy
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
        sel = ", ".join(
            f"{c} + i * 1000000000 AS {c}" if c == idc else c for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM '{p}', (SELECT unnest(range({k})) AS i) copies
                  ORDER BY i, {idc})
            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
