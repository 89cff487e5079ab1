#!/usr/bin/env python3
"""Dev-only pre-flight mirroring the driver's correctness gate: run DuckDB on
SparkEntry.oracleSql (dumped by graft.Verify) and compare against the Spark
parquet results, column-name-sorted, row-sorted, value-hashed.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark result")
            n_bad += 1
            continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"ERR   {name}: duckdb: {e}")
            n_bad += 1
            continue
        srel = con.sql(f"SELECT * FROM read_parquet({files})")
        s_cols = srel.columns
        s_rows = srel.fetchall()
        if sorted(map(str.lower, o_cols)) != sorted(map(str.lower, s_cols)):
            print(f"SCHEMA {name}: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_bad += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"ROWS  {name}: spark={len(s_rows)} oracle={len(o_rows)}")
            n_bad += 1
            continue
        hs, ho = table_hash(s_rows, [c.lower() for c in s_cols]), table_hash(o_rows, [c.lower() for c in o_cols])
        if hs != ho:
            print(f"HASH  {name}: mismatch ({len(s_rows)} rows)")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
