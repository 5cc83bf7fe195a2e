#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
runs graft.Verify via sbt (or reuses an existing outDir), then executes
each oracle SQL in DuckDB over the same sf parquet tables and compares
row counts, sorted-column schemas, and value hashes.

Usage: python3 dev/compare.py [sfDir] [outDir] [--skip-verify] [query...]
"""
import sys, json, subprocess, hashlib, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        d = f"{out}/{name}"
        if not os.path.isdir(d):
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        spark_tbl = pq.read_table(d)
        try:
            duck = con.sql(sql)
            drows = duck.fetchall()
            dcols = duck.columns
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
        scols = spark_tbl.column_names
        srows = [tuple(spark_tbl.column(c)[i].as_py() for c in scols)
                 for i in range(spark_tbl.num_rows)]
        if sorted(scols) != sorted(c.lower() for c in dcols) and sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}"); fails += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}"); fails += 1; continue
        hs, hd = table_hash(scols, srows), table_hash([c.lower() for c in dcols], drows)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
            shown = 0
            for i, (a, b) in enumerate(zip(srows, drows)):
                na = [norm_cell(a[j]) for j in order_s]
                nb = [norm_cell(b[j]) for j in order_d]
                if na != nb:
                    print(f"  row {i}: spark={na}\n          duck ={nb}")
                    shown += 1
                    if shown >= 5: break
            fails += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
