#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name> directory of parquet under verifyOutDir, runs the matching
oracle SQL (from oracle_sql.json) in DuckDB against the sf tables, then
compares: row count, column names, and a value hash computed on rows sorted
by all columns with columns in name order (approximating the driver).
"""
import json, sys, math
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            rows_match = len(got) == len(want)
            schema_match = sorted(gcols) == sorted(wcols)
            hash_match = (table_hash(got, gcols) == table_hash(want, wcols)
                          if schema_match else False)
            ok = rows_match and schema_match and hash_match
            results[name] = ok
            msg = "OK " if ok else "FAIL"
            print(f"{msg} {name}: rows {len(got)}/{len(want)} schema={schema_match} hash={hash_match}")
            if not ok and schema_match and len(got) and len(want):
                order = sorted(range(len(gcols)), key=lambda i: gcols[i])
                gs = sorted("\x01".join(canon(r[i]) for i in order) for r in got)
                ws = sorted("\x01".join(canon(r[i]) for i in order) for r in want)
                for idx in range(min(2000, max(len(gs), len(ws)))):
                    a = gs[idx] if idx < len(gs) else "<missing>"
                    b = ws[idx] if idx < len(ws) else "<missing>"
                    if a != b:
                        print(f"   first diff:\n     got  {a[:300]}\n     want {b[:300]}")
                        break
        except Exception as e:
            results[name] = False
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    n_ok = sum(results.values())
    print(f"== {n_ok}/{len(results)} OK ==")
    sys.exit(0 if n_ok == len(results) else 1)

main()
