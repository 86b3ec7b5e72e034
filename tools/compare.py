#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name> directory of parquet under verifyOutDir, runs the matching
oracle SQL (from oracle_sql.json) in DuckDB against the sf tables, then
compares: row count, column names, and a value hash computed on rows sorted
by all columns with columns in name order.

Values are fetched through Arrow (not .fetchall()) to match the driver's
pandas/arrow canonicalization: DuckDB widens sum(BIGINT) to HUGEINT, which
Arrow renders as float64 — a .fetchall() fetch hides that as a native Python
int and diverges from the driver (the round-5 `window_running` miss). On top
of the hash, per-column Arrow types are compared and any int-vs-float
divergence between the Spark result and the oracle is reported as a TYPE
failure even when the values would hash equal.
"""
import json, sys, math, decimal
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT arrives as decimal128; the driver's pandas fetch
        # renders it float64 — canonicalize the same way so the hash diverges
        # here exactly when it would diverge for the driver.
        return repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def fetch_arrow(con, sql):
    """Rows + column names + coarse type classes, through the Arrow path."""
    tbl = con.execute(sql).arrow()
    cols = tbl.column_names
    kinds = []
    import pyarrow.types as pt
    for f in tbl.schema:
        t = f.type
        if pt.is_integer(t):
            kinds.append("int")
        elif pt.is_floating(t) or pt.is_decimal(t):
            kinds.append("float")
        elif pt.is_boolean(t):
            kinds.append("bool")
        elif pt.is_binary(t) or pt.is_large_binary(t):
            kinds.append("binary")
        elif pt.is_string(t) or pt.is_large_string(t):
            kinds.append("string")
        else:
            kinds.append(str(t))
    rows = [tuple(d.values()) for d in tbl.to_pylist()]
    return rows, cols, kinds

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
            got, gcols, gkinds = fetch_arrow(
                con, f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
            want, wcols, wkinds = fetch_arrow(con, sql)
            rows_match = len(got) == len(want)
            schema_match = sorted(gcols) == sorted(wcols)
            # Type echo: compare coarse kinds per (sorted) column name.
            types_match = schema_match
            type_msg = ""
            if schema_match:
                gk = dict(zip(gcols, gkinds))
                wk = dict(zip(wcols, wkinds))
                bad = [(c, gk[c], wk[c]) for c in sorted(gk) if gk[c] != wk[c]]
                if bad:
                    types_match = False
                    type_msg = " TYPE " + ",".join(
                        f"{c}:spark={a}/oracle={b}" for c, a, b in bad)
            hash_match = (table_hash(got, gcols) == table_hash(want, wcols)
                          if schema_match else False)
            ok = rows_match and schema_match and hash_match and types_match
            results[name] = ok
            msg = "OK " if ok else "FAIL"
            print(f"{msg} {name}: rows {len(got)}/{len(want)} "
                  f"schema={schema_match} hash={hash_match}{type_msg}")
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
