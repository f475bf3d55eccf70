#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json over the parquet tables
in <sfDir>, and compares row count, column names, and the full sorted
value matrix (the driver's hash compare, made diffable). With no query
args, checks every query that has oracle SQL.
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    # driver protocol: sort columns by name, then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(norm(r[i]) for i in order) for r in rows]
    mat.sort(key=repr)
    return [cols[i] for i in order], mat

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if not names:
        names = sorted(oracle)
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        tbl = os.path.basename(t)[:-len(".parquet")]
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{t}')")
    failed = []
    for name in names:
        res_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(res_glob)
        if not files:
            print(f"{name}: MISSING spark result"); failed.append(name)
            continue
        if name not in oracle:
            print(f"{name}: rows-only ({len(con.sql(f'SELECT * FROM read_parquet({files!r})').fetchall())} rows)")
            continue
        srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = srel.columns, srel.fetchall()
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
        sc, sm = canon(srows, scols)
        oc, om = canon(orows, ocols)
        ok = sc == oc and sm == om
        status = "OK" if ok else "FAIL"
        print(f"{name}: {status} spark={len(sm)} oracle={len(om)}")
        if not ok:
            failed.append(name)
            if sc != oc:
                print(f"  cols spark={sc} oracle={oc}")
            else:
                for i, (a, b) in enumerate(zip(sm, om)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark {a!r}\n   oracle {b!r}")
                        break
                if len(sm) != len(om):
                    print(f"  row count {len(sm)} vs {len(om)}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
