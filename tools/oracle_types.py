#!/usr/bin/env python3
"""Sweep every oracle SQL for DuckDB type widening vs the Spark result.

The driver's hash compare is type-sensitive: q59 went red in round 8
solely because an uncast DuckDB window sum() returned HUGEINT while the
Spark side wrote BIGINT (values identical).  This tool makes that whole
class visible locally: for each query it prints the (spark_type,
oracle_type) pair per column and flags any oracle column whose DuckDB
type is a widening type (HUGEINT/UHUGEINT/DECIMAL/UBIGINT) or whose
type differs from the Spark parquet type outside a known-safe
equivalence set.

Usage:
  python3 tools/oracle_types.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

# Pairs observed on green driver rows -- proven safe under the driver hash.
SAFE = {
    ("BIGINT", "BIGINT"), ("INTEGER", "INTEGER"), ("DOUBLE", "DOUBLE"),
    ("VARCHAR", "VARCHAR"), ("BOOLEAN", "BOOLEAN"), ("DATE", "DATE"),
    ("TIMESTAMP", "TIMESTAMP"), ("TIMESTAMP_NS", "TIMESTAMP"),
    ("BLOB", "BLOB"), ("FLOAT", "FLOAT"),
}
WIDENING = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if not names:
        names = sorted(oracle)
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        tbl = os.path.basename(t)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{t}')")
    flagged = []
    for name in names:
        if name not in oracle:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_types = {}
        if files:
            srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_types = dict(zip(srel.columns, (str(t) for t in srel.types)))
        orel = con.sql(oracle[name])
        bad = []
        # Driver-hostile container types: the driver's pandas-based
        # compare sort_values/hashes row values and raises on numpy
        # arrays (q102/q116 in round 9) -- no ARRAY/STRUCT/MAP may
        # appear in EITHER side's output schema.
        for col, typ in spark_types.items():
            base = typ.split("(")[0].split("[")[0]
            if "[]" in typ or base in ("STRUCT", "MAP", "LIST", "UNION"):
                bad.append(f"{col}: spark={typ} [CONTAINER]")
        for col, typ in zip(orel.columns, (str(t) for t in orel.types)):
            st = spark_types.get(col, "?")
            base = typ.split("(")[0].split("[")[0]
            if "[]" in typ or base in ("STRUCT", "MAP", "LIST", "UNION"):
                bad.append(f"{col}: oracle={typ} [CONTAINER]")
            elif base in WIDENING or typ.startswith("DECIMAL"):
                bad.append(f"{col}: oracle={typ} spark={st} [WIDENING]")
            elif st != "?" and (st, typ) not in SAFE and st != typ:
                bad.append(f"{col}: oracle={typ} spark={st} [MISMATCH]")
        if bad:
            flagged.append(name)
            print(f"{name}: FLAG")
            for b in bad:
                print(f"    {b}")
    print(f"\nswept {len(names)} oracle SQLs, flagged {len(flagged)}: {flagged}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
