#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by `sbt "runMain graft.Verify
<sfDir> <outDir>"`), runs the matching oracle SQL from oracle_sql.json in
DuckDB with views over <sfDir>/*.parquet, and compares: schema (column names
sorted), row count, and values (columns sorted by name, rows in file order).
Exit 1 on any mismatch.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    failures = []
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = sorted(spark_rel.columns)
        sdata = spark_rel.fetchall()
        sidx = [spark_rel.columns.index(c) for c in scols]
        srows = [tuple(norm(r[i]) for i in sidx) for r in sdata]
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows "
                  f"{'OK' if len(srows) > 0 else 'EMPTY!'}")
            if len(srows) == 0:
                failures.append((name, "empty result, no oracle"))
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = sorted(orel.columns)
            odata = orel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        oidx = [orel.columns.index(c) for c in ocols]
        orows = [tuple(norm(r[i]) for i in oidx) for r in odata]
        if scols != ocols:
            failures.append((name, f"schema: spark={scols} oracle={ocols}"))
            print(f"[FAIL] {name}: schema mismatch spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount: spark={len(srows)} oracle={len(orows)}"))
            print(f"[FAIL] {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append((name, f"{len(bad)} differing rows; first at {i}"))
            print(f"[FAIL] {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"row {i}:\n  spark : {a}\n  oracle: {b}\n  cols  : {scols}")
            continue
        print(f"[OK]   {name}: {len(srows)} rows match")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
