#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): replicate the driver's
DuckDB-oracle compare locally so oracle SQL is validated before the
driver runs it. Usage:
    python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]
Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB with each testdata table
registered as a view, sorts columns by name, and compares values.
"""
import sys, json, math, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark result at {res_dir}")
            failures += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table().to_pylist()
        srows = [tuple(canon(r[k]) for k in sorted(r)) for r in sdf]
        orows = [tuple(canon(r[k]) for k in sorted(r)) for r in odf]
        scols = sorted(sdf[0]) if sdf else []
        ocols = sorted(odf[0]) if odf else []
        if scols != ocols:
            print(f"[SCHEMA] {name}: spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"[ROWS] {name}: spark={len(srows)} oracle={len(orows)}")
            failures += 1
            continue
        ordered_eq = srows == orows
        sorted_eq = ordered_eq or sorted(map(repr, srows)) == sorted(map(repr, orows))
        if ordered_eq:
            print(f"[OK]   {name}: {len(srows)} rows, exact ordered match")
        elif sorted_eq:
            print(f"[OK*]  {name}: {len(srows)} rows match only after row sort (check ORDER BY)")
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"[FAIL] {name}: {len(diffs)}/{len(srows)} differing rows; first: ")
            for i, a, b in diffs[:3]:
                print(f"    row {i}:\n      spark : {a}\n      oracle: {b}")
            failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
