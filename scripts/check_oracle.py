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
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def type_kind(t):
    """Canonical type class for driver-hash compatibility. Widths within a
    kind are equivalent under .to_pylist() (int32/int64 -> int), but CROSS
    kind (decimal128 vs int64, float vs int) is exactly the divergence that
    made mix_pack_shard driver-red in r15 while values compared equal.
    Dictionary encoding is a physical layout, not a logical type --
    .to_pylist() yields the value type's values -- so unwrap it before
    classifying (DuckDB can emit dictionary-encoded string columns).
    The null type needs no branch: the str(t) fallthrough already
    renders it as 'null' on both sides."""
    if pa.types.is_dictionary(t):
        return type_kind(t.value_type)
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_kind(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_kind(t.key_type)},{type_kind(t.item_type)}>"
    return str(t)

def kind_map(tbl):
    return {f.name: type_kind(f.type) for f in tbl.schema}

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
            otbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures += 1
            continue
        stbl = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        odf, sdf = otbl.to_pylist(), stbl.to_pylist()
        srows = [tuple(canon(r[k]) for k in sorted(r)) for r in sdf]
        orows = [tuple(canon(r[k]) for k in sorted(r)) for r in odf]
        scols = sorted(sdf[0]) if sdf else []
        ocols = sorted(odf[0]) if odf else []
        if scols != ocols:
            print(f"[SCHEMA] {name}: spark={scols} oracle={ocols}")
            failures += 1
            continue
        skinds, okinds = kind_map(stbl), kind_map(otbl)
        tdiffs = [(c, skinds.get(c), okinds.get(c))
                  for c in sorted(set(skinds) | set(okinds))
                  if skinds.get(c) != okinds.get(c)]
        if tdiffs:
            print(f"[TYPE] {name}: arrow type-kind mismatch (driver hash is type-sensitive):")
            for c, sk, ok in tdiffs:
                print(f"    {c}: spark={sk} oracle={ok}")
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
