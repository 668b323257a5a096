#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate:
reads Verify.scala's parquet dumps + oracle_sql.json, runs each oracle in
DuckDB against the same testdata parquet tables, and compares
row-count / column-names / values (columns sorted by name).

Usage: python tools/check.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pathlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def type_key(t):
    """Normalize an Arrow type for driver-style type comparison.
    string/large_string are interchangeable (reader-dependent); everything
    else compares on the raw Arrow type string — so int64 vs decimal128(38,0)
    (DuckDB HUGEINT from an uncast integer sum) is flagged, which is the
    divergence the driver's type-sensitive hash catches."""
    s = str(t)
    if s == "large_string":
        return "string"
    if s.startswith("timestamp"):
        return "timestamp"
    # Driver-observed behavior (CORRECTNESS_r05): int32-vs-int64 columns
    # hash equal, decimal128-vs-int64 does not — integer widths normalize,
    # decimals stay distinct.
    if s in ("int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64"):
        return "int"
    if s == "float":
        return "double"
    return s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        d = pathlib.Path(out_dir) / name
        if not d.exists():
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got_tbl = pq.read_table(str(d))
            got_cols = sorted(got_tbl.column_names)
            got = [tuple(norm(row[c]) for c in got_cols)
                   for row in got_tbl.to_pylist()]
            want_tbl = con.sql(sql).fetch_arrow_table()
            want_names = want_tbl.column_names
            order = sorted(range(len(want_names)), key=lambda i: want_names[i])
            want_cols = sorted(want_names)
            want = [tuple(norm(row[c]) for c in want_cols)
                    for row in want_tbl.to_pylist()]
            got_types = {c: type_key(got_tbl.schema.field(c).type)
                         for c in got_tbl.column_names}
            want_types = {c: type_key(want_tbl.schema.field(c).type)
                          for c in want_tbl.column_names}
            type_diffs = {c: (got_types.get(c), want_types.get(c))
                          for c in want_types
                          if c in got_types and got_types[c] != want_types[c]}
            if got_cols != want_cols:
                results[name] = f"SCHEMA-MISMATCH spark={got_cols} duck={want_cols}"
            elif type_diffs:
                results[name] = f"TYPE-MISMATCH {type_diffs}"
            elif len(got) != len(want):
                results[name] = f"ROWCOUNT-MISMATCH spark={len(got)} duck={len(want)}"
            elif got != want:
                diffs = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w]
                results[name] = f"VALUE-MISMATCH {len(diffs)} rows, first: {diffs[0] if diffs else '?'}"
            else:
                results[name] = "OK"
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {e}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, r in results.items():
        mark = "✓" if r == "OK" else "✗"
        print(f"{mark} {name}: {r[:300]}")
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
