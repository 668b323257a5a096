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
            want_rel = con.sql(sql)
            want_names = want_rel.columns
            order = sorted(range(len(want_names)), key=lambda i: want_names[i])
            want_cols = sorted(want_names)
            want = [tuple(norm(r[i]) for i in order) for r in want_rel.fetchall()]
            if got_cols != want_cols:
                results[name] = f"SCHEMA-MISMATCH spark={got_cols} duck={want_cols}"
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
