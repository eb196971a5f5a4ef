#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, sorts columns by name on both sides, and compares
row-by-row exactly. Reports per-query PASS/FAIL plus a diff sample, so oracle
mismatches are caught before the driver runs.
"""
import sys, json, glob, math

import duckdb

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
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = res_dir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"EMPTY  {name}: no parquet written")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        got_cols = sorted(got.column_names)
        got_rows = [tuple(canon(r[c]) for c in got_cols)
                    for r in got.to_pylist()]
        if name not in oracles:
            status = "ROWS>0" if len(got_rows) > 0 else "ZEROROWS"
            print(f"{status} {name}: {len(got_rows)} rows (no oracle)")
            n_noracle += 1
            if len(got_rows) == 0:
                n_fail += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL   {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp_cols = sorted(exp.column_names)
        exp_rows = [tuple(canon(r[c]) for c in exp_cols)
                    for r in exp.to_pylist()]
        if got_cols != exp_cols:
            print(f"FAIL   {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        # Type-strict, like the driver: DuckDB sum(INTEGER) -> decimal128(38,0)
        # vs Spark int64 hash-mismatches even when values compare equal
        # (round-1 judge finding -- 11 queries lost to it).
        got_types = {c: str(got.schema.field(c).type) for c in got_cols}
        exp_types = {c: str(exp.schema.field(c).type) for c in exp_cols}
        if got_types != exp_types:
            diffs = {c: (got_types[c], exp_types[c])
                     for c in got_cols if got_types[c] != exp_types[c]}
            print(f"FAIL   {name}: arrow types differ (spark, oracle): {diffs}")
            n_fail += 1
            continue
        if got_rows == exp_rows:
            print(f"PASS   {name}: {len(got_rows)} rows")
            n_pass += 1
        else:
            print(f"FAIL   {name}: rows differ "
                  f"(spark={len(got_rows)}, oracle={len(exp_rows)})")
            for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
                if g != e:
                    print(f"  first diff at row {i}:\n    spark : {g}\n    oracle: {e}")
                    break
            else:
                print(f"  row count mismatch only; spark tail: {got_rows[-1] if got_rows else None}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
