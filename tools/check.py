#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), creates
DuckDB views named after each table over <sfDir>/*.parquet, runs each
oracle SQL, and compares against the Spark parquet output at
<verifyOutDir>/<query>/. Column names are sorted before comparison
(matching the driver's described hashing). Exact value equality expected
(queries round order-sensitive floats themselves).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0
        return repr(v + 0.0)
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                raise AssertionError(
                    f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            if len(exp) != len(got):
                raise AssertionError(f"row counts differ: oracle={len(exp)} spark={len(got)}")
            for c in exp.columns:
                ev = [norm_cell(v) for v in exp[c].tolist()]
                gv = [norm_cell(v) for v in got[c].tolist()]
                if ev != gv:
                    bad = next(i for i in range(len(ev)) if ev[i] != gv[i])
                    raise AssertionError(
                        f"col '{c}' differs at row {bad}: oracle={ev[bad]} spark={gv[bad]}"
                        f" (total {sum(1 for a,b in zip(ev,gv) if a!=b)} diffs)")
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
