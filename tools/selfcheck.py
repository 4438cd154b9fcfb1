#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [q1,q2,...]

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered from sfDir), and compare schema (column names), row count,
and cell values (sorted columns, row order as produced).
"""
import json, math, sys
import duckdb

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os as _os
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # testdata tables are single files; derived rehearsal sets
        # (graft.ScaleGen) write multi-file directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if _os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import glob, os
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        got = con.sql(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.sql(
            f"SELECT * FROM '{qdir}/*.parquet' LIMIT 0").description]
        if name not in oracle:
            print(f"SKIP  {name:24s} rows={len(got)} (no oracle)")
            n_skip += 1
            continue
        exp = con.sql(oracle[name]).fetchall()
        exp_desc = con.sql(oracle[name]).description
        exp_cols = [d[0] for d in exp_desc]
        # The driver canonicalizes via pandas dtypes, where DuckDB HUGEINT
        # (e.g. sum(INTEGER)) becomes float64 and hash-mismatches Spark's
        # int64 even when fetchall() values compare equal. Flag it here.
        huge = [c for c, dt in zip(exp_cols,
                con.sql(oracle[name]).fetchdf().dtypes)
                if str(dt) == "float64" and any(
                    type(r[exp_cols.index(c)]) is int
                    for r in exp[:5] if r[exp_cols.index(c)] is not None)]
        if huge:
            print(f"WARN  {name:24s} oracle cols {huge} fetch as float64 "
                  f"but hold ints (HUGEINT?) — CAST(... AS BIGINT)")
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL  {name:24s} cols {sorted(got_cols)} != {sorted(exp_cols)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL  {name:24s} rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for rn, (g, e) in enumerate(zip(got, exp)):
                gr = [canon(g[i]) for i in gi]
                er = [canon(e[i]) for i in ei]
                if gr != er:
                    print(f"FAIL  {name:24s} row {rn}: {gr} != {er}")
                    ok = False
                    break
        if ok:
            print(f"PASS  {name:24s} rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
