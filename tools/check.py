#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

For each <name> dir in outDir: read spark parquet result, run oracle_sql.json
[name] in DuckDB with the sf tables registered as views, sort columns by name,
sort rows, round-trip to strings, compare.  Not the driver's exact code, but
the same contract (row/schema/value match).
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr-ish canonical form
    def cell(v):
        if pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}" if v == v else "NULL"
        return str(v)
    out = df.applymap(cell) if hasattr(df, "applymap") else df.map(cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def cells_equal(x: str, y: str) -> bool:
    """String-equal, or numerically equal within tolerance.  Both sides
    already round doubles to 4 decimals (the SURVEY §5 contract), so the
    tolerance only has to absorb representation noise from the round()
    itself — rel 1e-12 — plus an absolute floor at half the contract's
    last decimal; a genuine 4th-decimal mismatch still fails."""
    if x == y:
        return True
    try:
        fx, fy = float(x), float(y)
    except ValueError:
        return False
    return math.isclose(fx, fy, rel_tol=1e-12, abs_tol=5e-5)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    # a query that failed inside Verify writes no output dir — that must
    # FAIL the gate, not silently vanish from the report
    dirs = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
    for name in sorted(set(oracle) - dirs):
        results[name] = "MISSING OUTPUT (query failed in Verify?)" 
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
        elif not a.equals(b):
            neq = pd.Series([
                not all(cells_equal(a.iat[i, j], b.iat[i, j])
                        for j in range(a.shape[1]))
                for i in range(len(a))], index=a.index)
            if not neq.any():
                results[name] = f"OK ({len(a)} rows, within float tolerance)"
                continue
            idx = neq[neq].index[:3]
            diffs = [f"row{j}: spark={a.loc[j].to_dict()} duck={b.loc[j].to_dict()}" for j in idx]
            results[name] = "VALUE MISMATCH " + " | ".join(diffs)
        else:
            results[name] = f"OK ({len(a)} rows)"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith(("OK", "rows-only")) else "FAIL"
        bad += flag == "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
