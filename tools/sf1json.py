#!/usr/bin/env python3
"""Convert tools/check.py's [PASS]/[FAIL] report lines into the driver's
CORRECTNESS json shape, so the full-suite sf1 gate lands as one artifact
(round-6 verdict item 1: CORRECTNESS_SF1_r{N}.json).

Usage: python3 tools/sf1json.py <check-output-log> <out.json>
"""
import json, re, sys

def main(log_path, out_path):
    results = {}
    pat = re.compile(r"^\[(PASS|FAIL|TIME)\] ([\w]+): (.*)$")
    rows_pat = re.compile(r"\((\d+) rows\)")
    for line in open(log_path):
        m = pat.match(line.strip())
        if not m:
            continue
        flag, name, msg = m.groups()
        rows = rows_pat.search(msg)
        n = int(rows.group(1)) if rows else None
        if flag == "PASS" and msg.startswith("OK"):
            results[name] = {"rows_match": True, "schema_match": True,
                             "hash_match": True, "spark_rows": n,
                             "oracle_rows": n, "err": None}
        elif flag == "PASS":  # rows-only
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": n,
                             "oracle_rows": None, "err": "no_oracle"}
        elif flag == "TIME":  # oracle infeasible at this scale, not an
            # engine failure (the single-node DuckDB oracle is the
            # known sf10 bottleneck — BASELINE.md round-5/8 notes)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": n,
                             "oracle_rows": None, "err": "oracle_timeout"}
        else:
            results[name] = {"rows_match": False, "schema_match": None,
                             "hash_match": False, "spark_rows": n,
                             "oracle_rows": None, "err": msg[:400]}
    with open(out_path, "w") as f:
        json.dump(dict(sorted(results.items())), f, indent=2)
    npass = sum(1 for v in results.values() if v["err"] in (None, "no_oracle"))
    print(f"{out_path}: {npass}/{len(results)} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
