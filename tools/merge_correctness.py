#!/usr/bin/env python3
"""Merge a TARGETED tools/check.py run into an existing CORRECTNESS
artifact: each [PASS]/[FAIL]/[TIME] line in the log replaces that
query's entry (same record shape as tools/sf1json.py). The use case is
the patch-after-the-gate flow: an entry poisoned by infra (a concurrent
oracle filling the disk) or a post-freeze operator re-checked with a
targeted HEAD-jar run lands in the committed artifact without re-running
the whole multi-hour gate.

Usage: python3 tools/merge_correctness.py <artifact.json> <check-log>
                [--allow-new]
Prints the updated tally and each entry's old->new flag transition;
writes in place (sorted keys, indent 2 — the sf1json.py format, so
diffs stay minimal).  A log name NOT already present in the artifact
is REFUSED unless --allow-new is passed: a typo'd or truncated log
line must not silently add a phantom entry and inflate the tally
(round-12 advice).
"""
import json, re, sys

def record_of(flag, msg, n):
    if flag == "PASS" and msg.startswith("OK"):
        return {"rows_match": True, "schema_match": True, "hash_match": True,
                "spark_rows": n, "oracle_rows": n, "err": None}
    if flag == "PASS":  # rows-only
        return {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": n, "oracle_rows": None, "err": "no_oracle"}
    if flag == "TIME":
        return {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": n, "oracle_rows": None, "err": "oracle_timeout"}
    if flag == "SPIL":
        return {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": n, "oracle_rows": None, "err": "oracle_spill_limit"}
    return {"rows_match": False, "schema_match": None, "hash_match": False,
            "spark_rows": n, "oracle_rows": None, "err": msg[:400]}

def flag_of(rec):
    if rec is None:
        return "ABSENT"
    if rec.get("hash_match"):
        return "PASS"
    return {None: "FAIL", "no_oracle": "ROWS", "oracle_timeout": "TIME",
            "oracle_spill_limit": "SPIL"}.get(rec.get("err"), "FAIL")

def main(artifact, log_path, allow_new=False):
    d = json.load(open(artifact))
    pat = re.compile(r"^\[(PASS|FAIL|TIME|SPIL)\] ([\w]+): (.*)$")
    rows_pat = re.compile(r"\((\d+) rows\)")
    merged = []
    for line in open(log_path):
        m = pat.match(line.strip())
        if not m:
            continue
        flag, name, msg = m.groups()
        if name not in d and not allow_new:
            sys.exit(f"REFUSED: '{name}' is not a key in {artifact} — "
                     f"typo'd/truncated log line, or a genuinely new query "
                     f"(re-run with --allow-new)")
        rows = rows_pat.search(msg)
        new = record_of(flag, msg, int(rows.group(1)) if rows else None)
        print(f"  {name}: {flag_of(d.get(name))} -> {flag_of(new)}")
        d[name] = new
        merged.append(f"{name}={flag}")
    with open(artifact, "w") as f:
        json.dump(dict(sorted(d.items())), f, indent=2)
    green = sum(1 for v in d.values() if v.get("hash_match"))
    noor = sum(1 for v in d.values() if v.get("err") == "no_oracle")
    time = sum(1 for v in d.values() if v.get("err") == "oracle_timeout")
    spil = sum(1 for v in d.values() if v.get("err") == "oracle_spill_limit")
    bad = len(d) - green - noor - time - spil
    print(f"merged [{', '.join(merged)}] -> {artifact}: {len(d)} entries, "
          f"{green} green, {noor} rows-only, {time} timeouts, "
          f"{spil} spill-limit, {bad} other")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], "--allow-new" in sys.argv[3:])
