#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [only,names]

For each <name> dir in outDir: read spark parquet result, run oracle_sql.json
[name] in DuckDB with the sf tables registered as views, sort columns by name,
sort rows, round-trip to strings, compare.  Not the driver's exact code, but
the same contract (row/schema/value match).

The optional 3rd arg restricts to a comma-separated name list (local fast
loop / targeted sf1 re-checks).  Per-query progress streams to STDERR as
each oracle finishes — the sf1 gate runs >1 h and is otherwise opaque.

GRAFT_ORACLE_TIMEOUT=<seconds> (env, off by default) interrupts any single
DuckDB oracle past the budget and records it as ORACLE TIMEOUT — the
sf10 gate's escape hatch: the single-node oracle is the known scale
bottleneck (BASELINE.md round-5/8 notes), and a 100x-data recursive CTE
that would run for hours must not be reported as an ENGINE failure.
Timeouts print as [TIME] and do not fail the exit code; genuine
mismatches still do.  GRAFT_ORACLE_MEM overrides the 100GB ceiling
(PER CONNECTION — divide it when raising the worker count).

GRAFT_ORACLE_WORKERS=<n> (default 1) runs the oracles on n concurrent
connections, each with its own views and 1/n of the host threads.  The
point at scale is overlapping the TIMEOUT waits: a sequential sf10 run
pays 600 s of pure wall-clock per infeasible oracle, a 4-worker run
overlaps four of them.  DuckDB releases the GIL during execute, so
plain threads suffice.

GRAFT_ORACLE_SPILL=<size> caps each worker's spill directory via
DuckDB's max_temp_directory_size.  Default: (free /tmp space - 8GB
headroom) / workers, measured at startup — the round-12 sf10 gate
twice filled the disk because N concurrent 36GB+ spills had no
budget, poisoning six entries with IO errors AND threatening every
other process on the host.  A query that exceeds the cap is recorded
as ORACLE SPILL LIMIT (like a timeout: an oracle-feasibility verdict,
not an engine failure) and does not fail the exit code.
"""
import sys, json, glob, os, math, shutil, threading
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame):
    """Returns (string_frame, raw_frame) both sorted by the string form.
    The string form (stable %.10g) provides deterministic row ORDER and
    the schema comparison; VALUES are compared from the raw frame so no
    formatting can mask a real difference."""
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}" if v == v else "NULL"
        return str(v)
    strf = df.applymap(cell) if hasattr(df, "applymap") else df.map(cell)
    order = strf.sort_values(by=list(strf.columns)).index
    return (strf.loc[order].reset_index(drop=True),
            df.loc[order].reset_index(drop=True))

def cells_equal(x, y) -> bool:
    """Raw-value compare: floats numerically within tolerance, the rest
    by string form.  Both sides round doubles to 4 decimals (the SURVEY
    §5 contract), so the allowed difference is half the contract's
    last decimal regardless of magnitude, plus a 1e-15 relative floor
    (~4.5 double ulps): the two engines' round() implementations
    (BigDecimal vs float multiply/divide) can differ by 1 ulp on the
    SAME value, and above |value| ~ 4e11 one ulp exceeds 5e-5 — the
    floor absorbs exactly that representation noise while staying
    below a genuine last-decimal mismatch at every magnitude where 4
    decimals are representable in a double (a looser 1e-14 would
    already mask real 4th-decimal divergence around |value| ~ 1e10)."""
    xna, yna = pd.isna(x), pd.isna(y)
    if xna or yna:
        return bool(xna) and bool(yna)
    if isinstance(x, float) or isinstance(y, float):
        try:
            return math.isclose(float(x), float(y), rel_tol=1e-15, abs_tol=5e-5)
        except (TypeError, ValueError):
            return False
    return str(x) == str(y)

def main(sfdir, outdir, only=None):
    import time
    from queue import Queue, Empty
    mem = os.environ.get("GRAFT_ORACLE_MEM", "100GB")
    timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0")) or None
    workers = max(1, int(os.environ.get("GRAFT_ORACLE_WORKERS", "1")))
    spill = os.environ.get("GRAFT_ORACLE_SPILL")
    if not spill:
        # the AGGREGATE across workers must fit in the measured headroom
        # (round-13 ADVICE: a 4GB/worker floor with 4 workers on a 10GB
        # disk re-admits the disk-fill) — so per-worker is a pure floor-1
        # division of free-8GB, and when even 1GB/worker would overcommit
        # we shrink the effective concurrency assumption instead of the
        # guarantee: DuckDB never sees more than the disk holds.
        free_gb = shutil.disk_usage("/tmp").free // (1 << 30)
        spill = f"{max(1, (free_gb - 8) // workers)}GB"
        if (free_gb - 8) // workers < 1:
            print(f"[!!] /tmp headroom {free_gb}GB cannot fund {workers} "
                  f"workers at 1GB each — capping at 1GB/worker anyway; "
                  f"reduce GRAFT_ORACLE_WORKERS", file=sys.stderr, flush=True)
    print(f"[..] spill budget: {spill}/worker ({workers} workers)",
          file=sys.stderr, flush=True)

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    # a query that failed inside Verify writes no output dir — that must
    # FAIL the gate, not silently vanish from the report
    dirs = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
    for name in sorted(set(oracle) - dirs):
        results[name] = "MISSING OUTPUT (query failed in Verify?)"
    todo = Queue()
    for name in sorted(dirs):
        if not only or name in only:
            todo.put(name)
    lock = threading.Lock()

    def worker(wid):
        con = duckdb.connect()
        # the sf1-scale oracles (dedup_simhash, kmeans_fit_trace) spill
        # past DuckDB's default memory governor and die on spill disk
        # without an explicit ceiling (round-5 sf1 gate invariant)
        con.execute(f"SET memory_limit='{mem}'")
        # every in-memory connection defaults its spill storage to
        # cwd-relative .tmp — shared across THIS pool's workers and any
        # concurrently running check.py.  An interrupted oracle's spill
        # cleanup then races another connection's live spill file, and
        # the resulting duckdb::IOException escapes on a background
        # thread as C++ terminate(), killing the whole compare (observed:
        # the round-10 sf1 gate died on dedup_components' timeout).
        con.execute(
            f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}_{wid}'")
        con.execute(f"SET max_temp_directory_size='{spill}'")
        if workers > 1:
            con.execute(f"SET threads={max(1, (os.cpu_count() or 8) // workers)}")
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

        def run_oracle(sql):
            """Execute with an optional wall budget: a timer thread calls
            con.interrupt(), which surfaces as a DuckDB InterruptException
            in the executing thread.  The done-flag guards the race where
            the timer fires between fetchdf() completing and cancel() —
            an unguarded interrupt would land on the NEXT oracle's execute
            and mislabel it as a timeout."""
            if not timeout:
                return con.execute(sql).fetchdf()
            done, fired = threading.Event(), threading.Event()
            def fire():
                if not done.is_set():
                    fired.set()
                    con.interrupt()
            timer = threading.Timer(timeout, fire)
            timer.start()
            try:
                res = con.execute(sql).fetchdf()
            finally:
                done.set()
                timer.cancel()
                timer.join()
            if fired.is_set():
                # interrupt was requested but the query completed without
                # observing it — drain the pending flag so it cannot hit
                # the next oracle
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            return res

        while True:
            try:
                name = todo.get_nowait()
            except Empty:
                return
            t0 = time.time()
            d = os.path.join(outdir, name)
            files = glob.glob(f"{d}/*.parquet")
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            if name not in oracle:
                res = f"rows-only ({len(spark_df)} rows)"
            else:
                try:
                    duck_df = run_oracle(oracle[name])
                except Exception as e:
                    interrupted = "INTERRUPT" in type(e).__name__.upper() or \
                        "interrupt" in str(e).lower()
                    if timeout and interrupted:
                        res = f"ORACLE TIMEOUT ({timeout:.0f}s budget)"
                    elif "max_temp_directory_size" in str(e) \
                            or "temp directory" in str(e).lower():
                        res = f"ORACLE SPILL LIMIT ({spill} budget)"
                    else:
                        res = f"ORACLE SQL ERROR: {e}"
                    duck_df = None
                if duck_df is not None:
                    (a_str, a_raw), (b_str, b_raw) = canon(spark_df), canon(duck_df)
                    if list(a_str.columns) != list(b_str.columns):
                        res = f"SCHEMA MISMATCH spark={list(a_str.columns)} duck={list(b_str.columns)}"
                    elif len(a_str) != len(b_str):
                        res = f"ROWCOUNT MISMATCH spark={len(a_str)} duck={len(b_str)}"
                    else:
                        bad_rows = [i for i in range(len(a_raw))
                                    if not all(cells_equal(a_raw.iat[i, j], b_raw.iat[i, j])
                                               for j in range(a_raw.shape[1]))]
                        if bad_rows:
                            diffs = [f"row{j}: spark={a_str.loc[j].to_dict()} duck={b_str.loc[j].to_dict()}"
                                     for j in bad_rows[:3]]
                            res = "VALUE MISMATCH " + " | ".join(diffs)
                        else:
                            res = f"OK ({len(a_str)} rows)"
            with lock:
                results[name] = res
            print(f"[..] {name}: {res} ({time.time()-t0:.1f}s)",
                  file=sys.stderr, flush=True)

    threads = [threading.Thread(target=worker, args=(w,), daemon=True)
               for w in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    bad = timed_out = spilled = 0
    for k, v in sorted(results.items()):
        if v.startswith(("OK", "rows-only")):
            flag = "PASS"
        elif v.startswith("ORACLE TIMEOUT"):
            flag = "TIME"
            timed_out += 1
        elif v.startswith("ORACLE SPILL LIMIT"):
            flag = "SPIL"
            spilled += 1
        else:
            flag = "FAIL"
            bad += 1
        print(f"[{flag}] {k}: {v}")
    tail = f", {timed_out} oracle-timeout" if timed_out else ""
    tail += f", {spilled} oracle-spill-limit" if spilled else ""
    print(f"\n{len(results) - bad - timed_out - spilled}/{len(results)} pass{tail}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
