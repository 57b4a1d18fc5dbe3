#!/usr/bin/env python3
"""Local correctness harness (dev tool only — mimics the driver's gate).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, runs the matching oracle
SQL from oracle_sql.json in DuckDB against the same parquet tables,
sorts columns by name, sorts rows, and hash-compares values.

Usage: python3 tools/check.py <sfDir> <outDir>

CHECK_TIMEOUT_S (env, default 900): per-oracle wall budget. DuckDB's
plan choice is run-variant at sf1 (round 19: q137's unchanged oracle
ground 2+ h on a run that historically took minutes), so one
pathological plan must never serialize the whole sweep — an oracle
past its budget is interrupted and reported as TIMEOUT(name), counted
as a failure, and the sweep moves on. Set 0 to disable.
"""
import sys, os, json, hashlib, threading
import duckdb

TIMEOUT_S = float(os.environ.get("CHECK_TIMEOUT_S", "900"))

def run_with_timeout(con, fn, fired_out):
    """fn(con) under the per-oracle budget: a watchdog thread calls
    con.interrupt() at the deadline, which makes the in-flight DuckDB
    call raise InterruptException promptly.

    `fired_out` (a list) receives True when the watchdog called
    interrupt() — on BOTH the return and the raise path (set in the
    finally, after join(), so it is final). If the watchdog fired but
    fn() did not raise InterruptException (it finished or failed
    otherwise at ~TIMEOUT_S, racing the watchdog), the interrupt flag
    may still be pending on the shared connection and would cancel the
    NEXT query — the caller must discard and recreate the
    connection."""
    if TIMEOUT_S <= 0:
        return fn(con)
    done = threading.Event()
    fired = threading.Event()
    def watchdog():
        if not done.wait(TIMEOUT_S):
            fired.set()
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return fn(con)
    finally:
        done.set()
        t.join()
        # after join() `fired` is final: no late interrupt can hit
        # the connection past this point
        if fired.is_set():
            fired_out.append(True)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def df_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace")); h.update(b"\n")
    return h.hexdigest()

def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (e.g. fixtures/sf1)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        fired = []
        try:
            def fetch_both(c):
                spark_rel = c.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
                s_cols = [x.lower() for x in spark_rel.columns]
                s_rows = spark_rel.fetchall()
                duck_rel = c.sql(sql)
                d_cols = [x.lower() for x in duck_rel.columns]
                d_rows = duck_rel.fetchall()
                return s_cols, s_rows, d_cols, d_rows
            s_cols, s_rows, d_cols, d_rows = \
                run_with_timeout(con, fetch_both, fired)
            if fired:
                # the oracle finished at ~TIMEOUT_S racing the watchdog:
                # a stale interrupt flag may be pending on the shared
                # connection and would misreport the NEXT oracle as
                # TIMEOUT — discard the possibly-poisoned connection
                print(f"WARN {name}: watchdog fired but oracle "
                      "completed; recreating connection")
                con.close()
                con = connect(sf_dir)
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT_S:.0f}s "
                  "(pathological DuckDB plan? counted as FAIL)")
            n_fail += 1; continue
        except Exception as e:
            if fired:
                # watchdog fired during a non-interrupt failure: the
                # stale flag could poison the next oracle — recreate
                con.close()
                con = connect(sf_dir)
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}"); n_fail += 1; continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1; continue
        # dtype parity (INTEGER vs BIGINT etc.) in case the driver's
        # schema compare is type-strict
        s_types = {r[0].lower(): r[1] for r in
                   con.sql(f"DESCRIBE SELECT * FROM '{res_dir}/*.parquet'").fetchall()}
        d_types = {r[0].lower(): r[1] for r in con.sql(f"DESCRIBE {sql}").fetchall()}
        badtypes = [(c, s_types[c], d_types[c]) for c in s_types
                    if c in d_types and s_types[c] != d_types[c]]
        if badtypes:
            print(f"FAIL {name}: dtype mismatch {badtypes}")
            n_fail += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1; continue
        hs, hd = df_hash(s_rows, s_cols), df_hash(d_rows, d_cols)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            oi = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            sset = sorted("\x01".join(canon(r[i]) for i in oi) for r in s_rows)
            od = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            dset = sorted("\x01".join(canon(r[i]) for i in od) for r in d_rows)
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"  spark: {a[:180]}\n  duck : {b[:180]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
