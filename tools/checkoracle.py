#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read graft.Verify output
(outDir/<name>/ parquet + outDir/oracle_sql.json), run each oracle SQL in
DuckDB over the sfDir parquet tables, and compare row/schema/values.

Usage: python3 tools/checkoracle.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def load_tables(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize floats
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        if df[c].dtype.kind == "i":
            df[c] = df[c].astype("int64")
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # resume state (set when re-exec'd after a process-level DuckDB failure):
    # [startName, nPass, nFail, retriesOnStartName]
    start_name = sys.argv[3] if len(sys.argv) > 3 else ""
    n_pass = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    n_fail = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    retries = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    con = duckdb.connect()
    # explicit limit: DuckDB sizes its default off memory AVAILABLE AT START,
    # which is transiently tiny right after the Spark JVM exits — the cause of
    # spurious "Out of Memory Error" on the last few oracles when chained
    # 8GB covers sf0.01 (the driver gate scale); q88's recursive closure at
    # sf0.1 needs ~10-40GB. Size from TOTAL RAM, not available: available
    # memory is transiently tiny right after the Spark JVM exits (the exact
    # pathology the explicit limit exists to avoid).
    total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (1 << 30)
    con.execute(f"SET memory_limit='{max(8, min(40, int(total_gb * 0.35)))}GB'")
    load_tables(con, sf_dir)
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    first = True
    for name, sql in sorted(oracles.items()):
        if start_name and name < start_name:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; first = False; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(spark_dir + "/*.parquet"))])
            try:
                want = con.execute(sql).fetchdf()
            except Exception as inner:
                # DuckDB sporadically reports OOM late in a long run even at
                # tiny allocations with plenty free — and the broken state is
                # PROCESS-level (a fresh in-process connection fails too) and
                # briefly time-correlated. Re-exec from this oracle in a
                # clean process (short backoff), carrying the counts; after 3
                # fresh-process failures on the SAME oracle the failure is
                # real — fall through and record it.
                next_retries = retries + 1 if start_name == name else 1
                if next_retries <= 3:
                    sys.stdout.flush()
                    import time
                    time.sleep(2 * next_retries)
                    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__),
                                              sf_dir, out_dir, name, str(n_pass), str(n_fail),
                                              str(next_retries)])
                raise inner
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; first = False; continue
        first = False
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:\n spark:\n{g[diff].head(3)}\n oracle:\n{w[diff].head(3)}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
