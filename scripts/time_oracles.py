#!/usr/bin/env python3
"""Time each oracle_sql.json query in DuckDB serially (1 thread pool each,
run alone) and print a sorted cost table. Used to budget the driver's
correctness gate (Verify dump + oracle replay must fit its window).

Usage: python3 scripts/time_oracles.py <sfDir> <verifyOutDir> [only...]
"""
import sys, os, json, glob, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}

times = {}
for name, sql in sorted(oracle.items()):
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sfdir, '*.parquet')):
        tn = os.path.basename(t).replace('.parquet', '')
        con.execute(f"CREATE VIEW {tn} AS SELECT * FROM read_parquet('{t}')")
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchall())
        dt = time.time() - t0
        times[name] = dt
        print(f"{dt:8.1f}s  {name}  ({n} rows)", flush=True)
    except Exception as e:
        print(f"   FAIL   {name}: {str(e).splitlines()[0][:200]}", flush=True)
    con.close()

print("\n--- sorted by cost ---")
for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{dt:8.1f}s  {name}")
print(f"TOTAL: {sum(times.values()):.1f}s over {len(times)} queries")
