#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
entry in DuckDB against the same parquet tables, compare with the engine's
parquet dump (sorted columns, sorted rows), report exact/allclose/mismatch.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import math

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(os.path.join(sfdir, '*.parquet')):
    name = os.path.basename(t).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
# optional: restrict to the named queries (fast iteration on new operators)
only = set(sys.argv[3:])
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t)), [cols[i] for i in order]

def eq(a, b, tol):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return tol > 0 and abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y, tol) for x, y in zip(a, b))
    return a == b

fails = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(outdir, name)
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: engine output missing")
        fails += 1
        continue
    tbl = pq.read_table(pdir)
    got_cols = tbl.column_names
    got_rows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
    try:
        res = con.execute(sql)
        exp_cols = [d[0] for d in res.description]
        exp_rows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:300]}")
        fails += 1
        continue
    g, gc = norm(got_rows, got_cols)
    e_, ec = norm(exp_rows, exp_cols)
    if gc != ec:
        print(f"FAIL {name}: column mismatch engine={gc} oracle={ec}")
        fails += 1
        continue
    if len(g) != len(e_):
        print(f"FAIL {name}: row count engine={len(g)} oracle={len(e_)}")
        fails += 1
        continue
    exact = sum(1 for x, y in zip(g, e_) if eq(x, y, 0.0))
    close = sum(1 for x, y in zip(g, e_) if eq(x, y, 1e-9))
    if exact == len(g):
        print(f"OK   {name}: {len(g)} rows bitwise-equal")
    elif close == len(g):
        print(f"OK~  {name}: {len(g)} rows allclose (bitwise {exact}/{len(g)})")
    else:
        fails += 1
        print(f"FAIL {name}: {len(g)-close}/{len(g)} rows differ (bitwise {exact})")
        shown = 0
        for x, y in zip(g, e_):
            if not eq(x, y, 1e-9) and shown < 3:
                for i, cn in enumerate(gc):
                    if not eq(x[i], y[i], 1e-9):
                        print(f"   col {cn}: engine={x[i]!r} oracle={y[i]!r}")
                shown += 1
print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
