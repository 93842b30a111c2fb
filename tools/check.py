#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Reads each <outdir>/<name> parquet dir written by graft.Verify and compares
it to the DuckDB result of <outdir>/oracle_sql.json's SQL over the same
scale-factor tables. Columns sorted by name, rows sorted by all columns,
exact value compare (floats: bit-exact or tiny-ulp report).

This script is developer tooling only — the Scala library has no Python
dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

con = duckdb.connect()
for p in Path(SF).glob("*.parquet"):
    con.execute(
        f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = ("f", repr(v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(("" if v is None else str(v)) for v in t))
    return [sorted(cols)], out

fails = []
for name, sql in sorted(oracle.items()):
    pdir = OUT / name
    if not pdir.exists():
        fails.append((name, "no spark output"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
    gdesc = got.description
    gcols = [d[0] for d in gdesc]
    grows = got.fetchall()
    try:
        exp = con.execute(sql)
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    ecols = [d[0] for d in exp.description]
    erows = exp.fetchall()
    # The driver's hasher is type-sensitive: DuckDB HUGEINT (from
    # sum(BIGINT)/list_sum) vs Spark BIGINT hash-mismatches even when every
    # value is equal. Catch the type skew locally.
    gtypes = dict(zip(gcols, [str(d[1]) for d in gdesc]))
    etypes = dict(zip(ecols, [str(d[1]) for d in exp.description]))
    tmism = {c: (gtypes[c], etypes[c]) for c in gtypes
             if c in etypes and gtypes[c] != etypes[c]}
    if tmism:
        fails.append((name, f"column TYPES differ (driver hash is "
                      f"type-sensitive): {tmism}"))
        continue
    gc, gr = norm(grows, gcols)
    ec, er = norm(erows, ecols)
    if gc != ec:
        fails.append((name, f"columns differ: spark={gc} duckdb={ec}"))
        continue
    if len(gr) != len(er):
        fails.append((name, f"rowcount differ: spark={len(gr)} duckdb={len(er)}"))
        continue
    bad = [(a, b) for a, b in zip(gr, er) if a != b]
    if bad:
        fails.append((name, f"{len(bad)}/{len(gr)} rows differ; first: "
                      f"spark={bad[0][0]} duckdb={bad[0][1]}"))
    else:
        print(f"OK   {name}  ({len(gr)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} match")
sys.exit(1 if fails else 0)
