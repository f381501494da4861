#!/usr/bin/env python3
"""Exact (bitwise) comparison of two Verify output dirs — catches
run-to-run nondeterminism (unstable ordering, ties, float drift) that
could flake the driver's hash gate.
Usage: python3 tools/determinism.py <outDirA> <outDirB>
"""
import sys, glob
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted({p.split("/")[-1] for p in glob.glob(f"{a_dir}/*") if not p.endswith(".json")})
bad = 0
for n in names:
    fa = glob.glob(f"{a_dir}/{n}/*.parquet")
    fb = glob.glob(f"{b_dir}/{n}/*.parquet")
    if not fa or not fb:
        print(f"MISS {n}"); bad += 1; continue
    try:
        d1 = con.sql(f"SELECT * FROM read_parquet({fa!r}) EXCEPT ALL SELECT * FROM read_parquet({fb!r})").df()
        d2 = con.sql(f"SELECT * FROM read_parquet({fb!r}) EXCEPT ALL SELECT * FROM read_parquet({fa!r})").df()
    except Exception as e:
        print(f"ERR {n}: {e}"); bad += 1; continue
    if len(d1) or len(d2):
        print(f"DIFF {n}: {len(d1)}/{len(d2)} rows differ\n{d1.head(3)}")
        bad += 1
print(f"== {len(names) - bad} identical, {bad} differ ==")
sys.exit(1 if bad else 0)
