#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the sf tables and compare (exactly) with the parquet
dumped by graft.Verify. Columns sorted by name, rows compared as-is.

Driver parity: the driver's value hash is DTYPE-SENSITIVE, so a DuckDB
HUGEINT (-> pandas float64) against a Spark int64 fails there even when
every value is equal. We therefore fail on any dtype-kind or dtype-width
mismatch per column, after canonicalizing timestamp precision (ns vs us
is a storage artifact, both sides are normalized to datetime64[us]).
Usage: compare_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{out}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name)
        continue
    try:
        got = pd.read_parquet(pdir).reindex(sorted(pd.read_parquet(pdir).columns), axis=1)
        want = con.sql(sql).df()
        want = want.reindex(sorted(want.columns), axis=1)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails.append(name)
        continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails.append(name)
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        fails.append(name)
        continue
    # canonicalize timestamp precision before the strict dtype check
    for df in (got, want):
        for c in df.columns:
            if df[c].dtype.kind == 'M':
                df[c] = df[c].astype('datetime64[us]')
    ok = True
    for c in got.columns:
        da, db = got[c].dtype, want[c].dtype
        if da != db and not (da == object and db == object):
            # driver's value hash is dtype-sensitive: int64 vs float64
            # (DuckDB HUGEINT), int32 vs int64 etc. must fail here too
            print(f"FAIL {name}: col {c} dtype {da} vs {db}")
            ok = False
    if not ok:
        fails.append(name)
        continue
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            same = (pd.isna(a) & pd.isna(b)) | (a == b)
        else:
            # list/array cells (numpy arrays from parquet, lists from duckdb)
            # break elementwise ==; canonicalize to tuples first
            def canon(x):
                if isinstance(x, (list, tuple)) or (hasattr(x, "tolist") and getattr(x, "ndim", 0) > 0):
                    return tuple(x.tolist() if hasattr(x, "tolist") else x)
                try:
                    if x is None or pd.isna(x):  # covers None, NaN, NaT
                        return "\0NULL"
                except (TypeError, ValueError):
                    pass
                return x
            same = pd.Series([canon(x) for x in a], dtype=object).to_numpy() == \
                   pd.Series([canon(x) for x in b], dtype=object).to_numpy()
        if not np.all(same):
            bad = np.where(~same)[0][:3]
            print(f"FAIL {name}: col {c} mismatch at rows {bad.tolist()}: "
                  f"got {a[bad].tolist()} want {b[bad].tolist()}")
            ok = False
    if not ok:
        fails.append(name)
    else:
        print(f"PASS {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(set(fails))}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
