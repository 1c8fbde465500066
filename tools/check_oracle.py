#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]

Loads each SparkEntry query result (parquet written by graft.Verify),
runs the matching oracle SQL in DuckDB over the same testdata tables,
sorts columns by name, and compares row-by-row. Reports exact equality
and (for floats) max abs diff so near-misses are visible.
"""
import duckdb, sys, json, glob, os
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver testdata = single files; ScaleProbe output = spark dirs
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    # ScaleProbe re-writes events.ts as BIGINT nanos (Spark cannot
    # write TIMESTAMP(NANOS)); normalize back to a µs timestamp so the
    # oracles' strftime/epoch_us work identically on probe data
    if name == "events":
        (t,) = [r[1] for r in con.execute("DESCRIBE events").fetchall()
                if r[0] == "ts"] or [None]
        if t == "BIGINT":
            con.execute("DROP VIEW events")
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: cols {list(sdf.columns)} vs {list(ddf.columns)}")
        n_fail += 1
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
        n_fail += 1
        continue
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        # the driver hashes values representation-aware: a DuckDB HUGEINT
        # (sum(INT)) vs Spark BIGINT, or -0.0 vs 0.0, hash-mismatch even
        # when numerically equal — so compare dtype and bit patterns too
        both_int = (pd.api.types.is_integer_dtype(a)
                    and pd.api.types.is_integer_dtype(b))
        if a.dtype != b.dtype and not both_int:
            # int32-vs-int64 is tolerated by the driver (a3 passed r02);
            # float-vs-int / object (HUGEINT) mismatches are not
            bad.append((c, f"dtype {a.dtype} vs {b.dtype} "
                           "(driver hash is representation-aware)"))
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(float).values
            bv = b.astype(float).values
            # bit-exact equality incl. signed zero (emulates driver hash)
            eq = av.view(np.int64) == bv.view(np.int64)
            if not eq.all():
                with np.errstate(invalid="ignore"):
                    m = np.nanmax(np.abs(av - bv))
                i = int(np.argmin(eq))
                bad.append((c, f"{(~eq).sum()} cells differ bit-exact, "
                               f"maxdiff={m}, row {i}: "
                               f"{av[i]!r} vs {bv[i]!r}"))
        else:
            eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append((c, f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"))
    if bad:
        print(f"FAIL {name}: " + "; ".join(f"{c} {m}" for c, m in bad))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(sdf)} rows)")
        n_pass += 1

missing = [q for q in oracle if not os.path.isdir(f"{out}/{q}")]
print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
sys.exit(1 if n_fail else 0)
