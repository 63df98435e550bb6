#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
compares each Spark result against DuckDB running the oracle SQL over the
same sf directory. Driver-side tooling only — the Scala library never
depends on this.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = sdf[sorted(sdf.columns)]
        ddf = ddf[sorted(ddf.columns)]
        errs = []
        if list(sdf.columns) != list(ddf.columns):
            errs.append(f"columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        elif len(sdf) != len(ddf):
            errs.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        else:
            for c in sdf.columns:
                a, b = sdf[c], ddf[c]
                try:
                    # dtype KIND must match: DuckDB HUGEINT lands in pandas as
                    # float64 (int128 overflows int64), so its value repr
                    # diverges ("3.0" vs "3") and the driver's hash fails even
                    # though astype(str) of same-kind ints agrees. Width
                    # differences (int32 vs int64) hash identically and pass
                    # the driver, so only flag kind mismatches.
                    if a.dtype.kind != b.dtype.kind:
                        errs.append(f"col {c}: dtype kind spark={a.dtype} duck={b.dtype}")
                        continue
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        bad = ~((a == b) | (a.isna() & b.isna()))
                        if bad.any():
                            mx = (a[bad] - b[bad]).abs().max()
                            errs.append(f"col {c}: {bad.sum()} fp mismatches, maxdiff={mx:.3e}")
                    else:
                        astr, bstr = a.astype(str), b.astype(str)
                        bad = astr != bstr
                        if bad.any():
                            i = bad.idxmax()
                            errs.append(f"col {c}: {bad.sum()} mismatches, first@{i}: {a[i]!r} vs {b[i]!r}")
                except Exception as e:
                    errs.append(f"col {c}: compare error {e}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
