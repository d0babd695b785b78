#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the sf parquet tables and compare (columns sorted by name, rows
sorted, values hashed) with the Spark parquet dumps from graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: round-trip floats through repr-ish comparison
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{d}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files],
                        ignore_index=True)
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, o = norm(sdf), norm(odf)
        ok = True
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            ok = False
        elif len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            ok = False
        else:
            for c in s.columns:
                sc, oc = s[c], o[c]
                # driver-hash parity: an int column on one side vs a
                # float on the other (DuckDB widens SUM(BIGINT) to
                # HUGEINT, which pandas renders float64) hashes
                # differently in the driver even when every value is
                # numerically equal — fail it here too, unless the float
                # side carries NaN (genuine nullable-int widening, which
                # pandas applies to BOTH sides identically)
                if ({sc.dtype.kind, oc.dtype.kind} == {'i', 'f'}):
                    fside = sc if sc.dtype.kind == 'f' else oc
                    if not fside.isna().any():
                        print(f"FAIL {name}: col {c} type skew "
                              f"spark={sc.dtype} oracle={oc.dtype} "
                              f"(un-cast HUGEINT aggregate?)")
                        ok = False
                        break
                try:
                    if sc.dtype.kind == 'f' or oc.dtype.kind == 'f':
                        eq = (sc.astype('float64').fillna(-1e308)
                              == oc.astype('float64').fillna(-1e308))
                    else:
                        eq = sc.astype(str) == oc.astype(str)
                except Exception:
                    eq = sc.astype(str) == oc.astype(str)
                if not eq.all():
                    bad = (~eq)
                    i = bad.idxmax()
                    print(f"FAIL {name}: col {c}: {int(bad.sum())} diffs; "
                          f"first at row {i}: spark={sc[i]!r} oracle={oc[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
