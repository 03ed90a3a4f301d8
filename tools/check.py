#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles. Dev tooling only — the shipped library is pure
Scala/Spark."""
import sys, json, glob, duckdb, pandas as pd, hashlib

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    try:
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA mismatch spark={list(s.columns)} oracle={list(o.columns)}"); fails += 1; continue
    if len(s) != len(o):
        print(f"{name}: ROWS mismatch spark={len(s)} oracle={len(o)}"); fails += 1; continue
    if [str(t) for t in s.dtypes] != [str(t) for t in o.dtypes]:
        print(f"{name}: DTYPES differ spark={list(s.dtypes)} oracle={list(o.dtypes)}")
    hs = hashlib.md5(s.to_csv(index=False).encode()).hexdigest()
    ho = hashlib.md5(o.to_csv(index=False).encode()).hexdigest()
    if hs != ho:
        # Float columns are rounded to 6dp in each engine independently, so a
        # reduction-order difference near a .5 boundary at the 7th digit can
        # flip the 6th decimal. Fall back to allclose before declaring a miss.
        import numpy as np
        floatcols = [c for c in s.columns if str(s[c].dtype).startswith("float")]
        if floatcols:
            # re-sort by the NON-float columns first: canon() sorts by
            # alphabetical column order, so a float column that sorts before
            # the key (pagerank value<vid) would misalign rows whose floats
            # differ — exactly the rows this fallback exists to tolerate
            others = [c for c in s.columns if c not in floatcols]
            s2 = s.sort_values(by=others + floatcols).reset_index(drop=True) if others else s
            o2 = o.sort_values(by=others + floatcols).reset_index(drop=True) if others else o
            exact_ok = all(s2[c].equals(o2[c]) for c in others)
            close_ok = all(np.allclose(s2[c].to_numpy(), o2[c].to_numpy(),
                                       atol=2e-6, rtol=0, equal_nan=True)
                           for c in floatcols)
            if exact_ok and close_ok:
                print(f"{name}: OK ({len(s)} rows, float allclose)")
                continue
    if hs != ho:
        diff = (s != o)
        ndiff = diff.any(axis=1).sum()
        print(f"{name}: HASH mismatch ({ndiff} differing rows of {len(s)})")
        bad = s[diff.any(axis=1)]
        badorc = o[diff.any(axis=1)]
        print("  spark:", bad.head(3).to_dict("records"))
        print("  oracle:", badorc.head(3).to_dict("records"))
        fails += 1
    else:
        print(f"{name}: OK ({len(s)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
