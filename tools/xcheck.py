import json, duckdb, glob, sys, hashlib
import pandas as pd
import numpy as np

# usage: xcheck.py [sfdir] [verify_out_dir] — defaults are the driver-gate shape
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for tname in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sfdir}/{tname}.parquet')")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value rendering like a hash-compare would
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, (np.integer,)):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    return rows

fails = []
for name, sql in sorted(oracles.items()):
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")], ignore_index=True)
    ora_df = con.execute(sql).df()
    a, b = canon(spark_df), canon(ora_df)
    if a == b:
        print(f"OK    {name} ({len(a)} rows)")
    else:
        status = "ROWS" if len(a) != len(b) else "VALS"
        print(f"FAIL  {name} [{status}] spark={len(a)} oracle={len(b)}")
        fails.append(name)
        if len(a) == len(b):
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"   first diff row {i}:\n    spark : {x}\n    oracle: {y}")
                    break
        else:
            print(f"   spark cols={sorted(spark_df.columns)} oracle cols={sorted(ora_df.columns)}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} match")
sys.exit(1 if fails else 0)
