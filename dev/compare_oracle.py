import duckdb, json, glob, os, sys
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(out)):
    p = os.path.join(out, name)
    if not os.path.isdir(p): continue
    files = glob.glob(p + "/*.parquet")
    if not files:
        bad.append((name, "no spark output")); continue
    spark_df = con.sql(f"SELECT * FROM '{p}/*.parquet'").df()
    if name not in oracle:
        ok.append((name, f"rows-only ({len(spark_df)})")); continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle error: {e}")); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = odf.reindex(sorted(odf.columns), axis=1)
    if list(a.columns) != list(b.columns):
        bad.append((name, f"schema: {list(a.columns)} vs {list(b.columns)}")); continue
    # list/array cells (e.g. token or code arrays) are unhashable for
    # sort_values — canonicalize to tuples first, mirroring the driver's
    # value-hash compare
    import numpy as np
    def canon(df):
        for c in df.columns:
            if df[c].map(lambda x: isinstance(x, (list, np.ndarray))).any():
                df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
        return df
    a, b = canon(a), canon(b)
    try:
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    except Exception as e:
        bad.append((name, f"sort error: {e}")); continue
    if len(a) != len(b):
        bad.append((name, f"rows: {len(a)} vs {len(b)}")); continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        ok.append((name, f"match ({len(a)} rows)"))
    except Exception as e:
        bad.append((name, "values differ: " + str(e).splitlines()[-1][:200]))
for n, m in ok: print("OK  ", n, m)
for n, m in bad: print("BAD ", n, m)
print(f"== {len(ok)} ok, {len(bad)} bad")

# Usage (replicates the driver's correctness gate locally):
#   sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
#   python3 dev/compare_oracle.py /root/testdata/sf0.01 /tmp/vout
