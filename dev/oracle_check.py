#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare — DEV TOOL ONLY
(runs on the driver-side python stack: duckdb/pyarrow/pandas; the Scala
library never imports it).

Usage: oracle_check.py <sfDir> <verifyOutDir> [comma-separated query names]
after `sbt "runMain graft.Verify <sfDir> <verifyOutDir> [names]"`.
Reads oracle_sql.json + per-query parquet dirs from verifyOutDir, runs each
oracle SQL in DuckDB with tables registered as views over sfDir parquet,
compares rows / schema (sorted column names) / value hash. Exit 0 = all
oracled queries match.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

bad, miss, ok = [], [], 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        miss.append(name); continue
    try:
        spark_df = pq.read_table(d).to_pandas()
        o_df = con.execute(sql).fetchdf()
        r = len(spark_df) == len(o_df)
        s = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, o_df.columns))
        h = canon(spark_df) == canon(o_df) if (r and s) else False
        if r and s and h:
            ok += 1
        else:
            bad.append((name, len(spark_df), len(o_df), r, s, h))
    except Exception as e:
        bad.append((name, -1, -1, False, False, str(e)[:200]))

# queries with no oracle: rows-only
no_oracle = [n for n in os.listdir(out)
             if os.path.isdir(os.path.join(out, n)) and n not in oracle]
print(f"OK={ok}  BAD={len(bad)}  MISSING_OUTPUT={len(miss)}  NO_ORACLE={len(no_oracle)}")
for b in bad:
    print("BAD:", b)
for m in miss:
    print("MISSING:", m)
if no_oracle:
    print("NO_ORACLE (rows-only):", sorted(no_oracle))
sys.exit(1 if bad or miss else 0)
