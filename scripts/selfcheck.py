#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (NOT part of the
library — dev tooling only). Runs after `sbt "runMain graft.Verify <sf> <out>"`:
loads each <out>/<name> parquet, runs the matching oracle_sql.json entry in
DuckDB over the same testdata parquet tables, sorts columns by name, and
compares values exactly. Usage: selfcheck.py <sfDir> <outDir> [keyFilter]"""
import sys, os, json, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
keyfilter = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        # Spark-written table: a directory of part files (the synthesized
        # 10x dirs; the driver's testdata is single-file)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if v is None or v is pd.NaT: return None
    if isinstance(v, (int, bool, str)): return v
    try:
        import numpy as np
        if isinstance(v, np.ndarray): return tuple(norm_cell(x) for x in v)
        if isinstance(v, (np.integer,)): return int(v)
        if isinstance(v, (np.floating,)): return float(v)
        if isinstance(v, (np.bool_,)): return bool(v)
    except ImportError: pass
    return str(v)

def norm_df(df):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]

fails, passes, skips = [], 0, 0
for name in sorted(oracle):
    if keyfilter and keyfilter not in name: continue
    res_path = f"{outdir}/{name}"
    if not os.path.isdir(res_path):
        fails.append((name, "NO SPARK RESULT")); continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{res_path}/*.parquet'").df()
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"LOAD/SQL ERROR: {e}")); continue
    # The driver's comparator crashes on array/map-typed result cells
    # (pandas sort_values → "unhashable type: numpy.ndarray"), so any
    # nested-typed output column is a DRIVER FAIL even though we could
    # normalize it locally. Reject it here so local green == driver green.
    import numpy as np
    nested = [c for df in (spark_df, duck_df) for c in df.columns
              if df[c].map(lambda v: isinstance(v, (list, tuple, dict, np.ndarray))).any()]
    if nested:
        fails.append((name, f"NESTED-TYPED COLUMNS (driver comparator would crash): {sorted(set(nested))} — flatten with array_join/to_json"))
        continue
    # The driver's hash is dtype-sensitive: a DuckDB HUGEINT column (any
    # sum()/list_sum output) lands in pandas as float64 while the Spark
    # parquet is int64 — values compare equal under Python == but the
    # driver hash-mismatches. Reject any column whose pandas kind
    # (int/float/bool/object/datetime) differs so local green == driver green.
    common = set(spark_df.columns) & set(duck_df.columns)
    dtype_bad = sorted(
        c for c in common
        if spark_df[c].dtype.kind != duck_df[c].dtype.kind)
    if dtype_bad:
        detail = {c: (str(spark_df[c].dtype), str(duck_df[c].dtype)) for c in dtype_bad}
        fails.append((name, f"DTYPE KIND mismatch (driver hash is dtype-sensitive): {detail} — cast the oracle column (e.g. ::BIGINT for HUGEINT sums)"))
        continue
    a, b = norm_df(spark_df), norm_df(duck_df)
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        fails.append((name, f"SCHEMA: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
    elif len(a) != len(b):
        fails.append((name, f"ROWCOUNT: spark={len(a)} duck={len(b)}"))
    elif a != b:
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        fails.append((name, f"VALUES differ, first diffs: {diffs}"))
    else:
        passes += 1
        print(f"  PASS {name} ({len(a)} rows)")

print(f"\n== {passes} pass, {len(fails)} fail ==")
for name, why in fails:
    print(f"  FAIL {name}: {why[:500]}")
sys.exit(1 if fails else 0)
