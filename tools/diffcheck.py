#!/usr/bin/env python3
"""Local differential check: replays the driver's t2 gate.

Reads Verify output (<out>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf dir, compares row count, column
names, and values. Driver-side tooling only (not part of the library).
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# Heavy oracles (the 3-iteration recursive-CTE pagerank over 60M edge
# rows at the 10x dataset) need to spill: give DuckDB an explicit
# disk-backed temp dir (default is cwd-relative and at 10x once
# exhausted it mid-replay) and most of RAM before spilling.
_tmp = os.environ.get("DIFFCHECK_TMP", "/tmp/duckdb_spill")
os.makedirs(_tmp, exist_ok=True)
con.execute(f"SET temp_directory='{_tmp}'")
con.execute("SET memory_limit='90GB'")
def _pq_source(p):
    # driver testdata tables are single files; Spark-written tables
    # (e.g. a ScaleUp 10x dir) are DIRECTORIES of part files
    return os.path.join(p, "*.parquet") if os.path.isdir(p) else p


for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{_pq_source(p)}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# Queries that THREW in Verify either have no output dir (silently absent
# from this compare) or — with a reused out-dir — stale parquet from a
# prior run that would count as ok. Surface each as a FAIL and skip any
# leftover dir so the totals reflect Verify's real outcome.
vf_path = os.path.join(out_dir, "verify_failures.json")
verify_failed = json.load(open(vf_path)) if os.path.exists(vf_path) else {}
# warn-level: input-table schema drift vs the pinned expectation
# (graft.registry.ExpectedSchemas) — the r8 type-rotation failure class
sd_path = os.path.join(out_dir, "schema_drift.json")
schema_drift = json.load(open(sd_path)) if os.path.exists(sd_path) else {}
for tbl, rec in sorted(schema_drift.items()):
    print(f"  [WARN-SCHEMA-DRIFT] {tbl}: observed {rec['observed']!r}, "
          f"accepted {rec['accepted']}")
fail = ok = skip = 0
for name, msg in sorted(verify_failed.items()):
    print(f"  [FAIL-VERIFY] {name}: {msg[:160]}")
    fail += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d) or name in verify_failed:
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        skip += 1
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"  [FAIL-SQL] {name}: {e}")
        fail += 1
        continue
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
    elif len(spark_df) != len(duck_df):
        problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
    else:
        s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
        k = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
        for c in s.columns:
            a, b = s[c], k[c]
            if a.dtype.kind == 'M' or b.dtype.kind == 'M':
                a = pd.to_datetime(a).astype('datetime64[us]')
                b = pd.to_datetime(b).astype('datetime64[us]')
                eq = (a == b) | (a.isna() & b.isna())
            elif a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.astype(float), b.astype(float)
                eq = (av == bv) | (av.isna() & bv.isna()) | (np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            else:
                eq = (a.astype(object) == b.astype(object)) | (a.isna() & b.isna())
            if not eq.all():
                i = int(np.argmin(eq.values))
                problems.append(f"col {c} first-mismatch row {i}: spark={s[c].iloc[i]!r} duck={k[c].iloc[i]!r}")
        # dtype advisory (driver may compare schemas)
        for c in s.columns:
            if str(s[c].dtype) != str(k[c].dtype):
                problems.append(f"DTYPE-WARN {c}: spark={s[c].dtype} duck={k[c].dtype}")
    hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
    if hard:
        print(f"  [FAIL] {name}: " + "; ".join(problems[:4]))
        fail += 1
    else:
        warn = "; ".join(p for p in problems if p.startswith("DTYPE-WARN"))
        print(f"  [ok] {name}: {len(spark_df)} rows" + (f"  ({warn})" if warn else ""))
        ok += 1
print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
sys.exit(1 if fail else 0)
