#!/usr/bin/env python3
"""sf1 oracle gate (r13 verdict item 4): the driver's DuckDB value gate
tops out at sf0.1, so sf1 evidence was engine-only. This runs the same
compare as check.py over the ScaleData-built sf1 replica for whatever
subset graft.Verify dumped (SPARK_GRAFT_ONLY) — directory-style parquet,
so views glob part files. Names in oracle_sql.json without a dumped
output dir are SKIPPED (subset mode), not failed.
Usage: check_sf1.py <sfDir> <verifyOutDir>"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# r15: the r14 gate skipped the text/dedup families as "DuckDB temp-disk
# bound" — that bound was DEFAULT-config duckdb. Give the oracle the
# resources the box actually has (the gate is a judge-grade offline
# check, not a production job): a large memory budget keeps the
# recursive-CTE / explode-heavy oracles out of temp spill entirely, and
# an explicit spill dir with room bounds the rest.
tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_tmp")
os.makedirs(tmp, exist_ok=True)
con.execute(f"SET temp_directory='{tmp}'")
con.execute("SET memory_limit='80GB'")
con.execute("SET max_temp_directory_size='60GB'")
con.execute("SET threads=16")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = skipped = timeout = 0
# r15: per-oracle watchdog — at sf1 a handful of oracles (recursive-CTE
# graph peeling, 36-hash minhash unrolls) can run for hours in DuckDB;
# interrupt them and record TIMEOUT (excluded-but-visible) instead of
# wedging the whole gate. Engine-side results for those queries remain
# gated at sf0.01/sf0.1 by the driver.
import threading
BUDGET = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_S", "600"))
def with_budget(sql):
    timer = threading.Timer(BUDGET, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).fetchdf()
    finally:
        timer.cancel()
for name in sorted(oracle):
    d = f"{outdir}/{name}"
    if not os.path.isdir(d):
        skipped += 1; continue
    files = glob.glob(f"{d}/*.parquet")
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = with_budget(oracle[name])
    except duckdb.InterruptException:
        print(f"TIMEOUT {name}: oracle exceeded {BUDGET:.0f}s, skipped")
        timeout += 1; continue
    except Exception as e:
        if "INTERRUPT" in str(e).upper():
            print(f"TIMEOUT {name}: oracle exceeded {BUDGET:.0f}s, skipped")
            timeout += 1; continue
        print(f"FAIL {name}: {e}"); fail += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); fail += 1; continue
    s = spark_df[sc].sort_values(sc).reset_index(drop=True)
    dd = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(s) != len(dd):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(dd)}"); fail += 1; continue
    if s.equals(dd):
        print(f"OK   {name} ({len(s)} rows)"); ok += 1
    else:
        diff = (s != dd) & ~(s.isna() & dd.isna())
        bad = diff.any(axis=1)
        if bad.sum() == 0:
            dt = {c: (str(s[c].dtype), str(dd[c].dtype))
                  for c in sc if str(s[c].dtype) != str(dd[c].dtype)}
            print(f"FAIL {name}: values equal but dtypes differ: {dt}")
            fail += 1
            continue
        print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(s)}")
        print("spark:", s[bad].head(3).to_dict("records"))
        print("duck :", dd[bad].head(3).to_dict("records"))
        fail += 1
print(f"\n{ok} ok, {fail} fail, {timeout} oracle-timeout, "
      f"{skipped} not dumped (subset mode)")
sys.exit(1 if fail else 0)
