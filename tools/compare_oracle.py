#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each
SparkEntry.oracleSql in DuckDB over the same parquet tables and compare
with the Spark result dumped by graft.Verify (columns sorted by name,
values compared exactly). Usage: compare_oracle.py <sfDir> <verifyOut>"""
import sys, json, glob, math
import duckdb

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM parquet_scan('{vout}/{name}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); fail += 1; continue
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"FAIL {name}: columns {gcols} != oracle {ecols}"); fail += 1; continue
    e = exp.select(ecols).to_pylist()
    g = got.select(gcols).to_pylist()
    if len(e) != len(g):
        print(f"FAIL {name}: rows {len(g)} != oracle {len(e)}"); fail += 1; continue
    bad = None
    for i, (re_, rg) in enumerate(zip(e, g)):
        for c in ecols:
            a, b = re_[c], rg[c]
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                             and (a == b or (math.isnan(a) and math.isnan(b))))
            if not eq:
                bad = (i, c, a, b); break
        if bad: break
    if bad:
        i, c, a, b = bad
        print(f"FAIL {name}: row {i} col {c}: spark={b!r} oracle={a!r}"); fail += 1
    else:
        print(f"OK   {name}: {len(e)} rows")
print(f"{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
