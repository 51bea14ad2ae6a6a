#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each
SparkEntry.oracleSql in DuckDB over the same parquet tables and compare
with the Spark result dumped by graft.Verify.

Two comparison layers, and BOTH must pass (VERDICT r13 #2 — round 13
claimed 178/178 locally while the driver recorded 177/178, because the
old row-list compare happily compared array<bigint> cells that the
driver's canonicalizer cannot even hash):

 1. the original exact row-list compare (best diagnostics: first
    mismatching row/column is printed), and
 2. a driver-faithful canonicalization — pandas frame, columns sorted
    by name, per-row value hash via pandas.util.hash_pandas_object,
    order-independent sum compared across engines. This layer raises
    exactly where the driver raises (an ndarray/list cell is
    unhashable -> TypeError), so a driver-incompatible output schema
    now fails HERE first instead of at round adjudication.

Usage: compare_oracle.py <sfDir> <verifyOut>"""
import sys, json, math
import duckdb
import pandas as pd

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")


def canon_hash(tbl, cols):
    """The driver's sort-columns-then-hash canonicalization: columns
    ordered by name, every row value-hashed by pandas (TypeError on
    unhashable cells — the driver's exact failure mode), and the
    per-row hashes summed so row order cannot matter."""
    df = tbl.select(cols).to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    return int(pd.util.hash_pandas_object(df, index=False).sum() & ((1 << 64) - 1))


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
        continue
    # Layer 2: the driver's canonicalizer must be able to adjudicate
    # this schema, and its hashes must agree — builder-green must
    # imply driver-green.
    try:
        he, hg = canon_hash(exp, ecols), canon_hash(got, gcols)
    except Exception as ex:
        print(f"FAIL {name}: driver canonicalizer rejects schema: "
              f"{type(ex).__name__}: {ex}"); fail += 1; continue
    if he != hg:
        print(f"FAIL {name}: canonical hash mismatch (spark={hg:#x} "
              f"oracle={he:#x}) despite exact row equality — dtype skew?")
        fail += 1; continue
    print(f"OK   {name}: {len(e)} rows")
print(f"{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
