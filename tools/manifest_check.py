#!/usr/bin/env python3
"""Recompute graft.Verify's manifest.jsonl from the dumped parquet and
compare — the reconstructibility proof behind VERDICT r14 #1 (the round
whose driver correctness artifact came back empty `{}`).

graft.Verify writes, incrementally as each query dumps, one JSONL line
per query: {"name","rows","cols","hash"} where `hash` is an
order-independent canonical value hash of the WRITTEN parquet (columns
sorted by name; each row rendered by Verify.render, md5'd, first 8
big-endian bytes as a 64-bit word; all row words summed mod 2^64).
This script re-derives the identical hash in Python (pyarrow) straight
from the parquet — so the round's correctness record can be rebuilt and
cross-checked from the dump alone, with no Spark and no driver.

Rendering rules mirrored from Verify.render (Scala):
  null        -> U+0000
  bool        -> "T"/"F"
  int         -> decimal string
  float       -> IEEE-754 bits as SIGNED decimal (doubleToLongBits:
                 NaN canonicalized to 0x7ff8000000000000; float32
                 widened to float64, which is exact)
  str         -> as-is
  bytes       -> lowercase hex
  Decimal     -> normalize, plain (non-scientific) string
  date        -> epoch DAYS
  timestamp   -> epoch MICROS (UTC)
  list        -> "[" + U+0001-joined renders + "]"
  struct(dict)-> "{" + U+0001-joined renders of values (field order) + "}"
  row: sorted-column renders joined by U+0002

Usage: manifest_check.py <verifyOut>   (exit 1 on any mismatch)"""
import sys, json, math, struct, hashlib, glob, datetime
from decimal import Decimal
import pyarrow.parquet as pq

NULL, SEP, COLSEP = "\x00", "\x01", "\x02"
EPOCH_D = datetime.date(1970, 1, 1)
EPOCH_NAIVE = datetime.datetime(1970, 1, 1)
EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


def render(v):
    if v is None:
        return NULL
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        bits = (0x7FF8000000000000 if math.isnan(v)
                else struct.unpack("<q", struct.pack("<d", v))[0])
        return str(bits)
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, datetime.datetime):  # before date: datetime IS a date
        delta = v - (EPOCH_UTC if v.tzinfo is not None else EPOCH_NAIVE)
        return str((delta.days * 86400 + delta.seconds) * 1000000
                   + delta.microseconds)
    if isinstance(v, datetime.date):
        return str((v - EPOCH_D).days)
    if isinstance(v, list):
        return "[" + SEP.join(render(x) for x in v) + "]"
    if isinstance(v, dict):  # arrow struct -> dict in schema field order
        return "{" + SEP.join(render(x) for x in v.values()) + "}"
    raise TypeError(f"unrendered type {type(v)}: {v!r}")


def canonical(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    total = 0
    for row in zip(*data) if data else []:
        s = COLSEP.join(render(v) for v in row)
        h = hashlib.md5(s.encode("utf-8")).digest()
        total = (total + int.from_bytes(h[:8], "big")) & ((1 << 64) - 1)
    return table.num_rows, cols, str(total)


def main():
    vout = sys.argv[1]
    fail = ok = 0
    for line in open(f"{vout}/manifest.jsonl"):
        m = json.loads(line)
        name = m["name"]
        if "error" in m:
            print(f"SKIP {name}: recorded error: {m['error']}")
            fail += 1
            continue
        files = sorted(glob.glob(f"{vout}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: dump missing")
            fail += 1
            continue
        tbl = pq.read_table(files)
        try:
            rows, cols, h = canonical(tbl)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            fail += 1
            continue
        if rows != m["rows"] or cols != m["cols"] or h != m["hash"]:
            print(f"FAIL {name}: recomputed (rows={rows}, hash={h}) != "
                  f"manifest (rows={m['rows']}, hash={m['hash']})")
            fail += 1
            continue
        ok += 1
    print(f"{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {ok + fail} manifest rows")
    sys.exit(1 if fail else 0)


main()
