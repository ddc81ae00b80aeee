#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 scripts/selfcheck.py [sfDir] [outDir] [--skip-verify] [--only=q_a,q_b]
                                    [--forensics]

--forensics: instead of the row-by-row compare, recompute graft.Verify's
canonical rendering (hashes.json: cols sorted by name, IEEE-754 bit-hex
floats, plain-string decimals, epoch-us timestamps, sorted row strings)
from the DuckDB oracle side and diff table/column hashes — names the
diverging COLUMN for any hash-level mismatch, which is exactly the
forensic the r8 driver-only hash fails lacked.
"""
import datetime
import json
import math
import struct
import subprocess
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT_DIR = _pos[1] if len(_pos) > 1 else "/tmp/graft_verify"
SKIP = "--skip-verify" in sys.argv
# --only=q_a,q_b: run + compare a subset (fast targeted iteration)
ONLY = next((a.split("=", 1)[1].split(",") for a in sys.argv
             if a.startswith("--only=")), None)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    sel = f" {','.join(ONLY)}" if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}{sel}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    errs = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l or "error" in l.lower()]
    for l in errs[:40]:
        print("  ", l)
    if r.returncode != 0:
        print("verify FAILED rc", r.returncode)
        sys.exit(1)


def norm(v):
    # Bitwise float identity, matching the driver's hash gate exactly:
    # -0.0 != +0.0 (distinct bit patterns) and NaN == NaN (one canonical
    # NaN encoding). Python's == would treat -0.0 == 0.0 and NaN != NaN,
    # both of which diverge from a byte-level hash — this blind spot let
    # the q_price_volume_bridge -0.0 mismatch pass selfcheck in r7.
    if isinstance(v, float):
        if math.isnan(v):
            return b"NaN"
        return struct.pack(">d", v)
    return v


def canon(v):
    """Mirror of graft.Verify.canonValue — keep the two in lockstep."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        bits = struct.unpack(">Q", struct.pack(">d", v))[0]
        if math.isnan(v):
            bits = 0x7FF8000000000000  # Java's canonical NaN
        return f"{bits:016x}"
    if isinstance(v, Decimal):
        return format(v, "f")  # plain string, no E-notation
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return str(math.floor(v.timestamp()) * 1_000_000 + v.microsecond)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(sorted(canon(k) + "=" + canon(x)
                                     for k, x in v.items())) + "}"
    return str(v)


def oracle_canon(sql, con):
    """(table_hash, rows, {col: hash}, head) for the oracle SQL, in
    graft.Verify's canonical form."""
    import hashlib
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    # quote the projected names: a reserved-word or odd-character column
    # must not break the forensics re-execution of a green query
    sel = ", ".join('"' + c.replace('"', '""') + '"' for c in cols)
    rows = [[canon(v) for v in r]
            for r in con.sql(f"SELECT {sel} FROM ({sql})").fetchall()]
    keyed = sorted(("|".join(r), i) for i, r in enumerate(rows))
    table = hashlib.md5("\n".join(k for k, _ in keyed).encode()).hexdigest()
    col_hashes = {
        c: hashlib.md5("\n".join(rows[i][j] for _, i in keyed).encode()).hexdigest()
        for j, c in enumerate(cols)}
    return table, len(rows), col_hashes, [k for k, _ in keyed[:5]]


def run_forensics(sqls, con):
    hpath = Path(OUT_DIR, "hashes.json")
    if not hpath.exists():
        print("no hashes.json in outDir — rerun graft.Verify first")
        sys.exit(2)
    ours = json.loads(hpath.read_text())
    fails = 0
    for name in sorted(n for n in ours if n in sqls):
        mine = ours[name]
        try:
            oh, orows, ocols, ohead = oracle_canon(sqls[name], con)
        except Exception as e:
            print(f"FAIL {name} (oracle: {type(e).__name__}: {e})")
            fails += 1
            continue
        if mine["hash"] == oh:
            print(f"OK   {name}")
            continue
        fails += 1
        bad = [c for c in ocols if mine["cols"].get(c) != ocols[c]]
        print(f"FAIL {name} rows ours={mine['rows']} oracle={orows} "
              f"diverging cols: {bad or 'ALL'}")
        for a, b in zip(mine.get("head", []), ohead):
            if a != b:
                print(f"     ours  : {a}")
                print(f"     oracle: {b}")
                break
    print(f"\n{fails} forensic failures")
    sys.exit(1 if fails else 0)


def compare(name, sql, con):
    res_dir = Path(OUT_DIR) / name
    if not res_dir.exists():
        return f"MISSING result dir"
    try:
        ours = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        ours_cols = sorted(ours.columns)
        ours_rows = con.sql(
            f"SELECT {', '.join(ours_cols)} FROM '{res_dir}/*.parquet' ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        return f"READ FAIL: {e}"
    try:
        oracle = con.sql(sql)
        o_cols = sorted(oracle.columns)
        o_rows = con.sql(
            f"SELECT {', '.join(o_cols)} FROM ({sql}) ORDER BY ALL"
        ).fetchall()
    except Exception as e:
        return f"ORACLE FAIL: {type(e).__name__}: {e}"
    if ours_cols != o_cols:
        return f"SCHEMA MISMATCH ours={ours_cols} oracle={o_cols}"
    # dtype comparison: the driver's schema check may be typed; flag
    # width mismatches (int32 vs int64, hugeint sums, etc.)
    ours_types = dict(zip(ours.columns, [str(t) for t in ours.types]))
    o_types = dict(zip(oracle.columns, [str(t) for t in oracle.types]))
    dt = [f"{c}: ours={ours_types[c]} oracle={o_types[c]}"
          for c in ours_cols if ours_types[c] != o_types[c]]
    if dt:
        return "DTYPE MISMATCH " + "; ".join(dt)
    if len(ours_rows) != len(o_rows):
        return f"ROWCOUNT MISMATCH ours={len(ours_rows)} oracle={len(o_rows)}"
    for i, (a, b) in enumerate(zip(ours_rows, o_rows)):
        for c, (x, y) in enumerate(zip(a, b)):
            if norm(x) != norm(y):
                return (f"VALUE MISMATCH row {i} col {o_cols[c]}: ours={x!r} oracle={y!r}")
    return None


def main():
    if not SKIP:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single parquet FILES; ScaleCheck's
        # 10x corpus writes Spark-style DIRECTORIES named t.parquet —
        # glob the part files in that case
        src = Path(SF_DIR) / f"{t}.parquet"
        pat = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    sqls = json.loads(Path(OUT_DIR, "oracle_sql.json").read_text())
    if "--forensics" in sys.argv:
        if ONLY:
            sqls = {k: v for k, v in sqls.items() if k in ONLY}
        run_forensics(sqls, con)
    if ONLY:
        # a typo'd name must NOT produce a vacuous green run: validate
        # against the full oracle map + the rows-only dump dirs
        known = set(sqls) | {d.name for d in Path(OUT_DIR).iterdir() if d.is_dir()}
        unknown = [n for n in ONLY if n not in known]
        if unknown:
            print(f"unknown --only names: {unknown}")
            sys.exit(2)
        sqls = {k: v for k, v in sqls.items() if k in ONLY}
    fails = 0
    checked = 0
    for name in sorted(sqls):
        err = compare(name, sqls[name], con)
        status = "OK  " if err is None else "FAIL"
        checked += 1
        if err:
            fails += 1
        print(f"{status} {name}" + (f"  -> {err}" if err else ""))
    # rows-only queries (no oracle): just confirm output exists & rows>0
    for d in sorted(Path(OUT_DIR).iterdir()):
        if ONLY and d.name not in ONLY:
            continue
        if d.is_dir() and d.name not in sqls:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"{'OK  ' if n > 0 else 'FAIL'} {d.name} (rows-only: {n} rows)")
                checked += 1
                if n == 0:
                    fails += 1
            except Exception as e:
                fails += 1
                print(f"FAIL {d.name} (rows-only read: {e})")
    print(f"\n{fails} failures")
    if ONLY and checked == 0:
        print("--only matched zero checks")
        sys.exit(2)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
