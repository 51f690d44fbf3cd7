#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare (dev tool only —
NOT part of the shipped library; the engine itself has no python deps).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir> (written by `graft.Verify`):
  - read the Spark result parquet
  - run the matching SQL from oracle_sql.json in DuckDB, with one view
    per fixture table over <sfDir>/*.parquet
  - sort columns by name (as the driver does), compare row count,
    column names, and cell values row-by-row; report exact-match status
    and, for floats, the max abs diff so near-misses are visible.
Exit code = number of failing queries.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def compare(name, spark_rows, oracle_rows, cols_s, cols_o, types_s=None, types_o=None):
    if sorted(cols_s) != sorted(cols_o):
        return False, f"schema mismatch: spark={sorted(cols_s)} oracle={sorted(cols_o)}"
    # Type divergence check: the driver hashes *serialized* values, so a
    # DuckDB HUGEINT (int128 — what sum() over integers returns) against a
    # Spark BIGINT hash-mismatches even when every Python int compares
    # equal (the round-2 lesson: 8 queries rows-green, hash-red). Compare
    # the DuckDB-visible type of each column, but normalize int widths up
    # to 64-bit into one family — Spark's row_number()/length() emit INT32
    # where DuckDB emits BIGINT and the driver provably hashes those equal
    # (all such queries were hash-green in round 2). Anything crossing
    # families (HUGEINT, DECIMAL vs DOUBLE, VARCHAR vs int) is driver-red
    # no matter what the cells say.
    if types_s is not None and types_o is not None:
        int_family = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                      "UTINYINT", "USMALLINT", "UINTEGER"}

        def fam(t):
            t = str(t)
            return "INT<=64" if t in int_family else t

        ts = dict(zip(cols_s, (fam(t) for t in types_s)))
        to = dict(zip(cols_o, (fam(t) for t in types_o)))
        diverged = [f"{c}: spark={ts[c]} oracle={to[c]}"
                    for c in sorted(ts) if ts[c] != to[c]]
        if diverged:
            return False, ("type divergence (driver hash would differ): "
                           + "; ".join(diverged))
    if len(spark_rows) != len(oracle_rows):
        return False, f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    order = sorted(range(len(cols_s)), key=lambda i: cols_s[i])
    order_o = sorted(range(len(cols_o)), key=lambda i: cols_o[i])
    # Collect ALL float mismatches (so the max-absdiff in the failure
    # message reflects how near/far the divergence is) but fail fast on
    # the first non-float mismatch.
    max_float_diff = 0.0
    first_bad = None
    n_bad = 0
    for ri, (rs, ro) in enumerate(zip(spark_rows, oracle_rows)):
        for ci_s, ci_o in zip(order, order_o):
            a, b = norm_cell(rs[ci_s]), norm_cell(ro[ci_o])
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                max_float_diff = max(max_float_diff, abs(a - b))
                n_bad += 1
                if first_bad is None:
                    first_bad = f"row {ri} col {cols_s[ci_s]}: spark={a!r} oracle={b!r}"
            else:
                return False, f"row {ri} col {cols_s[ci_s]}: spark={a!r} oracle={b!r}"
    if first_bad is not None:
        return False, (f"{n_bad} float cell(s) differ, max absdiff "
                       f"{max_float_diff:.3e}; first: {first_bad}")
    return True, "ok"


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle_sql = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for qdir in sorted(d for d in out.iterdir() if d.is_dir()):
        name = qdir.name
        try:
            srel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            scols, srows = [d[0] for d in srel.description], srel.fetchall()
            if name not in oracle_sql:
                print(f"  [rows-only] {name}: {len(srows)} rows "
                      f"{'OK' if len(srows) > 0 else 'EMPTY (driver would flag)'}")
                if len(srows) == 0:
                    failures += 1
                continue
            orel = con.sql(oracle_sql[name])
            stypes, otypes = srel.types, orel.types
            ocols, orows = [d[0] for d in orel.description], orel.fetchall()
            ok, msg = compare(name, srows, orows, scols, ocols, stypes, otypes)
            print(f"  [{'PASS' if ok else 'FAIL'}] {name}: {msg} ({len(srows)} rows)")
            if not ok:
                failures += 1
        except Exception as e:
            print(f"  [ERR ] {name}: {e}")
            failures += 1
    missing = set(oracle_sql) - {d.name for d in out.iterdir() if d.is_dir()}
    for m in sorted(missing):
        print(f"  [MISS] {m}: oracle declared but no Spark output")
        failures += 1
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
