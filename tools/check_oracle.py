#!/usr/bin/env python3
"""Replicates the driver's DuckDB oracle check.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with each <sfDir>/*.parquet registered
    as a view named after the table
  - sort columns by name, canonicalize floats to 6dp, compare sorted rows
Prints a per-query PASS/FAIL line and a final "FAILS: N".
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon_cell(v):
    """Canonicalize a cell to "<type-bucket>:<value>".

    The type bucket (b=bool, i=int, f=float/decimal, s=str, y=bytes,
    [..]=list) is part of the canonical form so that an engine<->oracle
    type divergence (e.g. STRING '0' vs BIGINT 0) fails locally the same
    way it fails the driver's type-aware hash. NULL stays typeless.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"f:{float(v):.6f}"
    except Exception:
        pass
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v).hex()}"
    return f"s:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def selftest():
    """Prove the canonical form is type-aware: each mistyped pair differs."""
    assert canon_cell("0") != canon_cell(0), "str vs int must differ"
    assert canon_cell(1.0) != canon_cell(1), "float vs int must differ"
    assert canon_cell(True) != canon_cell(1), "bool vs int must differ"
    assert canon_cell(["1"]) != canon_cell([1]), "list elem types must differ"
    assert canon_cell(None) == "NULL"
    assert canon_cell(1.0000004) == canon_cell(1.0000001), "6dp float canon"
    print("selftest OK")
    return 0


def main():
    if sys.argv[1] == "--selftest":
        return selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    fails = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = Path(out_dir, name)
        try:
            con = duckdb.connect()
            for p in sorted(Path(sf_dir).glob("*.parquet")):
                con.execute(
                    f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
            ocols = None
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            con.close()
        except Exception as e:
            print(f"[FAIL] {name}: error {str(e)[:200]}")
            fails += 1
            continue
        oc, orn = canon_rows(ocols, orows)
        sc, srn = canon_rows(scols, srows)
        if oc != sc:
            print(f"[FAIL] {name}: schema mismatch spark={sc} oracle={oc}")
            fails += 1
        elif len(orn) != len(srn):
            print(f"[FAIL] {name}: rows spark={len(srn)} oracle={len(orn)}")
            fails += 1
        elif orn != srn:
            diff = next(i for i in range(len(orn)) if orn[i] != srn[i])
            print(f"[FAIL] {name}: value mismatch at sorted row {diff}: "
                  f"spark={srn[diff]} oracle={orn[diff]}")
            fails += 1
        else:
            print(f"[PASS] {name}: {len(srn)} rows")
    print(f"FAILS: {fails}")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
