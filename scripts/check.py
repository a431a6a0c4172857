#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB over the testdata parquet and
compares values exactly against the Verify.scala parquet dumps, using
pyarrow on both sides so DECIMAL stays DECIMAL (no silent float
conversion). Usage:

    scripts/check.py [sfDir] [verifyOutDir]
"""
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return Decimal(v)  # compares by value, scale-insensitive
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def nested_cols(table):
    """Top-level array/map/struct result columns — the driver's pandas
    compare (sort_values -> factorize -> hash) cannot sort or hash them,
    so a query emitting one passes no driver check. Reject here so
    green-local implies green-driver."""
    return [f.name for f in table.schema
            if pa.types.is_nested(f.type)]


def rows_of(table):
    bad = nested_cols(table)
    if bad:
        raise ValueError(
            f"nested-typed result column(s) {bad}: the driver's compare "
            "cannot hash arrays/maps/structs — serialize to a string "
            "(concat_ws / array_to_string) or unpack to scalar rows")
    cols = sorted(table.column_names)
    pydata = {c: table.column(c).to_pylist() for c in cols}
    return cols, [tuple(normalize(pydata[c][i]) for c in cols)
                  for i in range(table.num_rows)]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file parquet; synthesized corpora
        # (ScaleDecade, dup10) are Spark directory layout — glob those
        p = f"{sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass, fails = 0, []
    for name in sorted(oracle):
        try:
            exp_cols, exp = rows_of(con.execute(oracle[name]).arrow())
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                fails.append((name, "no verify output"))
                continue
            got_cols, got = rows_of(pq.read_table(files[0] if len(files) == 1
                                                  else f"{out}/{name}"))
            if exp_cols != got_cols:
                fails.append((name, f"cols {got_cols} != oracle {exp_cols}"))
                continue
            if len(exp) != len(got):
                fails.append((name, f"rows {len(got)} != oracle {len(exp)}"))
                continue
            bad = next((i for i, (a, b) in enumerate(zip(exp, got)) if a != b),
                       None)
            if bad is not None:
                diffs = [(exp_cols[j], exp[bad][j], got[bad][j])
                         for j in range(len(exp_cols))
                         if exp[bad][j] != got[bad][j]]
                fails.append((name, f"row {bad} differs: {diffs[:3]}"))
                continue
            n_pass += 1
            print(f"OK   {name} ({len(exp)} rows)")
        except Exception as ex:
            fails.append((name, f"error: {ex}"))
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    print(f"\n{n_pass}/{len(oracle)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
