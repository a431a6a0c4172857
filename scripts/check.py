#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB over the testdata parquet and
compares values exactly against the Verify.scala parquet dumps, using
pyarrow on both sides so DECIMAL stays DECIMAL (no silent float
conversion). Usage:

    scripts/check.py [sfDir] [verifyOutDir]

Oracle-result cache (r17 verdict item 5): the decade corpus makes the
DuckDB side cost ~90 min wall (quadratic CTEs over the dup-dense
corpus), which disincentivizes re-confirming the gate after late
fixes. Set GRAFT_ORACLE_CACHE=<dir> to memoize each oracle's result
parquet keyed by (query name, oracle SQL text, corpus fingerprint) —
an unchanged query over an unchanged corpus skips the DuckDB run
entirely. The fingerprint covers every table file's (relpath, size,
mtime), so regenerating the corpus — even same-cardinality — misses.
"""
import glob
import hashlib
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


def corpus_fingerprint(sf):
    """md5 over every table file's (relpath, size, mtime_ns) — a
    content-change or regeneration proxy cheap enough to run per
    invocation (stat only, no reads)."""
    h = hashlib.md5()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        files = sorted(glob.glob(f"{p}/*.parquet")) if os.path.isdir(p) else [p]
        for f in files:
            st = os.stat(f)
            h.update(f"{os.path.relpath(f, sf)}:{st.st_size}:{st.st_mtime_ns}\n"
                     .encode())
    return h.hexdigest()


def oracle_result(con, cache_dir, fp, name, sql, stats):
    """The oracle's arrow result, through the cache when enabled."""
    if not cache_dir:
        return con.execute(sql).arrow()
    # engine versions are part of the key: a duckdb/pyarrow upgrade that
    # changes an oracle result (or the arrow->parquet round-trip's type
    # normalization) must miss, never serve a stale expectation
    vers = f"duckdb={duckdb.__version__} pyarrow={pa.__version__}"
    key = hashlib.md5(f"{name}\n{fp}\n{sql}\n{vers}".encode()).hexdigest()
    path = os.path.join(cache_dir, f"{name}_{key}.parquet")
    if os.path.exists(path):
        stats["hit"] += 1
        return pq.read_table(path)
    stats["miss"] += 1
    tbl = con.execute(sql).arrow()
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic publish: a concurrent reader never
    return tbl             # sees a half-written cache entry


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    cache_dir = os.environ.get("GRAFT_ORACLE_CACHE")
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file parquet; synthesized corpora
        # (ScaleDecade, dup10) are Spark directory layout — glob those
        p = f"{sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    fp = corpus_fingerprint(sf) if cache_dir else None
    stats = {"hit": 0, "miss": 0}
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass, fails = 0, []
    for name in sorted(oracle):
        try:
            exp_cols, exp = rows_of(
                oracle_result(con, cache_dir, fp, name, oracle[name], stats))
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
    if cache_dir:
        print(f"oracle cache: {stats['hit']} hit / {stats['miss']} miss "
              f"(corpus {fp[:12]})")
    print(f"\n{n_pass}/{len(oracle)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
