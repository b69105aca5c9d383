#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare a graft.Verify
output directory against DuckDB running the dumped oracle SQL.

Usage: python3 tools/validate_oracle.py <verifyOutDir> [sfDir]

For every entry in <verifyOutDir>/oracle_sql.json, reads the Spark result
parquet from <verifyOutDir>/<name>/ and the oracle result from DuckDB over
the sf tables, normalizes both (columns sorted by name, rows sorted by their
repr tuple), and compares (columns, row count, value hash). Exit code = the
number of failing entries.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = sorted(tuple(repr(r[c]) for c in cols)
                  for b in tbl.to_batches() for r in b.to_pylist())
    return cols, len(rows), hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            fails.append((name, "no spark output"))
            continue
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        try:
            o = con.execute(sql).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001 - report any oracle failure
            fails.append((name, f"oracle error: {e}"))
            continue
        sc, sn, sh = norm(spark_tbl)
        oc, on, oh = norm(o)
        if not (sc == oc and sn == on and sh == oh):
            fails.append((name, f"cols_match={sc == oc} rows={sn}/{on} hash_match={sh == oh}"))
    # result dirs with no oracle key = stale leftovers from a wider run
    # mixed with a filtered Verify — unchecked data must not read as green
    orphans = sorted(d for d in os.listdir(out)
                     if os.path.isdir(os.path.join(out, d)) and d not in oracle)
    for d in orphans:
        fails.append((d, "result dir present but absent from oracle_sql.json "
                         "(stale from a wider run? use a fresh outDir)"))
    print(f"checked {len(oracle)} entries; fails: {len(fails)}")
    for f in fails:
        print(" FAIL", f)
    sys.exit(len(fails))


if __name__ == "__main__":
    main()
