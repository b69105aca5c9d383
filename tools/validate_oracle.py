#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
load the parquet dump written by graft.Verify and compare against the DuckDB
oracle (rows / schema / values), with columns sorted by name and rows sorted.

Usage: python3 tools/validate_oracle.py <outDir> <sfDir>
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    """Rows as sorted tuples of canonicalized values."""
    def cv(v):
        if v is None:
            return ("null",)
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", v)  # exact: driver may compare raw bytes
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))
    return sorted(tuple(cv(v) for v in row) for row in rows)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders", "customer",
              "supplier", "part", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        entry = {}
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            gcols = sorted(got.column_names)
            wcols = sorted(want.column_names)
            entry["schema_match"] = gcols == wcols
            if not entry["schema_match"]:
                entry["got_cols"] = gcols
                entry["want_cols"] = wcols
            g_rows = canon(
                [[got.column(c)[i].as_py() for c in gcols] for i in range(got.num_rows)], gcols)
            w_rows = canon(
                [[want.column(c)[i].as_py() for c in wcols] for i in range(want.num_rows)], wcols)
            entry["rows_match"] = got.num_rows == want.num_rows
            entry["hash_match"] = g_rows == w_rows
            entry["rows"] = got.num_rows
            entry["want_rows"] = want.num_rows
            if not entry["hash_match"]:
                diff_g = [r for r in g_rows if r not in w_rows][:3]
                diff_w = [r for r in w_rows if r not in g_rows][:3]
                entry["only_got"] = [str(r) for r in diff_g]
                entry["only_want"] = [str(r) for r in diff_w]
        except Exception as e:  # noqa: BLE001
            entry["error"] = str(e)[:300]
        results[name] = entry
    ok = sum(1 for e in results.values()
             if e.get("schema_match") and e.get("rows_match") and e.get("hash_match"))
    for name, e in results.items():
        status = "OK " if (e.get("schema_match") and e.get("rows_match") and e.get("hash_match")) else "FAIL"
        print(f"{status} {name}: {json.dumps(e)[:400]}")
    print(f"\n{ok}/{len(results)} queries match")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
