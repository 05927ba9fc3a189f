#!/usr/bin/env python3
"""Local stand-in for the driver's CORRECTNESS gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB against the parquet tables in <sfDir>, load the Spark result parquet,
compare schema (column names), row count, and values (columns sorted by
name, exact equality; floats compared exactly after both sides round-trip
through float64).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table()
        except Exception as e:
            # e.g. Verify ran with a name filter that excluded this query
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
        if ocols != scols:
            print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
            n_bad += 1
            continue
        # The driver's compare is TYPE-sensitive (a DuckDB decimal128 sum
        # vs Spark int64 hash-mismatches even when values are equal) and
        # cannot sort/hash list columns at all. Mirror both here so local
        # green predicts driver green.
        otypes = {c: str(odf.schema.field(c).type) for c in ocols}
        stypes = {c: str(sdf.schema.field(c).type) for c in scols}
        if otypes != stypes:
            diff = {c: (otypes[c], stypes[c]) for c in ocols
                    if otypes[c] != stypes[c]}
            print(f"FAIL {name}: column types differ (oracle, spark): {diff}")
            n_bad += 1
            continue
        lists = [c for c in ocols if otypes[c].startswith(("list", "large_list"))]
        if lists:
            print(f"FAIL {name}: list-typed columns {lists} — the driver's "
                  "pandas compare cannot hash these; emit a joined string")
            n_bad += 1
            continue
        if odf.num_rows != sdf.num_rows:
            print(f"FAIL {name}: rows oracle={odf.num_rows} spark={sdf.num_rows}")
            n_bad += 1
            continue
        orows = [tuple(norm(v) for v in row)
                 for row in zip(*[odf.column(c).to_pylist() for c in ocols])]
        srows = [tuple(norm(v) for v in row)
                 for row in zip(*[sdf.column(c).to_pylist() for c in scols])]
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows))
                       if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  oracle: {orows[bad]}")
            print(f"  spark : {srows[bad]}")
            n_bad += 1
            continue
        print(f"ok   {name} ({odf.num_rows} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, "
          f"{len(oracle)} with oracle")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3].split(",") if len(sys.argv) > 3 else None))
