#!/usr/bin/env python3
"""Local stand-in for the driver's CORRECTNESS gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB against the parquet tables in <sfDir>, load the Spark result parquet,
compare schema (column names), row count, and values (columns sorted by
name, exact equality; floats compared exactly after both sides round-trip
through float64).
"""
import hashlib
import json
import math
import os
import pathlib
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ---------------------------------------------------------------------------
# Oracle-side memoization. The tri-SF audit costs hours of CPU, dominated by
# unrolled k-means/BPE CTEs that do not change between rounds — so the ORACLE
# result (the expensive side) is cached keyed by (query, sfDir, testdata
# digest, oracle-SQL hash). Only a canonical digest of the oracle rows is
# stored; on a digest match the verdict line is byte-identical to a cold run.
# Any key change (edited SQL, different sf, regenerated testdata) misses the
# cache; a digest MISMATCH (spark != cached oracle) falls back to re-running
# the oracle so FAIL diffs are always computed against live rows. Disable
# with GRAFT_ORACLE_CACHE=0.
CACHE_DIR = pathlib.Path(__file__).resolve().parent / ".oracle_cache"
CACHE_ON = os.environ.get("GRAFT_ORACLE_CACHE", "1") != "0"


def testdata_digest(sf_dir):
    """Identity of the read-only testdata: sha256 of the FULL file content
    of every table. CONTENT-based, deliberately NO mtime: the driver
    regenerates the testdata every round with fresh mtimes but
    (deterministic generator) identical bytes, and an mtime in the key
    would throw away the multi-hour sf0.1 oracle cache each round for
    nothing. Full content (not the r14 size+head/tail probe): a
    regeneration that changed only mid-file bytes while preserving size
    and both 64 KB probe regions would have false-hit the cache and
    silently validated against stale oracle rows; hashing everything
    costs seconds against hours of oracle recompute. Returns None (= run
    with the cache disabled) if any table file is missing, so a partial
    sf dir still degrades to per-query FAIL lines instead of dying at
    startup."""
    h = hashlib.sha256()
    try:
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            st = os.stat(p)
            h.update(f"{t}:{st.st_size};".encode())
            with open(p, "rb") as f:
                while True:
                    chunk = f.read(1 << 22)
                    if not chunk:
                        break
                    h.update(chunk)
    except OSError:
        return None
    return h.hexdigest()


def rows_digest(cols, types, n_rows, rows):
    """Canonical digest of a normalized result (column names + arrow types
    + row reprs — the exact objects the equality compare sees)."""
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    h.update(repr(sorted(types.items())).encode())
    h.update(str(n_rows).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


# Bump when the cached-digest format changes (rows_digest normalization,
# compare semantics) so stale-format entries can't satisfy a new reader.
CACHE_FORMAT = "v4"  # v4: testdata digest hashes FULL file content


def cache_path(name, sf_dir, td_digest, sql):
    # duckdb.__version__ is part of the key: an engine upgrade can change
    # oracle results (regex, sort, float formatting), and a stale cached
    # digest would print 'ok' where a cold run FAILs.
    key = (f"{CACHE_FORMAT}|duckdb={duckdb.__version__}|"
           f"{name}|{sf_dir}|{td_digest}|"
           + hashlib.sha256(sql.encode()).hexdigest())
    return CACHE_DIR / (hashlib.sha256(key.encode()).hexdigest() + ".json")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def load_spark(con, out_dir, name):
    return con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()


def norm_rows(df, cols):
    return [tuple(norm(v) for v in row)
            for row in zip(*[df.column(c).to_pylist() for c in cols])]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            # partial sf dir: queries over the missing table get their own
            # per-query "oracle error" FAIL lines; the rest still verify
            print(f"warn {t}: view not created ({e})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
    td = testdata_digest(sf_dir) if CACHE_ON else None
    cache_on = CACHE_ON and td is not None
    if cache_on:
        CACHE_DIR.mkdir(exist_ok=True)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        # ---- warm path: compare the spark result against the cached
        # oracle digest; only a full match short-circuits ---------------
        cpath = cache_path(name, sf_dir, td, sql) if cache_on else None
        if cache_on and cpath.is_file():
            try:
                cached = json.load(open(cpath))
                sdf = load_spark(con, out_dir, name)
                scols = sorted(sdf.column_names)
                stypes = {c: str(sdf.schema.field(c).type) for c in scols}
                if (cached["cols"] == scols
                        and cached["types"] == stypes
                        and cached["n_rows"] == sdf.num_rows
                        and not any(t.startswith(("list", "large_list"))
                                    for t in stypes.values())
                        and cached["digest"] == rows_digest(
                            scols, stypes, sdf.num_rows,
                            norm_rows(sdf, scols))):
                    print(f"ok   {name} ({sdf.num_rows} rows)")
                    n_ok += 1
                    continue
                # anything short of a full match: fall through to the
                # cold path so FAIL diffs come from live oracle rows
            except Exception:
                pass
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = load_spark(con, out_dir, name)
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
        orows = norm_rows(odf, ocols)
        srows = norm_rows(sdf, scols)
        if cache_on:
            try:
                json.dump({"cols": ocols, "types": otypes,
                           "n_rows": odf.num_rows,
                           "digest": rows_digest(ocols, otypes,
                                                 odf.num_rows, orows)},
                          open(cpath, "w"))
            except Exception:
                pass
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
