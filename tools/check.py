#!/usr/bin/env python3
"""Local correctness checker replicating the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (spark parquet) and oracle_sql.json, runs each
oracle in DuckDB with views over <sfDir>/*.parquet, sorts columns by name,
sorts rows, and compares values exactly. Dev tool only — not engine code.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb may hand back HUGEINT sums as object/float — normalize ints
        if df[c].dtype == object:
            try:
                as_int = pd.to_numeric(df[c])
                if pd.api.types.is_integer_dtype(as_int):
                    df[c] = as_int
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # A GRAFT_VERIFY_ONLY dev run writes its subset to oracle_sql.dev.json
    # (full runs delete it), so prefer that when present.
    dev = Path(out_dir) / "oracle_sql.dev.json"
    oracle_path = dev if dev.exists() else Path(out_dir) / "oracle_sql.json"
    oracle = json.loads(oracle_path.read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").df())
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
                n_fail += 1
    # queries with no oracle: rows-only
    all_out = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    if dev.exists():  # dev subset: ignore stale outputs outside the filter
        import os
        prefixes = [p for p in os.environ.get("GRAFT_VERIFY_ONLY", "").split(",")
                    if p.strip()]
        if prefixes:
            all_out = {n for n in all_out
                       if any(n.startswith(p.strip()) for p in prefixes)}
    for name in sorted(all_out - set(oracle)):
        n = len(con.execute(f"SELECT 1 FROM '{Path(out_dir)/name}/*.parquet'").df())
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n} rows)")
        if n > 0:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
