#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB over the testdata parquet
tables, sorts columns by name + rows, and compares values exactly
(with a tiny float report if not bit-equal).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def isnull(v):
    """NULL-ish across pandas dtypes: None, NaN, NaT."""
    if v is None:
        return True
    try:
        import pandas as pd
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
    # dtype drift between DuckDB versions was the root cause of the
    # r5/r6 driver-vs-judge divergence — always record the version
    print(f"duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ\n  got: {gc}\n  exp: {ec}")
            n_fail += 1
            continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        g = got.sort_values(gc, kind="mergesort").reset_index(drop=True)
        e = exp.sort_values(gc, kind="mergesort").reset_index(drop=True)
        bad = []
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], e[c])):
                a, b = norm(a), norm(b)
                # both-null (None/NaN/NaT) is a match — pandas NaT/NaN
                # compare unequal to themselves under !=
                if isnull(a) and isnull(b):
                    continue
                try:
                    if a != b and not (isinstance(a, float) and
                                       isinstance(b, float) and
                                       math.isnan(a) and math.isnan(b)):
                        if (a is None) != (b is None) or not isinstance(a, float):
                            bad.append((c, i, a, b, None))
                        else:
                            bad.append((c, i, a, b, abs(a - b)))
                except (TypeError, ValueError):
                    bad.append((c, i, a, b, None))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value diffs (col,row,got,exp,absdiff):")
            for d in bad[:4]:
                print(f"   {d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(gc)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
