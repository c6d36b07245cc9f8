#!/usr/bin/env python3
"""Bind every oracle SQL via DuckDB DESCRIBE and flag output columns
whose type a hash-based (dtype-sensitive) comparer would treat
differently from Spark's parquet output: HUGEINT, DECIMAL, UTINYINT...
anything outside {BIGINT,INTEGER,SMALLINT,TINYINT,DOUBLE,FLOAT,VARCHAR,
BOOLEAN,DATE,TIMESTAMP*,BLOB and list/struct thereof}.

Usage: python3 tools/audit_oracle_types.py <sfDir> <oracle_sql.json>
"""
import json, sys, re
import duckdb

OK = re.compile(r'^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN|DATE|TIMESTAMP.*|BLOB|(BIGINT|INTEGER|DOUBLE|VARCHAR|FLOAT)\[\]|STRUCT\(.*\)|MAP\(.*\))$')

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf, path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(path))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:120]}")
            n_bad += 1
            continue
        bad = [(c, t) for (c, t, *_ ) in desc if not OK.match(t)]
        if bad:
            n_bad += 1
            print(f"FLAG {name}: {bad}")
    print(f"== {n_bad} flagged / {len(oracles)} ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
