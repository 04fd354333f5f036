#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/localcheck.py <verify_out_dir> [sf_dir]

Reads each <name>.parquet written by `graft.Verify`, runs the matching SQL
from oracle_sql.json in DuckDB over the raw testdata tables, and compares:
column names (sorted), row count, and a hash over the value matrix with rows
sorted by all columns. Prints one line per query + a summary.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    """Return (colnames_sorted, rowcount, hash) for a query, canonicalized."""
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    # canonicalize value text: floats via repr (full precision), None uniform
    import pandas as pd  # noqa
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple("\0N" if v is None or v != v else repr(v) for v in tup))
    rows.sort()
    import hashlib
    h = hashlib.sha256()
    for r in rows:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return cols, len(rows), h.hexdigest()


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(p.name for p in out_dir.iterdir() if p.is_dir())
    n_pass = n_fail = n_noora = 0
    # completeness: an oracle whose query crashed in Verify has no output
    # dir — that is a FAIL, not a silent skip
    for missing in sorted(set(oracle) - set(names)):
        print(f"FAIL  {missing}: no query output (query failed in Verify?)")
        n_fail += 1
    for name in names:
        spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            scols, srows, shash = canon(con, spark_sql, name)
        except Exception as e:
            print(f"FAIL  {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={srows} (no oracle — rows-only check)")
            n_noora += 1
            continue
        try:
            ocols, orows, ohash = canon(con, oracle[name], name)
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            print(f"FAIL  {name}: rows spark={srows} oracle={orows}")
            n_fail += 1
        elif shash != ohash:
            print(f"FAIL  {name}: hash mismatch (rows={srows})")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={srows}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
