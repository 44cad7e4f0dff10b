#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

Mirrors the driver: for each <name> subdir (spark parquet result) with an
entry in oracle_sql.json, run the oracle in DuckDB over the sf parquet
tables and compare (columns sorted by name, rows sorted, values hashed).
Queries without an oracle get a rows-only report.
"""
import json, sys, glob, os
import duckdb


def canon(df):
    # columns sorted by name; rows sorted by all columns; stable value repr
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def norm_cell(v):
    import math, datetime
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(round(v, 9))
    return repr(v)


def table_hash(df):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(norm_cell(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no parquet output")
            n_fail += 1
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1
            if len(got) == 0:
                print(f"  WARN zero rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        hg, hw = table_hash(g), table_hash(w)
        if hg != hw:
            print(f"FAIL  {name}: hash mismatch ({len(g)} rows)")
            diff = (g.astype(str) != w.astype(str))
            bad = diff.any(axis=1)
            print(g[bad].head(3))
            print(w[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
