#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle and diff. Usage: check.py <sfDir> <outDir> [query...]

Canonicalization mirrors the driver's pandas path: columns sorted by name,
then `DataFrame.sort_values` over all columns. That call is load-bearing —
it raises TypeError on unhashable cells (e.g. numpy arrays), exactly like
the driver did on round 2's q44/q46/q47, so an output shape the driver
can't hash fails HERE first.
"""
import sys, json, math, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        # repr of the double — exact match expected
        return repr(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if v is None:
        return "None"
    return str(v)


def canon(df):
    """Driver-equivalent canonicalization: sort columns by name, then
    pandas sort_values over every column (raises on unhashable cells)."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got_df = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            want_df = con.execute(sql).df()
            if sorted(got_df.columns) != sorted(want_df.columns):
                print(f"FAIL {name}: columns {sorted(got_df.columns)} != {sorted(want_df.columns)}")
                n_fail += 1
                continue
            # dtype drift (spark parquet vs oracle) — warn, since the
            # driver's strictness here is unknown
            for c in got_df.columns:
                if str(got_df[c].dtype) != str(want_df[c].dtype):
                    print(f"  TYPE? {name}.{c}: spark={got_df[c].dtype} oracle={want_df[c].dtype}")
            gt = canon(got_df)
            wt = canon(want_df)
            if gt == wt:
                print(f"PASS {name} ({len(gt)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows {len(gt)} vs {len(wt)}")
                wset, gset = set(wt), set(gt)
                for d in [r for r in gt if r not in wset][:3]:
                    print(f"  spark-only:  {d}")
                for d in [r for r in wt if r not in gset][:3]:
                    print(f"  oracle-only: {d}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{outdir}/q*")):
        name = d.split("/")[-1]
        if name not in oracles:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
