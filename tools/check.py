#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle and diff. Usage: check.py <sfDir> <outDir> [query...]
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of the double — exact match expected
        return repr(v)
    return str(v)


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
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            want_rel = con.execute(sql)
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
            if sorted(got_cols) != sorted(want_cols):
                print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
                n_fail += 1
                continue
            # dtype drift (spark parquet vs oracle) — warn, since the
            # driver's strictness here is unknown
            gt_types = {d[0]: d[1] for d in got_rel.description}
            wt_types = {d[0]: d[1] for d in want_rel.description}
            for c in got_cols:
                if gt_types[c] != wt_types[c]:
                    print(f"  TYPE? {name}.{c}: spark={gt_types[c]} oracle={wt_types[c]}")
            # driver sorts columns by name before hashing
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            widx = [want_cols.index(c) for c in sorted(want_cols)]
            gt = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
            wt = sorted(tuple(norm(r[i]) for i in widx) for r in want)
            if gt == wt:
                print(f"PASS {name} ({len(gt)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows {len(gt)} vs {len(wt)}")
                diff_g = [r for r in gt if r not in set(wt)][:3]
                diff_w = [r for r in wt if r not in set(gt)][:3]
                for d in diff_g:
                    print(f"  spark-only:  {d}")
                for d in diff_w:
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
