#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each oracle_sql.json
entry in DuckDB over the corpus views and compares value-for-value (columns
sorted by name, rows sorted) against the parquet dumped by graft.Verify.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), \
        [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    dumped = {p.rstrip('/').split('/')[-1] for p in glob.glob(f"{out_dir}/*/")}
    for name in sorted(dumped):
        if name not in oracle:
            got = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
            print(f"  [rows-only] {name}: {got} rows")
            continue
        try:
            o = con.execute(oracle[name])
            orows, ocols = o.fetchall(), [d[0] for d in o.description]
            g = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            grows, gcols = g.fetchall(), [d[0] for d in g.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        on, ocs = norm(orows, ocols)
        gn, gcs = norm(grows, gcols)
        if ocs != gcs:
            print(f"FAIL {name}: columns oracle={ocs} got={gcs}")
            n_fail += 1
            continue
        if len(on) != len(gn):
            print(f"FAIL {name}: rowcount oracle={len(on)} got={len(gn)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(on, gn))
               if not all(eq(x, y) for x, y in zip(a, b))]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(on)} rows differ; first at {i}:")
            print(f"   oracle: {a}")
            print(f"   got:    {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(on)} rows)")
            n_pass += 1
    missing = set(oracle) - dumped
    for name in sorted(missing):
        print(f"FAIL {name}: no parquet dumped (query threw in Verify?)")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(dumped - set(oracle))} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
