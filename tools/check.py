#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>.parquet result dir written by graft.Verify, runs the twin
SQL from oracle_sql.json in DuckDB against the same fixture tables and
compares canonically: columns sorted by name, rows sorted, floats compared
with 1e-6 tolerance.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def key(r):
        return tuple((str(type(v)), str(v)) for v in r)
    return sorted(rows, key=key)

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    # expected set = the declared-query manifest (so a query that crashed in
    # Verify FAILS here instead of silently not being checked); fall back to
    # listing dirs for older dumps. Stale dirs not in the manifest are noted.
    manifest = f"{out_dir}/queries.txt"
    if os.path.exists(manifest):
        names = sorted(open(manifest).read().split())
        for stale in set(dirs) - set(names):
            print(f"STALE {stale}: result dir not in declared manifest")
    else:
        names = dirs
    for name in names:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: query produced no result (crashed in Verify)")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = sorted(got_rel.columns)
        got = con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        want_cols = sorted(want_rel.columns)
        if [c.lower() for c in got_cols] != [c.lower() for c in want_cols]:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); n_fail += 1; continue
        want = con.sql(
            f"SELECT {', '.join(want_cols)} FROM want_rel").fetchall()
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        got_s, want_s = canon(got), canon(want)
        bad = [(g, w) for g, w in zip(got_s, want_s)
               if not all(eq(x, y) for x, y in zip(g, w))]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: got={bad[0][0]} want={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
