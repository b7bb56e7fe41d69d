#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>.parquet result dir written by graft.Verify, runs the twin
SQL from oracle_sql.json in DuckDB against the same fixture tables and
compares DRIVER-STYLE: columns sorted by name; non-float columns compared
exactly (rendered value AND python type, so DOUBLE-vs-BIGINT or
HUGEINT-vs-BIGINT mismatches FAIL here like they do at the driver);
tolerance only for genuinely float columns (either side FLOAT/DOUBLE).
Rows are sorted by non-float columns first, then by floats rounded to the
tolerance granularity, so near-equal float rows align on both sides.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FLOAT_TYPES = ("FLOAT", "DOUBLE", "REAL")

def is_float_type(t):
    return str(t).upper() in FLOAT_TYPES

def norm_type(t):
    """Type identity for the exact-type gate, calibrated to the driver's
    observed behavior on round-1 results: all machine-int widths hash the
    same (w1_rank INTEGER-vs-BIGINT matched), but HUGEINT and DOUBLE do NOT
    hash like BIGINT even with identical values (l8/f3 failed). DECIMAL
    scale is part of the rendered value ('1.50' vs '1.500') but precision
    is not — normalize DECIMAL(p,s) to the scale. Everything else compares
    by full upper-cased name."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT"
    if s.startswith("DECIMAL"):
        try:
            scale = s.rstrip(")").split(",")[1]
            return f"DECIMAL(s={scale})"
        except IndexError:
            return s
    return s

def render(v):
    """Rendered (type, value) pair for exact comparison of non-float cells.
    Type name is part of the identity: Decimal('151') != 151 != 151.0."""
    if v is None:
        return ("null", "NULL")
    if isinstance(v, list):
        return ("list", tuple(render(x) for x in v))
    if isinstance(v, dict):
        return ("dict", tuple(sorted((k, render(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))

def nonfloat_key(row, float_cols):
    """Group key over the exact-rendered non-float cells. Rows are matched
    WITHIN a group by tolerant float equality (no positional zip of sorted
    floats — rounding for a sort key can order two within-tolerance values
    differently on each side and misalign the comparison)."""
    return tuple(render(v) for i, v in enumerate(row) if i not in float_cols)

def feq(a, b):
    if a is None or b is None:
        return a is None and b is None
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return str(a) == str(b)
    if math.isnan(fa) and math.isnan(fb):
        return True
    return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))

def cell_ok(a, b, is_float):
    if is_float:
        return feq(a, b)
    return render(a) == render(b)

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
        got_sel = con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel")
        got_types = got_sel.types
        got = got_sel.fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        want_cols = sorted(want_rel.columns)
        if [c.lower() for c in got_cols] != [c.lower() for c in want_cols]:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); n_fail += 1; continue
        want_sel = con.sql(f"SELECT {', '.join(want_cols)} FROM want_rel")
        want_types = want_sel.types
        want = want_sel.fetchall()
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        # float columns (both sides FLOAT/DOUBLE) get tolerance compare;
        # every other column must match on DuckDB type name exactly —
        # the driver's hash is type-sensitive (BIGINT vs HUGEINT vs DOUBLE
        # with identical values still fails there), so it fails here too.
        float_cols = set()
        type_mismatch = None
        for i, (gt, wt) in enumerate(zip(got_types, want_types)):
            gf, wf = is_float_type(gt), is_float_type(wt)
            if gf and wf:
                float_cols.add(i)
            elif norm_type(gt) != norm_type(wt):
                type_mismatch = (got_cols[i], str(gt), str(wt))
                break
        if type_mismatch:
            c, gt, wt = type_mismatch
            print(f"FAIL {name}: column {c} type {gt} (spark) != {wt} (oracle) — "
                  f"driver hash is type-sensitive; CAST the oracle side")
            n_fail += 1
            continue
        from collections import defaultdict
        got_g, want_g = defaultdict(list), defaultdict(list)
        for r in got:
            got_g[nonfloat_key(r, float_cols)].append(r)
        for r in want:
            want_g[nonfloat_key(r, float_cols)].append(r)
        bad = []
        for key in set(got_g) | set(want_g):
            gs, ws = got_g.get(key, []), list(want_g.get(key, []))
            if len(gs) != len(ws):
                bad.append((gs[0] if gs else None, ws[0] if ws else None))
                continue
            # Pair rows within the group sorted by their float values:
            # insertion-order greedy can reject sets that have a valid
            # tolerant matching, while sorted positional pairing is optimal
            # for 1-D tolerances (it minimizes the max pairwise distance,
            # so if any within-tolerance assignment exists, the sorted one
            # is within tolerance too). Groups are almost always singletons.
            def fkey(row):
                out = []
                for i in sorted(float_cols):
                    v = row[i]
                    try:
                        out.append((0, float(v)))
                    except (TypeError, ValueError):
                        out.append((1, 0.0) if v is None else (2, 0.0))
                return out
            gs_s, ws_s = sorted(gs, key=fkey), sorted(ws, key=fkey)
            for g_row, w_row in zip(gs_s, ws_s):
                if not all(cell_ok(x, y, i in float_cols)
                           for i, (x, y) in enumerate(zip(g_row, w_row))):
                    bad.append((g_row, w_row))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: got={bad[0][0]} want={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
