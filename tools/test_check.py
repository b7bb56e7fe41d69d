#!/usr/bin/env python3
"""Self-test for check.py's driver-parity comparison semantics.

Builds tiny parquet results + oracle pairs with DuckDB and asserts the
calibrated behavior measured against the real driver (round 1→2):
  - machine-int width differences (INT vs BIGINT) PASS (driver hashes them
    the same),
  - HUGEINT-vs-BIGINT and DOUBLE-vs-BIGINT FAIL even with equal values
    (driver hash is type-sensitive — the round-1 f3/l8/mm2 failure class),
  - within-tolerance float differences PASS regardless of row order,
  - genuine value differences FAIL.

Run: python3 tools/test_check.py   (exit 0 = all behaviors verified)
"""
import io, json, os, sys, tempfile
import contextlib
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check


def run_case(name, result_sql, oracle_sql):
    """Materialize result_sql as the 'spark' parquet, compare vs oracle_sql;
    return True if check.py PASSes."""
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = os.path.join(tmp, "sf")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(sf_dir)
        os.makedirs(os.path.join(out_dir, name))
        con = duckdb.connect()
        # minimal fixture table so check.py's view registration finds one
        con.execute(f"COPY (SELECT 1 AS r_regionkey) TO "
                    f"'{sf_dir}/region.parquet' (FORMAT PARQUET)")
        con.execute(f"COPY ({result_sql}) TO "
                    f"'{out_dir}/{name}/part-0.parquet' (FORMAT PARQUET)")
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump({name: oracle_sql}, f)
        with open(os.path.join(out_dir, "queries.txt"), "w") as f:
            f.write(name)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = check.main(sf_dir, out_dir)
        return rc == 0, buf.getvalue()


def expect(name, result_sql, oracle_sql, should_pass):
    ok, log = run_case(name, result_sql, oracle_sql)
    verdict = "PASS" if ok else "FAIL"
    wanted = "PASS" if should_pass else "FAIL"
    if ok != should_pass:
        print(f"SELFTEST BROKEN: {name} -> {verdict}, wanted {wanted}\n{log}")
        return False
    print(f"selftest ok: {name} -> {verdict} (as required)")
    return True


def main():
    cases = [
        # int widths are equivalent at the driver (w1_rank evidence)
        ("int_width_ok",
         "SELECT CAST(1 AS INTEGER) AS a, 'x' AS k",
         "SELECT CAST(1 AS BIGINT) AS a, 'x' AS k",
         True),
        # HUGEINT never hashes like BIGINT even with identical values (l8)
        ("hugeint_fails",
         "SELECT CAST(100 AS BIGINT) AS a, 'x' AS k",
         "SELECT CAST(100 AS HUGEINT) AS a, 'x' AS k",
         False),
        # DOUBLE never hashes like an int (f3 floor/ceil)
        ("double_vs_int_fails",
         "SELECT CAST(151 AS BIGINT) AS a, 'x' AS k",
         "SELECT CAST(151.0 AS DOUBLE) AS a, 'x' AS k",
         False),
        # float columns compare with tolerance, any row order
        ("float_tolerance_ok",
         "SELECT * FROM (VALUES ('a', CAST(0.99999949 AS DOUBLE)), "
         "('a', CAST(2.0000001 AS DOUBLE))) t(k, v)",
         "SELECT * FROM (VALUES ('a', CAST(2.0 AS DOUBLE)), "
         "('a', CAST(0.99999951 AS DOUBLE))) t(k, v)",
         True),
        # beyond tolerance fails
        ("float_mismatch_fails",
         "SELECT 'a' AS k, CAST(1.0 AS DOUBLE) AS v",
         "SELECT 'a' AS k, CAST(1.001 AS DOUBLE) AS v",
         False),
        # non-float value differences fail exactly
        ("value_mismatch_fails",
         "SELECT 'a' AS k, CAST(1 AS BIGINT) AS v",
         "SELECT 'b' AS k, CAST(1 AS BIGINT) AS v",
         False),
        # DECIMAL scale is part of the rendered identity
        ("decimal_scale_fails",
         "SELECT 'a' AS k, CAST(1.50 AS DECIMAL(18,2)) AS v",
         "SELECT 'a' AS k, CAST(1.500 AS DECIMAL(18,3)) AS v",
         False),
        # same decimal scale, different precision: equivalent
        ("decimal_precision_ok",
         "SELECT 'a' AS k, CAST(1.50 AS DECIMAL(18,2)) AS v",
         "SELECT 'a' AS k, CAST(1.50 AS DECIMAL(12,2)) AS v",
         True),
    ]
    results = [expect(*c) for c in cases]
    if all(results):
        print(f"== all {len(cases)} checker-behavior cases hold")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
