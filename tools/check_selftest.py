#!/usr/bin/env python3
"""Regression fixture for check.py's physical-type gate (and the value
gate), driven through check.py's REAL entry point so a refactor cannot
silently drop a gate.

Builds one "got" parquet (a window SUM, CAST to BIGINT -> int64) and an
oracle_sql.json with three entries over it:

  selftest_pass        — oracle carries the same CAST: must PASS.
  selftest_fail_dtype  — oracle omits the CAST, so DuckDB widens the
                         window SUM to HUGEINT (float64/object in
                         pandas). Values agree; ONLY the dtype differs.
                         The r7 q78 incident class: must FAIL.
  selftest_fail_value  — same dtypes, one value off: must FAIL.

Exit 0 iff check.py produced exactly PASS/FAIL/FAIL and a non-zero exit.
"""
import duckdb, json, os, subprocess, sys, tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

CAST_SQL = ("SELECT doc_id, CAST(SUM(n_chars) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
            " AS s FROM documents ORDER BY doc_id")
UNCAST_SQL = CAST_SQL.replace("CAST(", "(").replace(" AS BIGINT)", ")")
OFFBY1_SQL = CAST_SQL.replace("AS BIGINT)", "AS BIGINT) + 1")


def main():
    outdir = tempfile.mkdtemp(prefix="check_selftest_")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SFDIR}/documents.parquet')")
    os.makedirs(f"{outdir}/selftest_pass")
    con.execute(f"COPY ({CAST_SQL}) TO "
                f"'{outdir}/selftest_pass/part0.parquet' (FORMAT PARQUET)")
    # the widened/off-by-one oracles run against the SAME produced rows
    for name in ("selftest_fail_dtype", "selftest_fail_value"):
        os.symlink(f"{outdir}/selftest_pass", f"{outdir}/{name}")
    json.dump({"selftest_pass": CAST_SQL,
               "selftest_fail_dtype": UNCAST_SQL,
               "selftest_fail_value": OFFBY1_SQL},
              open(f"{outdir}/oracle_sql.json", "w"))

    r = subprocess.run(
        [sys.executable, f"{HERE}/check.py", SFDIR, outdir,
         "selftest_pass,selftest_fail_dtype,selftest_fail_value"],
        capture_output=True, text=True)
    print(r.stdout, end="")
    ok = (r.returncode != 0
          and "PASS selftest_pass" in r.stdout
          and "FAIL selftest_fail_dtype" in r.stdout
          and "dtype" in r.stdout
          and "FAIL selftest_fail_value" in r.stdout)
    print("SELFTEST " + ("PASS: gate fails widened dtypes and wrong "
                         "values, passes the exact form"
                         if ok else "FAIL: gate did not behave as pinned"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
