#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (columns sorted by name,
rows in produced order, exact match expected; FP drift reported)."""
import duckdb, json, sys
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fails += 1
            continue
        got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
            fails += 1
            continue
        ok, notes = True, []
        for c in got.columns:
            a = got[c].reset_index(drop=True)
            b = exp[c].reset_index(drop=True)
            # Physical-type gate: the driver hashes physical types, so a
            # DuckDB widening (e.g. window SUM(BIGINT) -> HUGEINT ->
            # float64) must fail here even when the values agree.
            if str(a.dtype) != str(b.dtype):
                notes.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
                ok = False
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                an, bn = a.isna(), b.isna()
                if not an.equals(bn):
                    i = int(np.argmax(an.to_numpy() != bn.to_numpy()))
                    notes.append(f"{c}: null mismatch at row {i} "
                                 f"(got={a[i]!r} exp={b[i]!r})")
                    ok = False
                    continue
                av = a[~an].to_numpy(float)
                bv = b[~bn].to_numpy(float)
                if not np.array_equal(av, bv):
                    d = np.abs(av - bv)
                    rel = np.max(d / np.maximum(np.abs(bv), 1e-300))
                    i = int(np.argmax(d))
                    notes.append(f"{c}: not bit-exact, max rel {rel:.3e} "
                                 f"(got={av[i]!r} exp={bv[i]!r})")
                    if rel > 1e-12:
                        ok = False
            else:
                if not a.equals(b):
                    neq = a.astype(str) != b.astype(str)
                    i = int(np.argmax(neq.to_numpy()))
                    notes.append(f"{c}: mismatch at row {i} "
                                 f"(got={a[i]!r} exp={b[i]!r})")
                    ok = False
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name} rows={len(got)}" +
              ("" if not notes else " | " + "; ".join(notes[:4])))
        fails += 0 if ok else 1
    print(f"== {len(oracle) if not only else len(only)} queries, {fails} failing")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
