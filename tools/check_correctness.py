#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (columns sorted by name, values
hashed). Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if os.path.exists(os.path.join(d, "_ERROR")):
            # the query threw on the Spark side; never grade leftovers
            err = open(os.path.join(d, "_ERROR")).read().strip()[:200]
            results[name] = {"check": "builder_error", "ok": False, "err": err}
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = {"check": "rows_only", "rows": len(got), "ok": len(got) > 0}
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"check": "oracle_error", "ok": False, "err": str(e)[:200]}
            continue
        g, e = canon(got.copy()), canon(exp.copy())
        ok_schema = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                results[name] = {"check": "oracle", "ok": False,
                                 "detail": str(ex).split("\n")[0][:200],
                                 "rows": len(g), "exp_rows": len(e)}
                continue
        # Driver-side hashes are computed over concrete value representations,
        # so a dtype divergence (e.g. DuckDB HUGEINT -> pandas float64 vs Spark
        # int64) fails the driver even when values compare equal here. Treat it
        # as a hard failure so the local gate reproduces the driver's verdict.
        dtype_mismatch = []
        if ok_schema:
            for c in g.columns:
                gd, ed = str(g[c].dtype), str(e[c].dtype)
                if gd != ed:
                    dtype_mismatch.append({"col": c, "spark": gd, "oracle": ed})
        ok_dtype = not dtype_mismatch
        r = {"check": "oracle", "ok": ok_schema and ok_rows and ok_vals and ok_dtype,
             "rows": len(g), "exp_rows": len(e),
             "schema_ok": ok_schema, "got_cols": list(g.columns), "exp_cols": list(e.columns)}
        if dtype_mismatch:
            r["dtype_mismatch"] = dtype_mismatch
        results[name] = r
    n_ok = sum(1 for r in results.values() if r["ok"])
    for name, r in sorted(results.items()):
        flag = "OK " if r["ok"] else "FAIL"
        extra = "" if r["ok"] else " " + json.dumps({k: v for k, v in r.items() if k != "ok"})[:300]
        print(f"{flag} {name} ({r.get('check')}, rows={r.get('rows')}){extra}")
    n_dtype = sum(1 for r in results.values() if r.get("dtype_mismatch"))
    print(f"\n{n_ok}/{len(results)} pass; dtype-divergent oracles: {n_dtype}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
