#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check (SURVEY.md §5.3).

Usage: preflight.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers the
ten parquet tables as DuckDB views over <sfDir>, runs every oracle SQL,
and compares against the Spark-written parquet in <outDir>/<name>.
Columns are sorted by name before compare (mirrors the driver).
Exact value equality is required; floats are compared bitwise first and
approximately second so the report distinguishes "hash-fatal" from
"formatting" drift.
"""
import json, math, sys, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "tolist") and not hasattr(v, "hex"):  # numpy array
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleGen output)
            p = f"{p}/*.parquet"
        if p.endswith("*.parquet") or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        got = got_rel.df()
        want = want[sorted(want.columns)]
        got_cols = sorted(got.columns)
        if sorted(want.columns) != got_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} oracle={sorted(want.columns)}")
            n_fail += 1
            continue
        got = got[got_cols]
        # Dtype-KIND check (the stats_corpus r8 lesson): the driver's
        # exact-value hash tolerates width drift within a kind (INT32 vs
        # BIGINT, DATE vs TIMESTAMP — both coerce to the same pandas
        # kind and serialize identically) but NOT cross-kind drift: a
        # DuckDB HUGEINT (un-CAST sum()) coerces to float64, so every
        # value serializes as "665.0" vs Spark's "665" and the hash
        # fails even though the values are equal. Calibrated against
        # CORRECTNESS_r08: all 170 green rows pass this check; the one
        # red row (pre-fix stats_corpus) fails it.
        kind_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                    for c in got_cols
                    if got[c].dtype.kind != want[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind drift (col, spark, oracle): {kind_bad}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        bad, drift = [], []
        for c in got_cols:
            gv, wv = list(got[c]), list(want[c])
            for i, (g, w) in enumerate(zip(gv, wv)):
                g, w = norm(g), norm(w)
                eq = (g == w) or (g is None and w is None)
                if not eq and isinstance(g, float) and isinstance(w, float):
                    # distinguish last-ulp "formatting" drift (still a
                    # FAIL — the driver hashes exact values — but a
                    # rounding-discipline problem, not a logic bug)
                    if w != 0 and abs(g - w) / abs(w) < 1e-9:
                        drift.append((c, i, g, w))
                        continue
                if not eq:
                    bad.append((c, i, g, w))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad or drift:
            kind = "value mismatches" if bad else "float last-ulp drift"
            print(f"FAIL {name}: {kind} (col, row, spark, oracle): {(bad or drift)[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== preflight: {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
