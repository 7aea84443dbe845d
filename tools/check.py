#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Approximates the driver's t2 gate: for each query, read the Spark parquet
dump (written by graft.Verify), run the oracle SQL in DuckDB over the same
scale-factor tables, sort columns by name, sort rows, and compare values
exactly. Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact 64-bit repr — catches any ulp drift
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return sorted(c for c in cols), out


def main(sf_dir, out_dir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if prefixes:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Flag type promotions the driver's pandas fetch renders
            # differently than Spark (DuckDB SUM(BIGINT) -> HUGEINT, which
            # pandas turns into float64 "5000000.0"). fetchall() hides
            # this (HUGEINT -> Python int), and cursor.description only
            # reports the generic 'NUMBER' typecode — the relation API's
            # .types is the probe that actually resolves HUGEINT.
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t)]
            if hug:
                print(f"FAIL {name}: HUGEINT cols {hug} — cast to BIGINT "
                      f"in the oracle SQL (driver pandas fetch -> float)")
                fail += 1
                continue
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in spark.description]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL {name}: cols spark={sc} duck={dc}")
            fail += 1
        elif dr != sr:
            n = len(dr)
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL {name}: rows spark={len(sr)} duck={n} "
                  f"first_diffs={diffs[:3]}")
            for i in diffs[:2]:
                print(f"    spark: {sr[i]}\n    duck : {dr[i]}")
            if len(sr) != len(dr):
                print(f"    spark head: {sr[:2]}\n    duck head : {dr[:2]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(sr)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
