#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 dev/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle_sql.json entry in DuckDB over views of <sfDir>/*.parquet, and
compares row counts + values (columns sorted by name, rows in emitted
order). Reports per-query PASS/FAIL with first diffs.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols_sorted = sorted(oracle_rel.columns)
            oracle_rows = con.execute(
                f"SELECT {', '.join(ocols_sorted)} FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_cols != ocols_sorted:
            print(f"FAIL {name}: columns differ spark={spark_cols} oracle={ocols_sorted}")
            n_fail += 1
            continue
        # Mirror the driver's hash sensitivity to numeric *kind*: a DuckDB
        # HUGEINT (sum of BIGINT) lands in pandas as float64 and hashes as
        # "3549.0" against Spark's int64 "3549" — value-equal but hash-FAIL.
        sdt = con.sql(f"SELECT {', '.join(spark_cols)} FROM spark_rel").df().dtypes
        odt = con.sql(f"SELECT {', '.join(ocols_sorted)} FROM ({sql})").df().dtypes
        kind_bad = [(c, str(sdt[c]), str(odt[c])) for c in spark_cols
                    if sdt[c].kind != odt[c].kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind differs (spark vs oracle): {kind_bad}")
            n_fail += 1
            continue
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
            n_fail += 1
            continue
        bad = 0
        for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                if bad == 0:
                    print(f"FAIL {name}: row {i} spark={na} oracle={nb} (cols {spark_cols})")
                bad += 1
        if bad:
            print(f"     {name}: {bad}/{len(spark_rows)} rows differ")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracles:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
                print(f"ROWS {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable rows-only output: {e}")
                n_fail += 1
            n_skip += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
