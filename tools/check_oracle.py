#!/usr/bin/env python3
"""Dev-loop oracle self-check (mirrors the driver's t2 gate).

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: reads each
<outDir>/<name> parquet (Spark result) and runs <outDir>/oracle_sql.json's
SQL in DuckDB over the same sfDir parquet tables, then compares schema,
row count, and exact values (columns sorted by name, rows in result order).

Dev tooling only — the shipped library is pure Scala/Spark.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_df, duck_df):
    problems = []
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"rows spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv = [norm_cell(x) for x in s[c].tolist()]
        dv = [norm_cell(x) for x in d[c].tolist()]
        # timestamps: pandas may give ns vs us units; compare as strings
        if str(s[c].dtype).startswith("datetime") or str(d[c].dtype).startswith("datetime"):
            sv = [str(pd.Timestamp(x)) if x is not None else None for x in sv]
            dv = [str(pd.Timestamp(x)) if x is not None else None for x in dv]
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
        if mism:
            i, a, b = mism[0]
            problems.append(
                f"col {c}: {len(mism)}/{len(sv)} cells differ; first row {i}: "
                f"spark={a!r} duck={b!r}"
                + (f" (delta={a-b!r})" if isinstance(a, float) and isinstance(b, float) else ""))
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala dual-keys every entry under "<name>" and "<name>.parquet"
    # (driver-contract hardening); normalize to bare names and dedupe.
    oracle = {name.removesuffix(".parquet"): sql for name, sql in oracle.items()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}.parquet")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
