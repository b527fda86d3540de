#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
  python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already populated
outDir with <name>/ parquet dirs + oracle_sql.json. For each query:
creates DuckDB views over the sfDir parquet tables, runs the oracle SQL,
loads the Spark parquet result, sorts columns by name (and rows by all
columns), and compares values exactly (doubles: exact; report max abs diff
when not exact).

Driver-side-only deps (duckdb/pandas/pyarrow) are fine here: this script is
a dev tool, never imported by the Scala library.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = True
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        print(f"  [{name}] COLUMN MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return False
    if len(spark_df) != len(oracle_df):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}")
        return False
    s, o = norm(spark_df), norm(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # int-on-one-side / float-on-the-other means the two engines emitted
        # different TYPES for this column (e.g. DuckDB integer SUM -> HUGEINT
        # -> float64 in pandas, vs Spark int64). Values may compare equal
        # numerically, but the driver hashes rendered values ("1234" vs
        # "1234.0") -> hash mismatch. Treat as a failure so the local mirror
        # predicts the driver. (Bit us in round 2: split_train_val,
        # curate_corpus.)
        int_float_split = (
            (pd.api.types.is_integer_dtype(sv) and pd.api.types.is_float_dtype(ov))
            or (pd.api.types.is_float_dtype(sv) and pd.api.types.is_integer_dtype(ov)))
        if int_float_split:
            print(f"  [{name}] col {c}: DTYPE SPLIT spark={sv.dtype} oracle={ov.dtype} "
                  f"(driver would hash-mismatch; cast the oracle column)")
            ok = False
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype(float)
            ov = ov.astype(float)
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
            if neq.any():
                d = (sv[neq] - ov[neq]).abs().max()
                print(f"  [{name}] col {c}: {int(neq.sum())} rows differ, max_abs_diff={d}")
                i = neq.idxmax()
                print(f"    first diff row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
                ok = False
        else:
            sv2 = sv.astype(object).where(pd.notna(sv), None)
            ov2 = ov.astype(object).where(pd.notna(ov), None)
            neq = [i for i in range(len(sv2)) if sv2.iloc[i] != ov2.iloc[i]]
            if neq:
                i = neq[0]
                print(f"  [{name}] col {c} ({sv.dtype} vs {ov.dtype}): {len(neq)} rows differ; first row {i}: spark={sv2.iloc[i]!r} oracle={ov2.iloc[i]!r}")
                ok = False
        # dtype sanity (driver checks schema too)
        if str(sv.dtype) != str(ov.dtype):
            print(f"  [{name}] dtype note col {c}: spark={sv.dtype} oracle={ov.dtype}")
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if compare(name, spark_df, oracle_df):
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
