"""Local replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count +
sorted-column values. Usage: python tools/check_correctness.py [sf_dir] [names...]"""

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from cefspark.queries import REGISTRY
    from cefspark.session import get_spark

    spark = get_spark(app_name="correctness", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    n_pass = n_fail = n_rows_only = 0
    for name, (fn, oracle) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if oracle is None:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} duckdb={sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if g.equals(e):
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            neq = (g != e).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} mismatched rows of {len(g)}")
            print("  spark:", g[neq].head(3).to_dict("records"))
            print("  duck :", e[neq].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
