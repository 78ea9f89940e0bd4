"""Local differential harness mimicking the driver's correctness gate:
run every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compare row count, schema (column names), and values
(column-name-sorted, row-sorted, exact match; floats also reported with
max-abs-diff so hash-risk is visible).

Usage: python tests/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize pandas conversion artifacts: timestamp unit (Spark->ns,
    # DuckDB->us; both are semantically microsecond TIMESTAMP) and
    # date-as-object vs date-as-datetime64
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and all(
            v is None or hasattr(v, "year") for v in df[c].head(20)
        ):
            try:
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except (ValueError, TypeError):
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_df) != len(oracle_df):
        return [f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}"]
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [
            f"columns spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        ]
    s, o = canon(spark_df), canon(oracle_df)
    for col in s.columns:
        sk, ok = s[col].dtype, o[col].dtype
        if sk != ok and not (sk.kind == "M" and ok.kind == "M"):
            issues.append(f"dtype {col}: spark={sk} oracle={ok}")
    for col in s.columns:
        sc, oc = s[col], o[col]
        if sc.dtype.kind == "f" or oc.dtype.kind == "f":
            sc_n, oc_n = sc.astype(float), oc.astype(float)
            both_nan = sc_n.isna() & oc_n.isna()
            diff = (sc_n - oc_n).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                mx = diff[bad].max()
                issues.append(
                    f"col {col}: {int(bad.sum())} float mismatches, max_abs_diff={mx!r}"
                )
        else:
            eq = (sc == oc) | (sc.isna() & oc.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                issues.append(
                    f"col {col}: {int((~eq).sum())} mismatches, first: "
                    f"spark={sc[idx]!r} oracle={oc[idx]!r}"
                )
    return issues


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    from postgresimporter_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for i in issues[:5]:
                print(f"   {i}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
