"""Catalog-wide negative-zero hash-hazard scan.

The external correctness gate hashes formatted rows, so a value that
compares equal across engines but formats differently — IEEE ``-0.0``
vs ``+0.0`` — is a hash mismatch even with max_abs_diff == 0 (this is
exactly what happened to q101_trend_slope in round 4).  This scan runs
every ``queries()``/``oracle_sql()`` pair at the driver's scale factor
and reports any float column where either engine emits a ``-0.0``.

A query is only *guaranteed* red when the two engines disagree on the
sign for the same row, but any ``-0.0`` at all is a latent hazard (the
other engine's rounding mode may flip on other data), so everything
found here should be normalized with ``+ 0.0`` on both sides.

Usage: python tests/negzero_scan.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def negzero_cols(df) -> list[tuple[str, int]]:
    out = []
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].to_numpy()
            with np.errstate(invalid="ignore"):
                n = int(np.sum((v == 0.0) & np.signbit(v)))
            if n:
                out.append((c, n))
    return out


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

    spark = get_spark(app_name="negzero-scan")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    hazards = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            s_neg = negzero_cols(sdf)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark: {str(e).splitlines()[0][:120]}", flush=True)
            continue
        o_neg = []
        if name in oracles:
            try:
                o_neg = negzero_cols(con.sql(oracles[name]).df())
            except Exception as e:  # noqa: BLE001
                print(
                    f"ERR  {name}: oracle: {str(e).splitlines()[0][:120]}",
                    flush=True,
                )
                continue
        if s_neg or o_neg:
            hazards += 1
            print(
                f"NEGZ {name}: spark={s_neg} oracle={o_neg} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        else:
            print(f"ok   {name} ({time.time() - t0:.1f}s)", flush=True)
    print(f"== {hazards} hazard queries / {len(names)} scanned", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
