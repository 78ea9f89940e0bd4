"""Catalog CLI: run any registry query from the command line.

    python -m postgresimporter_spark.query q01_pricing_summary
    python -m postgresimporter_spark.query q26 --sf /root/testdata/sf0.1
    python -m postgresimporter_spark.query --list
    python -m postgresimporter_spark.query q05 --explain

Name matching accepts the full registry name or any unambiguous prefix
(``q26`` -> ``q26_minhash_lsh``). ``--explain`` prints the formatted
physical plan plus the ``plan_audit`` counters instead of executing;
``--json`` emits newline-delimited JSON rows (for piping) instead of
the table preview. The session is the engine's blessed one
(``session.py``: AQE, Arrow, UTC) — the same configuration every
oracle result was produced under.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m postgresimporter_spark.query",
        description="Run a catalog query against the parquet fixture dir.",
    )
    ap.add_argument("name", nargs="?", help="query name or unique prefix")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="fixture directory (default sf0.01)")
    ap.add_argument("--list", action="store_true",
                    help="list all catalog queries and exit")
    ap.add_argument("--explain", action="store_true",
                    help="print the physical plan + audit, don't execute")
    ap.add_argument("--json", action="store_true",
                    help="emit newline-delimited JSON rows")
    ap.add_argument("--limit", type=int, default=20,
                    help="table-preview row cap (default 20; JSON is uncapped)")
    args = ap.parse_args(argv)

    from .plans import registry

    reg = registry()
    if args.list or not args.name:
        for n in sorted(reg, key=lambda n: int(n[1:n.index("_")])):
            print(f"{n}\t{reg[n].description}")
        return 0

    # resolution order: exact name -> id prefix at the "_" boundary
    # ("q23" means q23_table_counts, never the q230.. tier) -> any
    # unambiguous prefix
    matches = (
        [n for n in reg if n == args.name]
        or [n for n in reg if n.startswith(args.name + "_")]
        or [n for n in reg if n.startswith(args.name)]
    )
    if not matches:
        print(f"no query matches {args.name!r} (try --list)",
              file=sys.stderr)
        return 1
    if len(matches) > 1:
        print(f"ambiguous {args.name!r}: {sorted(matches)}",
              file=sys.stderr)
        return 1
    name = matches[0]

    from .session import get_spark

    spark = get_spark(app_name=f"query-{name}")
    df = reg[name].fn(spark, args.sf)

    if args.explain:
        from .plans.audit import plan_audit

        df.explain("formatted")
        print(json.dumps(plan_audit(df), default=str, indent=2))
        return 0
    if args.json:
        for row in df.toJSON().toLocalIterator():
            print(row)
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
