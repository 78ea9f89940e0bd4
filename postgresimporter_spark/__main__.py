"""CLI entry point: ``python -m postgresimporter_spark <sources> [flags]``.

Mirrors the reference CLI (E1, cli.py:7-128 / main.py:555-593): positional
sources, hook flags, stage toggles, env-var DB fallback. Runs the 6-stage
pipeline and prints the reconciliation report.
"""

from __future__ import annotations

import logging
import sys

from .config import parse_args
from .pipeline import run_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    cfg = parse_args(argv)
    logging.basicConfig(level=cfg.log_level.upper())
    if not cfg.sources:
        logging.fatal("no sources given")
        return 1
    spark = get_spark(app_name="postgresimporter-spark-cli")
    result = run_pipeline(spark, cfg)
    if result.report is not None:
        result.report.show(truncate=False)
    # reference semantics: reconciliation failure is a FATAL log, not a
    # non-zero exit (main.py:301-302)
    return 0


if __name__ == "__main__":
    sys.exit(main())
