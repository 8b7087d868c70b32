"""CLI entry point (reference parity: the reference ships a stub CLI,
reference __main__.py:6-13 — ours actually runs queries).

    python -m ssb_coefficient_maker_spark --version
    python -m ssb_coefficient_maker_spark list
    python -m ssb_coefficient_maker_spark run q01_pricing_summary --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ssb_coefficient_maker_spark")
    parser.add_argument("--version", action="store_true", help="print version and exit")
    sub = parser.add_subparsers(dest="cmd")
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    args = parser.parse_args(argv)

    if args.version:
        from ssb_coefficient_maker_spark import __version__

        print(__version__)
        return 0
    if args.cmd == "list":
        from ssb_coefficient_maker_spark.queries import REGISTRY

        for name, spec in REGISTRY.items():
            print(f"{name:28s} [{spec.group}]{'' if spec.oracle else ' (rows-only)'}")
        return 0
    if args.cmd == "run":
        from ssb_coefficient_maker_spark.queries import REGISTRY
        from ssb_coefficient_maker_spark.session import get_spark

        if args.query not in REGISTRY:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"cli:{args.query}")
        REGISTRY[args.query].fn(spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    parser.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
