"""CLI entry point — the ``whitebox_tools --run=Tool`` analog.

    python -m whitebox_tools_ray list
    python -m whitebox_tools_ray run <query> [--sf-dir DIR] [--out FILE.parquet]
    python -m whitebox_tools_ray flagship [--corpus DIR] [--out DIR]

Owns its Ray session (scripts/CLIs do; library code never calls ray.init).
Suitable for ``ray job submit -- python -m whitebox_tools_ray run <query>``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="whitebox_tools_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list available operators/pipelines")
    runp = sub.add_parser("run", help="run one operator over the test tables")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--out", default=None, help="write result parquet here")
    runp.add_argument("--num-cpus", type=int, default=None)
    flag = sub.add_parser("flagship", help="run the pages flagship pipeline")
    flag.add_argument("--corpus", required=True)
    flag.add_argument("--out", required=True)
    flag.add_argument("--num-cpus", type=int, default=None)
    flag.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    from .pipelines.queries import ORACLE, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "sql-oracle" if name in ORACLE else "rows-only"
            print(f"{name:32s} {kind}")
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "run":
            if args.query not in QUERIES:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            t0 = time.time()
            res = QUERIES[args.query](args.sf_dir)
            import ray.data

            if isinstance(res, ray.data.Dataset):
                if args.out:
                    res.write_parquet(args.out)
                    n = None
                else:
                    n = res.count()
            else:
                n = len(res)
            print(json.dumps({"query": args.query, "rows": n,
                              "out": args.out, "sec": round(time.time() - t0, 3)}))
        elif args.cmd == "flagship":
            from .pipelines.flagship import flagship_pages

            res = flagship_pages(args.corpus, args.out, resume=not args.no_resume)
            print(json.dumps(res, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
