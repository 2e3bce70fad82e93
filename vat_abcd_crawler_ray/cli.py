"""CLI entry points (SURVEY §2.8: ``crawl`` / ``extract-file`` analogs
of the reference's ``Cmd::All`` / ``Cmd::FileToCsv``,
``/root/reference/src/main.rs:288-321``).

Owns its Ray session (the driver contract ``__ray_entry__`` does not).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_crawl(args: argparse.Namespace) -> int:
    import ray

    from .config import load_settings
    from .pipelines.crawl import CrawlRun
    from .pipelines.tables import write_all_tables

    _init_ray(args.num_cpus)
    settings = load_settings(args.settings)
    run = CrawlRun(
        args.pages, args.seeds, args.politeness, args.out, settings=settings,
        select_mode=args.select_mode,
        fetch_mode=args.fetch_mode,
        bootstrap_mode=args.bootstrap_mode,
        admission_mode=args.admission_mode,
    )
    metrics = run.run(resume=args.resume)
    if args.tables:
        write_all_tables(args.out, os.path.join(args.out, "tables"))
    json.dump(metrics.as_dict(), sys.stdout, default=str)
    print()
    ray.shutdown()
    return 0


def cmd_extract_file(args: argparse.Namespace) -> int:
    from .config import load_settings
    from .functions.fields import FieldRegistry
    from .pipelines.tables import archive_to_csv

    settings = load_settings(args.settings)
    reg = (
        FieldRegistry.from_json_file(args.fields)
        if args.fields
        else FieldRegistry()
    )
    sys.stdout.write(archive_to_csv(args.zip, reg, settings))
    return 0


def cmd_tables(args: argparse.Namespace) -> int:
    import ray

    from .pipelines.tables import write_all_tables

    _init_ray(args.num_cpus)
    paths = write_all_tables(args.run_dir, args.out)
    json.dump(paths, sys.stdout)
    print()
    ray.shutdown()
    return 0


def cmd_gpkg(args: argparse.Namespace) -> int:
    import ray

    from .pipelines.gpkg import units_gpkg

    _init_ray(args.num_cpus)
    stats = units_gpkg(args.run_dir, args.out, layer=args.layer)
    json.dump(stats, sys.stdout)
    print()
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vat_abcd_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the full crawl pipeline")
    c.add_argument("--pages", required=True)
    c.add_argument("--seeds", required=True)
    c.add_argument("--politeness", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--settings", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--tables", action="store_true", help="also write final tables")
    c.add_argument("--select-mode", default="auto",
                   choices=["auto", "driver", "distributed"])
    c.add_argument("--bootstrap-mode", default="auto",
                   choices=["auto", "driver", "distributed"])
    c.add_argument("--admission-mode", default="auto",
                   choices=["auto", "driver", "distributed"],
                   help="per-round link admission path (auto gates on "
                        "the surviving link count)")
    c.add_argument("--fetch-mode", default="store",
                   choices=["store", "scan", "http"],
                   help='page-table fetch tiers "store"/"scan"; "http" '
                        "fetches over the real network via the stdlib "
                        "urllib opener built from the crawl settings")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("extract-file", help="ZIP of ABCD XML → CSV on stdout")
    e.add_argument("--zip", required=True)
    e.add_argument("--fields", default=None, help="reference-format field spec JSON")
    e.add_argument("--settings", default=None)
    e.set_defaults(fn=cmd_extract_file)

    t = sub.add_parser("tables", help="derive final tables from a run dir")
    t.add_argument("--run-dir", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--num-cpus", type=int, default=None)
    t.set_defaults(fn=cmd_tables)

    g = sub.add_parser(
        "gpkg",
        help="units → GeoPackage POINT layer (W8, csv-to-gpkg.sh analog)",
    )
    g.add_argument("--run-dir", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--layer", default="out")
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gpkg)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
