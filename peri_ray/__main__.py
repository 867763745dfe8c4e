"""CLI entry: run validation pipelines from the shell.

    python -m peri_ray validate --input DIR_OR_GLOB --schema spec.json \
        --out OUT_DIR [--mode strict] [--id-column url]
    python -m peri_ray flagship --input DIR_OR_GLOB [--checkpoint CKPT]

The schema file is JSON Schema Draft 7 (decoded via the bridge).  This
is the only module besides bench.py allowed to own a Ray session, and
only when one isn't already running (driver contract)."""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_validate(args) -> int:
    ray = _ensure_ray()
    import ray.data as rd

    from peri_ray.jsonschema import from_json_schema
    from peri_ray.sources import write_validated, write_violations
    from peri_ray.validate import validate_dataset

    with open(args.schema) as f:
        spec = from_json_schema(json.load(f))
    ds = rd.read_parquet(args.input)
    combined = validate_dataset(ds, spec, mode=args.mode, id_column=args.id_column)
    write_validated(combined, f"{args.out}/validated")
    write_violations(combined, f"{args.out}/violations")
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_flagship(args) -> int:
    ray = _ensure_ray()
    import ray.data as rd

    from peri_ray.pipelines.flagship import run_flagship

    ds = rd.read_parquet(args.input)
    verdict = run_flagship(
        ds,
        checkpoint_dir=args.checkpoint,
        write_outputs=bool(args.checkpoint),
        id_column=args.id_column,
    )
    print(json.dumps({k: v for k, v in verdict.items() if k != "column_stats"},
                     default=str))
    ray.shutdown()
    return 0 if verdict["passed"] or args.allow_fail else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="peri_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="validate parquet against a JSON Schema")
    v.add_argument("--input", required=True)
    v.add_argument("--schema", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--mode", default="strict", choices=["strict", "permissive"])
    v.add_argument("--id-column", default=None)
    v.set_defaults(fn=cmd_validate)

    f = sub.add_parser("flagship", help="full verdict pipeline over web_pages parquet")
    f.add_argument("--input", required=True)
    f.add_argument("--checkpoint", default=None)
    f.add_argument("--id-column", default="url")
    f.add_argument("--allow-fail", action="store_true")
    f.set_defaults(fn=cmd_flagship)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
