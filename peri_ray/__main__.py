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
    """Returns (ray, owned): shut down only a session this CLI opened —
    never one a surrounding driver owns (driver contract)."""
    import ray

    if ray.is_initialized():
        return ray, False
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray, True


def cmd_validate(args) -> int:
    ray, owned = _ensure_ray()
    import ray.data as rd

    from peri_ray.jsonschema import from_json_schema
    from peri_ray.validate import validate_dataset, violations_dataset

    with open(args.schema) as f:
        spec = from_json_schema(json.load(f))
    ds = rd.read_parquet(args.input)
    combined = validate_dataset(ds, spec, mode=args.mode, id_column=args.id_column)
    # ONE kernel pass: persist the combined stream, then derive both
    # sinks from cheap pruned re-reads of the written parquet
    combined_dir = f"{args.out}/combined"
    combined.write_parquet(combined_dir)
    names = rd.read_parquet(combined_dir).schema().names
    validated_cols = [c for c in names if c != "violations"]
    rd.read_parquet(combined_dir, columns=validated_cols).write_parquet(
        f"{args.out}/validated"
    )
    viols = violations_dataset(
        rd.read_parquet(combined_dir, columns=["record_id", "violations"])
    )
    if viols.count():
        viols.write_parquet(f"{args.out}/violations", partition_cols=["rule_id"])
    print(json.dumps({"out": args.out}))
    if owned:
        ray.shutdown()
    return 0


def cmd_flagship(args) -> int:
    ray, owned = _ensure_ray()
    import ray.data as rd

    from peri_ray.pipelines.flagship import run_flagship

    ds = rd.read_parquet(args.input)
    verdict = run_flagship(
        ds,
        checkpoint_dir=args.checkpoint,
        write_outputs=bool(args.checkpoint),
        id_column=args.id_column,
        id_source=rd.read_parquet(args.input, columns=[args.id_column]),
    )
    print(json.dumps({k: v for k, v in verdict.items() if k != "column_stats"},
                     default=str))
    if owned:
        ray.shutdown()
    return 0 if verdict["passed"] or args.allow_fail else 1


def cmd_compat(args) -> int:
    """Schema-level only — no data, no Ray: classify old→new spec
    changes and exit 0 iff backward compatible (CI gate shape)."""
    from peri_ray.compat import spec_compat
    from peri_ray.jsonschema import from_json_schema

    with open(args.old) as f:
        old = from_json_schema(json.load(f))
    with open(args.new) as f:
        new = from_json_schema(json.load(f))
    findings = spec_compat(old, new, mode=args.mode)
    ok = all(x["severity"] in ("compatible", "informational")
             for x in findings)
    print(json.dumps({"backward_compatible": ok, "findings": findings}))
    return 0 if ok or args.allow_breaking else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="peri_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="validate parquet against a JSON Schema")
    v.add_argument("--input", required=True)
    v.add_argument("--schema", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--mode", default="strict", choices=["strict", "permissive"])
    # required: without a real id the violations parquet would carry
    # per-batch row indices that repeat across blocks (unjoinable)
    v.add_argument("--id-column", required=True)
    v.set_defaults(fn=cmd_validate)

    f = sub.add_parser("flagship", help="full verdict pipeline over web_pages parquet")
    f.add_argument("--input", required=True)
    f.add_argument("--checkpoint", default=None)
    f.add_argument("--id-column", default="url")
    f.add_argument("--allow-fail", action="store_true")
    f.set_defaults(fn=cmd_flagship)

    c = sub.add_parser("compat",
                       help="classify old->new JSON Schema changes by "
                            "validation compatibility (exit 1 on "
                            "breaking)")
    c.add_argument("--old", required=True)
    c.add_argument("--new", required=True)
    c.add_argument("--mode", default="permissive",
                   choices=["strict", "permissive"])
    c.add_argument("--allow-breaking", action="store_true")
    c.set_defaults(fn=cmd_compat)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
