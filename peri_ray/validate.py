"""Dataset-level validation API — ``Peri.validate/3`` and
``Peri.conforms?/3`` lifted to ``ray.data.Dataset`` scale
(reference ``lib/peri.ex:572-604,443-450``).

Design (SURVEY §3.5): validation is ONE stateless ``map_batches`` stage
over zero-copy Arrow batches.  Each output row carries its input columns
(strict-projected or permissive), a ``valid`` bool, and a
``violations`` list<struct> column.  The two logical sinks (validated
rows, violations rows) are *views* over that single stage:

- ``validated(ds)``   → drop the violations column
- ``violations(ds)``  → flatten the list column into the violations table

At 100 TB you consume the combined stream once (write partitioned
parquet), then derive the violations view by re-reading ONLY the
``record_id``+``violations`` columns (parquet column pruning makes the
second pass cheap) — never by running the kernels twice.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from peri_ray.compile import VIOLATION_SCHEMA, Plan, compile_spec

__all__ = [
    "compile_spec",
    "Plan",
    "validate_batch",
    "validate_dataset",
    "violations_dataset",
    "violation_rule_counts",
    "validated_dataset",
    "conforms",
    "VIOLATION_SCHEMA",
]


def validate_batch(plan: Plan, table: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Single-batch entry (test/conformance surface)."""
    return plan.run_batch(table)


#: list<struct> layout of the embedded per-row violations column
VIOL_LIST_TYPE = pa.list_(
    pa.struct(
        [
            ("rule_id", pa.string()),
            ("path", pa.string()),
            ("message", pa.string()),
            ("actual", pa.string()),
            ("expected", pa.string()),
        ]
    )
)


def embed_violations(out: pa.Table, viols: pa.Table) -> pa.Table:
    """Attach a sparse violations row table (``__row`` + struct fields)
    to ``out`` as the aligned list<struct> ``violations`` column —
    fully vectorized (stable argsort + bincount offsets), shared by the
    validation map stage and the changeset cast layer."""
    n = out.num_rows
    if viols.num_rows == 0:
        # fast path: all-empty list column, no python row work
        offsets = pa.array(np.zeros(n + 1, np.int32))
        empty = pa.ListArray.from_arrays(
            offsets, pa.array([], type=VIOL_LIST_TYPE.value_type)
        )
        return out.append_column("violations", empty)
    # sparse path: stable-sort violation rows by their source row
    # index, then a bincount gives the list offsets
    rows_np = viols.column("__row").to_numpy(zero_copy_only=False)
    order = np.argsort(rows_np, kind="stable")
    sorted_viols = viols.take(pa.array(order))
    fields = [f.name for f in VIOL_LIST_TYPE.value_type]
    struct = pa.StructArray.from_arrays(
        [sorted_viols.column(f).combine_chunks() for f in fields], fields
    )
    counts = np.bincount(rows_np, minlength=n)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), struct
    )
    return out.append_column("violations", lists)


class _ValidateFn:
    """map_batches callable: validates a batch and embeds violations as a
    list<struct> column aligned to rows.  Plain function semantics (no
    per-actor state needed — the plan is immutable and ships in the task
    closure)."""

    def __init__(self, plan: Plan):
        self.plan = plan

    def __call__(self, table: pa.Table) -> pa.Table:
        out, viols = self.plan.run_batch(table, with_rows=True)
        ids = self.plan._record_ids(table)
        out = out.append_column("record_id", ids)
        return embed_violations(out, viols)


def validate_dataset(ds, spec: dict, mode: str = "strict", id_column: str | None = None,
                     registry: dict | None = None, batch_size: int | None = 8192,
                     concurrency: int | tuple | None = None,
                     string_length: str = "codepoints",
                     regex_engine: str = "re2"):
    """``ds.map_batches(validator)`` over Arrow batches.  Returns the
    combined dataset (input columns + valid + record_id + violations).

    Default is a stateless task pool (the immutable plan ships once in
    the task closure).  Pass ``concurrency`` for an actor pool: the plan
    compiles once per ACTOR in ``__init__`` — worth it when the spec is
    large (hundreds of rules / big enum sets / many regexes) and
    per-task deserialization would show up in ``ds.stats()``."""
    opts = dict(mode=mode, id_column=id_column, registry=registry,
                string_length=string_length, regex_engine=regex_engine)
    if concurrency is not None:
        # validate the spec EAGERLY on the driver (same contract as the
        # task path) — a bad spec must raise here, not inside a remote
        # actor constructor at execution time
        compile_spec(spec, **opts)
        return ds.map_batches(
            _ValidateActor,
            fn_constructor_args=(spec,),
            fn_constructor_kwargs=opts,
            concurrency=concurrency,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    plan = compile_spec(spec, **opts)
    return ds.map_batches(
        _ValidateFn(plan), batch_format="pyarrow", batch_size=batch_size
    )


class _ValidateActor(_ValidateFn):
    """Actor-pool variant: compile the plan once per actor."""

    def __init__(self, spec, **opts):
        super().__init__(compile_spec(spec, **opts))


def violations_dataset(combined):
    """Flatten the embedded violations column into the violations table
    ``(record_id, rule_id, path, message, actual, expected)``."""

    import pyarrow.compute as pc

    def _flatten(table: pa.Table) -> pa.Table:
        viols = table.column("violations").combine_chunks()
        lens = pc.list_value_length(viols).fill_null(0)
        total = pc.sum(lens).as_py() or 0
        if total == 0:
            return VIOLATION_SCHEMA.empty_table()
        ids = table.column("record_id").combine_chunks()
        parent = np.repeat(
            np.arange(table.num_rows),
            lens.to_numpy(zero_copy_only=False).astype(np.int64),
        )
        flat = pc.list_flatten(viols)  # struct array, vectorized unnest
        cols = {"record_id": ids.take(pa.array(parent))}
        for fname in ("rule_id", "path", "message", "actual", "expected"):
            cols[fname] = pc.struct_field(flat, fname)
        return pa.table(cols)

    return combined.map_batches(_flatten, batch_format="pyarrow")


def violation_rule_counts(combined) -> pa.Table:
    """Per-(rule_id, path) violation counts as a small Arrow table.

    Scale shape: one ≤n_rules-row partial per block (counted inside
    ``map_batches`` from the embedded violations column), then a driver
    merge of the tiny partials — the canonical tree-reduce.  No
    all-to-all shuffle: a ``groupby`` exchange would move every block
    for a result bounded by (blocks × rules) rows."""

    import pyarrow.compute as pc

    empty = pa.schema([("rule_id", pa.string()), ("path", pa.string()),
                       ("cnt", pa.int64())])

    def _partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t.column("violations").combine_chunks())
        if len(flat) == 0:
            return empty.empty_table()
        tb = pa.table({"rule_id": pc.struct_field(flat, "rule_id"),
                       "path": pc.struct_field(flat, "path")})
        g = tb.group_by(["rule_id", "path"]).aggregate([("path", "count")])
        return g.rename_columns(["rule_id", "path", "cnt"])

    parts = combined.map_batches(_partial, batch_format="pyarrow").take_all()
    if not parts:
        return empty.empty_table()
    merged = pa.Table.from_pylist(parts, schema=empty)
    out = merged.group_by(["rule_id", "path"]).aggregate([("cnt", "sum")])
    return out.rename_columns(["rule_id", "path", "cnt"])


def validated_dataset(combined):
    cols = [c for c in combined.schema().names if c != "violations"]
    return combined.select_columns(cols)


def conforms(ds, spec: dict, mode: str = "strict", registry: dict | None = None) -> bool:
    """Dataset-level ``Peri.conforms?`` (lib/peri.ex:443-450): True iff
    every row validates.  Aggregates the valid mask without materializing
    rows on the driver."""
    combined = validate_dataset(ds, spec, mode=mode, registry=registry)
    import ray.data  # noqa: F401  (Dataset already imported by caller)

    def _count_invalid(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = pc.sum(pc.invert(table.column("valid"))).as_py() or 0
        return pa.table({"invalid": pa.array([bad], pa.int64())})

    total = combined.map_batches(_count_invalid, batch_format="pyarrow").sum("invalid")
    return (total or 0) == 0


def spec_impact(ds, spec_old: dict, spec_new: dict, *,
                id_column: str | None = None,
                batch_size: int | None = 8192,
                registry: dict | None = None) -> "pa.Table":
    """Spec-evolution impact analysis: per (path, rule_id), the exact
    violation counts under the CURRENT spec and a PROPOSED spec, plus
    the delta — the "what breaks if we tighten this contract?" answer
    a schema owner needs before rolling a new version, computed in ONE
    fused pass (both compiled plans run per batch; the input is read
    once, not once per spec version).

    Per-batch partials are bounded by the union of the two specs'
    rule sets; the driver merge is spec-sized.  Rules present under
    only one version report 0 for the other.  Returns
    (path, rule_id, n_old, n_new, delta) sorted by (path, rule_id)."""
    import ray

    from peri_ray.compile import compile_spec

    plans = [compile_spec(spec_old, id_column=id_column,
                          registry=registry),
             compile_spec(spec_new, id_column=id_column,
                          registry=registry)]

    def _part(t: pa.Table) -> pa.Table:
        outs = []
        for ver, plan in enumerate(plans):
            _, viols = plan.run_batch(t)
            g = (viols.select(["path", "rule_id"])
                 .group_by(["path", "rule_id"])
                 .aggregate([([], "count_all")])
                 .rename_columns(["path", "rule_id", "n"]))
            outs.append(g.append_column(
                "ver", pa.array([ver] * g.num_rows, pa.int8())))
        return pa.concat_tables(outs)

    parts = ds.map_batches(_part, batch_format="pyarrow",
                           batch_size=batch_size)
    agg: dict[tuple, list[int]] = {}
    for t in (ray.get(r) for r in parts.to_arrow_refs()):
        for p, r, n, v in zip(t.column("path").to_pylist(),
                              t.column("rule_id").to_pylist(),
                              t.column("n").to_pylist(),
                              t.column("ver").to_pylist()):
            cur = agg.setdefault((p, r), [0, 0])
            cur[v] += int(n)
    keys = sorted(agg)
    return pa.table({
        "path": pa.array([k[0] for k in keys], pa.string()),
        "rule_id": pa.array([k[1] for k in keys], pa.string()),
        "n_old": pa.array([agg[k][0] for k in keys], pa.int64()),
        "n_new": pa.array([agg[k][1] for k in keys], pa.int64()),
        "delta": pa.array([agg[k][1] - agg[k][0] for k in keys],
                          pa.int64())})
