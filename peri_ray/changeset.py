"""Changeset-style cast + validate — the data-shaped analog of the
reference's Ecto changeset layer (``/root/reference/lib/peri/ecto.ex:35-382``:
cast external attrs to typed fields, collect per-field cast errors as
``"is invalid"``, then run the schema validations over the casted
values).  The DB/BEAM glue (Repo integration, atom keys, Changeset
structs) stays out of scope; what survives the translation is the
pipeline contract: strings in → typed columns + ONE violations stream
that mixes cast errors with spec violations.

One fused ``map_batches`` stage per batch: vectorized grammar match +
masked cast per rule column, then the compiled validation plan over the
casted table, then both violation sets embed into the standard
list<struct> column (``validate.embed_violations``).  No extra pass,
no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.compile import compile_spec

__all__ = ["cast_and_validate"]

from peri_ray.errors import TEMPLATES

#: Ecto's cast-error message — registered with every other
#: reference-exact template in peri_ray.errors.TEMPLATES
CAST_MESSAGE = TEMPLATES["cast"]


def _coerce_with_violations(t: pa.Table, rules: dict[str, str]):
    """Coerce ``rules`` columns under the explicit lexical grammars
    (same grammars as :func:`peri_ray.sources.coerce_string_columns`)
    and return ``(coerced_table, cast_viols)`` where cast_viols is a
    sparse violations row table (__row + struct fields): one row per
    NON-NULL cell that failed its grammar.  Null cells are not cast
    errors — required-ness is the spec's call."""
    from peri_ray.sources import _COERCE_RES, _COERCE_TYPES

    rows, rule_ids, paths, actuals, expecteds = [], [], [], [], []
    for col, kind in rules.items():
        s = t.column(col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if pa.types.is_large_string(s.type):
            s = s.cast(pa.string())
        ok = pc.match_substring_regex(s, _COERCE_RES[kind])
        bad = pc.and_(pc.is_valid(s), pc.invert(pc.fill_null(ok, False)))
        bad_np = bad.to_numpy(zero_copy_only=False)
        clean = pc.if_else(pc.fill_null(ok, False), s,
                           pa.nulls(len(s), pa.string()))
        if kind in ("integer", "float"):
            clean = pc.replace_substring_regex(clean, r"^\+", "")
        out = pc.cast(clean, _COERCE_TYPES[kind])
        t = t.set_column(t.schema.get_field_index(col), col, out)
        idx = np.flatnonzero(bad_np)
        if len(idx):
            rows.extend(idx.tolist())
            rule_ids.extend([f"cast:{col}"] * len(idx))
            paths.extend([col] * len(idx))
            actuals.extend(s.take(pa.array(idx)).to_pylist())
            expecteds.extend([kind] * len(idx))
    viols = pa.table({
        "__row": pa.array(rows, pa.int64()),
        "rule_id": pa.array(rule_ids, pa.string()),
        "path": pa.array(paths, pa.string()),
        "message": pa.array([CAST_MESSAGE] * len(rows), pa.string()),
        "actual": pa.array(actuals, pa.string()),
        "expected": pa.array(expecteds, pa.string()),
    })
    return t, viols


class _CastValidateFn:
    """Per-batch: coerce → validate → embed combined violations."""

    def __init__(self, rules: dict[str, str], spec: dict, opts: dict):
        self.rules = dict(rules)
        self.plan = compile_spec(spec, **opts)

    def __call__(self, table: pa.Table) -> pa.Table:
        from peri_ray.validate import embed_violations

        coerced, cast_viols = _coerce_with_violations(table, self.rules)
        out, viols = self.plan.run_batch(coerced, with_rows=True)
        ids = self.plan._record_ids(coerced)
        out = out.append_column("record_id", ids)
        if cast_viols.num_rows:
            if viols.num_rows == 0:
                viols = cast_viols
            else:
                spec_v = viols.select(cast_viols.schema.names)
                # Ecto parity: a field with a cast error carries ONLY
                # "is invalid" — spec violations on the same (row,
                # field) (required/type on the nulled cell) are
                # superseded by the cast error
                def _keys(v: pa.Table) -> pa.Array:
                    return pc.binary_join_element_wise(
                        pc.cast(v.column("__row"), pa.string()),
                        v.column("path").combine_chunks(), ":")

                keep = pc.invert(pc.is_in(_keys(spec_v),
                                          value_set=_keys(cast_viols)))
                viols = pa.concat_tables(
                    [spec_v.filter(keep), cast_viols.cast(spec_v.schema)])
            # a cast error invalidates the row even when the spec alone
            # would have accepted the nulled cell
            bad_rows = np.unique(
                cast_viols.column("__row").to_numpy(zero_copy_only=False))
            valid = out.column("valid").combine_chunks().to_numpy(
                zero_copy_only=False).copy()
            valid[bad_rows] = False
            out = out.set_column(out.schema.get_field_index("valid"),
                                 "valid", pa.array(valid))
        return embed_violations(out, viols)


def cast_and_validate(ds, cast_rules: dict[str, str], spec: dict,
                      mode: str = "strict", id_column: str | None = None,
                      registry: dict | None = None,
                      batch_size: int | None = 8192):
    """Ecto-changeset-shaped ingestion: cast ``cast_rules`` string
    columns to typed columns (unparseable NON-NULL cell → a
    ``cast:<col>`` violation with Ecto's "is invalid" message and a
    nulled cell), then validate the casted table against ``spec``;
    returns the standard combined Dataset (typed columns + valid +
    record_id + violations) where the violations list mixes cast and
    spec entries.  The spec must declare the POST-cast types."""
    compile_spec(spec, mode=mode, id_column=id_column, registry=registry)
    opts = dict(mode=mode, id_column=id_column, registry=registry)
    return ds.map_batches(_CastValidateFn(cast_rules, spec, opts),
                          batch_format="pyarrow", batch_size=batch_size)
