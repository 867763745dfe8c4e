"""Spec inference: profile a Dataset in ONE streaming pass and emit a
Peri spec dict (the reverse direction of validation — what
`Peri.validate/3` consumes; reference spec grammar in
/root/reference/lib/peri.ex:200-320).

Shape: types come from the Arrow schema (free — no data pass);
nullability, string enum candidates and numeric min/max come from
per-block partials merged on the driver.  Partial size is bounded by
columns × (enum_threshold + 1) rows per block regardless of corpus
size, so the driver merge stays tiny at any scale; struct columns are
profiled recursively under dotted paths without materializing
anything.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def dtype_to_spec(dt: pa.DataType) -> Any:
    """Arrow physical type → Peri type tag (structs handled by the
    caller via recursion)."""
    if pa.types.is_boolean(dt):
        return "boolean"
    if pa.types.is_integer(dt):
        return "integer"
    if pa.types.is_floating(dt):
        return "float"
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return "string"
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return "binary"
    if pa.types.is_date(dt):
        return "date"
    if pa.types.is_time(dt):
        return "time"
    if pa.types.is_timestamp(dt):
        return "datetime" if dt.tz else "naive_datetime"
    if pa.types.is_duration(dt):
        return "duration"
    if (pa.types.is_list(dt) or pa.types.is_large_list(dt)
            or pa.types.is_fixed_size_list(dt)):
        inner = dt.value_type
        if pa.types.is_struct(inner):
            return ("list", "map")  # element schemas need their own pass
        return ("list", dtype_to_spec(inner))
    if pa.types.is_struct(dt):
        return "map"
    return "any"


class _ProfilePartial:
    """Batch → one row per (dotted) column path: count, null count,
    capped distinct strings, numeric min/max.  Distinct lists are
    capped at enum_threshold + 1 — enough to detect overflow exactly:
    if the true cardinality is ≤ threshold no block ever truncates, so
    the union is exact; otherwise some block or the union overflows
    and the column is correctly rejected as an enum."""

    def __init__(self, enum_threshold: int):
        self.cap = enum_threshold + 1

    def _walk(self, path: str, col: pa.ChunkedArray | pa.Array, rows: list):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dt = col.type
        n = len(col)
        nulls = col.null_count
        distinct = None
        vmin = vmax = None
        imin = imax = None
        if pa.types.is_struct(dt):
            rows.append((path, n, nulls, None, None, None, None, None))
            for i, f in enumerate(dt):
                child = col.field(i)
                if nulls:
                    # a null parent must count as null for the child too
                    child = pc.if_else(pc.is_valid(col), child,
                                       pa.nulls(n, f.type))
                self._walk(f"{path}.{f.name}", child, rows)
            return
        if pa.types.is_string(dt) or pa.types.is_large_string(dt):
            uniq = col.drop_null().unique()
            if len(uniq) <= self.cap:
                distinct = sorted(uniq.to_pylist())
            else:
                distinct = sorted(uniq.slice(0, self.cap).to_pylist())
        elif (pa.types.is_integer(dt) or pa.types.is_floating(dt)) and n > nulls:
            mm = pc.min_max(col)
            if pa.types.is_integer(dt):
                # keep integer bounds exact: a float64 round trip loses
                # precision past 2^53 and the inferred range could then
                # reject the very value it was profiled from
                imin = int(mm["min"].as_py())
                imax = int(mm["max"].as_py())
                vmin, vmax = float(imin), float(imax)
            else:
                vmin = float(mm["min"].as_py())
                vmax = float(mm["max"].as_py())
        rows.append((path, n, nulls, distinct, vmin, vmax, imin, imax))

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: list = []
        for name in t.column_names:
            self._walk(name, t.column(name), rows)
        return pa.table({
            "path": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nulls": pa.array([r[2] for r in rows], pa.int64()),
            "distinct": pa.array([r[3] for r in rows],
                                 pa.list_(pa.string())),
            "vmin": pa.array([r[4] for r in rows], pa.float64()),
            "vmax": pa.array([r[5] for r in rows], pa.float64()),
            "imin": pa.array([r[6] for r in rows], pa.int64()),
            "imax": pa.array([r[7] for r in rows], pa.int64()),
        })


def profile_columns(ds, enum_threshold: int = 16,
                    batch_size: int | None = 65536) -> dict[str, dict]:
    """Merged per-path profile: {path: {n, nulls, distinct|None,
    vmin, vmax}} — distinct is None once the cap is exceeded."""
    cap = enum_threshold + 1
    parts = ds.map_batches(_ProfilePartial(enum_threshold),
                           batch_format="pyarrow", batch_size=batch_size)
    merged: dict[str, dict] = {}
    for r in parts.take_all():
        m = merged.setdefault(r["path"], {
            "n": 0, "nulls": 0, "distinct": set(), "over": False,
            "vmin": None, "vmax": None, "imin": None, "imax": None})
        m["n"] += r["n"]
        m["nulls"] += r["nulls"]
        d = r["distinct"]
        if d is not None:  # None = non-string column (no enum tracking)
            m["distinct"].update(d)
            if len(d) >= cap or len(m["distinct"]) >= cap:
                m["over"] = True
        if r["vmin"] is not None:
            m["vmin"] = r["vmin"] if m["vmin"] is None else min(m["vmin"], r["vmin"])
            m["vmax"] = r["vmax"] if m["vmax"] is None else max(m["vmax"], r["vmax"])
        if r["imin"] is not None:
            m["imin"] = r["imin"] if m["imin"] is None else min(m["imin"], r["imin"])
            m["imax"] = r["imax"] if m["imax"] is None else max(m["imax"], r["imax"])
    out: dict[str, dict] = {}
    for path, m in merged.items():
        out[path] = {
            "n": m["n"], "nulls": m["nulls"],
            "distinct": (sorted(m["distinct"])
                         if m["distinct"] and not m["over"] else None),
            "vmin": m["vmin"], "vmax": m["vmax"],
            "imin": m["imin"], "imax": m["imax"],
        }
    return out


def infer_spec(ds, enum_threshold: int = 16, with_ranges: bool = False,
               batch_size: int | None = 65536) -> dict[str, Any]:
    """Infer a Peri spec for a Dataset: Arrow types → type tags,
    zero-null columns → ``("required", t)``, low-cardinality string
    columns → enum, struct columns → nested map specs.  With
    ``with_ranges`` numeric leaves also get the observed
    ``("range", (min, max))`` (validating the profiled data against
    the inferred spec passes by construction)."""
    schema = ds.schema()
    arrow_schema = pa.schema([(n, t) for n, t in
                              zip(schema.names, schema.types)])
    prof = profile_columns(ds, enum_threshold, batch_size)

    def _build(dt: pa.DataType, path: str) -> Any:
        if pa.types.is_struct(dt):
            nested = {f.name: _field(f.type, f"{path}.{f.name}") for f in dt}
            return nested
        base = dtype_to_spec(dt)
        p = prof.get(path, {})
        if base == "string" and p.get("distinct"):
            return ("enum", p["distinct"])
        if with_ranges and base == "integer" and p.get("imin") is not None:
            return (base, ("range", (p["imin"], p["imax"])))
        if with_ranges and base == "float" and p.get("vmin") is not None:
            return (base, ("range", (p["vmin"], p["vmax"])))
        return base

    def _field(dt: pa.DataType, path: str) -> Any:
        inner = _build(dt, path)
        p = prof.get(path, {})
        if p.get("n", 0) > 0 and p.get("nulls", 1) == 0:
            return ("required", inner)
        return inner

    return {f.name: _field(f.type, f.name) for f in arrow_schema}


def spec_as_table(spec: dict[str, Any], prefix: str = "") -> pa.Table:
    """Flatten an inferred spec to (field, type, required, enum_vals)
    rows — the comparable/driver-checkable rendering."""
    rows = []

    def _walk(s: dict[str, Any], prefix: str):
        for name, v in s.items():
            path = f"{prefix}{name}"
            required = False
            if isinstance(v, tuple) and v and v[0] == "required":
                required = True
                v = v[1]
            if isinstance(v, dict):
                rows.append((path, "map", required, None))
                _walk(v, path + ".")
                continue
            enum_vals = None
            if isinstance(v, tuple) and v and v[0] == "enum":
                rows.append((path, "string", required, ",".join(v[1])))
                continue
            if isinstance(v, tuple):
                rows.append((path, str(v[0]), required, None))
                continue
            rows.append((path, str(v), required, enum_vals))

    _walk(spec, prefix)
    return pa.table({
        "field": pa.array([r[0] for r in rows], pa.string()),
        "type": pa.array([r[1] for r in rows], pa.string()),
        "required": pa.array([r[2] for r in rows], pa.bool_()),
        "enum_vals": pa.array([r[3] for r in rows], pa.string()),
    })


def spec_diff_table(spec_a: dict[str, Any], spec_b: dict[str, Any],
                    prefix: str = "") -> pa.Table:
    """Schema-evolution diff of two inferred specs (snapshot A → B):
    one row per detected change — ``added`` / ``removed`` (field
    presence), ``type_changed``, ``required_changed``,
    ``enum_changed`` — with the before/after rendering.  A field can
    emit several rows (e.g. a type change AND a required flip).

    Driver-side over the flattened :func:`spec_as_table` rows (specs
    are schema-sized, not data-sized); the data-dependent inputs
    (required flags, enum sets) come from the streaming inference
    passes that built the specs."""
    def _render(v) -> str:
        # faithful type rendering: spec_as_table collapses ('list', X)
        # to 'list', which would make a list element-type change
        # invisible to the diff
        if isinstance(v, tuple) and v and v[0] == "list" and len(v) > 1:
            return f"list[{_render(v[1])}]"
        if isinstance(v, tuple) and v:
            return str(v[0])
        if isinstance(v, dict):
            return "map"
        return str(v)

    def _index(spec, pref):
        out = {}
        for name, v in spec.items():
            path = f"{pref}{name}"
            required = False
            if isinstance(v, tuple) and v and v[0] == "required":
                required = True
                v = v[1]
            if isinstance(v, dict):
                out[path] = ("map", required, None)
                out.update(_index(v, path + "."))
                continue
            if isinstance(v, tuple) and v and v[0] == "enum":
                out[path] = ("string", required, ",".join(v[1]))
                continue
            out[path] = (_render(v), required, None)
        return out

    a, b = _index(spec_a, prefix), _index(spec_b, prefix)
    rows = []
    for f in sorted(set(a) | set(b)):
        if f not in b:
            rows.append((f, "removed", a[f][0], None))
            continue
        if f not in a:
            rows.append((f, "added", None, b[f][0]))
            continue
        (ta, ra, ea), (tb, rb, eb) = a[f], b[f]
        if ta != tb:
            rows.append((f, "type_changed", ta, tb))
        if ra != rb:
            rows.append((f, "required_changed", str(ra).lower(),
                         str(rb).lower()))
        if ea != eb:
            rows.append((f, "enum_changed", ea, eb))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "field": pa.array([r[0] for r in rows], pa.string()),
        "change": pa.array([r[1] for r in rows], pa.string()),
        "before": pa.array([r[2] for r in rows], pa.string()),
        "after": pa.array([r[3] for r in rows], pa.string()),
    })
