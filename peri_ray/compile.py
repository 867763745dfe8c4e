"""Spec compiler + vectorized batch runtime.

``compile_spec(spec)`` turns a rule-spec (``peri_ray.spec``) into a
``Plan`` whose ``run_batch(pa.Table)`` validates one Arrow batch and
returns ``(out_table, violations_table)``.  This is the engine analogue of
``Peri.validate/3`` (reference ``lib/peri.ex:572-604``) re-expressed as
column kernels:

- every type/constraint check is a vectorized ``pyarrow.compute`` / numpy
  mask over the whole column (reference: per-value clauses of
  ``validate_field/4``, ``lib/peri.ex:785-1323``);
- null semantics follow the reference's clause ordering: ``nil`` passes
  every type except ``required`` and ``literal`` (``lib/peri.ex:1056``,
  ``825-838``, ``801-806``);
- defaults fill nulls before checks (``lib/peri.ex:970-991``); transforms
  run after successful validation (``lib/peri.ex:1058-1108``);
- nested map schemas recurse into ``pa.struct`` children with dotted error
  paths (``lib/peri.ex:1303-1318``, ``lib/peri/error.ex:225-232``);
- sibling fields all accumulate errors (``traverse_schema``,
  ``lib/peri.ex:686-707``) while list *elements* halt at the first failing
  element (``lib/peri.ex:1194-1216``);
- callbacks (``cond`` / ``dependent`` / ``custom``) run vectorized when
  marked (``spec.vec``) or expressible as column ops, else per-row inside
  the batch — the batch is the unit of distribution either way.

Violations are plain Arrow rows ``(row_idx, rule_id, path, message,
actual, expected)`` with message strings matching the reference templates
(``peri_ray.errors``).
"""

from __future__ import annotations

import inspect as _inspect
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray import spec as S
from peri_ray.errors import TEMPLATES, expand, render, summarize

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _np_bool(mask: pa.Array | pa.ChunkedArray, fill: bool = False) -> np.ndarray:
    """Arrow boolean array -> numpy bool, nulls becoming ``fill``."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if mask.null_count:
        mask = mask.fill_null(fill)
    return mask.to_numpy(zero_copy_only=False)


def _null_np(arr: pa.Array) -> np.ndarray:
    return _np_bool(pc.is_null(arr), fill=False)


def _dtype_ok(tname: str, dtype: pa.DataType) -> bool:
    """Column-dtype admissibility for a primitive type name.  Arrow columns
    are uniformly typed, so the reference's per-value guards
    (``is_binary/is_integer/...``, ``lib/peri.ex:793-799``) become one
    dtype check; int/float strictness preserved (``lib/peri.ex:779-780``,
    the v0.9.1 numeric-strictness fix)."""
    t = dtype
    if pa.types.is_null(t):
        return True  # all-null column: every value is nil -> null rules apply
    if tname == "any":
        return True
    if tname in ("string", "atom"):
        return (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or (pa.types.is_dictionary(t) and pa.types.is_string(t.value_type))
        )
    if tname == "integer":
        return pa.types.is_integer(t)
    if tname == "float":
        return pa.types.is_floating(t)
    if tname == "boolean":
        return pa.types.is_boolean(t)
    if tname == "map":
        return pa.types.is_struct(t) or pa.types.is_map(t)
    if tname == "date":
        return pa.types.is_date(t)
    if tname == "time":
        return pa.types.is_time(t)
    if tname in ("datetime", "naive_datetime"):
        return pa.types.is_timestamp(t)
    if tname == "duration":
        return pa.types.is_duration(t)
    if tname == "binary":
        return (
            pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)
        )
    return False


def _decode_dict(arr: pa.Array) -> pa.Array:
    if pa.types.is_dictionary(arr.type):
        return arr.dictionary_decode()
    return arr


def _render_cell(v: Any) -> str:
    return render(v)


@dataclass
class Violation:
    """Sparse draft: indices into the batch + constant-or-per-row fields."""

    indices: np.ndarray
    rule_id: str
    path: str
    messages: list[str]  # one per index
    actuals: list[str]
    expected: str


@dataclass
class FieldResult:
    values: pa.Array
    ok: np.ndarray  # bool per row; rows outside `active` stay True
    violations: list[Violation] = dc_field(default_factory=list)


class Ctx:
    """Per-batch validation context — the engine twin of ``Peri.Parser``
    (``lib/peri/parser.ex:15-112``): root batch for callbacks (1-arity
    sees root, 2-arity sees (current, root), lib/peri.ex:1571-1580),
    list-element scope via :meth:`for_list_elements` (the
    ``Parser.for_list_element`` twin, lib/peri/parser.ex:97-106).

    Inside a flattened list/map scope the root is the parent batch
    GATHERED per element (built lazily, only when a callback or a
    root-field lookup actually needs it), so every index stays aligned
    with the flat array."""

    def __init__(self, table: pa.Table):
        self._table: pa.Table | None = table
        self._base: "Ctx" | None = None
        self._parent_of = None
        self._elements: pa.Array | None = None
        self.n = table.num_rows
        self._root_rows: list[dict] | None = None
        self._cur_rows: list | None = None

    @property
    def root(self) -> pa.Table:
        if self._table is None:
            self._table = self._base.root.take(pa.array(self._parent_of))
        return self._table

    def root_rows(self) -> list[dict]:
        if self._root_rows is None:
            self._root_rows = self.root.to_pylist()
        return self._root_rows

    def current_rows(self) -> list | None:
        """List-element scope values (current_data); None at top level."""
        if self._cur_rows is None and self._elements is not None:
            self._cur_rows = self._elements.to_pylist()
        return self._cur_rows

    def for_list_elements(self, parent_of: np.ndarray, elements: pa.Array) -> "Ctx":
        child = Ctx.__new__(Ctx)
        child._table = None
        child._base = self
        child._parent_of = parent_of
        child._elements = elements
        child.n = len(parent_of)
        child._root_rows = None
        child._cur_rows = None
        return child


def _sparse_messages(template_key: str, ctx_const: dict, arr: pa.Array, idx: np.ndarray):
    """Build per-row messages for failing rows only (error path is sparse;
    cf. reference error-path cost note in BASELINE.md)."""
    template = TEMPLATES[template_key]
    if idx.size == 0:
        return [], []
    vals = arr.take(pa.array(idx)).to_pylist()
    actuals = [_render_cell(v) for v in vals]
    if "%{actual}" in template:
        msgs = [expand(template, {**ctx_const, "actual": a}) for a in actuals]
    else:
        msg = expand(template, ctx_const)
        msgs = [msg] * idx.size
    return msgs, actuals


def _apply_error_override(violations: list["Violation"], override) -> list["Violation"]:
    """Per-rule ``error:`` message override (``tag_error_override``,
    lib/peri.ex:1458-1479; ``apply_override``, lib/peri/error.ex:182-195):
    a static string replaces every message; a callable receives the
    violation fields as a dict and returns the new message (non-string
    returns keep the original)."""
    if override is None:
        return violations
    for v in violations:
        if callable(override):
            new = []
            for m, a in zip(v.messages, v.actuals):
                r = override({"message": m, "path": v.path, "rule_id": v.rule_id,
                              "actual": a, "expected": v.expected})
                new.append(r if isinstance(r, str) else m)
            v.messages = new
        else:
            v.messages = [str(override)] * len(v.messages)
    return violations


def _const_violation(
    template_key: str,
    ctx_const: dict,
    rule_id: str,
    path: str,
    arr: pa.Array,
    bad: np.ndarray,
    expected: str,
) -> Violation:
    idx = np.flatnonzero(bad)
    msgs, actuals = _sparse_messages(template_key, ctx_const, arr, idx)
    return Violation(idx, rule_id, path, msgs, actuals, expected)


# ---------------------------------------------------------------------------
# constraint kernels (reference lib/peri.ex:863-968, 1396-1438)
# ---------------------------------------------------------------------------


_GRAPHEME_RX = None


def _grapheme_lengths(arr: pa.Array) -> np.ndarray:
    """Exact grapheme-cluster counts (``String.length`` parity,
    lib/peri.ex:879-893) via the ``regex`` module's ``\\X``.  Scalar per
    row — opt in with ``compile_spec(string_length="graphemes")`` only
    where combining characters / emoji matter; the default codepoint
    path stays fully vectorized."""
    global _GRAPHEME_RX
    if _GRAPHEME_RX is None:
        import regex as _rx

        _GRAPHEME_RX = _rx.compile(r"\X")
    return np.array(
        [len(_GRAPHEME_RX.findall(v)) if v is not None else 0
         for v in arr.to_pylist()],
        np.int64,
    )


_PCRE_CACHE: dict[str, Any] = {}


def _pcre_match_mask(arr: pa.Array, pattern: str) -> np.ndarray:
    """PCRE-compatible regex path (the ``regex`` module: lookarounds,
    backrefs — what the reference's Elixir ~r// supports and RE2
    doesn't).  Scalar per row; compiled pattern cached per process."""
    import regex as _rx

    rx = _PCRE_CACHE.get(pattern)
    if rx is None:
        rx = _PCRE_CACHE[pattern] = _rx.compile(pattern)
    return np.array(
        [bool(rx.search(v)) if v is not None else False
         for v in arr.to_pylist()],
        bool,
    )


def _string_constraint(arr: pa.Array, name: str, val: Any,
                       string_length: str = "codepoints",
                       regex_engine: str = "re2",
                       grapheme_lens: np.ndarray | None = None):
    """Returns (ok_mask_over_nonnull, template_key, ctx).  String length
    defaults to codepoints (``pc.utf8_length``, vectorized); pass
    ``string_length="graphemes"`` for exact reference parity
    (``String.length``, ``lib/peri.ex:879-893``).  Regex is RE2 vs PCRE
    (documented deviation, SURVEY §2.3)."""
    if name == "regex":
        if regex_engine == "pcre":
            return _pcre_match_mask(arr, val), "string.regex", {"regex": f"~r/{val}/"}
        return _np_bool(pc.match_substring_regex(arr, val), False), "string.regex", {"regex": f"~r/{val}/"}
    if name == "eq":
        return _np_bool(pc.equal(arr, val), False), "string.eq", {"literal": val}
    if name in ("min", "max"):
        if string_length == "graphemes":
            if grapheme_lens is None:
                grapheme_lens = _grapheme_lengths(arr)
            ok = grapheme_lens >= val if name == "min" else grapheme_lens <= val
        else:
            cmp = pc.greater_equal if name == "min" else pc.less_equal
            ok = _np_bool(cmp(pc.utf8_length(arr), val), False)
        return ok, f"string.{name}", {"length": val}
    raise ValueError(name)


def _numeric_constraint(arr: pa.Array, name: str, val: Any):
    if name == "eq":
        return _np_bool(pc.equal(arr, val), False), "num.eq", {"value": val}
    if name == "neq":
        return _np_bool(pc.not_equal(arr, val), False), "num.neq", {"value": val}
    if name == "gt":
        return _np_bool(pc.greater(arr, val), False), "num.gt", {"value": val}
    if name == "gte":
        return _np_bool(pc.greater_equal(arr, val), False), "num.gte", {"value": val}
    if name == "lt":
        return _np_bool(pc.less(arr, val), False), "num.lt", {"value": val}
    if name == "lte":
        return _np_bool(pc.less_equal(arr, val), False), "num.lte", {"value": val}
    if name == "range":
        lo, hi = val
        ok = np.logical_and(
            _np_bool(pc.greater_equal(arr, lo), False),
            _np_bool(pc.less_equal(arr, hi), False),
        )
        return ok, "num.range", {"min": lo, "max": hi}
    if name == "multiple_of":
        # ints: exact remainder; floats: 1e-9 tolerance (lib/peri.ex:1432-1438)
        np_vals = arr.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            if pa.types.is_integer(arr.type):
                ok = np.mod(np.nan_to_num(np_vals.astype("float64")), val) == 0
            else:
                q = np.nan_to_num(np_vals.astype("float64")) / float(val)
                ok = np.abs(q - np.round(q)) < 1e-9
        return ok, "num.multiple_of", {"value": val}
    raise ValueError(name)


_BUILTIN_TRANSFORMS: dict[str, Callable[[pa.Array], pa.Array]] = {
    "upcase": pc.utf8_upper,
    "downcase": pc.utf8_lower,
    "trim": pc.utf8_trim_whitespace,
    "capitalize": pc.utf8_capitalize,
}


def _callback_arity(fn: Callable) -> int:
    try:
        params = [
            p
            for p in _inspect.signature(fn).parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        return len(params)
    except (TypeError, ValueError):
        return 1


# ---------------------------------------------------------------------------
# The recursive field validator
# ---------------------------------------------------------------------------


class Compiled:
    """A compiled type expression for one field; ``validate`` runs it over
    a whole column.  Mirrors the clause dispatch of ``validate_field/4``
    but resolved once at compile time instead of per value."""

    def __init__(self, texpr: Any, path: str, registry: dict | None, depth: int = 0,
                 string_length: str = "codepoints", regex_engine: str = "re2"):
        if depth > 64:
            # parity with @ref_depth_limit (lib/peri/parser.ex:112)
            raise RecursionError(f"{path}: ref recursion deeper than 64")
        self.texpr = texpr
        self.path = path
        self.registry = registry or {}
        self.depth = depth
        self.string_length = string_length
        self.regex_engine = regex_engine

    def _sub(self, texpr: Any, path: str | None = None) -> "Compiled":
        return Compiled(texpr, path if path is not None else self.path,
                        self.registry, self.depth + 1, self.string_length,
                        self.regex_engine)

    # -- entry ------------------------------------------------------------
    def validate(self, arr: pa.Array, active: np.ndarray, ctx: Ctx) -> FieldResult:
        t = self.texpr
        arr = _decode_dict(arr)

        if isinstance(t, str):
            return self._primitive(arr, active, ctx, t)
        if isinstance(t, dict):
            return self._nested(arr, active, ctx, t, presence=True)
        if isinstance(t, tuple) and t:
            tag = t[0]
            handler = getattr(self, f"_t_{tag}", None)
            if handler is not None:
                return handler(arr, active, ctx, t)
            if S.is_constraint_attachment(t):
                return self._attachment(arr, active, ctx, t)
        raise ValueError(f"{self.path}: cannot compile type {t!r}")

    # -- primitives -------------------------------------------------------
    def _primitive(self, arr: pa.Array, active: np.ndarray, ctx: Ctx, tname: str) -> FieldResult:
        ok = np.ones(len(active), dtype=bool)
        if tname == "any" or pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        nulls = _null_np(arr)
        if _dtype_ok(tname, arr.type):
            return FieldResult(arr, ok)
        # column-level type mismatch: every non-null active value fails
        # (lib/peri.ex:1320-1323)
        bad = active & ~nulls
        ok[bad] = False
        v = _const_violation(
            "type",
            {"expected": ":" + tname},
            f"type.{tname}",
            self.path,
            arr,
            bad,
            expected=":" + tname,
        )
        return FieldResult(arr, ok, [v])

    # -- (type, attachment): constraints / default / transform ------------
    def _attachment(self, arr: pa.Array, active: np.ndarray, ctx: Ctx, t: tuple) -> FieldResult:
        inner, attachment = t
        if isinstance(attachment, tuple) and attachment[0] == "default":
            default = attachment[1]
            if callable(default):
                default = default()
            nulls = _null_np(arr) if not pa.types.is_null(arr.type) else np.ones(len(active), bool)
            if nulls.any():
                if pa.types.is_null(arr.type):
                    probe = pa.array([default])
                    arr = pa.array([default] * len(active), type=probe.type)
                else:
                    try:
                        arr = arr.fill_null(default)
                    except (pa.ArrowTypeError, pa.ArrowInvalid):
                        # default physically incompatible with the column
                        # (an integer default on a oneof branch over a
                        # string-typed column): keep nulls.  Validity is
                        # unchanged — nil passes the branch's type the
                        # same way the filled default would, and required
                        # checks nulls BEFORE defaults fill
                        # (lib/peri.ex:825 clause order) — only the
                        # output value deviates, the documented
                        # branch-physical-type deviation class.
                        pass
            return self._sub(inner).validate(arr, active, ctx)

        if isinstance(attachment, tuple) and attachment[0] == "transform":
            res = self._sub(inner).validate(arr, active, ctx)
            res.values = self._apply_transform(res.values, attachment[1], active & res.ok, ctx)
            return res

        # constraint or constraint list: type check first, then every
        # option; ALL failing options are reported (lib/peri.ex:848-861)
        constraints = attachment if isinstance(attachment, list) else [attachment]
        base = self._sub(inner).validate(arr, active, ctx)
        arr2 = base.values
        nulls = _null_np(arr2)
        applies = active & base.ok & ~nulls  # nil passes constraints (clause order, lib/peri.ex:1056)
        ok = base.ok.copy()
        violations = list(base.violations)
        override = next((cv for cn, cv in constraints if cn == "error"), None)
        if applies.any() and not pa.types.is_null(arr2.type):
            # grapheme lengths scanned ONCE per column even when both min
            # and max constraints are present
            g_lens = None
            if (inner == "string" and self.string_length == "graphemes"
                    and any(cn in ("min", "max") for cn, _ in constraints)):
                g_lens = _grapheme_lengths(arr2)
            for cname, cval in constraints:
                if cname == "error":
                    continue
                if inner == "string":
                    mask, tkey, mctx = _string_constraint(arr2, cname, cval,
                                                          self.string_length,
                                                          self.regex_engine,
                                                          g_lens)
                else:
                    mask, tkey, mctx = _numeric_constraint(arr2, cname, cval)
                bad = applies & ~mask
                if bad.any():
                    ok[bad] = False
                    violations.extend(_apply_error_override([
                        _const_violation(
                            tkey, mctx, f"{inner}.{cname}", self.path, arr2, bad,
                            expected=f"{cname} {render(cval)}",
                        )
                    ], override))
        return FieldResult(arr2, ok, violations)

    def _apply_transform(self, arr: pa.Array, mapper: Any, rows: np.ndarray, ctx: Ctx) -> pa.Array:
        """Post-validation value rewrite (lib/peri.ex:1058-1108): only
        valid, non-null, active rows are transformed; nil is never passed
        to a transform (nil catch-all precedes the transform clauses)."""
        nulls = _null_np(arr)
        rows = rows & ~nulls
        if not rows.any():
            return arr
        if isinstance(mapper, str):
            if mapper in _BUILTIN_TRANSFORMS:
                out = _BUILTIN_TRANSFORMS[mapper](arr)
                return pc.if_else(pa.array(rows), out, arr)
            from peri_ray.functions import resolve_function

            mapper = resolve_function(mapper)
        if S.is_vectorized(mapper):
            out = mapper(arr)
            if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                out = pa.array(out)
            return pc.if_else(pa.array(rows), out, arr)
        # scalar python path; 2-arity sees the root record (lib/peri.ex:1071-1082)
        arity = _callback_arity(mapper)
        vals = arr.to_pylist()
        idx = np.flatnonzero(rows)
        if arity >= 2:
            roots = ctx.root_rows()
            for i in idx:
                vals[i] = mapper(vals[i], roots[i])
        else:
            for i in idx:
                vals[i] = mapper(vals[i])
        try:
            return pa.array(vals, type=arr.type)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return pa.array(vals)

    # -- required ----------------------------------------------------------
    def _t_required(self, arr: pa.Array, active: np.ndarray, ctx: Ctx, t: tuple) -> FieldResult:
        inner = t[1]
        # defaults still fill before the null check would fire — but a
        # default on a required field is a spec error caught in validate_spec
        nulls = _null_np(arr) if not pa.types.is_null(arr.type) else np.ones(len(active), bool)
        res = self._sub(inner).validate(arr, active, ctx)
        bad = active & nulls
        if bad.any():
            res.ok = res.ok.copy()
            res.ok[bad] = False
            expected = summarize(inner)
            msg = expand(TEMPLATES["required"], {"expected": expected})
            idx = np.flatnonzero(bad)
            res.violations.append(
                Violation(idx, "required", self.path, [msg] * idx.size, ["nil"] * idx.size, expected)
            )
        return res

    # -- literal (nil does NOT auto-pass: clause order lib/peri.ex:801) ----
    def _t_literal(self, arr: pa.Array, active: np.ndarray, ctx: Ctx, t: tuple) -> FieldResult:
        expected_v = t[1]
        ok = np.ones(len(active), bool)
        if pa.types.is_null(arr.type):
            mask = np.full(len(active), expected_v is None)
        elif expected_v is None:
            mask = _null_np(arr)
        else:
            try:
                mask = _np_bool(pc.equal(arr, expected_v), False)
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                mask = np.zeros(len(active), bool)
        bad = active & ~mask
        ok[bad] = False
        violations = []
        if bad.any():
            violations.append(
                _const_violation(
                    "literal",
                    {"expected": render(expected_v)},
                    "literal",
                    self.path,
                    arr,
                    bad,
                    expected=render(expected_v),
                )
            )
        return FieldResult(arr, ok, violations)

    # -- enum (nil passes: clause order lib/peri.ex:1056 vs 1174) ----------
    def _t_enum(self, arr: pa.Array, active: np.ndarray, ctx: Ctx, t: tuple) -> FieldResult:
        choices = list(t[1])
        opts = t[2] if len(t) == 3 else {}
        ok = np.ones(len(active), bool)
        violations: list[Violation] = []
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        nulls = _null_np(arr)
        applies = active & ~nulls
        # optional type pre-check (lib/peri.ex:1184-1192,1440-1456)
        pre = opts.get("type")
        if pre is not None:
            pre_res = self._sub(pre).validate(arr, applies, ctx)
            violations.extend(pre_res.violations)
            ok &= pre_res.ok
            applies &= pre_res.ok
        try:
            mask = _np_bool(pc.is_in(arr, value_set=pa.array(choices)), False)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            mask = np.zeros(len(active), bool)
        bad = applies & ~mask
        if bad.any():
            ok[bad] = False
            rendered = render(choices)
            violations.extend(_apply_error_override([
                _const_violation(
                    "enum", {"choices": rendered}, "enum", self.path, arr, bad, expected=rendered
                )
            ], opts.get("error")))
        return FieldResult(arr, ok, violations)

    # -- meta passthrough (lib/peri.ex:1788-1802) --------------------------
    def _t_meta(self, arr, active, ctx, t):
        return self._sub(t[1]).validate(arr, active, ctx)

    def _t_schema(self, arr, active, ctx, t):
        if len(t) == 3 and isinstance(t[2], tuple) and t[2][0] == "additional_keys":
            return self._schema_additional(arr, active, ctx, t[1], t[2][1])
        return self._sub(t[1]).validate(arr, active, ctx)

    def _schema_additional(self, arr, active, ctx, schema: dict, extra_t):
        """``{:schema, s, {:additional_keys, t}}`` (lib/peri.ex:1272-1296):
        declared struct fields validate by their own rules; every
        non-declared field validates against ``extra_t`` and is KEPT in
        the output (unlike plain strict filtering)."""
        n = len(active)
        ok = np.ones(n, bool)
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        if not pa.types.is_struct(arr.type):
            bad = active & ~_null_np(arr)
            ok[bad] = False
            return FieldResult(
                arr, ok,
                [_const_violation("type", {"expected": summarize(schema)}, "type.map",
                                  self.path, arr, bad, summarize(schema))],
            )
        nulls = _null_np(arr)
        applies = active & ~nulls
        declared = self._nested(arr, applies, ctx, schema, presence=True)
        ok &= declared.ok
        violations = list(declared.violations)
        names = [f.name for f in declared.values.type]
        children = [pc.struct_field(declared.values, nm) for nm in names]
        for f in arr.type:
            if f.name in schema:
                continue
            child_path = f"{self.path}.{f.name}" if self.path else f.name
            res = self._sub(extra_t, child_path).validate(
                pc.struct_field(arr, f.name), applies, ctx
            )
            bad = applies & ~res.ok
            ok[bad] = False
            violations.extend(res.violations)
            names.append(f.name)
            children.append(res.values)
        children = [
            c if not pa.types.is_null(c.type) else pa.nulls(n, pa.string()) for c in children
        ]
        rebuilt = pa.StructArray.from_arrays(children, names, mask=pa.array(nulls))
        return FieldResult(rebuilt, ok, violations)

    def _t_ref(self, arr, active, ctx, t):
        # registry lookup with depth cap (lib/peri.ex:1481-1519)
        name = t[1]
        if name not in self.registry:
            raise KeyError(f"{self.path}: unknown schema ref {name!r}")
        return self._sub(self.registry[name]).validate(arr, active, ctx)

    # -- either / oneof: ordered first-match (lib/peri.ex:1124-1162) -------
    def _t_either(self, arr, active, ctx, t):
        a, b = t[1]
        return self._choice(arr, active, ctx, [a, b], kind="either")

    def _t_oneof(self, arr, active, ctx, t):
        return self._choice(arr, active, ctx, list(t[1]), kind="oneof")

    def _choice(self, arr, active, ctx, branches, kind):
        n = len(active)
        ok = np.ones(n, bool)
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)  # nil passes (clause order)
        nulls = _null_np(arr)
        applies = active & ~nulls
        matched = np.zeros(n, bool)
        values = arr
        for branch in branches:
            remaining = applies & ~matched
            if not remaining.any():
                break
            try:
                res = self._sub(branch).validate(values, remaining, ctx)
            except ValueError:
                continue
            newly = remaining & res.ok
            if newly.any():
                # first-match wins, incl. branch transforms (lib/peri.ex:1124-1136).
                # Branch value rewrites merge back only when the branch kept
                # the column's physical type — a nested-schema branch's
                # strict struct rebuild may differ (per-row schemas don't
                # exist in a columnar world; cf. _t_multi's merge rule).
                if res.values is not values and res.values.type == values.type:
                    values = pc.if_else(pa.array(newly), res.values, values)
                matched |= newly
        bad = applies & ~matched
        violations = []
        if bad.any():
            ok[bad] = False
            if kind == "either":
                mctx = {
                    "first_type": summarize(branches[0]),
                    "second_type": summarize(branches[1]),
                }
                tkey = "either"
                expected = f"{summarize(branches[0])} or {summarize(branches[1])}"
            else:
                expected = " or ".join(summarize(b) for b in branches)
                mctx = {"oneof": expected}
                tkey = "oneof"
            violations.append(
                _const_violation(tkey, mctx, kind, self.path, arr, bad, expected=expected)
            )
        return FieldResult(values, ok, violations)

    # -- list --------------------------------------------------------------
    def _t_list(self, arr, active, ctx, t):
        elem_t = t[1]
        opts = t[2] if len(t) == 3 else {}
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
            bad = active & ~_null_np(arr)
            ok[bad] = False
            return FieldResult(
                arr,
                ok,
                [
                    _const_violation(
                        "type", {"expected": ":list"}, "type.list", self.path, arr, bad, ":list"
                    )
                ],
            )
        nulls = _null_np(arr)
        applies = active & ~nulls

        # list-level constraints (lib/peri.ex:1396-1430)
        lengths = pc.list_value_length(arr)
        for cname in ("min", "max", "unique"):
            if cname not in opts:
                continue
            cval = opts[cname]
            if cname == "min":
                mask = _np_bool(pc.greater_equal(lengths, cval), False)
                tkey, mctx = "list.min", {"min": cval}
            elif cname == "max":
                mask = _np_bool(pc.less_equal(lengths, cval), False)
                tkey, mctx = "list.max", {"max": cval}
            else:
                if not cval:
                    continue
                mask = self._list_unique_mask(arr)
                tkey, mctx = "list.unique", {}
            bad = applies & ~mask
            if bad.any():
                ok[bad] = False
                violations.extend(_apply_error_override([
                    _const_violation(
                        tkey, mctx, f"list.{cname}", self.path, arr, bad,
                        expected=expand(TEMPLATES[tkey], mctx),
                    )
                ], opts.get("error")))

        # element validation on flattened values; failures map back to the
        # parent row, keeping only the FIRST failing element per row
        # (halt-on-first, lib/peri.ex:1194-1216)
        lens = pc.list_value_length(arr).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(arr)  # skips null parents, aligned with lens
        parent_of = np.repeat(np.arange(n), lens)
        starts = np.zeros(n, np.int64)
        if n:
            np.cumsum(lens[:-1], out=starts[1:])
        flat_active = applies[parent_of] if len(flat) else np.empty(0, bool)
        elem_ctx = ctx.for_list_elements(parent_of, flat)
        res = self._sub(elem_t).validate(flat, flat_active, elem_ctx)
        elem_bad = flat_active & ~res.ok
        if elem_bad.any():
            bad_parents, first_pos = np.unique(parent_of[elem_bad], return_index=True)
            bad_flat_idx = np.flatnonzero(elem_bad)[first_pos]
            ok[bad_parents] = False
            msg_by_flat: dict[int, tuple[str, str, str, str]] = {}
            for v in res.violations:
                for j, fi in enumerate(v.indices):
                    if int(fi) not in msg_by_flat:
                        msg_by_flat[int(fi)] = (v.rule_id, v.messages[j], v.actuals[j], v.expected)
            for parent, fi in zip(bad_parents, bad_flat_idx):
                elem_idx = int(fi - starts[parent])
                rid, msg, act, exp = msg_by_flat.get(
                    int(fi), ("list.element", "invalid element", "nil", "")
                )
                violations.append(
                    Violation(np.array([parent]), rid, f"{self.path}.{elem_idx}", [msg], [act], exp)
                )
        if res.values is not flat and len(flat):
            # element transforms: rebuild list array in order, preserving
            # parent nulls (lib/peri.ex:1194-1216 rebuilds elements in order)
            offsets = np.concatenate([starts, [int(lens.sum())]])
            rebuilt = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), res.values,
            )
            if nulls.any():
                mask_arr = pa.array(nulls)
                rebuilt = pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()), res.values, mask=mask_arr
                )
            arr = rebuilt
        return FieldResult(arr, ok, violations)

    @staticmethod
    def _list_unique_mask(arr: pa.Array) -> np.ndarray:
        vals = arr.to_pylist()
        out = np.ones(len(vals), bool)
        for i, lst in enumerate(vals):
            if lst is not None:
                out[i] = len(set(map(str, lst))) == len(lst)
        return out

    # -- tuple: fixed-arity struct f0..fn (lib/peri.ex:1164-1172) ----------
    def _t_tuple(self, arr, active, ctx, t):
        types = list(t[1])
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        if not pa.types.is_struct(arr.type):
            bad = active & ~_null_np(arr)
            ok[bad] = False
            return FieldResult(
                arr, ok,
                [_const_violation("type", {"expected": ":tuple"}, "type.tuple", self.path, arr, bad, ":tuple")],
            )
        nulls = _null_np(arr)
        applies = active & ~nulls
        nfields = arr.type.num_fields
        if nfields != len(types):
            # arity is schema-vs-dtype level in the columnar world
            bad = applies
            ok[bad] = False
            mctx = {"length": len(types), "actual": nfields}
            violations.append(
                Violation(
                    np.flatnonzero(bad),
                    "tuple.size",
                    self.path,
                    [expand(TEMPLATES["tuple.size"], mctx)] * int(bad.sum()),
                    [str(nfields)] * int(bad.sum()),
                    str(len(types)),
                )
            )
            return FieldResult(arr, ok, violations)
        children = []
        changed = False
        for i, sub_t in enumerate(types):
            child = pc.struct_field(arr, i)
            res = self._sub(sub_t, f"{self.path}.{i}").validate(child, applies, ctx)
            elem_bad = applies & ~res.ok
            ok[elem_bad] = False
            violations.extend(res.violations)
            changed = changed or res.values is not child
            children.append(res.values)
        if changed:
            # element transforms/defaults rebuild the tuple from validated
            # values (validate_tuple_elements, lib/peri.ex:1325-1349)
            names = [f.name for f in arr.type]
            children = [
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in children
            ]
            children = [
                c if not pa.types.is_null(c.type) else pa.nulls(n, pa.string())
                for c in children
            ]
            arr = pa.StructArray.from_arrays(children, names, mask=pa.array(nulls))
        return FieldResult(arr, ok, violations)

    # -- multi: tagged-union dispatch (lib/peri.ex:1521-1556) --------------
    def _t_multi(self, arr, active, ctx, t):
        _, dispatch_field, branches = t
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        # dispatch column: current struct scope if the value is a struct
        # containing it, else the root table
        disp = None
        if not pa.types.is_null(arr.type) and pa.types.is_struct(arr.type):
            names = [f.name for f in arr.type]
            if dispatch_field in names:
                disp = pc.struct_field(arr, dispatch_field)
        if disp is None and dispatch_field in ctx.root.column_names:
            disp = ctx.root.column(dispatch_field).combine_chunks()
        if disp is None:
            disp = pa.nulls(n, pa.string())
        disp = _decode_dict(disp)
        disp_str = disp.cast(pa.string()) if not pa.types.is_string(disp.type) else disp
        values = arr
        matched = np.zeros(n, bool)
        for tag, branch in branches.items():
            mask = active & _np_bool(pc.equal(disp_str, str(tag)), False)
            matched |= mask
            if not mask.any():
                continue
            res = self._sub(branch).validate(values, mask, ctx)
            bad = mask & ~res.ok
            ok[bad] = False
            violations.extend(
                Violation(v.indices[mask[v.indices]], v.rule_id, v.path,
                          [m for m, i in zip(v.messages, v.indices) if mask[i]],
                          [a for a, i in zip(v.actuals, v.indices) if mask[i]],
                          v.expected)
                for v in res.violations
            )
            if res.values is not values and res.values.type == values.type:
                # per-branch value rewrites merge back only when branches
                # share a physical type; branch-specific strict projections
                # keep the original column (per-row schemas don't exist in
                # a columnar world)
                values = pc.if_else(pa.array(mask & res.ok), res.values, values)
        unknown = active & ~matched
        if unknown.any():
            ok[unknown] = False
            tags = ", ".join(f":{k}" for k in branches)
            idx = np.flatnonzero(unknown)
            tag_vals = disp_str.take(pa.array(idx)).to_pylist()
            msgs = [
                expand(
                    TEMPLATES["multi.unknown"],
                    {"field": ":" + dispatch_field, "tag": render(tv), "tags": tags},
                )
                for tv in tag_vals
            ]
            violations.append(
                Violation(idx, "multi.unknown", self.path, msgs,
                          [render(tv) for tv in tag_vals], tags)
            )
        return FieldResult(values, ok, violations)

    # -- cond: runtime branch selection (lib/peri.ex:993-999) --------------
    def _t_cond(self, arr, active, ctx, t):
        _, condition, t_true, t_false = t
        mask = self._row_mask(condition, active, ctx)
        res_t = self._sub(t_true).validate(arr, active & mask, ctx)
        res_f = self._sub(t_false).validate(arr, active & ~mask, ctx)
        ok = np.ones(len(active), bool)
        ok[active & mask & ~res_t.ok] = False
        ok[active & ~mask & ~res_f.ok] = False
        values = arr
        # same merge rule as _choice/_t_multi: branch value rewrites merge
        # back only when the branch kept the column's physical type (a
        # nested-schema branch's strict struct rebuild may differ)
        if res_t.values is not arr and res_t.values.type == arr.type:
            values = pc.if_else(pa.array(mask), res_t.values, values)
        if res_f.values is not arr and res_f.values.type == arr.type:
            values = pc.if_else(pa.array(~mask), res_f.values, values)
        return FieldResult(values, ok, res_t.violations + res_f.violations)

    def _row_mask(self, condition, active, ctx) -> np.ndarray:
        """Evaluate a cond/dependent condition into a row mask.  Column
        names and vectorized callables stay on the Arrow path; opaque
        callables fall back to per-row (SURVEY §7.6.1)."""
        if isinstance(condition, str):
            col = ctx.root.column(condition).combine_chunks()
            if pa.types.is_boolean(col.type):
                return _np_bool(col, False)
            return ~_null_np(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        if S.is_vectorized(condition):
            out = condition(ctx.root)
            if isinstance(out, (pa.Array, pa.ChunkedArray)):
                return _np_bool(out, False)
            return np.asarray(out, dtype=bool)
        rows = ctx.root_rows()
        out = np.zeros(len(active), bool)
        arity = _callback_arity(condition)
        for i in np.flatnonzero(active):
            if arity >= 2:
                curs = ctx.current_rows()
                cur = curs[i] if curs is not None else rows[i]
                out[i] = bool(condition(cur, rows[i]))
            else:
                out[i] = bool(condition(rows[i]))
        return out

    # -- dependent ---------------------------------------------------------
    def _t_dependent(self, arr, active, ctx, t):
        if len(t) == 2:
            return self._dependent_schema(arr, active, ctx, t[1])
        return self._dependent_pairwise(arr, active, ctx, t[1], t[2], t[3])

    def _dependent_pairwise(self, arr, active, ctx, other_field, condition, inner):
        """``{:dependent, field, cb, type}``: condition FIRST on
        (value, other_value), then the type (lib/peri.ex:1039-1046)."""
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        if other_field in ctx.root.column_names:
            other = ctx.root.column(other_field).combine_chunks()
        else:
            other = pa.nulls(n, pa.string())
        if isinstance(condition, tuple) and condition[0] == "eq":
            # vectorized equality fast path (password ≡ confirmation)
            template = condition[1]
            try:
                mask = _np_bool(pc.equal(arr, other), False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                mask = np.zeros(n, bool)
            both_null = _null_np(arr) & _null_np(other)
            mask |= both_null
            bad = active & ~mask
            if bad.any():
                ok[bad] = False
                idx = np.flatnonzero(bad)
                acts = [render(v) for v in arr.take(pa.array(idx)).to_pylist()]
                violations.append(
                    Violation(idx, "dependent", self.path, [template] * idx.size, acts, "")
                )
        else:
            vals = arr.to_pylist()
            others = other.to_pylist()
            for i in np.flatnonzero(active):
                r = condition(vals[i], others[i])
                if r is None or r is True:
                    continue
                template, mctx = r if isinstance(r, tuple) else (str(r), {})
                ok[i] = False
                violations.append(
                    Violation(
                        np.array([i]), "dependent", self.path,
                        [expand(template, mctx)], [render(vals[i])], "",
                    )
                )
        passed = active & ok
        res = self._sub(inner).validate(arr, passed, ctx)
        ok &= res.ok
        violations.extend(res.violations)
        return FieldResult(res.values, ok, violations)

    def _dependent_schema(self, arr, active, ctx, callback):
        """``{:dependent, cb}`` — the callback returns a *type* per row;
        rows are grouped by returned type and each group validated with
        that type's kernels (lib/peri.ex:1001-1037; SURVEY §7.6.2)."""
        rows = ctx.root_rows()
        n = len(active)
        groups: dict[int, tuple[Any, np.ndarray]] = {}
        assignments = np.full(n, -1, np.int64)
        specs: list[Any] = []
        arity = _callback_arity(callback)
        for i in np.flatnonzero(active):
            if arity >= 2:
                curs = ctx.current_rows()
                cur = curs[i] if curs is not None else rows[i]
                t = callback(cur, rows[i])
            else:
                t = callback(rows[i])
            if t is None:
                continue
            key = next((j for j, s in enumerate(specs) if s == t), None)
            if key is None:
                specs.append(t)
                key = len(specs) - 1
            assignments[i] = key
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        values = arr
        for j, t in enumerate(specs):
            mask = assignments == j
            res = self._sub(t).validate(values, mask, ctx)
            ok[mask & ~res.ok] = False
            violations.extend(res.violations)
            # guard like _choice/_t_multi: only merge type-preserving rewrites
            if res.values is not values and res.values.type == values.type:
                values = pc.if_else(pa.array(mask), res.values, values)
        return FieldResult(values, ok, violations)

    # -- custom (lib/peri.ex:1110-1122); nil skips (clause order) ----------
    def _t_custom(self, arr, active, ctx, t):
        cb = t[1]
        if isinstance(cb, str):  # MFA-style name → registered callable
            from peri_ray.functions import resolve_function

            cb = resolve_function(cb)
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        nulls = _null_np(arr)
        applies = active & ~nulls
        if S.is_vectorized(cb):
            out = cb(arr)
            if isinstance(out, tuple):
                mask, template, mctx = out
                mask = _np_bool(mask, False) if isinstance(mask, pa.Array) else np.asarray(mask, bool)
            else:
                mask = _np_bool(out, False) if isinstance(out, pa.Array) else np.asarray(out, bool)
                template, mctx = "is invalid", {}
            bad = applies & ~mask
            if bad.any():
                ok[bad] = False
                idx = np.flatnonzero(bad)
                acts = [render(v) for v in arr.take(pa.array(idx)).to_pylist()]
                violations.append(
                    Violation(idx, "custom", self.path, [expand(template, mctx)] * idx.size, acts, "")
                )
            return FieldResult(arr, ok, violations)
        vals = arr.to_pylist()
        for i in np.flatnonzero(applies):
            r = cb(vals[i])
            if r is None or r is True:
                continue
            template, mctx = r if isinstance(r, tuple) else ("is invalid", {})
            ok[i] = False
            violations.append(
                Violation(np.array([i]), "custom", self.path, [expand(template, mctx)], [render(vals[i])], "")
            )
        return FieldResult(arr, ok, violations)

    # -- map-valued columns ({:map, v} / {:map, k, v}) ----------------------
    def _t_map(self, arr, active, ctx, t):
        n = len(active)
        ok = np.ones(n, bool)
        if pa.types.is_null(arr.type):
            return FieldResult(arr, ok)
        if not pa.types.is_map(arr.type):
            bad = active & ~_null_np(arr)
            ok[bad] = False
            return FieldResult(
                arr, ok,
                [_const_violation("type", {"expected": ":map"}, "type.map", self.path, arr, bad, ":map")],
            )
        nulls = _null_np(arr)
        applies = active & ~nulls
        violations: list[Violation] = []
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        parent_of = np.repeat(np.arange(n), np.diff(offsets).clip(min=0))
        flat_active = applies[parent_of] if len(parent_of) else np.empty(0, bool)
        subs = [("items", t[-1])] if len(t) == 2 else [("keys", t[1]), ("items", t[2])]
        for which, sub_t in subs:
            flat = getattr(arr, which)
            res = self._sub(sub_t).validate(
                flat, flat_active, ctx.for_list_elements(parent_of, flat)
            )
            bad = flat_active & ~res.ok
            if bad.any():
                bad_parents = np.unique(parent_of[bad])
                ok[bad_parents] = False
                first = {}
                for v in res.violations:
                    for j, fi in enumerate(v.indices):
                        p = int(parent_of[fi])
                        if p not in first:
                            first[p] = (v.rule_id, v.messages[j], v.actuals[j], v.expected)
                for p, (rid, msg, act, exp) in first.items():
                    violations.append(Violation(np.array([p]), rid, self.path, [msg], [act], exp))
        return FieldResult(arr, ok, violations)

    # -- nested map schema → struct recursion -------------------------------
    def _nested(self, arr, active, ctx, schema: dict, presence: bool) -> FieldResult:
        n = len(active)
        ok = np.ones(n, bool)
        violations: list[Violation] = []
        if pa.types.is_null(arr.type):
            # nil nested: ok unless schema has defaults and the field key
            # was present (lib/peri.ex:1048-1054); a present-but-all-null
            # column with defaults materializes them
            if presence and _schema_has_defaults(schema):
                arr = _empty_struct(schema, n)
            else:
                return FieldResult(arr, ok)
        if not pa.types.is_struct(arr.type):
            bad = active & ~_null_np(arr)
            ok[bad] = False
            return FieldResult(
                arr, ok,
                [_const_violation("type", {"expected": summarize(schema)}, "type.map", self.path, arr, bad, summarize(schema))],
            )
        nulls = _null_np(arr)
        if nulls.any() and presence and _schema_has_defaults(schema):
            # materialize defaults for nil parents (lib/peri.ex:1048-1054)
            nulls = np.zeros(n, bool)
            arr = _fill_null_structs(arr)
        applies = active & ~nulls
        existing = {f.name for f in arr.type}
        children: list[pa.Array] = []
        names: list[str] = []
        for key, sub_t in schema.items():
            child_path = f"{self.path}.{key}" if self.path else key
            if key in existing:
                child = pc.struct_field(arr, key)
            else:
                child = pa.nulls(n, pa.null())
            res = self._sub(sub_t, child_path).validate(
                child, applies, ctx
            )
            bad = applies & ~res.ok
            ok[bad] = False
            violations.extend(res.violations)
            names.append(key)
            children.append(res.values)
        # strict-mode struct rebuild: declared keys only, canonical order
        # (filter_data, lib/peri.ex:630-664)
        children = [
            c if not pa.types.is_null(c.type) else pa.nulls(n, pa.string()) for c in children
        ]
        rebuilt = pa.StructArray.from_arrays(children, names, mask=pa.array(nulls))
        return FieldResult(rebuilt, ok, violations)


def _schema_has_defaults(schema: dict) -> bool:
    """``schema_has_defaults?`` (lib/peri.ex:1558-1569)."""
    for t in schema.values():
        if S.is_constraint_attachment(t) and isinstance(t[1], tuple) and t[1][0] == "default":
            return True
        if isinstance(t, dict) and _schema_has_defaults(t):
            return True
    return False


def _empty_struct(schema: dict, n: int) -> pa.Array:
    names = list(schema.keys())
    children = [pa.nulls(n, pa.string()) for _ in names]
    return pa.StructArray.from_arrays(children, names)


def _fill_null_structs(arr: pa.Array) -> pa.Array:
    names = [f.name for f in arr.type]
    children = [pc.struct_field(arr, nm) for nm in names]
    return pa.StructArray.from_arrays(children, names)


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------

VIOLATION_SCHEMA = pa.schema(
    [
        ("record_id", pa.string()),
        ("rule_id", pa.string()),
        ("path", pa.string()),
        ("message", pa.string()),
        ("actual", pa.string()),
        ("expected", pa.string()),
    ]
)

VIOLATION_STRUCT = pa.struct(
    [(f.name, f.type) for f in VIOLATION_SCHEMA if f.name != "record_id"]
)


class PeriRegexWarning(UserWarning):
    """A schema regex uses syntax the default RE2 engine rejects."""


def _collect_regexes(node: Any, out: list[str]) -> None:
    if isinstance(node, tuple):
        if len(node) == 2 and node[0] == "regex" and isinstance(node[1], str):
            out.append(node[1])
        else:
            for x in node:
                _collect_regexes(x, out)
    elif isinstance(node, dict):
        for v in node.values():
            _collect_regexes(v, out)
    elif isinstance(node, list):
        for v in node:
            _collect_regexes(v, out)


def _warn_pcre_only_regexes(spec: dict) -> None:
    """Compile-time probe: the reference's ``~r//`` is PCRE, so a ported
    schema may carry lookarounds/backrefs that RE2 (the default,
    vectorized engine) rejects only at batch time deep in a pipeline.
    Probe each pattern once on the driver and warn with the opt-in
    (VERDICT r1 "missing" item 2)."""
    pats: list[str] = []
    _collect_regexes(spec, pats)
    probe = pa.array(["x"])
    for pat in pats:
        try:
            pc.match_substring_regex(probe, pat)
        except pa.ArrowInvalid as e:
            import warnings

            warnings.warn(
                f"regex {pat!r} is not valid RE2 ({e}); the reference's "
                "~r// is PCRE — pass compile_spec(..., regex_engine=\"pcre\") "
                "for lookaround/backreference support",
                PeriRegexWarning,
                stacklevel=3,
            )


class Plan:
    """Compiled validation plan over one table spec.

    mode="strict" projects the output to declared columns in canonical
    order; mode="permissive" keeps undeclared columns untouched
    (``filter_data``, reference ``lib/peri.ex:630-664``;
    ``test/permissive_mode_test.exs``)."""

    def __init__(self, spec: dict, mode: str = "strict", id_column: str | None = None,
                 registry: dict | None = None, string_length: str = "codepoints",
                 regex_engine: str = "re2"):
        if mode not in ("strict", "permissive"):
            raise ValueError(f"Invalid mode: {mode}. Must be 'strict' or 'permissive'")
        if string_length not in ("codepoints", "graphemes"):
            raise ValueError(f"Invalid string_length: {string_length}")
        if regex_engine not in ("re2", "pcre"):
            raise ValueError(f"Invalid regex_engine: {regex_engine}")
        if string_length == "graphemes" or regex_engine == "pcre":
            # fail on the DRIVER if the regex module is absent — not
            # inside a remote task mid-pipeline
            import regex  # noqa: F401
        S.validate_spec(spec)
        if regex_engine == "re2":
            _warn_pcre_only_regexes(spec)
        self.spec = spec
        self.mode = mode
        self.id_column = id_column
        self.registry = registry or {}
        self.fields = {
            key: Compiled(t, key, self.registry, string_length=string_length,
                          regex_engine=regex_engine)
            for key, t in spec.items()
        }

    # -- batch entry -------------------------------------------------------
    def run_batch(self, table: pa.Table, with_rows: bool = False) -> tuple[pa.Table, pa.Table]:
        table = table.combine_chunks()
        ctx = Ctx(table)
        n = table.num_rows
        valid = np.ones(n, bool)
        all_viols: list[Violation] = []
        out_cols: dict[str, pa.Array] = {}
        for key, compiled in self.fields.items():
            if key in table.column_names:
                col = table.column(key).combine_chunks()
            else:
                col = pa.nulls(n, pa.null())
            res = compiled.validate(col, np.ones(n, bool), ctx)
            valid &= res.ok
            all_viols.extend(res.violations)
            out_cols[key] = res.values

        if self.mode == "strict":
            names, arrays = [], []
            for key in self.spec:
                arr = out_cols[key]
                if pa.types.is_null(arr.type):
                    arr = pa.nulls(n, pa.string())
                names.append(key)
                arrays.append(arr)
        else:
            names, arrays = [], []
            for name in table.column_names:
                if name in out_cols:
                    arr = out_cols[name]
                    if pa.types.is_null(arr.type):
                        arr = pa.nulls(n, pa.string())
                    arrays.append(arr)
                else:
                    arrays.append(table.column(name).combine_chunks())
                names.append(name)
            for key in self.spec:
                if key not in table.column_names:
                    arr = out_cols[key]
                    if pa.types.is_null(arr.type):
                        arr = pa.nulls(n, pa.string())
                    names.append(key)
                    arrays.append(arr)
        out = pa.table(dict(zip(names, arrays)))
        out = out.append_column("valid", pa.array(valid))

        violations = self._violations_table(table, all_viols, with_rows=with_rows)
        return out, violations

    def _record_ids(self, table: pa.Table) -> pa.Array:
        if self.id_column and self.id_column in table.column_names:
            col = table.column(self.id_column).combine_chunks()
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            return col.fill_null("") if col.null_count else col
        return pa.array([str(i) for i in range(table.num_rows)])

    def _violations_table(self, table: pa.Table, viols: list[Violation],
                          with_rows: bool = False) -> pa.Table:
        if not viols:
            t = VIOLATION_SCHEMA.empty_table()
            return t.append_column("__row", pa.array([], pa.int32())) if with_rows else t
        ids = self._record_ids(table)
        rec, rid, pth, msg, act, exp = [], [], [], [], [], []
        rows: list[np.ndarray] = []
        for v in viols:
            taken = ids.take(pa.array(v.indices)).to_pylist()
            rec.extend(taken)
            rid.extend([v.rule_id] * len(taken))
            pth.extend([v.path] * len(taken))
            msg.extend(v.messages)
            act.extend(v.actuals)
            exp.extend([v.expected] * len(taken))
            rows.append(v.indices)
        out = pa.table(
            {
                "record_id": pa.array(rec, pa.string()),
                "rule_id": pa.array(rid, pa.string()),
                "path": pa.array(pth, pa.string()),
                "message": pa.array(msg, pa.string()),
                "actual": pa.array(act, pa.string()),
                "expected": pa.array(exp, pa.string()),
            }
        )
        if with_rows:
            out = out.append_column(
                "__row", pa.array(np.concatenate(rows).astype(np.int32))
            )
        return out


def compile_spec(spec: dict, mode: str = "strict", id_column: str | None = None,
                 registry: dict | None = None,
                 string_length: str = "codepoints",
                 regex_engine: str = "re2") -> Plan:
    return Plan(spec, mode=mode, id_column=id_column, registry=registry,
                string_length=string_length, regex_engine=regex_engine)
