"""Rule-spec DSL — the engine's analogue of the reference's schema term
tree (zoedsoupe/peri, ``lib/peri.ex:261-293``).

A *spec* is plain Python data, mirroring Peri's Elixir terms:

=======================  =====================================================
Peri                     Engine
=======================  =====================================================
``:string``              ``"string"``
``{:required, t}``       ``("required", t)``
``{:enum, [..]}``        ``("enum", [..])`` / ``("enum", [..], {"error": ..})``
``{:literal, v}``        ``("literal", v)``
``{:list, t}``           ``("list", t)`` / ``("list", t, {"min":1,...})``
``{:map, v}``            ``("map", v)`` / ``("map", k, v)``
``{:tuple, [..]}``       ``("tuple", [..])``
``{:either, {a,b}}``     ``("either", (a, b))``
``{:oneof, [..]}``       ``("oneof", [..])``
``{:multi, f, %{..}}``   ``("multi", "field", {tag: subspec, ...})``
``{:cond, cb, t, f}``    ``("cond", cb_or_colname, t_true, t_false)``
``{:dependent,f,cb,t}``  ``("dependent", "field", cb, t)``
``{:dependent, cb}``     ``("dependent", cb)``
``{:custom, cb}``        ``("custom", cb)``
``{t, {:default, v}}``   ``(t, ("default", v_or_0arity_callable))``
``{t, {:transform, f}}`` ``(t, ("transform", f))``
``{:string, {:min,5}}``  ``("string", ("min", 5))``
``{:integer, [gt: 1]}``  ``("integer", [("gt", 1), ...])``
nested map schema        nested ``dict``
``{:meta, t, opts}``     ``("meta", t, {...})``  (opts passthrough)
``{:schema, s}``         ``("schema", s)`` (explicit nested tag)
``{:ref, name}``         ``("ref", "name")``  (registry lookup)
=======================  =====================================================

Primitive type names: ``any atom string integer float boolean map date
time datetime naive_datetime duration binary`` (``binary`` is an engine
addition for web-page ``html`` payloads; ``:pid`` is BEAM-specific and
dropped — SURVEY §2.9).

``validate_spec`` performs the same legality checks as
``Peri.validate_schema/1`` (``lib/peri.ex:1635-1961``): unknown types,
required+default conflict, bad enum choices, bad list constraints,
``multiple_of 0``, multi-branch shape, etc.
"""

from __future__ import annotations

from typing import Any, Callable

from peri_ray.errors import InvalidSchemaError, render

PRIMITIVES = {
    "any",
    "atom",
    "string",
    "integer",
    "float",
    "boolean",
    "map",
    "date",
    "time",
    "datetime",
    "naive_datetime",
    "duration",
    "binary",
}

STRING_CONSTRAINTS = {"regex", "eq", "min", "max"}
NUMERIC_CONSTRAINTS = {"eq", "neq", "gt", "gte", "lt", "lte", "range", "multiple_of"}
LIST_CONSTRAINTS = {"min", "max", "unique"}
# [NORTH] extension beyond the reference (Peri only type-checks temporal
# values, lib/peri.ex:788-792): ordered comparisons on date/time columns,
# needed for warc_ts bounds checks on the web_pages table.
TEMPORAL_TYPES = {"date", "time", "datetime", "naive_datetime", "duration"}
TEMPORAL_CONSTRAINTS = {"eq", "neq", "gt", "gte", "lt", "lte", "range"}

# Tags that construct a composite type (vs ``(type, constraint)`` pairs).
TYPE_TAGS = {
    "required",
    "enum",
    "literal",
    "list",
    "map",
    "tuple",
    "either",
    "oneof",
    "multi",
    "cond",
    "dependent",
    "custom",
    "meta",
    "schema",
    "ref",
}


def vec(fn: Callable) -> Callable:
    """Mark a callback as vectorized: it receives/returns
    ``pyarrow.Array``/``numpy`` data instead of scalars.  The compiler
    keeps vectorized callbacks on the Arrow fast path; unmarked callbacks
    fall back to a per-row loop inside the batch (SURVEY §7.6.1)."""
    fn.__peri_vectorized__ = True
    return fn


def is_vectorized(fn: Any) -> bool:
    return callable(fn) and getattr(fn, "__peri_vectorized__", False)


def is_constraint_attachment(t: Any) -> bool:
    """True for ``(type, attachment)`` 2-tuples where attachment is a
    constraint / constraint-list / default / transform, as opposed to a
    composite-type tag tuple like ``("list", t)``."""
    if not (isinstance(t, tuple) and len(t) == 2):
        return False
    head = t[0]
    if isinstance(head, str) and head in TYPE_TAGS:
        return False
    return True


def _is_constraint(x: Any) -> bool:
    return isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], str)


def _check_type(t: Any, path: str, errors: list[str]) -> None:
    """One type expression.  Mirrors ``validate_type/2`` clause-per-shape
    (``lib/peri.ex:1668-1961``)."""
    if isinstance(t, str):
        if t not in PRIMITIVES:
            errors.append(f"{path}: invalid schema definition: {render(t)}")
        return
    if isinstance(t, dict):
        for k, v in t.items():
            _check_type(v, f"{path}.{k}", errors)
        return
    if callable(t):
        errors.append(f"{path}: bare callable is not a type; wrap in ('custom', fn)")
        return
    if not (isinstance(t, tuple) and t):
        errors.append(f"{path}: invalid schema definition: {render(t)}")
        return

    tag = t[0]
    if tag == "required":
        inner = t[1]
        # required + default conflict (lib/peri.ex:829-834,1780-1783)
        if (
            is_constraint_attachment(inner)
            and isinstance(inner[1], tuple)
            and inner[1][0] == "default"
        ):
            errors.append(
                f"{path}: cannot set default value of {render(inner[1][1])} "
                f"for required field"
            )
        _check_type(inner, path, errors)
    elif tag == "enum":
        choices = t[1]
        if not isinstance(choices, (list, tuple)) or len(choices) == 0:
            errors.append(f"{path}: expected enum choices to be a non-empty list")
        if len(t) == 3 and not isinstance(t[2], dict):
            errors.append(f"{path}: expected enum opts to be a dict, got {render(t[2])}")
    elif tag == "literal":
        pass
    elif tag == "list":
        _check_type(t[1], path, errors)
        if len(t) == 3:
            opts = t[2]
            if not isinstance(opts, dict):
                errors.append(f"{path}: expected list opts to be a dict, got {render(opts)}")
            else:
                for k in opts:
                    if k not in LIST_CONSTRAINTS | {"error"}:
                        # lib/peri.ex:1859
                        errors.append(
                            f"{path}: invalid list constraint, allowed: "
                            f":min, :max, :unique; got {render(k)}"
                        )
    elif tag == "map":
        for sub in t[1:]:
            _check_type(sub, path, errors)
    elif tag == "tuple":
        if not isinstance(t[1], (list, tuple)):
            errors.append(f"{path}: expected tuple types to be a list")
        else:
            for sub in t[1]:
                _check_type(sub, path, errors)
    elif tag == "either":
        pair = t[1]
        if not (isinstance(pair, tuple) and len(pair) == 2):
            errors.append(f"{path}: expected either to carry a 2-tuple of types")
        else:
            _check_type(pair[0], path, errors)
            _check_type(pair[1], path, errors)
    elif tag == "oneof":
        if not isinstance(t[1], (list, tuple)) or not t[1]:
            errors.append(f"{path}: expected oneof to carry a non-empty list of types")
        else:
            for sub in t[1]:
                _check_type(sub, path, errors)
    elif tag == "multi":
        # lib/peri.ex:1816-1825
        if not isinstance(t[1], str):
            errors.append(f"{path}: expected :multi dispatch field to be a string, got {render(t[1])}")
        if not isinstance(t[2], dict) or not t[2]:
            errors.append(f"{path}: expected :multi branches to be a map, got {render(t[2])}")
        else:
            for tag_name, branch in t[2].items():
                _check_type(branch, f"{path}[{tag_name}]", errors)
    elif tag == "cond":
        if len(t) != 4:
            errors.append(f"{path}: expected ('cond', condition, true_type, else_type)")
        else:
            if not (callable(t[1]) or isinstance(t[1], str)):
                errors.append(f"{path}: cond condition must be a callable or a column name")
            _check_type(t[2], path, errors)
            _check_type(t[3], path, errors)
    elif tag == "dependent":
        if len(t) == 2:
            if not callable(t[1]):
                errors.append(f"{path}: dependent callback must be callable")
        elif len(t) == 4:
            if not isinstance(t[1], str):
                errors.append(f"{path}: dependent field must be a column name")
            cond = t[2]
            vectorized_eq = isinstance(cond, tuple) and len(cond) == 2 and cond[0] == "eq"
            if not (callable(cond) or vectorized_eq):
                errors.append(
                    f"{path}: dependent condition must be callable or ('eq', message)"
                )
            _check_type(t[3], path, errors)
        else:
            errors.append(f"{path}: invalid dependent form")
    elif tag == "custom" and isinstance(t[1], str):
        pass  # registered-function name, resolved at validation time
    elif tag == "custom":
        if not callable(t[1]):
            errors.append(f"{path}: custom validator must be callable")
    elif tag == "meta":
        _check_type(t[1], path, errors)
        if len(t) == 3 and not isinstance(t[2], dict):
            # lib/peri.ex:1788,1802
            errors.append(f"{path}: expected meta opts to be a dict, got {render(t[2])}")
    elif tag == "schema":
        _check_type(t[1], path, errors)
        if len(t) == 3:
            # {:schema, s, {:additional_keys, t}} (lib/peri.ex:1272-1296)
            # or {:schema, s, name: _} (lib/peri.ex:1883-1897)
            if isinstance(t[2], tuple) and len(t[2]) == 2 and t[2][0] == "additional_keys":
                if not isinstance(t[1], dict):
                    errors.append(f"{path}: additional_keys requires a map schema")
                _check_type(t[2][1], path, errors)
            elif isinstance(t[2], dict) and set(t[2]) <= {"name"}:
                pass
            else:
                errors.append(f"{path}: invalid schema opts: {render(t[2])}")
        elif len(t) > 3:
            errors.append(f"{path}: invalid schema definition: {render(t)}")
    elif tag == "ref":
        if not isinstance(t[1], str):
            errors.append(f"{path}: expected ref name to be a string")
    elif is_constraint_attachment(t):
        inner, attachment = t
        _check_type(inner, path, errors)
        if isinstance(attachment, tuple) and attachment[0] == "default":
            pass
        elif isinstance(attachment, tuple) and attachment[0] == "transform":
            if not callable(attachment[1]) and not isinstance(attachment[1], str):
                errors.append(f"{path}: transform must be callable or a named builtin")
        elif _is_constraint(attachment) or (
            isinstance(attachment, list) and all(_is_constraint(x) for x in attachment)
        ):
            constraints = attachment if isinstance(attachment, list) else [attachment]
            allowed = (
                STRING_CONSTRAINTS
                if inner == "string"
                else NUMERIC_CONSTRAINTS
                if inner in ("integer", "float")
                else TEMPORAL_CONSTRAINTS
                if inner in TEMPORAL_TYPES
                else set()
            )
            if not allowed:
                errors.append(f"{path}: type {render(inner)} does not accept constraints")
            for cname, cval in constraints:
                if cname == "error":
                    continue
                if cname not in allowed:
                    errors.append(f"{path}: invalid constraint {render(cname)} for {render(inner)}")
                if cname == "multiple_of" and (not isinstance(cval, (int, float)) or cval == 0):
                    # lib/peri.ex:1764
                    errors.append(
                        f"{path}: expected :multiple_of value to be a non-zero "
                        f"number, got {render(cval)}"
                    )
                if cname == "range":
                    if not (isinstance(cval, tuple) and len(cval) == 2):
                        errors.append(f"{path}: range expects a (min, max) tuple")
        else:
            errors.append(f"{path}: invalid schema definition: {render(t)}")
    else:
        errors.append(f"{path}: invalid schema definition: {render(t)}")


def validate_spec(spec: dict[str, Any]) -> None:
    """Raise ``InvalidSchemaError`` if the spec is malformed — the engine
    twin of ``Peri.validate_schema/1`` + ``Peri.InvalidSchema``
    (``lib/peri.ex:1635-1650``).  Valid specs return ``None``."""
    if not isinstance(spec, dict):
        raise InvalidSchemaError([f"spec must be a dict of field -> type, got {render(spec)}"])
    errors: list[str] = []
    for key, t in spec.items():
        if not isinstance(key, str):
            errors.append(f"field names must be strings, got {render(key)}")
            continue
        _check_type(t, key, errors)
    if errors:
        raise InvalidSchemaError(errors)


def conforms_spec(spec: Any) -> bool:
    """Boolean twin of validate_spec (cf. ``Peri.conforms?``-style usage)."""
    try:
        validate_spec(spec)
        return True
    except InvalidSchemaError:
        return False
