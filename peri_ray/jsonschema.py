"""Rule-spec ↔ JSON Schema Draft 7 bridge — the engine twin of
``Peri.to_json_schema/2`` / ``Peri.from_json_schema/2`` (reference
``lib/peri/json_schema/encoder.ex:63-349``, ``decoder.ex:13-242``).

Lossy in the same places the reference is: ``anyOf`` decodes to
``oneof`` (first-match semantics, decoder.ex:78-84); callback types
(``cond``/``dependent``/``custom``) encode as permissive ``{}`` since
JSON Schema cannot express them; ``multi`` encodes as a discriminated
``oneOf`` (encoder.ex discriminator handling)."""

from __future__ import annotations

from typing import Any

from peri_ray import spec as S
from peri_ray.spec import validate_spec

_PRIM_TO_JSON = {
    "string": {"type": "string"},
    "atom": {"type": "string"},
    "integer": {"type": "integer"},
    "float": {"type": "number"},
    "boolean": {"type": "boolean"},
    "map": {"type": "object"},
    "any": {},
    "date": {"type": "string", "format": "date"},
    "time": {"type": "string", "format": "time"},
    "datetime": {"type": "string", "format": "date-time"},
    "naive_datetime": {"type": "string", "format": "date-time"},
    "duration": {"type": "string", "format": "duration"},
    "binary": {"type": "string", "contentEncoding": "base64"},
}


def _encode_type(t: Any, defs: dict) -> dict:
    if isinstance(t, str):
        return dict(_PRIM_TO_JSON.get(t, {}))
    if isinstance(t, dict):
        return encode(t, defs)
    if isinstance(t, tuple) and t:
        tag = t[0]
        if tag == "required":
            return _encode_type(t[1], defs)
        if tag == "meta":
            out = _encode_type(t[1], defs)
            meta = t[2] if len(t) == 3 else {}
            for k in ("doc", "description"):
                if k in meta:
                    out["description"] = meta[k]
            if "example" in meta:
                out["examples"] = [meta["example"]]
            return out
        if tag == "schema":
            return _encode_type(t[1], defs)
        if tag == "literal":
            import datetime as _dt

            v = t[1]
            if isinstance(v, _dt.datetime):
                return {"const": v.isoformat(), "format": "date-time"}
            if isinstance(v, _dt.date):
                return {"const": v.isoformat(), "format": "date"}
            if isinstance(v, _dt.time):
                return {"const": v.isoformat(), "format": "time"}
            return {"const": v}
        if tag == "enum":
            return {"enum": list(t[1])}
        if tag == "list":
            out = {"type": "array", "items": _encode_type(t[1], defs)}
            opts = t[2] if len(t) == 3 else {}
            if "min" in opts:
                out["minItems"] = opts["min"]
            if "max" in opts:
                out["maxItems"] = opts["max"]
            if opts.get("unique"):
                out["uniqueItems"] = True
            return out
        if tag == "map":
            return {"type": "object", "additionalProperties": _encode_type(t[-1], defs)}
        if tag == "tuple":
            return {
                "type": "array",
                "prefixItems": [_encode_type(x, defs) for x in t[1]],
                "minItems": len(t[1]),
                "maxItems": len(t[1]),
            }
        if tag == "either":
            return {"anyOf": [_encode_type(t[1][0], defs), _encode_type(t[1][1], defs)]}
        if tag == "oneof":
            return {"anyOf": [_encode_type(x, defs) for x in t[1]]}
        if tag == "multi":
            # discriminated union (encoder.ex discriminator for :multi)
            return {
                "oneOf": [
                    {
                        "allOf": [
                            {"properties": {t[1]: {"const": tag_v}}, "required": [t[1]]},
                            _encode_type(branch, defs),
                        ]
                    }
                    for tag_v, branch in t[2].items()
                ]
            }
        if tag == "ref":
            name = t[1]
            return {"$ref": f"#/$defs/{name}"}
        if tag in ("cond", "dependent", "custom"):
            return {}  # not expressible in JSON Schema
        if S.is_constraint_attachment(t):
            inner, attachment = t
            out = _encode_type(inner, defs)
            if isinstance(attachment, tuple) and attachment[0] == "default":
                d = attachment[1]
                if not callable(d):
                    out["default"] = d
                return out
            if isinstance(attachment, tuple) and attachment[0] == "transform":
                return out
            constraints = attachment if isinstance(attachment, list) else [attachment]

            def _jsonable(v):
                # temporal bounds serialize as ISO strings so the emitted
                # schema survives json.dumps (decoder: fromisoformat)
                import datetime as _dt

                if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
                    return v.isoformat()
                return v

            for cname, cval in constraints:
                cval = _jsonable(cval)
                if inner == "string":
                    out.update(
                        {"regex": {"pattern": cval}, "eq": {"const": cval},
                         "min": {"minLength": cval}, "max": {"maxLength": cval}}.get(cname, {})
                    )
                else:
                    out.update(
                        {"eq": {"const": cval}, "neq": {"not": {"const": cval}},
                         "gt": {"exclusiveMinimum": cval}, "gte": {"minimum": cval},
                         "lt": {"exclusiveMaximum": cval}, "lte": {"maximum": cval},
                         "multiple_of": {"multipleOf": cval}}.get(cname, {})
                    )
                if cname == "range":
                    out["minimum"], out["maximum"] = (_jsonable(cval[0]), _jsonable(cval[1]))
            return out
    raise ValueError(f"cannot encode {t!r}")


def encode(spec: dict, defs: dict | None = None) -> dict:
    """Spec (dict schema) → JSON Schema Draft 7 object."""
    top = defs is None
    defs = {} if defs is None else defs
    properties = {}
    required = []
    for key, t in spec.items():
        properties[key] = _encode_type(t, defs)
        if isinstance(t, tuple) and t and t[0] == "required":
            required.append(key)
    out: dict[str, Any] = {"type": "object", "properties": properties}
    if required:
        out["required"] = required
    if top:
        out["$schema"] = "http://json-schema.org/draft-07/schema#"
        if defs:
            out["$defs"] = defs
    return out


def to_json_schema(spec: dict) -> dict:
    validate_spec(spec)
    return encode(spec)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_type(js: dict) -> Any:
    if "$ref" in js:
        return ("ref", js["$ref"].rsplit("/", 1)[-1])
    if "const" in js and js.get("format") not in ("date", "time", "date-time"):
        return ("literal", js["const"])
    if "const" in js and "type" not in js:
        # temporal literal: {"const": iso, "format": ...} with no type
        import datetime as _dt

        parser = {"date": _dt.date.fromisoformat, "time": _dt.time.fromisoformat,
                  "date-time": _dt.datetime.fromisoformat}[js["format"]]
        return ("literal", parser(str(js["const"])))
    if "enum" in js:
        return ("enum", list(js["enum"]))
    if "anyOf" in js:
        branches = [_decode_type(b) for b in js["anyOf"]]
        if len(branches) == 2:
            return ("either", (branches[0], branches[1]))
        return ("oneof", branches)
    t = js.get("type")
    if t == "object" and "properties" in js:
        return decode(js)
    if t == "object":
        if "additionalProperties" in js and isinstance(js["additionalProperties"], dict):
            return ("map", _decode_type(js["additionalProperties"]))
        return "map"
    if t == "array":
        if "prefixItems" in js:
            return ("tuple", [_decode_type(x) for x in js["prefixItems"]])
        inner = _decode_type(js["items"]) if "items" in js else "any"
        opts = {}
        if "minItems" in js:
            opts["min"] = js["minItems"]
        if "maxItems" in js:
            opts["max"] = js["maxItems"]
        if js.get("uniqueItems"):
            opts["unique"] = True
        return ("list", inner, opts) if opts else ("list", inner)
    if t == "string":
        fmt = js.get("format")
        base = {"date": "date", "time": "time", "date-time": "datetime",
                "duration": "duration"}.get(fmt, "string")
        constraints = []
        if "pattern" in js:
            constraints.append(("regex", js["pattern"]))
        if "minLength" in js:
            constraints.append(("min", js["minLength"]))
        if "maxLength" in js:
            constraints.append(("max", js["maxLength"]))
        if constraints and base == "string":
            return ("string", constraints if len(constraints) > 1 else constraints[0])
        if base != "string":
            # temporal bounds round-trip ([NORTH] temporal constraints):
            # the encoder writes minimum/maximum as ISO-ish strings
            import datetime as _dt

            def _parse(v):
                if base == "date":
                    return _dt.date.fromisoformat(str(v))
                if base == "time":
                    return _dt.time.fromisoformat(str(v))
                if base == "duration":
                    return v
                return _dt.datetime.fromisoformat(str(v))

            tconstraints = []
            if "minimum" in js and "maximum" in js:
                tconstraints.append(("range", (_parse(js["minimum"]), _parse(js["maximum"]))))
            elif "minimum" in js:
                tconstraints.append(("gte", _parse(js["minimum"])))
            elif "maximum" in js:
                tconstraints.append(("lte", _parse(js["maximum"])))
            if "exclusiveMinimum" in js:
                tconstraints.append(("gt", _parse(js["exclusiveMinimum"])))
            if "exclusiveMaximum" in js:
                tconstraints.append(("lt", _parse(js["exclusiveMaximum"])))
            if "const" in js:
                tconstraints.append(("eq", _parse(js["const"])))
            if isinstance(js.get("not"), dict) and "const" in js["not"]:
                tconstraints.append(("neq", _parse(js["not"]["const"])))
            if tconstraints:
                return (base, tconstraints if len(tconstraints) > 1 else tconstraints[0])
        return base
    if t in ("integer", "number"):
        base = "integer" if t == "integer" else "float"
        constraints = []
        if "minimum" in js and "maximum" in js:
            constraints.append(("range", (js["minimum"], js["maximum"])))
        else:
            if "minimum" in js:
                constraints.append(("gte", js["minimum"]))
            if "maximum" in js:
                constraints.append(("lte", js["maximum"]))
        if "exclusiveMinimum" in js:
            constraints.append(("gt", js["exclusiveMinimum"]))
        if "exclusiveMaximum" in js:
            constraints.append(("lt", js["exclusiveMaximum"]))
        if "multipleOf" in js:
            constraints.append(("multiple_of", js["multipleOf"]))
        if isinstance(js.get("not"), dict) and "const" in js["not"]:
            constraints.append(("neq", js["not"]["const"]))
        if constraints:
            return (base, constraints if len(constraints) > 1 else constraints[0])
        return base
    if t == "boolean":
        return "boolean"
    return "any"


def decode(js: dict) -> dict:
    """JSON Schema object → spec dict.  Required fields re-wrap in
    ``("required", t)``; the result is re-validated like the reference
    decoder feeding ``validate_schema`` (decoder.ex:13-23)."""
    required = set(js.get("required", []))
    out = {}
    for key, sub in js.get("properties", {}).items():
        t = _decode_type(sub)
        if "default" in sub:
            t = (t, ("default", sub["default"]))
        if key in required:
            t = ("required", t)
        out[key] = t
    return out


def from_json_schema(js: dict) -> dict:
    spec = decode(js)
    validate_spec(spec)
    return spec
