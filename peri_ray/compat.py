"""Spec-evolution compatibility analysis — the schema-registry-style
check a validation contract needs before a new spec version ships:
does the new spec accept every row the old spec accepted?

``spec_compat(old, new)`` walks both specs field-by-field (recursing
into nested map schemas) and classifies each difference:

- ``compatible`` — the validity set can only WIDEN (constraint
  dropped/loosened, enum grown, required dropped, field removed in
  permissive mode): every old-valid row stays valid.
- ``breaking`` — some old-valid rows may now fail (required added,
  type changed, constraint added/tightened, enum shrunk, field
  removed under strict mode).
- ``warning`` — validity may narrow depending on data the old spec
  never inspected (an optional constrained field added: rows carrying
  bad values in that previously-unchecked column start failing).
- ``informational`` — output shape changes but validity does not
  (defaults and transforms; Peri checks required/nil BEFORE defaults
  fill — lib/peri.ex:825 clause order — so a default never changes
  which rows pass).

Unrecognized or non-comparable changes (callables, cond/dependent
bodies, multi dispatch tables) classify conservatively as
``breaking`` with an ``unclassified`` change tag — the analyzer never
silently calls an unknown edit safe.  Pure schema-level analysis: no
data, no Ray.
"""

from __future__ import annotations

from typing import Any

# composite tags that are NOT (type, attachment) pairs — mirror of
# spec.TYPE_TAGS usage in is_constraint_attachment
from peri_ray.spec import is_constraint_attachment

# constraints where a (name, value) pair tightens/loosens monotonically:
# name -> 'lower_bound' (bigger = tighter) | 'upper_bound' (smaller =
# tighter)
_MONOTONE = {
    "min": "lower_bound", "gte": "lower_bound", "gt": "lower_bound",
    "max": "upper_bound", "lte": "upper_bound", "lt": "upper_bound",
}


def _norm(t: Any) -> dict:
    """Normalize a field type into {required, default, transforms,
    base, constraints} — peeling nested attachments; ``base`` is the
    innermost type (a string primitive, a composite tag tuple, a dict
    sub-schema, or anything else raw)."""
    out = {"required": False, "default": False, "transforms": 0,
           "constraints": [], "base": None}
    while True:
        if isinstance(t, tuple) and len(t) == 2 and t[0] == "required":
            out["required"] = True
            t = t[1]
            continue
        if is_constraint_attachment(t):
            inner, att = t
            if isinstance(att, tuple) and att and att[0] == "default":
                out["default"] = True
                t = inner
                continue
            if isinstance(att, tuple) and att and att[0] == "transform":
                out["transforms"] += 1
                t = inner
                continue
            cons = att if isinstance(att, list) else [att]
            out["constraints"].extend(cons)
            t = inner
            continue
        break
    out["base"] = t
    return out


def _cons_key(c: Any):
    if isinstance(c, tuple) and c:
        return c[0]
    return c


def _hashable(v: Any) -> bool:
    try:
        hash(v)
        return True
    except TypeError:
        return False


def _compare_constraints(path: str, old: list, new: list,
                         findings: list) -> None:
    old_by = {}
    new_by = {}
    for c in old:
        old_by.setdefault(_cons_key(c), []).append(c)
    for c in new:
        new_by.setdefault(_cons_key(c), []).append(c)
    for name in sorted(set(old_by) | set(new_by), key=str):
        if name == "error":
            continue  # message override: never affects validity
        oc, nc = old_by.get(name, []), new_by.get(name, [])
        if oc == nc:
            continue
        if not nc:
            findings.append((path, f"constraint_removed:{name}",
                             "compatible",
                             f"{name} constraint dropped"))
            continue
        if not oc:
            findings.append((path, f"constraint_added:{name}",
                             "breaking",
                             f"{name} constraint added"))
            continue
        if (len(oc) == 1 and len(nc) == 1 and name in _MONOTONE
                and isinstance(oc[0], tuple) and isinstance(nc[0], tuple)
                and len(oc[0]) == 2 and len(nc[0]) == 2
                and isinstance(oc[0][1], (int, float))
                and isinstance(nc[0][1], (int, float))):
            kind = _MONOTONE[name]
            loosened = (nc[0][1] <= oc[0][1] if kind == "lower_bound"
                        else nc[0][1] >= oc[0][1])
            findings.append((
                path, f"constraint_{'loosened' if loosened else 'tightened'}:{name}",
                "compatible" if loosened else "breaking",
                f"{name} {oc[0][1]!r} -> {nc[0][1]!r}"))
            continue
        if (name == "multiple_of" and len(oc) == 1 and len(nc) == 1
                and isinstance(oc[0][1], int) and isinstance(nc[0][1], int)
                and nc[0][1] != 0 and oc[0][1] % nc[0][1] == 0):
            findings.append((path, "constraint_loosened:multiple_of",
                             "compatible",
                             f"multiple_of {oc[0][1]} -> divisor {nc[0][1]}"))
            continue
        findings.append((path, f"constraint_changed:{name}", "breaking",
                         f"{name} changed non-monotonically"))


def _compare_field(path: str, old_t: Any, new_t: Any,
                   findings: list, mode: str) -> None:
    if old_t == new_t:
        return
    o, n = _norm(old_t), _norm(new_t)

    if o["required"] != n["required"]:
        if n["required"]:
            findings.append((path, "required_added", "breaking",
                             "field became required"))
        else:
            findings.append((path, "required_removed", "compatible",
                             "field became optional"))
    if o["default"] != n["default"]:
        findings.append((path, "default_changed", "informational",
                         "default added/removed (validity unchanged: "
                         "required checks before defaults fill)"))
    if o["transforms"] != n["transforms"]:
        findings.append((path, "transform_changed", "informational",
                         "transform chain changed (output, not "
                         "validity)"))

    ob, nb = o["base"], n["base"]
    if isinstance(ob, dict) and isinstance(nb, dict):
        _compare_schema(ob, nb, findings, mode, prefix=path + ".")
    elif (isinstance(ob, tuple) and isinstance(nb, tuple)
          and len(ob) == 2 and len(nb) == 2
          and ob[0] == "enum" and nb[0] == "enum"):
        ov, nv = ob[1], nb[1]
        if (isinstance(ov, (list, tuple, set, frozenset))
                and isinstance(nv, (list, tuple, set, frozenset))
                and all(_hashable(v) for v in list(ov) + list(nv))):
            ovs, nvs = set(ov), set(nv)
            if ovs == nvs:
                pass
            elif ovs <= nvs:
                findings.append((path, "enum_widened", "compatible",
                                 f"enum grew by {sorted(map(str, nvs - ovs))}"))
            else:
                findings.append((path, "enum_narrowed", "breaking",
                                 f"enum lost {sorted(map(str, ovs - nvs))}"))
        elif ov != nv:
            findings.append((path, "enum_changed", "breaking",
                             "enum values changed (non-comparable)"))
    elif (isinstance(ob, tuple) and isinstance(nb, tuple)
          and len(ob) == 2 and len(nb) == 2
          and ob[0] == "list" and nb[0] == "list"):
        _compare_field(path + "[]", ob[1], nb[1], findings, mode)
    elif (isinstance(ob, tuple) and isinstance(nb, tuple)
          and len(ob) == 2 and len(nb) == 2
          and ob[0] == "schema" and nb[0] == "schema"
          and isinstance(ob[1], dict) and isinstance(nb[1], dict)):
        _compare_schema(ob[1], nb[1], findings, mode, prefix=path + ".")
    elif ob != nb:
        if nb == "any":
            findings.append((path, "type_widened_to_any", "compatible",
                             "any accepts every value"))
        elif isinstance(ob, str) and isinstance(nb, str):
            findings.append((path, "type_changed", "breaking",
                             f"type {ob} -> {nb}"))
        else:
            findings.append((path, "unclassified", "breaking",
                             "base type changed in a form the analyzer "
                             "does not model — conservatively breaking"))

    _compare_constraints(path, o["constraints"], n["constraints"],
                         findings)


def _compare_schema(old: dict, new: dict, findings: list, mode: str,
                    prefix: str = "") -> None:
    for key in sorted(set(old) | set(new), key=str):
        path = prefix + str(key)
        if key not in new:
            if mode == "strict":
                findings.append((path, "field_removed", "breaking",
                                 "strict mode fails undeclared keys"))
            else:
                findings.append((path, "field_removed", "compatible",
                                 "permissive mode ignores undeclared "
                                 "keys (output narrows)"))
            continue
        if key not in old:
            n = _norm(new[key])
            if n["required"] and not n["default"]:
                findings.append((path, "field_added_required", "breaking",
                                 "rows without the field now fail"))
            elif (n["base"] == "any" and not n["constraints"]
                  and not n["required"]):
                findings.append((path, "field_added", "compatible",
                                 "optional any-typed field"))
            else:
                findings.append((path, "field_added", "warning",
                                 "new checks on a previously "
                                 "uninspected column — rows carrying "
                                 "bad values there start failing"))
            continue
        _compare_field(path, old[key], new[key], findings, mode)


def spec_compat(old_spec: dict, new_spec: dict,
                mode: str = "permissive") -> list[dict]:
    """Classify every difference between two specs by validation
    compatibility.  Returns a list of dicts (path, change, severity,
    detail), stable-ordered by path; empty means the validity set is
    identical field-for-field.  ``mode`` is the validation mode the
    verdict is computed against ('permissive' default; 'strict' makes
    field removal breaking)."""
    findings: list = []
    _compare_schema(old_spec, new_spec, findings, mode)
    return [{"path": p, "change": c, "severity": s, "detail": d}
            for p, c, s, d in findings]


def is_backward_compatible(old_spec: dict, new_spec: dict,
                           mode: str = "permissive") -> bool:
    """True iff no finding is breaking or warning — every row valid
    under ``old_spec`` is provably valid under ``new_spec``."""
    return all(f["severity"] in ("compatible", "informational")
               for f in spec_compat(old_spec, new_spec, mode))
