"""Spec-tree rewriting — the engine twin of ``Peri.walk/2``
(reference ``lib/peri/walker.ex:57-163``): depth-first traversal of a
rule-spec with a user mapper applied to every type expression, enabling
make-optional, drop-field, rename-field and similar schema surgery
before compilation.

The mapper receives each *type expression* post-order (children first,
like the reference's depth-first rewrite) and returns a replacement, or
``DROP`` to delete the field (dict entries only).
"""

from __future__ import annotations

from typing import Any, Callable

from peri_ray import spec as S

DROP = object()


def walk(spec_or_type: Any, mapper: Callable[[Any], Any]) -> Any:
    """Depth-first rewrite.  For dict schemas the mapper also sees
    ``("field", key, type)`` triples so field-level rewrites (rename,
    drop) are expressible, mirroring walker.ex's handling of schema
    key-value nodes."""
    t = spec_or_type
    if isinstance(t, dict):
        out = {}
        for key, sub in t.items():
            new_sub = walk(sub, mapper)
            decision = mapper(("field", key, new_sub))
            if decision is DROP:
                continue
            if isinstance(decision, tuple) and len(decision) == 3 and decision[0] == "field":
                _, new_key, new_type = decision
                out[new_key] = new_type
            else:
                out[key] = new_sub
        return mapper(out)
    if isinstance(t, tuple) and t:
        tag = t[0]
        if tag in ("required", "meta", "schema"):
            rebuilt = (tag, walk(t[1], mapper)) + tuple(t[2:])
        elif tag == "list":
            rebuilt = ("list", walk(t[1], mapper)) + tuple(t[2:])
        elif tag == "map":
            rebuilt = ("map",) + tuple(walk(x, mapper) for x in t[1:])
        elif tag == "tuple":
            rebuilt = ("tuple", [walk(x, mapper) for x in t[1]])
        elif tag == "either":
            a, b = t[1]
            rebuilt = ("either", (walk(a, mapper), walk(b, mapper)))
        elif tag == "oneof":
            rebuilt = ("oneof", [walk(x, mapper) for x in t[1]])
        elif tag == "multi":
            rebuilt = ("multi", t[1], {k: walk(v, mapper) for k, v in t[2].items()})
        elif tag == "cond":
            rebuilt = ("cond", t[1], walk(t[2], mapper), walk(t[3], mapper))
        elif tag == "dependent" and len(t) == 4:
            rebuilt = ("dependent", t[1], t[2], walk(t[3], mapper))
        elif S.is_constraint_attachment(t):
            rebuilt = (walk(t[0], mapper), t[1])
        else:
            rebuilt = t
        return mapper(rebuilt)
    return mapper(t)


# -- canned rewrites (walker_test.exs scenarios) ----------------------------


def make_all_optional(spec: dict) -> dict:
    """Strip every {:required, t} wrapper (walker_test.exs make-optional)."""

    def mapper(node):
        if isinstance(node, tuple) and node and node[0] == "required":
            return node[1]
        return node

    return walk(spec, mapper)


def drop_fields(spec: dict, names: set[str]) -> dict:
    def mapper(node):
        if isinstance(node, tuple) and len(node) == 3 and node[0] == "field" and node[1] in names:
            return DROP
        return node

    return walk(spec, mapper)


def rename_fields(spec: dict, renames: dict[str, str]) -> dict:
    def mapper(node):
        if isinstance(node, tuple) and len(node) == 3 and node[0] == "field" and node[1] in renames:
            return ("field", renames[node[1]], node[2])
        return node

    return walk(spec, mapper)
