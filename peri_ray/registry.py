"""Named-schema registry — the engine twin of the reference's
``defschema`` macro + ``{:ref, name}`` resolution
(``lib/peri.ex:339-388,1481-1519``; ``lib/peri/parser.ex:112`` for the
recursion-depth cap, honored by the compiler).

``defschema`` validates the spec at registration (like the macro calling
``Peri.validate_schema``) and stores it under a name; ``("ref", name)``
type expressions resolve against this registry (or an explicit one passed
to ``compile_spec``) at validation time, with recursion capped at depth
64 by ``peri_ray.compile.Compiled``.
"""

from __future__ import annotations

from typing import Any

from peri_ray.spec import validate_spec

schema_registry: dict[str, dict[str, Any]] = {}


def defschema(name: str, spec: dict[str, Any]) -> dict[str, Any]:
    """Register a named schema after legality validation.  Returns the
    spec so it can be used inline as well."""
    validate_spec(spec)
    schema_registry[name] = spec
    return spec


def get_schema(name: str) -> dict[str, Any]:
    """``get_schema/1`` parity (lib/peri.ex:339-388)."""
    return schema_registry[name]
