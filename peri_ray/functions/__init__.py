"""Named function registry — the user-extension surface (SURVEY §2.8).

The reference lets schemas carry callbacks by MFA — module/function/args
triples that are *names*, not closures (``{:custom, {m, f}}``,
``lib/peri.ex:1110-1122``; transform MFAs ``lib/peri.ex:1084-1108``).
The engine twin: register a Python callable under a string name, then
reference it from a spec as ``("custom", "name")`` or
``(t, ("transform", "name"))``.  Names serialize cleanly into task
closures and JSON spec dumps; closures don't.

Vectorized callables (wrapped with :func:`peri_ray.vec`) receive the
whole Arrow column; scalar callables are auto-lifted into a per-row
loop over only the rows still active (the slow path — keep hot rules
vectorized).
"""

from __future__ import annotations

from typing import Any, Callable

from peri_ray.spec import vec

__all__ = ["register_function", "resolve_function", "function_registry", "vec"]

function_registry: dict[str, Callable[..., Any]] = {}


def register_function(name: str, fn: Callable | None = None, *, vectorized: bool = False):
    """Register ``fn`` under ``name``; usable as a decorator.

    >>> @register_function("odd")
    ... def odd(v):
    ...     return v % 2 == 1 or ("must be odd", {})
    """

    def _store(f: Callable) -> Callable:
        function_registry[name] = vec(f) if vectorized else f
        return f

    if fn is not None:
        return _store(fn)
    return _store


def resolve_function(name: str) -> Callable:
    if name not in function_registry:
        raise KeyError(
            f"no registered function {name!r}; register_function({name!r}, fn) first"
        )
    return function_registry[name]
