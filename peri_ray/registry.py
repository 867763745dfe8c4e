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


def defschema(name: str, spec: dict[str, Any]) -> "Schema":
    """Register a named schema after legality validation.  Returns a
    :class:`Schema` handle carrying the macro-generated surface
    (``name/1``, ``name!/1``, meta, JSON Schema export)."""
    validate_spec(spec)
    schema_registry[name] = spec
    return Schema(name, spec)


def get_schema(name: str) -> dict[str, Any]:
    """``get_schema/1`` parity (lib/peri.ex:339-388)."""
    return schema_registry[name]


class ValidationError(Exception):
    """Raised by :meth:`Schema.validate_bang` — the ``name!/1`` bang
    variant (lib/peri.ex:365-372): any violation fails the whole batch."""

    def __init__(self, violations):
        self.violations = violations
        msgs = [
            f"{r['path']}: {r['message']}"
            for r in violations.slice(0, 10).to_pylist()
        ]
        extra = violations.num_rows - len(msgs)
        if extra > 0:
            msgs.append(f"... +{extra} more")
        super().__init__("validation failed:\n" + "\n".join(f"  {m}" for m in msgs))


class Schema:
    """The engine twin of ``defschema``'s generated module functions
    (lib/peri.ex:339-388): callable validation, a bang variant, schema
    access, and format bridges — over batches or whole Datasets."""

    def __init__(self, name: str, spec: dict[str, Any]):
        self.name = name
        self.spec = spec

    # -- name/1 ------------------------------------------------------------
    def __call__(self, data, mode: str = "strict", id_column: str | None = None):
        """Validate a ``pa.Table`` (returns ``(combined, violations)``)
        or a Dataset (returns the combined Dataset)."""
        import pyarrow as pa

        from peri_ray.validate import compile_spec, validate_dataset

        if isinstance(data, pa.Table):
            return compile_spec(self.spec, mode=mode, id_column=id_column).run_batch(data)
        return validate_dataset(data, self.spec, mode=mode, id_column=id_column)

    # -- name!/1 -----------------------------------------------------------
    def validate_bang(self, table, mode: str = "strict"):
        """Batch bang variant: returns the validated table or raises
        :class:`ValidationError` listing the violations."""
        out, viols = self(table, mode=mode)
        if viols.num_rows:
            raise ValidationError(viols)
        return out.drop_columns(["valid"])

    def conforms(self, table, mode: str = "strict") -> bool:
        import pyarrow.compute as pc

        out, _ = self(table, mode=mode)
        return bool(pc.all(out.column("valid")).as_py())

    # -- tooling bridges ---------------------------------------------------
    def to_json_schema(self) -> dict:
        from peri_ray.jsonschema import to_json_schema

        return to_json_schema(self.spec)

    def walk(self, fn) -> "Schema":
        from peri_ray.walker import walk

        return Schema(self.name, walk(self.spec, fn))

    def generate(self, n: int, seed: int = 0):
        from peri_ray.specgen import generate_table

        return generate_table(self.spec, n, seed=seed)
