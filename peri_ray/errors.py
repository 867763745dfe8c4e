"""Violation/error machinery: message templates, value rendering, type
summaries.

Semantics mirror the reference's error layer (zoedsoupe/peri,
``lib/peri/error.ex``): errors carry a dotted ``path``, a ``key``, a
template-expanded ``message`` and structured content.  In the engine an
"error" is one row of the **violations table** — the columnar analogue of
``%Peri.Error{}`` — with columns::

    record_id : string   # the row's identity (url / doc_id / ordinal)
    rule_id   : string   # stable machine id of the failed rule
    path      : string   # dotted field path ("user.profile.email")
    message   : string   # template-expanded, parity with the reference
    actual    : string   # rendered offending value
    expected  : string   # rendered expectation

Message templates are byte-identical to the reference's
(``lib/peri.ex:801-1553``, ``lib/peri/error.ex:331-339``); template
expansion substitutes ``%{key}`` placeholders
(``Peri.Error.format_error_message``, ``lib/peri/error.ex:331-339``).
"""

from __future__ import annotations

from typing import Any

# ---------------------------------------------------------------------------
# Message templates (verbatim from the reference; see file:line in comments)
# ---------------------------------------------------------------------------

TEMPLATES = {
    # lib/peri.ex:1322
    "type": "expected type of %{expected} received %{actual} value",
    # Ecto's :cast error message (lib/peri/ecto.ex cast path; the
    # message string itself is ecto/lib/ecto/changeset.ex's default) —
    # used by peri_ray.changeset.cast_and_validate
    "cast": "is invalid",
    # lib/peri.ex:826
    "required": "is required, expected type of %{expected}",
    # lib/peri.ex:804
    "literal": "expected literal value %{expected} but got %{actual}",
    # lib/peri.ex:867
    "string.regex": "should match the %{regex} pattern",
    # lib/peri.ex:875
    "string.eq": "should be equal to literal %{literal}",
    # lib/peri.ex:883
    "string.min": "should have the minimum length of %{length}",
    # lib/peri.ex:891
    "string.max": "should have the maximum length of %{length}",
    # lib/peri.ex:900
    "num.eq": "should be equal to %{value}",
    # lib/peri.ex:909
    "num.neq": "should be not equal to %{value}",
    # lib/peri.ex:918  (sic: "then" is the reference's spelling)
    "num.gt": "should be greater then %{value}",
    # lib/peri.ex:927
    "num.gte": "should be greater then or equal to %{value}",
    # lib/peri.ex:936
    "num.lte": "should be less then or equal to %{value}",
    # lib/peri.ex:945
    "num.lt": "should be less then %{value}",
    # lib/peri.ex:952
    "num.range": "should be in the range of %{min}..%{max} (inclusive)",
    # lib/peri.ex:966
    "num.multiple_of": "should be a multiple of %{value}",
    # lib/peri.ex:1179
    "enum": "expected one of %{choices} received %{actual}",
    # lib/peri.ex:1133
    "either": "expected either %{first_type} or %{second_type}, got: %{actual}",
    # lib/peri.ex:1158
    "oneof": "expected one of %{oneof}, got: %{actual}",
    # lib/peri.ex:1169
    "tuple.size": "expected tuple of size %{length} received tuple with %{actual} length",
    # lib/peri.ex:1409
    "list.min": "should have at least %{min} items",
    # lib/peri.ex:1417
    "list.max": "should have at most %{max} items",
    # lib/peri.ex:1425
    "list.unique": "should have unique items",
    # lib/peri.ex:1553
    "multi.unknown": "no :multi branch matches dispatch %{field}=%{tag}; expected one of %{tags}",
    # lib/peri.ex:1300
    "nested": "expected a nested schema but received schema: %{type}",
}


def render(value: Any) -> str:
    """Render a Python value the way Elixir ``inspect/1`` renders the
    equivalent term (``lib/peri/error.ex:331-339`` passes non-binary
    context values through ``inspect/2``).  Atoms are modelled as strings
    prefixed with ``:`` by the caller where needed.
    """
    if value is None:
        return "nil"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return '"' + value + '"'
    if isinstance(value, float):
        if value == int(value) and abs(value) < 1e15:
            return f"{value:.1f}"
        return repr(value)
    if isinstance(value, bytes):
        return '"' + value.decode("utf-8", "replace") + '"'
    if isinstance(value, (list, tuple)):
        return "[" + ", ".join(render(v) for v in value) + "]"
    return str(value)


def expand(template: str, context: dict[str, Any]) -> str:
    """``Peri.Error.format_error_message`` parity
    (``lib/peri/error.ex:331-339``): substitute ``%{key}``; binaries are
    substituted raw, other values through ``render``.
    """
    msg = template
    for key, val in context.items():
        sub = val if isinstance(val, str) else render(val)
        msg = msg.replace("%{" + key + "}", sub)
    return msg


# ---------------------------------------------------------------------------
# Type summaries (``Peri.Error.summarize/1``, lib/peri/error.ex:242-329)
# ---------------------------------------------------------------------------

_MAX_KEYS = 3


def summarize(type_expr: Any, max_keys: int = _MAX_KEYS) -> str:
    """Compact rendering of a type expression for error messages.

    Parity with ``lib/peri/error.ex:242-329``: atoms render as ``:string``;
    nested map schemas render as ``%{a, b, c, +N more}``; ``:required``
    wraps as ``{:required, t}``; defaults/meta are transparent.
    """
    from peri_ray import spec as _spec

    t = type_expr
    if isinstance(t, str):
        return ":" + t
    if isinstance(t, dict):
        keys = list(t.keys())
        total = len(keys)
        shown = ", ".join(str(k) for k in keys[:max_keys])
        if total == 0:
            return "%{}"
        if total <= max_keys:
            return "%{" + shown + "}"
        return "%{" + shown + f", +{total - max_keys} more}}"
    if isinstance(t, tuple) and t:
        tag = t[0]
        if tag == "required":
            return "{:required, " + summarize(t[1], max_keys) + "}"
        if tag == "meta":
            return summarize(t[1], max_keys)
        if tag == "schema":
            return summarize(t[1], max_keys)
        if tag == "enum":
            return "{:enum, " + render(list(t[1])) + "}"
        if tag == "literal":
            return "{:literal, " + render(t[1]) + "}"
        if tag == "list":
            return "{:list, " + summarize(t[1], max_keys) + "}"
        if tag == "tuple":
            return "{:tuple, [" + ", ".join(summarize(x, max_keys) for x in t[1]) + "]}"
        if tag == "either":
            a, b = t[1]
            return "{:either, {" + summarize(a, max_keys) + ", " + summarize(b, max_keys) + "}}"
        if tag == "oneof":
            return "{:oneof, [" + ", ".join(summarize(x, max_keys) for x in t[1]) + "]}"
        if tag == "map":
            if len(t) == 2:
                return "{:map, " + summarize(t[1], max_keys) + "}"
            return "{:map, " + summarize(t[1], max_keys) + ", " + summarize(t[2], max_keys) + "}"
        if tag == "multi":
            return "{:multi, " + str(t[1]) + "}"
        if tag in ("cond", "dependent", "custom", "ref"):
            return "{:" + tag + ", ...}"
        # {type, {:default, v}} / {type, {:transform, f}} / {type, constraint(s)}
        if _spec.is_constraint_attachment(t):
            inner, attachment = t
            if isinstance(attachment, tuple) and attachment[0] in ("default", "transform"):
                return summarize(inner, max_keys)
            # constrained scalar type renders as the bare atom
            # (lib/peri/error.ex:300-303)
            return ":" + inner if isinstance(inner, str) else summarize(inner, max_keys)
    return render(t)


class InvalidSchemaError(Exception):
    """Raised when a rule-spec fails legality checks — the engine analogue
    of ``Peri.InvalidSchema`` (``lib/peri/invalid_schema.ex:17-52``)."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("Invalid schema:\n" + "\n".join(f"  {e}" for e in errors))


# ---------------------------------------------------------------------------
# Violations post-processing (``Peri.Error.traverse_errors/2`` and
# ``error_to_map/1``, lib/peri/error.ex:212-223,383-429)
# ---------------------------------------------------------------------------


def traverse_violations(violations, fn):
    """Post-walk over the violations table/Dataset rewriting ``message``
    per row — the i18n hook (``traverse_errors``, lib/peri/error.ex:212-223).
    ``fn`` receives the violation row as a dict and returns the new
    message string.  Runs inside ``map_batches`` when given a Dataset, so
    re-templating streams at any scale."""
    import pyarrow as pa

    def _rewrite(t: pa.Table) -> pa.Table:
        msgs = [fn(r) for r in t.to_pylist()]
        idx = t.column_names.index("message")
        return t.set_column(idx, "message", pa.array(msgs, pa.string()))

    if isinstance(t := violations, pa.Table):
        return _rewrite(t)
    return violations.map_batches(_rewrite, batch_format="pyarrow")


def violation_to_map(row: dict) -> dict:
    """``Peri.Error.error_to_map/1`` parity (lib/peri/error.ex:383-429):
    one violation row as a plain JSON-able dict with a list-shaped path,
    the leaf key, and a content map of expected/actual."""
    parts = row["path"].split(".") if row.get("path") else []
    return {
        "path": parts,
        "key": parts[-1] if parts else None,
        "message": row.get("message"),
        "content": {
            "rule": row.get("rule_id"),
            "actual": row.get("actual"),
            "expected": row.get("expected"),
        },
    }
