"""Conformance suite for the batch validator — mirrors the reference's
test strategy (SURVEY §5): each case asserts exact validated values and
exact violation (rule_id, path, message) rows, per FIXTURES F1–F7.

Reference citations point into /root/reference (zoedsoupe/peri) for the
behavior each case pins down.  Batch-level tests need no Ray session:
row-independence means one batch is representative (proven separately in
test_ray_dataset.py by validating the same rows batched with unrelated
ones).
"""

import numpy as np
import pyarrow as pa
import pytest

from peri_ray import compile_spec, InvalidSchemaError, validate_spec, vec


def run(spec, data, **kw):
    plan = compile_spec(spec, **kw)
    return plan.run_batch(pa.table(data))


def viol_tuples(viols):
    return [(r["rule_id"], r["path"], r["message"]) for r in viols.to_pylist()]


# ---------------------------------------------------------------------------
# F1 — simple flat schema (test/peri_test.exs:6-10,49-88)
# ---------------------------------------------------------------------------


class TestSimple:
    SPEC = {"name": "string", "age": "integer", "email": ("required", "string")}

    def test_valid(self):
        out, viols = run(self.SPEC, {"name": ["John"], "age": [30], "email": ["j@x.io"]})
        assert out.column("valid").to_pylist() == [True]
        assert viols.num_rows == 0

    def test_missing_required(self):
        # test/peri_test.exs:61-66: missing :email
        out, viols = run(self.SPEC, {"name": ["John"], "age": [30], "email": pa.array([None], pa.string())})
        assert out.column("valid").to_pylist() == [False]
        assert viol_tuples(viols) == [
            ("required", "email", "is required, expected type of :string")
        ]

    def test_missing_column_entirely(self):
        out, viols = run(self.SPEC, {"name": ["John"], "age": [30]})
        assert out.column("valid").to_pylist() == [False]
        assert viols.to_pylist()[0]["rule_id"] == "required"

    def test_wrong_type(self):
        # age as string: every non-null value fails the :integer check
        out, viols = run(self.SPEC, {"name": ["J"], "age": ["thirty"], "email": ["e@x"]})
        assert out.column("valid").to_pylist() == [False]
        assert viol_tuples(viols) == [
            ("type.integer", "age", 'expected type of :integer received "thirty" value')
        ]

    def test_float_fails_integer(self):
        # numeric strictness (lib/peri.ex:779-780, test/peri_test.exs:2360-2386)
        out, viols = run(self.SPEC, {"name": ["J"], "age": [5.1], "email": ["e@x"]})
        assert out.column("valid").to_pylist() == [False]
        assert viols.to_pylist()[0]["rule_id"] == "type.integer"

    def test_int_fails_float(self):
        out, viols = run({"score": "float"}, {"score": [5]})
        assert out.column("valid").to_pylist() == [False]

    def test_nil_passes_optional(self):
        # optional-by-default (lib/peri.ex:1056)
        out, viols = run(self.SPEC, {"name": [None], "age": [None], "email": ["e@x"]})
        assert out.column("valid").to_pylist() == [True]
        assert viols.num_rows == 0

    def test_strict_mode_drops_extra(self):
        # filter_data strict (lib/peri.ex:630-664; test/peri_test.exs:1076-1155)
        out, _ = run(self.SPEC, {"name": ["J"], "age": [1], "email": ["e"], "extra": [9]})
        assert "extra" not in out.column_names

    def test_permissive_mode_keeps_extra(self):
        # test/permissive_mode_test.exs:20-66
        out, _ = run(
            self.SPEC,
            {"name": ["J"], "age": [1], "email": ["e"], "extra": [9]},
            mode="permissive",
        )
        assert out.column("extra").to_pylist() == [9]

    def test_empty_values_pass_required(self):
        # empty strings are not nil (lib/peri.ex:836-838)
        out, viols = run(self.SPEC, {"name": [""], "age": [0], "email": [""]})
        assert out.column("valid").to_pylist() == [True]


# ---------------------------------------------------------------------------
# F2 — nested schemas (test/peri_test.exs:18-26,110-283; regression #40)
# ---------------------------------------------------------------------------


class TestNested:
    SPEC = {
        "user": {
            "name": "string",
            "profile": {
                "age": ("required", "integer"),
                "email": ("required", "string"),
            },
        }
    }

    def _user(self, name, age, email):
        return {"name": name, "profile": {"age": age, "email": email}}

    def test_valid_nested(self):
        out, viols = run(self.SPEC, {"user": pa.array([self._user("J", 3, "e@x")])})
        assert out.column("valid").to_pylist() == [True]
        assert viols.num_rows == 0

    def test_nested_error_path(self):
        out, viols = run(self.SPEC, {"user": pa.array([self._user("J", 3, None)])})
        assert viol_tuples(viols) == [
            ("required", "user.profile.email", "is required, expected type of :string")
        ]

    def test_absent_optional_parent_ok(self):
        # nil nested schema without defaults -> ok (lib/peri.ex:1048-1056)
        out, viols = run(self.SPEC, {"user": pa.array([None], pa.struct(
            [("name", pa.string()), ("profile", pa.struct([("age", pa.int64()), ("email", pa.string())]))]
        ))})
        assert out.column("valid").to_pylist() == [True]

    def test_required_nested_summary(self):
        # {:required, %{...}} missing -> summarize rendering %{name, email}
        # (lib/peri/error.ex:306-320; test/peri_test.exs:2844-2853)
        spec = {"owner": ("required", {"name": "string", "email": "string"})}
        out, viols = run(spec, {"owner": pa.array([None], pa.struct([("name", pa.string()), ("email", pa.string())]))})
        assert viols.to_pylist()[0]["message"] == "is required, expected type of %{name, email}"

    def test_summary_truncation(self):
        spec = {"o": ("required", {"a": "string", "b": "string", "c": "string", "d": "string"})}
        out, viols = run(spec, {"o": pa.array([None], pa.struct([("a", pa.string())]))})
        assert viols.to_pylist()[0]["message"] == "is required, expected type of %{a, b, c, +1 more}"

    def test_sibling_errors_accumulate(self):
        # traverse_schema reduces over every key (lib/peri.ex:686-707)
        spec = {"a": ("required", "string"), "b": ("required", "integer")}
        out, viols = run(spec, {"a": pa.array([None], pa.string()), "b": pa.array([None], pa.int64())})
        assert len(viols) == 2


# ---------------------------------------------------------------------------
# F3 — constraint matrix (test/peri_test.exs:2256-2386; list_constraints)
# ---------------------------------------------------------------------------


class TestConstraints:
    def test_string_regex(self):
        out, viols = run({"u": ("string", ("regex", "^[a-zA-Z0-9_]+$"))}, {"u": ["ok_1", "no way"]})
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.to_pylist()[0]["message"] == "should match the ~r/^[a-zA-Z0-9_]+$/ pattern"

    def test_string_eq_min_max(self):
        out, viols = run({"s": ("string", ("eq", "Elixir"))}, {"s": ["Elixir", "Erlang"]})
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.to_pylist()[0]["message"] == 'should be equal to literal Elixir'
        out, viols = run({"s": ("string", ("min", 5))}, {"s": ["abcde", "abc"]})
        assert viols.to_pylist()[0]["message"] == "should have the minimum length of 5"
        out, viols = run({"s": ("string", ("max", 3))}, {"s": ["ab", "abcd"]})
        assert viols.to_pylist()[0]["message"] == "should have the maximum length of 3"

    def test_numeric_comparisons(self):
        cases = [
            (("eq", 42), [42, 41], "should be equal to 42"),
            (("neq", 42), [41, 42], "should be not equal to 42"),
            (("gt", 10), [11, 10], "should be greater then 10"),
            (("gte", 10), [10, 9], "should be greater then or equal to 10"),
            (("lt", 10), [9, 10], "should be less then 10"),
            (("lte", 10), [10, 11], "should be less then or equal to 10"),
        ]
        for constraint, vals, msg in cases:
            out, viols = run({"n": ("integer", constraint)}, {"n": vals})
            assert out.column("valid").to_pylist() == [True, False], constraint
            assert viols.to_pylist()[0]["message"] == msg

    def test_range(self):
        out, viols = run({"n": ("integer", ("range", (5, 15)))}, {"n": [5, 15, 4, 16]})
        assert out.column("valid").to_pylist() == [True, True, False, False]
        assert viols.to_pylist()[0]["message"] == "should be in the range of 5..15 (inclusive)"

    def test_multiple_of_int(self):
        out, viols = run({"n": ("integer", ("multiple_of", 5))}, {"n": [10, 11]})
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.to_pylist()[0]["message"] == "should be a multiple of 5"

    def test_multiple_of_float_tolerance(self):
        # 1e-9 tolerance (lib/peri.ex:1432-1438)
        out, _ = run({"x": ("float", ("multiple_of", 0.25))}, {"x": [0.75, 0.8]})
        assert out.column("valid").to_pylist() == [True, False]

    def test_multi_option_all_failures_collected(self):
        # lib/peri.ex:848-861: every failing option reported
        spec = {"pw": ("string", [("min", 8), ("regex", "[0-9]")])}
        out, viols = run(spec, {"pw": ["abc"]})
        assert out.column("valid").to_pylist() == [False]
        assert sorted(r["rule_id"] for r in viols.to_pylist()) == ["string.min", "string.regex"]

    def test_nil_passes_constraints(self):
        out, viols = run({"n": ("integer", ("gt", 10))}, {"n": pa.array([None], pa.int64())})
        assert out.column("valid").to_pylist() == [True]

    def test_list_constraints(self):
        spec = {"tags": ("list", "string", {"min": 1, "max": 3, "unique": True})}
        out, viols = run(spec, {"tags": pa.array([[], ["a", "a"], ["a", "b", "c", "d"], ["x"]])})
        assert out.column("valid").to_pylist() == [False, False, False, True]
        msgs = {r["message"] for r in viols.to_pylist()}
        assert msgs == {
            "should have at least 1 items",
            "should have unique items",
            "should have at most 3 items",
        }

    def test_list_element_halts_at_first(self):
        # halt-on-first-bad-element (lib/peri.ex:1194-1216)
        spec = {"ns": ("list", ("integer", ("gt", 0)))}
        out, viols = run(spec, {"ns": pa.array([[1, -2, -3], [1, 2]])})
        assert out.column("valid").to_pylist() == [False, True]
        rows = viols.to_pylist()
        assert len(rows) == 1  # only the first failing element reported
        assert rows[0]["path"] == "ns.1"


# ---------------------------------------------------------------------------
# F4 — choice types (test/peri_test.exs:380-489,599-677,2741-2827; multi_test)
# ---------------------------------------------------------------------------


class TestChoice:
    def test_enum(self):
        out, viols = run({"r": ("enum", ["admin", "user"])}, {"r": ["admin", "root", None]})
        assert out.column("valid").to_pylist() == [True, False, True]  # nil passes enum
        assert viols.to_pylist()[0]["message"] == 'expected one of ["admin", "user"] received "root"'

    def test_enum_int(self):
        out, _ = run({"b": ("enum", [1, 2, 3])}, {"b": [2, 9]})
        assert out.column("valid").to_pylist() == [True, False]

    def test_enum_with_type_precheck(self):
        # {:enum, choices, type: :integer} (lib/peri.ex:1184-1192)
        out, viols = run({"b": ("enum", [1, 2], {"type": "integer"})}, {"b": ["x"]})
        assert out.column("valid").to_pylist() == [False]
        assert viols.to_pylist()[0]["rule_id"] == "type.integer"

    def test_literal_nil_fails(self):
        # literal precedes the nil catch-all (lib/peri.ex:801 vs 1056)
        out, viols = run({"s": ("literal", "active")}, {"s": pa.array([None], pa.string())})
        assert out.column("valid").to_pylist() == [False]

    def test_either_first_match(self):
        out, viols = run({"v": ("either", ("integer", "string"))}, {"v": ["hello"]})
        assert out.column("valid").to_pylist() == [True]
        out, viols = run({"v": ("either", ("integer", "boolean"))}, {"v": ["hello"]})
        assert out.column("valid").to_pylist() == [False]
        assert (
            viols.to_pylist()[0]["message"]
            == 'expected either :integer or :boolean, got: "hello"'
        )

    def test_oneof(self):
        out, viols = run({"v": ("oneof", ["integer", "string", "boolean"])}, {"v": [3.3]})
        assert out.column("valid").to_pylist() == [False]
        assert viols.to_pylist()[0]["message"] == "expected one of :integer or :string or :boolean, got: 3.3"

    def test_oneof_with_constraints(self):
        out, _ = run({"v": ("oneof", [("integer", ("gt", 10)), ("integer", ("lt", 0))])}, {"v": [11, -1, 5]})
        assert out.column("valid").to_pylist() == [True, True, False]

    def test_multi_dispatch(self):
        # test/multi_test.exs:15-67
        spec = {
            "payload": (
                "multi",
                "kind",
                {
                    "circle": {"radius": ("required", "float")},
                    "rect": {"w": ("required", "float"), "h": ("required", "float")},
                },
            )
        }
        data = {
            "kind": ["circle", "rect", "blob"],
            "payload": pa.array(
                [
                    {"radius": 1.0, "w": None, "h": None},
                    {"radius": None, "w": 2.0, "h": 3.0},
                    {"radius": None, "w": None, "h": None},
                ]
            ),
        }
        out, viols = run(spec, data)
        assert out.column("valid").to_pylist() == [True, True, False]
        assert (
            viols.to_pylist()[0]["message"]
            == 'no :multi branch matches dispatch :kind="blob"; expected one of :circle, :rect'
        )


# ---------------------------------------------------------------------------
# F5 — defaults & transforms (test/peri_test.exs:1666-1778,1852-2159)
# ---------------------------------------------------------------------------


class TestDefaultsTransforms:
    def test_default_fills_nil_only(self):
        out, _ = run({"name": ("string", ("default", "Anonymous"))}, {"name": [None, "Zed"]})
        assert out.column("name").to_pylist() == ["Anonymous", "Zed"]

    def test_default_missing_column(self):
        out, _ = run({"age": ("integer", ("default", 0))}, {"x": [1, 2]}, mode="permissive")
        assert out.column("age").to_pylist() == [0, 0]

    def test_callable_default(self):
        out, _ = run({"n": ("integer", ("default", lambda: 7))}, {"n": [None]})
        assert out.column("n").to_pylist() == [7]

    def test_default_then_constraint(self):
        # default fills BEFORE checks (lib/peri.ex:970-991)
        out, _ = run({"n": (("integer", ("gte", 5)), ("default", 9))}, {"n": [None, 4]})
        assert out.column("valid").to_pylist() == [True, False]

    def test_incompatible_branch_default_keeps_nulls(self):
        # hypothesis-found crash: an integer default on a oneof branch
        # over a string-typed column cannot physically fill — validity
        # must match the reference (required checks nulls BEFORE any
        # default fills, lib/peri.ex:825) and the engine must not raise
        spec = {"f0": ("required", ("oneof", [("integer", ("default", 0)), "string"]))}
        out, viols = run(spec, {"f0": ["a", None, "b"]})
        assert out.column("valid").to_pylist() == [True, False, True]
        assert viols.to_pylist()[0]["rule_id"] == "required"
        # optional variant: nil passes the branch; value deviation
        # (null kept instead of 0) is the documented physical-type class
        out2, _ = run({"f0": ("oneof", [("integer", ("default", 0)), "string"])},
                      {"f0": ["a", None]})
        assert out2.column("valid").to_pylist() == [True, True]

    def test_required_default_is_spec_error(self):
        # lib/peri.ex:829-834,1780-1783
        with pytest.raises(InvalidSchemaError):
            validate_spec({"e": ("required", ("string", ("default", "x")))})

    def test_builtin_transform(self):
        out, _ = run({"u": ("string", ("transform", "upcase"))}, {"u": ["ab", None]})
        assert out.column("u").to_pylist() == ["AB", None]

    def test_python_scalar_transform(self):
        out, _ = run({"n": ("integer", ("transform", lambda v: v * 2))}, {"n": [3, None]})
        assert out.column("n").to_pylist() == [6, None]

    def test_vectorized_transform(self):
        import pyarrow.compute as pc

        out, _ = run(
            {"n": ("integer", ("transform", vec(lambda a: pc.multiply(a, 2))))},
            {"n": [3, 4]},
        )
        assert out.column("n").to_pylist() == [6, 8]

    def test_transform_skips_invalid(self):
        # transforms run after type check on validated values (lib/peri.ex:1058-1108)
        out, _ = run({"n": ("integer", ("transform", lambda v: v * 2))}, {"n": ["x"]})
        assert out.column("n").to_pylist() == ["x"]

    def test_two_arity_transform_sees_root(self):
        out, _ = run(
            {"a": "integer", "b": ("integer", ("transform", lambda v, root: v + root["a"]))},
            {"a": [10], "b": [1]},
        )
        assert out.column("b").to_pylist() == [11]

    def test_nested_defaults_materialize_when_key_present(self):
        # schema_has_defaults? + field_presence? (lib/peri.ex:1048-1054;
        # test/peri_test.exs:1687-1761): null parent with defaults -> filled
        spec = {"profile": {"theme": ("string", ("default", "dark"))}}
        data = {"profile": pa.array([None], pa.struct([("theme", pa.string())]))}
        out, _ = run(spec, data)
        assert out.column("profile").to_pylist() == [{"theme": "dark"}]


# ---------------------------------------------------------------------------
# F6 — cond / dependent / custom (test/peri_test.exs:2388-2627)
# ---------------------------------------------------------------------------


class TestDynamic:
    def test_cond_column_name(self):
        spec = {
            "provide_details": "boolean",
            "details": ("cond", "provide_details", ("required", "string"), "any"),
        }
        data = {"provide_details": [True, False, True], "details": ["d", None, None]}
        out, viols = run(spec, data)
        assert out.column("valid").to_pylist() == [True, True, False]
        assert viols.to_pylist()[0]["path"] == "details"

    def test_cond_callable(self):
        spec = {
            "t": "string",
            "v": ("cond", lambda row: row["t"] == "num", ("required", "integer"), "any"),
        }
        out, _ = run(spec, {"t": ["num", "txt"], "v": pa.array([None, None], pa.int64())})
        assert out.column("valid").to_pylist() == [False, True]

    def test_cond_nested_map_branch_type_divergence(self):
        # regression (ADVICE r2): a cond branch that is a nested map
        # schema rebuilds the struct strictly (dropping extra keys), so
        # its physical type diverges from the input column; the merge
        # must keep the original column instead of raising ArrowTypeError
        spec = {
            "flag": "boolean",
            "obj": ("cond", "flag", {"a": "string"}, "any"),
        }
        data = pa.table({
            "flag": [True, False],
            "obj": pa.array([{"a": "x", "extra": 1}, {"a": "y", "extra": 2}]),
        })
        plan = compile_spec(spec)
        out, viols = plan.run_batch(data)
        assert out.column("valid").to_pylist() == [True, True]
        assert viols.num_rows == 0

    def test_dependent_schema_nested_map_branch(self):
        # regression (ADVICE r2): same unguarded merge in _dependent_schema
        spec = {
            "kind": "string",
            "obj": ("dependent", lambda row: {"a": ("required", "string")}
                    if row["kind"] == "strict" else "any"),
        }
        data = pa.table({
            "kind": ["strict", "loose"],
            "obj": pa.array([{"a": "x", "extra": 1}, {"a": None, "extra": 2}]),
        })
        out, viols = compile_spec(spec).run_batch(data)
        assert out.column("valid").to_pylist() == [True, True]
        assert viols.num_rows == 0

    def test_dependent_pairwise_eq(self):
        # password confirmation (test/peri_test.exs:2487-2527)
        spec = {
            "password": "string",
            "password_confirmation": (
                "dependent",
                "password",
                ("eq", "confirmation should be equal to password"),
                "string",
            ),
        }
        out, viols = run(
            spec,
            {"password": ["abc", "abc"], "password_confirmation": ["abc", "xyz"]},
        )
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.to_pylist()[0]["message"] == "confirmation should be equal to password"

    def test_dependent_pairwise_callable(self):
        def check(val, other):
            if other is not None and val is None:
                return ("%{f} is required when other is set", {"f": "this"})
            return None

        spec = {"a": "string", "b": ("dependent", "a", check, "string")}
        out, viols = run(spec, {"a": ["x", None], "b": [None, None]})
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.to_pylist()[0]["message"] == "this is required when other is set"

    def test_dependent_schema_returning(self):
        # {:dependent, cb} returning a type per row (lib/peri.ex:1001-1037)
        def decide(row):
            return ("required", "integer") if row["kind"] == "n" else ("required", "string")

        spec = {"kind": "string", "v": ("dependent", decide)}
        out, _ = run(spec, {"kind": ["n", "s"], "v": pa.array(["3", "ok"])})
        # string col: integer branch fails for row 0
        assert out.column("valid").to_pylist() == [False, True]

    def test_custom_scalar(self):
        def odd(v):
            return None if v % 2 == 1 else ("must be odd", {})

        out, viols = run({"n": ("custom", odd)}, {"n": [3, 4, None]})
        assert out.column("valid").to_pylist() == [True, False, True]  # nil skips custom
        assert viols.to_pylist()[0]["message"] == "must be odd"

    def test_custom_vectorized(self):
        import pyarrow.compute as pc

        cb = vec(lambda arr: (pc.equal(pc.bit_wise_and(arr, 1), 1), "must be odd", {}))
        out, viols = run({"n": ("custom", cb)}, {"n": [3, 4]})
        assert out.column("valid").to_pylist() == [True, False]


# ---------------------------------------------------------------------------
# spec legality (≅ Peri.validate_schema, test/peri_test.exs:1452-1665)
# ---------------------------------------------------------------------------


class TestSpecLegality:
    def test_unknown_type(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": "stringg"})

    def test_empty_enum(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": ("enum", [])})

    def test_multiple_of_zero(self):
        # lib/peri.ex:1764
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": ("integer", ("multiple_of", 0))})

    def test_bad_list_constraint(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": ("list", "string", {"frobnicate": 1})})

    def test_constraint_on_wrong_type(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": ("boolean", ("gt", 1))})

    def test_valid_specs_pass(self):
        validate_spec(
            {
                "a": "string",
                "b": ("required", ("integer", ("gte", 0))),
                "c": {"d": ("enum", ["x"])},
                "e": ("list", ("string", ("min", 1)), {"max": 5}),
            }
        )

    def test_multi_requires_map_branches(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"x": ("multi", "f", [])})


# ---------------------------------------------------------------------------
# registry / refs (test/ref_test.exs)
# ---------------------------------------------------------------------------


class TestRefs:
    def test_ref_resolution(self):
        from peri_ray import defschema

        defschema("address", {"street": ("required", "string")})
        spec = {"addr": ("ref", "address")}
        plan = compile_spec(spec, registry={"address": {"street": ("required", "string")}})
        t = pa.table({"addr": pa.array([{"street": None}, {"street": "s"}])})
        out, viols = plan.run_batch(t)
        assert out.column("valid").to_pylist() == [False, True]


# ---------------------------------------------------------------------------
# row-independence / batching invariance
# ---------------------------------------------------------------------------


class TestBatchingInvariance:
    def test_same_outcome_alone_or_batched(self):
        spec = {"n": ("required", ("integer", ("range", (0, 10)))), "s": ("string", ("min", 2))}
        alone_out, alone_v = run(spec, {"n": [99], "s": ["a"]})
        batched_out, batched_v = run(
            spec, {"n": [5, 99, 3], "s": ["ab", "a", "xy"]}
        )
        assert alone_out.column("valid").to_pylist() == [False]
        assert batched_out.column("valid").to_pylist() == [True, False, True]
        assert sorted(r["rule_id"] for r in alone_v.to_pylist()) == sorted(
            r["rule_id"] for r in batched_v.to_pylist()
        )


class TestAdditionalKeys:
    """{:schema, s, {:additional_keys, t}} — declared fields validate by
    their own rules; undeclared struct fields validate against t and are
    kept in the output (lib/peri.ex:1272-1296)."""

    SPEC = {"cfg": ("schema", {"port": "integer"}, ("additional_keys", "string"))}

    def test_extra_keys_validated_and_kept(self):
        data = {"cfg": [{"port": 80, "host": "a.io"}, {"port": 81, "host": "b.io"}]}
        out, viols = run(self.SPEC, data)
        assert out.column("valid").to_pylist() == [True, True]
        assert viols.num_rows == 0
        cfg = out.column("cfg").to_pylist()
        assert cfg[0] == {"port": 80, "host": "a.io"}  # extra key preserved

    def test_extra_key_violation(self):
        data = {"cfg": [{"port": 80, "host": 7}]}
        out, viols = run(self.SPEC, data)
        assert out.column("valid").to_pylist() == [False]
        vt = viol_tuples(viols)
        assert vt == [("type.string", "cfg.host", "expected type of :string received 7 value")]

    def test_declared_key_still_checked(self):
        data = {"cfg": [{"port": "eighty", "host": "x"}]}
        out, viols = run(self.SPEC, data)
        assert out.column("valid").to_pylist() == [False]
        assert viols.to_pylist()[0]["path"] == "cfg.port"

    def test_schema_name_opt_accepted(self):
        validate_spec({"cfg": ("schema", {"port": "integer"}, {"name": "config"})})

    def test_bad_opts_rejected(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"cfg": ("schema", {"p": "integer"}, ("additional_keys",))})


class TestErrorTraversal:
    """traverse_errors / error_to_map parity (lib/peri/error.ex:212-223,
    383-429) over the violations table."""

    def test_traverse_violations_table(self):
        from peri_ray import traverse_violations

        _, viols = run(
            {"age": ("integer", ("gte", 18))}, {"age": [17, 30, 2]}
        )
        out = traverse_violations(viols, lambda r: f"[i18n] {r['message']}")
        msgs = out.column("message").to_pylist()
        assert len(msgs) == 2
        assert all(m.startswith("[i18n] should be greater then or equal") for m in msgs)
        # non-message columns untouched
        assert out.column("rule_id").to_pylist() == ["integer.gte"] * 2

    def test_violation_to_map(self):
        from peri_ray import violation_to_map

        _, viols = run(
            {"user": {"email": ("required", "string")}},
            {"user": [{"email": None}]},
        )
        m = violation_to_map(viols.to_pylist()[0])
        assert m["path"] == ["user", "email"]
        assert m["key"] == "email"
        assert m["content"]["rule"] == "required"
        assert "is required" in m["message"]


class TestTemporalConstraints:
    """[NORTH] extension: ordered comparisons on temporal columns (the
    reference only type-checks temporal values, lib/peri.ex:788-792)."""

    def test_datetime_gte(self):
        import datetime

        out, viols = run(
            {"ts": ("datetime", ("gte", datetime.datetime(1995, 1, 1)))},
            {"ts": pa.array([datetime.datetime(1994, 6, 1),
                             datetime.datetime(1996, 1, 1), None],
                            pa.timestamp("us"))},
        )
        assert out.column("valid").to_pylist() == [False, True, True]
        assert viols.column("rule_id").to_pylist() == ["datetime.gte"]

    def test_date_range(self):
        import datetime

        out, viols = run(
            {"d": ("date", ("range", (datetime.date(2000, 1, 1),
                                      datetime.date(2001, 1, 1))))},
            {"d": pa.array([datetime.date(1999, 1, 1),
                            datetime.date(2000, 6, 1)], pa.date32())},
        )
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.column("rule_id").to_pylist() == ["date.range"]

    def test_multiple_of_rejected_on_temporal(self):
        with pytest.raises(InvalidSchemaError):
            validate_spec({"d": ("datetime", ("multiple_of", 5))})


class TestMapTupleMeta:
    """{:map, v} / {:map, k, v} (lib/peri.ex:1227-1261), {:tuple, [t...]}
    (lib/peri.ex:1164-1172,1325-1349) and {:meta, t, opts} passthrough."""

    def test_map_value_type(self):
        arr = pa.array(
            [[("a", 1), ("b", 2)], [("c", 3)], None],
            pa.map_(pa.string(), pa.int64()),
        )
        out, viols = run({"m": ("map", "integer")}, {"m": arr})
        assert out.column("valid").to_pylist() == [True, True, True]

    def test_map_bad_value(self):
        arr = pa.array(
            [[("a", "x")], [("b", "y")]],
            pa.map_(pa.string(), pa.string()),
        )
        out, viols = run({"m": ("map", "integer")}, {"m": arr})
        assert out.column("valid").to_pylist() == [False, False]
        assert all(r == "type.integer" for r in viols.column("rule_id").to_pylist())

    def test_map_key_and_value(self):
        arr = pa.array(
            [[("a", 1)], [("b", 2)]],
            pa.map_(pa.string(), pa.int64()),
        )
        out, _ = run({"m": ("map", "string", "integer")}, {"m": arr})
        assert out.column("valid").to_pylist() == [True, True]

    def test_tuple_per_index(self):
        arr = pa.array(
            [{"f0": 1.5, "f1": 2.5}, {"f0": 0.5, "f1": None}],
            pa.struct([("f0", pa.float64()), ("f1", pa.float64())]),
        )
        out, viols = run(
            {"coords": ("tuple", ["float", ("float", ("gt", 1.0))])},
            {"coords": arr},
        )
        assert out.column("valid").to_pylist() == [True, True]
        out2, viols2 = run(
            {"coords": ("tuple", [("float", ("gt", 1.0)), "float"])},
            {"coords": arr},
        )
        assert out2.column("valid").to_pylist() == [True, False]
        # per-index error path coords.0 (lib/peri.ex:1335-1340)
        assert viols2.column("path").to_pylist() == ["coords.0"]

    def test_tuple_element_transform_rebuilds(self):
        # regression (ADVICE r2): tuple-element transforms were validated
        # but the original struct was returned, silently dropping the
        # rewrite (reference rebuilds: lib/peri.ex:1325-1349)
        arr = pa.array(
            [{"f0": "ab", "f1": 3}, {"f0": "cd", "f1": 4}, None],
            pa.struct([("f0", pa.string()), ("f1", pa.int64())]),
        )
        out, viols = run(
            {"t": ("tuple", [("string", ("transform", "upcase")), "integer"])},
            {"t": arr},
        )
        assert viols.num_rows == 0
        assert out.column("t").to_pylist() == [
            {"f0": "AB", "f1": 3}, {"f0": "CD", "f1": 4}, None,
        ]

    def test_tuple_element_default_fills(self):
        arr = pa.array(
            [{"f0": 1, "f1": None}],
            pa.struct([("f0", pa.int64()), ("f1", pa.int64())]),
        )
        out, _ = run(
            {"t": ("tuple", ["integer", ("integer", ("default", 9))])},
            {"t": arr},
        )
        assert out.column("t").to_pylist() == [{"f0": 1, "f1": 9}]

    def test_tuple_arity_mismatch(self):
        arr = pa.array([{"f0": 1}], pa.struct([("f0", pa.int64())]))
        out, viols = run({"t": ("tuple", ["integer", "integer"])}, {"t": arr})
        assert out.column("valid").to_pylist() == [False]
        assert viols.column("rule_id").to_pylist() == ["tuple.size"]

    def test_meta_transparent(self):
        out, viols = run(
            {"age": ("meta", ("integer", ("gte", 18)), {"description": "years"})},
            {"age": [17, 21]},
        )
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.column("rule_id").to_pylist() == ["integer.gte"]


class TestMultiUnknownTag:
    def test_unknown_tag_lists_known(self):
        out, viols = run(
            {"v": ("multi", "kind", {"a": "integer", "b": "string"})},
            {"kind": ["a", "zzz"], "v": pa.array([1, 2], pa.int64())},
            mode="permissive",
        )
        assert out.column("valid").to_pylist() == [True, False]
        (msg,) = viols.column("message").to_pylist()
        assert ":a" in msg and ":b" in msg and "zzz" in msg


class TestSummarize:
    """summarize/1 truncated rendering (lib/peri/error.ex:306-320) —
    asserted because messages embed it verbatim (test/peri_test.exs:2844-53)."""

    def test_truncation(self):
        from peri_ray import summarize

        s = summarize({k: "string" for k in ["a", "b", "c", "d", "e"]}, max_keys=3)
        assert s == "%{a, b, c, +2 more}"

    def test_required_missing_message_embeds_summary(self):
        out, viols = run(
            {"user": ("required", {"name": "string", "email": "string"})},
            {"user": pa.array([None], pa.struct([("name", pa.string()), ("email", pa.string())]))},
        )
        (msg,) = viols.column("message").to_pylist()
        assert "%{name, email}" in msg


class TestSchemaHandle:
    """defschema's generated surface (lib/peri.ex:339-388): name/1,
    name!/1, conforms, format bridges — as a Schema handle."""

    def test_call_validates_batch(self):
        from peri_ray import defschema

        user = defschema("user_t1", {"name": ("required", "string"),
                                     "age": ("integer", ("gte", 0))})
        out, viols = user(pa.table({"name": ["a", None], "age": [3, -1]}))
        assert out.column("valid").to_pylist() == [True, False]
        assert sorted(viols.column("rule_id").to_pylist()) == ["integer.gte", "required"]

    def test_bang_raises_with_violations(self):
        from peri_ray import defschema, ValidationError

        s = defschema("pos_t1", {"n": ("integer", ("gt", 0))})
        ok = s.validate_bang(pa.table({"n": [1, 2]}))
        assert ok.column("n").to_pylist() == [1, 2]
        with pytest.raises(ValidationError) as ei:
            s.validate_bang(pa.table({"n": [1, -2]}))
        assert "should be greater then 0" in str(ei.value)

    def test_conforms_and_bridges(self):
        from peri_ray import defschema

        s = defschema("doc_t1", {"lang": ("enum", ["en", "de"])})
        assert s.conforms(pa.table({"lang": ["en"]}))
        assert not s.conforms(pa.table({"lang": ["xx"]}))
        js = s.to_json_schema()
        assert js["properties"]["lang"]["enum"] == ["en", "de"]
        t = s.generate(50, seed=1)
        assert s.conforms(t)

    def test_walk_returns_new_schema(self):
        from peri_ray import defschema

        s = defschema("w_t1", {"a": ("required", "integer")})
        relaxed = s.walk(lambda t: t[1] if isinstance(t, tuple) and t[0] == "required" else t)
        assert relaxed.spec == {"a": "integer"}
        assert relaxed.conforms(pa.table({"a": pa.array([None], pa.int64())}))


class TestListElementCallbacks:
    """2-arity/root-access callbacks inside list elements — the engine
    twin of Parser.for_list_element scoping (lib/peri/parser.ex:97-106;
    test/nested_list_callback_test.exs).  Regression: the flattened
    element scope must gather root rows per element, not reuse the
    parent batch's indices."""

    def test_cond_root_access_multi_element(self):
        spec = {
            "strict_mode": "boolean",
            "items": ("list", {"v": ("cond",
                                     lambda row: row.get("strict_mode"),
                                     ("integer", ("gte", 10)), "integer")}),
        }
        out, viols = run(spec, {
            "strict_mode": [True, False],
            "items": [[{"v": 5}, {"v": 20}, {"v": 6}], [{"v": 5}]],
        }, mode="permissive")
        assert out.column("valid").to_pylist() == [False, True]
        # halt-on-first: only the FIRST failing element reported
        assert viols.column("path").to_pylist() == ["items.0"]

    def test_dependent_resolves_other_from_root(self):
        # {:dependent, field, cb, t}: dependent_val comes from ROOT
        # (lib/peri.ex:1039-1046), aligned per element
        spec = {
            "expected_tag": "string",
            "tags": ("list", ("dependent", "expected_tag",
                              ("eq", "tag must match expected"), "string")),
        }
        out, viols = run(spec, {
            "expected_tag": ["x", "y"],
            "tags": [["x", "x", "z"], ["y"]],
        }, mode="permissive")
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.column("path").to_pylist() == ["tags.2"]

    def test_two_arity_cond_sees_element_and_root(self):
        spec = {
            "limit": "integer",
            "ns": ("list", ("cond",
                            lambda cur, root: cur is not None and cur > root["limit"],
                            ("integer", ("lte", 0)), "integer")),
        }
        out, viols = run(spec, {"limit": [10, 10], "ns": [[5, 50], [1, 2]]},
                         mode="permissive")
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.column("path").to_pylist() == ["ns.1"]


class TestErrorOverrides:
    """Per-rule error: message overrides (tag_error_override,
    lib/peri.ex:1458-1479; apply_override lib/peri/error.ex:182-195;
    test/custom_errors_test.exs)."""

    def test_static_override_on_constraint(self):
        out, viols = run(
            {"age": ("integer", [("gte", 18), ("error", "too young!")])},
            {"age": [17, 30]},
        )
        assert out.column("valid").to_pylist() == [False, True]
        assert viols.column("message").to_pylist() == ["too young!"]

    def test_callable_override_sees_error_fields(self):
        cb = lambda err: f"bad {err['path']}: got {err['actual']}"
        out, viols = run(
            {"n": ("integer", [("lt", 10), ("error", cb)])},
            {"n": [50]},
        )
        assert viols.column("message").to_pylist() == ["bad n: got 50"]

    def test_enum_opts_override(self):
        out, viols = run(
            {"color": ("enum", ["red", "blue"], {"error": "pick red or blue"})},
            {"color": ["green"]},
        )
        assert viols.column("message").to_pylist() == ["pick red or blue"]

    def test_list_opts_override(self):
        out, viols = run(
            {"tags": ("list", "string", {"min": 2, "error": "need two tags"})},
            {"tags": [["only-one"]]},
        )
        assert viols.column("message").to_pylist() == ["need two tags"]

    def test_override_keeps_rule_id(self):
        _, viols = run(
            {"age": ("integer", [("gte", 18), ("error", "too young!")])},
            {"age": [17]},
        )
        assert viols.column("rule_id").to_pylist() == ["integer.gte"]


class TestMultiOptionCollection:
    def test_all_failing_options_collected(self):
        """Multi-option constraint lists collect EVERY failing option
        (lib/peri.ex:848-861), unlike list elements which halt."""
        out, viols = run(
            {"s": ("string", [("min", 10), ("regex", "^[0-9]+$")])},
            {"s": ["abc"]},
        )
        assert out.column("valid").to_pylist() == [False]
        assert sorted(viols.column("rule_id").to_pylist()) == [
            "string.min", "string.regex"
        ]


class TestConformsSpec:
    def test_boolean_twin(self):
        from peri_ray import conforms_spec

        assert conforms_spec({"a": ("integer", ("gte", 0))})
        assert not conforms_spec({"a": ("integer", ("frobnicate", 1))})
        assert not conforms_spec({"a": ("required", ("integer", ("default", 1)))})


class TestDictionaryColumns:
    """Parquet readers often deliver dictionary-encoded string columns;
    every string kernel must treat them as strings transparently."""

    def test_enum_and_string_constraints_on_dictionary(self):
        d = pa.array(["en", "X9!", "de"]).dictionary_encode()
        out, _ = run({"lang": ("enum", ["en", "de"])}, {"lang": d})
        assert out.column("valid").to_pylist() == [True, False, True]
        out, _ = run({"lang": ("string", ("regex", "^[a-z]{2}$"))}, {"lang": d})
        assert out.column("valid").to_pylist() == [True, False, True]
        out, _ = run({"lang": ("string", ("min", 3))}, {"lang": d})
        assert out.column("valid").to_pylist() == [False, True, False]

    def test_multi_dispatch_from_struct_scope(self):
        arr = pa.array(
            [{"kind": "a", "v": 1}, {"kind": "b", "v": 1}],
            pa.struct([("kind", pa.string()), ("v", pa.int64())]),
        )
        out, viols = run(
            {"payload": ("multi", "kind",
                         {"a": {"kind": "string", "v": ("integer", ("gte", 0))},
                          "b": {"kind": "string", "v": ("integer", ("lt", 0))}})},
            {"payload": arr},
        )
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.column("rule_id").to_pylist() == ["integer.lt"]


class TestGraphemeLength:
    """Exact String.length parity (lib/peri.ex:879-893): Peri counts
    grapheme clusters.  Opt in with string_length="graphemes"; the
    default codepoint path stays vectorized."""

    def test_combining_and_zwj(self):
        s_combining = "é"           # é as e + combining acute
        s_family = "\U0001F468‍\U0001F469‍\U0001F467"  # ZWJ family
        t = pa.table({"s": [s_combining, s_family, "ab"]})
        # codepoints: every value exceeds max 1
        out_cp, _ = compile_spec({"s": ("string", ("max", 1))}).run_batch(t)
        assert out_cp.column("valid").to_pylist() == [False, False, False]
        # graphemes: é and the family are single clusters
        out_gr, _ = compile_spec(
            {"s": ("string", ("max", 1))}, string_length="graphemes"
        ).run_batch(t)
        assert out_gr.column("valid").to_pylist() == [True, True, False]

    def test_min_graphemes(self):
        t = pa.table({"s": ["éé", "x"]})
        out, viols = compile_spec(
            {"s": ("string", ("min", 2))}, string_length="graphemes"
        ).run_batch(t)
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.column("message").to_pylist() == [
            "should have the minimum length of 2"
        ]

    def test_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="string_length"):
            compile_spec({"s": "string"}, string_length="bytes")


class TestPcreRegexEngine:
    """Opt-in PCRE-compatible regex (the reference's ~r// supports
    lookarounds/backrefs; RE2, the vectorized default, does not)."""

    def test_lookahead_pattern(self):
        pat = r"^(?=.*[0-9])(?=.*[a-z]).+$"  # needs a digit AND a letter
        t = pa.table({"p": ["abc1", "abcdef", "123", None]})
        out, viols = compile_spec(
            {"p": ("string", ("regex", pat))}, regex_engine="pcre"
        ).run_batch(t)
        assert out.column("valid").to_pylist() == [True, False, False, True]
        assert all("~r/" in m for m in viols.column("message").to_pylist())
        # the vectorized RE2 default cannot compile lookaheads
        with pytest.raises(Exception):
            compile_spec({"p": ("string", ("regex", pat))}).run_batch(t)

    def test_invalid_engine_rejected(self):
        with pytest.raises(ValueError, match="regex_engine"):
            compile_spec({"p": "string"}, regex_engine="pcre2")

    def test_pcre_only_pattern_warns_at_compile_time(self):
        # VERDICT r1: a ported Peri schema with PCRE-only syntax used to
        # fail only at batch time; the default engine now probes every
        # regex on the driver and names the opt-in
        import warnings

        from peri_ray.compile import PeriRegexWarning

        nested = {"user": {"pw": ("string", ("regex", r"^(?=.*\d).+$"))}}
        with pytest.warns(PeriRegexWarning, match="pcre"):
            compile_spec(nested)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no warning on valid RE2
            compile_spec({"u": ("string", ("regex", r"^https?://"))})
            # nor when the PCRE engine is selected
            compile_spec(nested, regex_engine="pcre")


class TestOptInPropagation:
    """Regression: the grapheme/PCRE opt-ins must reach fields nested
    inside dict schemas, lists and choice branches (the nested
    dispatcher used to rebuild Compiled without them)."""

    def test_grapheme_inside_nested_schema(self):
        t = pa.table({"u": pa.array([{"name": "é"}],
                                    pa.struct([("name", pa.string())]))})
        out, _ = compile_spec(
            {"u": {"name": ("string", ("max", 1))}}, string_length="graphemes"
        ).run_batch(t)
        assert out.column("valid").to_pylist() == [True]

    def test_pcre_inside_nested_schema(self):
        pat = r"^(?=.*[0-9]).+$"
        t = pa.table({"u": pa.array([{"p": "a1"}, {"p": "ab"}],
                                    pa.struct([("p", pa.string())]))})
        out, _ = compile_spec(
            {"u": {"p": ("string", ("regex", pat))}}, regex_engine="pcre"
        ).run_batch(t)
        assert out.column("valid").to_pylist() == [True, False]

    def test_grapheme_inside_list(self):
        t = pa.table({"xs": [["é", "ab"]]})
        out, viols = compile_spec(
            {"xs": ("list", ("string", ("max", 1)))}, string_length="graphemes"
        ).run_batch(t)
        assert out.column("valid").to_pylist() == [False]
        assert viols.column("path").to_pylist() == ["xs.1"]


class TestSpecImpact:
    def test_fused_counts_match_two_separate_runs(self):
        import pyarrow as pa
        import ray.data as rd

        from peri_ray.validate import (spec_impact, validate_dataset,
                                       violations_dataset)

        t = pa.table({
            "id": pa.array(range(40), pa.int64()),
            "v": pa.array([None if i % 7 == 0 else i % 15
                           for i in range(40)], pa.int64()),
        })
        old = {"id": ("required", "integer"),
               "v": ("integer", ("gte", 0))}
        new = {"id": ("required", "integer"),
               "v": ("required", ("integer", ("lte", 9)))}
        got = {(r["path"], r["rule_id"]): (r["n_old"], r["n_new"],
                                           r["delta"])
               for r in spec_impact(rd.from_arrow(t).repartition(4),
                                    old, new,
                                    id_column="id").to_pylist()}

        def counts(spec):
            from collections import Counter

            vio = violations_dataset(validate_dataset(
                rd.from_arrow(t), spec, id_column="id"))
            return Counter((r["path"], r["rule_id"])
                           for r in vio.take_all())

        co, cn = counts(old), counts(new)
        want = {}
        for k in set(co) | set(cn):
            want[k] = (co.get(k, 0), cn.get(k, 0),
                       cn.get(k, 0) - co.get(k, 0))
        assert got == want
        # the tightened spec must show the planted regressions
        assert got[("v", "required")][1] == 6      # ids 0,7,...,35
        assert got[("v", "integer.lte")][1] > 0


class TestSpecCompat:
    """Spec-evolution compatibility analysis (peri_ray/compat.py) —
    the schema-registry-style pre-ship check."""

    def _sev(self, old, new, path, **kw):
        from peri_ray.compat import spec_compat

        return {f["path"]: (f["change"], f["severity"])
                for f in spec_compat(old, new, **kw)}.get(path)

    def test_identical_specs_no_findings(self):
        from peri_ray.compat import is_backward_compatible, spec_compat

        s = {"a": ("required", "integer"),
             "b": ("string", ("min", 1))}
        assert spec_compat(s, s) == []
        assert is_backward_compatible(s, s)

    def test_required_added_and_removed(self):
        old = {"a": "integer"}
        assert self._sev(old, {"a": ("required", "integer")}, "a") == (
            "required_added", "breaking")
        assert self._sev({"a": ("required", "integer")}, old, "a") == (
            "required_removed", "compatible")

    def test_field_added_variants(self):
        old = {"a": "integer"}
        assert self._sev(old, {**old, "b": ("required", "string")},
                         "b") == ("field_added_required", "breaking")
        assert self._sev(old, {**old, "b": "any"}, "b") == (
            "field_added", "compatible")
        assert self._sev(old, {**old, "b": ("integer", ("gte", 0))},
                         "b") == ("field_added", "warning")
        # required-with-default fills, so absent rows still pass
        assert self._sev(
            old, {**old, "b": ("required", ("integer", ("default", 0)))},
            "b") == ("field_added", "warning")

    def test_field_removed_mode_dependent(self):
        old = {"a": "integer", "b": "string"}
        new = {"a": "integer"}
        assert self._sev(old, new, "b") == ("field_removed", "compatible")
        assert self._sev(old, new, "b", mode="strict") == (
            "field_removed", "breaking")

    def test_type_change_breaking_and_any_widening(self):
        assert self._sev({"a": "integer"}, {"a": "string"}, "a") == (
            "type_changed", "breaking")
        assert self._sev({"a": "integer"}, {"a": "any"}, "a") == (
            "type_widened_to_any", "compatible")

    def test_monotone_constraints(self):
        old = {"a": ("integer", ("gte", 5))}
        assert self._sev(old, {"a": ("integer", ("gte", 3))}, "a") == (
            "constraint_loosened:gte", "compatible")
        assert self._sev(old, {"a": ("integer", ("gte", 7))}, "a") == (
            "constraint_tightened:gte", "breaking")
        old = {"s": ("string", ("max", 10))}
        assert self._sev(old, {"s": ("string", ("max", 20))}, "s") == (
            "constraint_loosened:max", "compatible")
        assert self._sev(old, {"s": ("string", ("max", 5))}, "s") == (
            "constraint_tightened:max", "breaking")

    def test_constraint_added_removed(self):
        assert self._sev({"a": "integer"},
                         {"a": ("integer", ("lt", 9))}, "a") == (
            "constraint_added:lt", "breaking")
        assert self._sev({"a": ("integer", ("lt", 9))},
                         {"a": "integer"}, "a") == (
            "constraint_removed:lt", "compatible")

    def test_multiple_of_divisor_loosens(self):
        old = {"a": ("integer", ("multiple_of", 10))}
        assert self._sev(old, {"a": ("integer", ("multiple_of", 5))},
                         "a") == ("constraint_loosened:multiple_of",
                                  "compatible")
        assert self._sev(old, {"a": ("integer", ("multiple_of", 3))},
                         "a") == ("constraint_changed:multiple_of",
                                  "breaking")

    def test_enum_widen_narrow(self):
        old = {"l": ("enum", ["en", "de"])}
        assert self._sev(old, {"l": ("enum", ["en", "de", "fr"])},
                         "l") == ("enum_widened", "compatible")
        assert self._sev(old, {"l": ("enum", ["en"])}, "l") == (
            "enum_narrowed", "breaking")

    def test_default_and_transform_informational(self):
        assert self._sev({"a": "integer"},
                         {"a": ("integer", ("default", 0))}, "a") == (
            "default_changed", "informational")
        assert self._sev(
            {"s": "string"},
            {"s": ("string", ("transform", str.upper))}, "s") == (
            "transform_changed", "informational")

    def test_nested_schema_recursion(self):
        old = {"m": {"x": ("integer", ("gte", 0))}}
        new = {"m": {"x": ("integer", ("gte", 5))}}
        assert self._sev(old, new, "m.x") == (
            "constraint_tightened:gte", "breaking")
        old = {"m": ("schema", {"x": "integer"})}
        new = {"m": ("schema", {"x": "string"})}
        assert self._sev(old, new, "m.x") == ("type_changed", "breaking")

    def test_list_element_recursion(self):
        old = {"xs": ("list", ("integer", ("gte", 0)))}
        new = {"xs": ("list", ("integer", ("gte", 1)))}
        assert self._sev(old, new, "xs[]") == (
            "constraint_tightened:gte", "breaking")

    def test_unclassified_is_conservative(self):
        from peri_ray.compat import is_backward_compatible

        old = {"a": ("either", ("integer", "string"))}
        new = {"a": ("oneof", ["integer", "string", "float"])}
        sev = self._sev(old, new, "a")
        assert sev is not None and sev[1] == "breaking"
        assert not is_backward_compatible(old, new)

    def test_error_override_ignored(self):
        old = {"a": ("integer", [("gte", 0), ("error", "bad value")])}
        new = {"a": ("integer", [("gte", 0), ("error", "worse value")])}
        from peri_ray.compat import spec_compat

        assert spec_compat(old, new) == []


class TestSpecCompatSoundness:
    """Property: any change spec_compat classifies compatible (plus
    informationals) must regress ZERO generated old-valid rows — the
    static analyzer's soundness contract, checked against the
    generator + compiled validator end to end."""

    BASE = {
        "a": ("required", "integer"),
        "b": ("string", ("min", 2)),
        "l": ("enum", ["x", "y"]),
        "n": ("integer", [("gte", 0), ("lte", 100)]),
    }

    LOOSENINGS = [
        ("drop_required", {"a": "integer"}),
        ("loosen_min", {"b": ("string", ("min", 1))}),
        ("drop_constraint", {"b": "string"}),
        ("widen_enum", {"l": ("enum", ["x", "y", "z"])}),
        ("raise_lte", {"n": ("integer", [("gte", 0), ("lte", 200)])}),
        ("widen_to_any", {"n": "any"}),
        ("remove_field", None),  # drop "n"
        ("add_optional_any", {"extra": "any"}),
    ]

    TIGHTENINGS = [
        ("add_required", {"b": ("required", ("string", ("min", 2)))}),
        ("raise_min", {"b": ("string", ("min", 5))}),
        ("narrow_enum", {"l": ("enum", ["x"])}),
        ("lower_lte", {"n": ("integer", [("gte", 0), ("lte", 10)])}),
        ("type_change", {"b": "integer"}),
        ("add_required_field", {"zz": ("required", "string")}),
    ]

    def _apply(self, edit):
        new = dict(self.BASE)
        name, patch = edit
        if patch is None:
            del new["n"]
        else:
            new.update(patch)
        return new

    def test_compatible_edits_never_regress_generated_data(self):
        import numpy as np

        from peri_ray.compat import is_backward_compatible
        from peri_ray.compile import compile_spec
        from peri_ray.specgen import generate_table

        t = generate_table(self.BASE, 300, seed=3)
        old_plan = compile_spec(self.BASE)
        out_old, _ = old_plan.run_batch(t)
        v_old = out_old.column("valid").to_numpy(zero_copy_only=False)
        assert v_old.all()  # generator round-trip
        for edit in self.LOOSENINGS:
            new = self._apply(edit)
            assert is_backward_compatible(self.BASE, new), edit[0]
            out_new, _ = compile_spec(new).run_batch(t)
            v_new = out_new.column("valid").to_numpy(
                zero_copy_only=False)
            assert bool(np.all(v_new)), (
                f"compatible edit {edit[0]} regressed "
                f"{int((~v_new).sum())} generated rows")

    def test_tightenings_are_flagged(self):
        from peri_ray.compat import is_backward_compatible

        for edit in self.TIGHTENINGS:
            assert not is_backward_compatible(
                self.BASE, self._apply(edit)), edit[0]


class TestCompatCLI:
    def test_compat_subcommand_json_schema_round_trip(self, tmp_path):
        import json

        from peri_ray.__main__ import main

        old = tmp_path / "old.json"
        new = tmp_path / "new.json"
        old.write_text(json.dumps({
            "type": "object",
            "properties": {"a": {"type": "integer"},
                           "b": {"type": "string", "minLength": 2}},
            "required": ["a"]}))
        new.write_text(json.dumps({
            "type": "object",
            "properties": {"a": {"type": "integer"},
                           "b": {"type": "string", "minLength": 5}},
            "required": ["a"]}))
        assert main(["compat", "--old", str(old), "--new", str(new)]) == 1
        assert main(["compat", "--old", str(old), "--new", str(new),
                     "--allow-breaking"]) == 0
        # loosening is compatible -> exit 0
        new.write_text(json.dumps({
            "type": "object",
            "properties": {"a": {"type": "integer"},
                           "b": {"type": "string", "minLength": 1}},
            "required": ["a"]}))
        assert main(["compat", "--old", str(old), "--new", str(new)]) == 0
