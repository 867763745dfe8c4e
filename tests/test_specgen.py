"""Property-style tests for the spec-driven generator (SURVEY §5.2-4):
generated data must validate clean against its own spec (the reference's
generate→validate round-trip, test/gen_overrides_test.exs:126-137), and
single-field mutations must produce exactly the matching violation.
"""

import numpy as np
import pyarrow as pa
import pytest

from peri_ray import compile_spec
from peri_ray.specgen import generate_table, generate_dataset, _sample_regex

SPECS = {
    "simple": {
        "name": ("required", "string"),
        "age": ("required", ("integer", ("gte", 18))),
        "email": ("string", ("regex", "^[a-z]+@[a-z]+\\.(com|io)$")),
    },
    "constrained": {
        "qty": ("float", ("range", (0.0, 100.0))),
        "code": ("integer", [("gte", 0), ("lte", 9999), ("multiple_of", 5)]),
        "tag": ("enum", ["a", "b", "c"]),
        "exact": ("literal", 42),
    },
    "nested": {
        "user": {
            "name": ("required", ("string", ("min", 3))),
            "score": ("float", ("gt", 0.0)),
        },
        "tags": ("list", "string", {"min": 1, "max": 3}),
        "pair": ("tuple", ["string", "integer"]),
    },
    "choice": {
        "v": ("either", ("integer", "string")),
        "w": ("oneof", ["boolean", ("integer", ("gt", 100))]),
    },
    "temporal": {
        "d": "date",
        "ts": ("required", "datetime"),
        "dur": "duration",
    },
}


class TestRoundTrip:
    @pytest.mark.parametrize("name", list(SPECS))
    def test_generated_data_validates_clean(self, name):
        spec = SPECS[name]
        table = generate_table(spec, 500, seed=7)
        assert table.num_rows == 500
        out, viols = compile_spec(spec).run_batch(table)
        assert viols.num_rows == 0, viols.to_pylist()[:3]
        assert all(out.column("valid").to_pylist())

    def test_deterministic(self):
        a = generate_table(SPECS["simple"], 100, seed=3)
        b = generate_table(SPECS["simple"], 100, seed=3)
        assert a.equals(b)
        c = generate_table(SPECS["simple"], 100, seed=4)
        assert not a.equals(c)

    def test_gen_override_field(self):
        spec = {"id": ("required", "string")}
        t = generate_table(spec, 10, seed=0,
                           overrides={"id": lambda rng, n: [f"id-{i}" for i in range(n)]})
        assert t.column("id").to_pylist()[0] == "id-0"

    def test_gen_override_in_opts(self):
        spec = {"lvl": ("enum", [1, 2, 3], {"gen": lambda rng, n: [2] * n})}
        t = generate_table(spec, 5, seed=0)
        assert t.column("lvl").to_pylist() == [2] * 5

    def test_custom_requires_override(self):
        spec = {"x": ("custom", lambda v: True)}
        with pytest.raises(ValueError, match="gen override"):
            generate_table(spec, 5)

    def test_streaming_dataset(self, ray_session):
        ds = generate_dataset(SPECS["constrained"], 2000, seed=1,
                              override_num_blocks=4)
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        assert t.num_rows == 2000
        out, viols = compile_spec(SPECS["constrained"]).run_batch(t.combine_chunks())
        assert viols.num_rows == 0


class TestRegexSampler:
    @pytest.mark.parametrize("rx", [
        "^https?://", "^[a-z]{3,5}$", "^v[0-9]+\\.[0-9]+$", "cat|dog",
        "^[A-Z][a-z]+( [A-Z][a-z]+)?$",
    ])
    def test_samples_match(self, rx):
        import re

        rng = np.random.default_rng(0)
        for s in _sample_regex(rx, rng, 20):
            assert re.search(rx, s), (rx, s)


class TestMutationProperty:
    """Mutate one field per rule → the engine emits exactly that
    violation on exactly the mutated rows (SURVEY §5.2-4)."""

    SPEC = {
        "name": ("required", ("string", ("min", 2))),
        "age": ("integer", ("gte", 18)),
        "tag": ("enum", ["a", "b"]),
    }

    def _mutate(self, table, col, values):
        idx = table.column_names.index(col)
        return table.set_column(idx, col, pa.array(values))

    def test_mutations(self):
        plan = compile_spec(self.SPEC)
        base = generate_table(self.SPEC, 50, seed=11)
        cases = [
            ("name", [None] * 50, "required"),
            ("name", ["x"] * 50, "string.min"),
            ("age", [17] * 50, "integer.gte"),
            ("tag", ["zz"] * 50, "enum"),
        ]
        for col, vals, rule in cases:
            out, viols = plan.run_batch(self._mutate(base, col, vals))
            rules = set(v["rule_id"] for v in viols.to_pylist())
            assert rules == {rule}, (col, rule, rules)
            assert viols.num_rows == 50
            assert not any(out.column("valid").to_pylist())


# ---------------------------------------------------------------------------
# hypothesis fuzz: ANY legal spec must round-trip generate → validate clean
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_names = st.sampled_from([f"f{i}" for i in range(8)])


def _leaf_types():
    prim = st.sampled_from(["string", "integer", "float", "boolean",
                            "date", "datetime", "any"])
    int_c = st.builds(
        lambda lo, span: ("integer", ("range", (lo, lo + span))),
        st.integers(-1000, 1000), st.integers(0, 500),
    )
    flt_c = st.builds(
        lambda lo, span: ("float", ("range", (float(lo), float(lo + span)))),
        st.integers(-100, 100), st.integers(1, 50),
    )
    str_c = st.builds(
        lambda lo, span: ("string", [("min", lo), ("max", lo + span)]),
        st.integers(0, 10), st.integers(1, 10),
    )
    enum = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1,
                    max_size=3, unique=True).map(lambda vs: ("enum", vs))
    lit = st.sampled_from([("literal", 42), ("literal", "on")])
    return st.one_of(prim, int_c, flt_c, str_c, enum, lit)


def _has_default(t):
    return (isinstance(t, tuple) and len(t) == 2 and isinstance(t[1], tuple)
            and len(t[1]) and t[1][0] == "default")


def _extend(children):
    # required+default is a spec ERROR by design (lib/peri.ex:829-834)
    required = children.filter(lambda t: not _has_default(t)).map(
        lambda t: ("required", t))
    lst = children.map(lambda t: ("list", t))
    lst_opts = st.builds(
        lambda t, lo, span: ("list", t, {"min": lo, "max": lo + span}),
        children, st.integers(0, 3), st.integers(0, 3),
    )
    nested = st.dictionaries(_names, children, min_size=1, max_size=2)
    either = st.tuples(children, children).map(lambda p: ("either", p))
    oneof = st.lists(children, min_size=1, max_size=3).map(
        lambda ts: ("oneof", ts))
    tup = st.lists(children, min_size=1, max_size=3).map(
        lambda ts: ("tuple", ts))
    mp = children.map(lambda t: ("map", t))
    dflt_int = st.integers(-5, 5).map(
        lambda v: ("integer", ("default", v)))
    dflt_str = st.sampled_from(["dv", "zz"]).map(
        lambda v: ("string", ("default", v)))
    return st.one_of(required, lst, lst_opts, nested, either, oneof,
                     tup, mp, dflt_int, dflt_str)


_type_expr = st.recursive(_leaf_types(), _extend, max_leaves=5)
_spec = st.dictionaries(_names, _type_expr, min_size=1, max_size=3)


class TestHypothesisRoundTrip:
    @given(spec=_spec, seed=st.integers(0, 1_000_000))
    @settings(max_examples=60, deadline=None)
    def test_generated_validates_clean(self, spec, seed):
        from peri_ray import validate_spec

        validate_spec(spec)  # grammar must only yield legal specs
        table = generate_table(spec, 25, seed=seed)
        assert table.num_rows == 25
        out, viols = compile_spec(spec).run_batch(table)
        assert viols.num_rows == 0, (spec, viols.to_pylist()[:3])
        assert all(out.column("valid").to_pylist())


class TestStreamingSchemaStability:
    def test_choice_branches_stable_across_blocks(self, ray_session):
        """Regression: generate_dataset must produce ONE schema across
        blocks even for either/oneof specs (per-block table() calls used
        to re-roll the branch choice)."""
        spec = {"v": ("either", ("integer", "string")),
                "s": ("oneof", [{"f0": "string"}, {"f1": "integer"}])}
        ds = generate_dataset(spec, 4000, seed=5, override_num_blocks=8)
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                             promote_options="none")
        assert t.num_rows == 4000


class TestJsonSerializableSchema:
    def test_temporal_schema_json_dumps(self):
        """Regression: temporal bounds must serialize to real JSON."""
        import datetime
        import json

        from peri_ray.jsonschema import from_json_schema, to_json_schema

        spec = {
            "ts": ("datetime", ("gte", datetime.datetime(1995, 1, 1))),
            "d": ("date", ("range", (datetime.date(2000, 1, 1),
                                     datetime.date(2001, 1, 1)))),
            "e": ("datetime", ("eq", datetime.datetime(1999, 9, 9))),
        }
        blob = json.dumps(to_json_schema(spec))          # must not raise
        assert from_json_schema(json.loads(blob)) == spec


class TestDatasetBatchEquivalence:
    """Row-independence property on RANDOM specs: validating through a
    multi-block Ray Dataset must agree row-for-row with a single
    run_batch over the same table (the distribution layer cannot change
    semantics)."""

    @given(spec=_spec, seed=st.integers(0, 10_000))
    @settings(max_examples=8, deadline=None)
    def test_dataset_equals_batch(self, ray_session, spec, seed):
        import ray.data as rd

        from peri_ray.validate import validate_dataset

        table = generate_table(spec, 40, seed=seed)
        # corrupt a slice so both valid and invalid rows exist: null out
        # the first column's tail
        col0 = table.column_names[0]
        vals = table.column(col0).to_pylist()
        try:
            corrupted = table.set_column(
                table.column_names.index(col0), col0,
                pa.array(vals[:20] + [None] * 20, table.column(col0).type),
            )
        except pa.ArrowInvalid:
            corrupted = table
        out_batch, _ = compile_spec(spec).run_batch(corrupted)
        ds = rd.from_arrow(corrupted).repartition(4)
        combined = validate_dataset(ds, spec, id_column=None)
        # iterate as Arrow (to_pandas would trip Ray's tensor-extension
        # cast on fixed-shape list columns); order across blocks is not
        # guaranteed, so compare the valid multiset
        got_valid = []
        for b in combined.iter_batches(batch_format="pyarrow"):
            got_valid.extend(b.column("valid").to_pylist())
        assert sorted(got_valid) == sorted(out_batch.column("valid").to_pylist())


class TestModeEquivalenceOnAscii:
    """On ASCII corpora the grapheme and PCRE opt-ins must agree row
    for row with the vectorized defaults, for ANY random spec (the
    opt-ins change unicode semantics, not logic)."""

    @given(spec=_spec, seed=st.integers(0, 10_000))
    @settings(max_examples=25, deadline=None)
    def test_optins_equal_defaults(self, spec, seed):
        table = generate_table(spec, 30, seed=seed)
        a, _ = compile_spec(spec).run_batch(table)
        b, _ = compile_spec(spec, string_length="graphemes",
                            regex_engine="pcre").run_batch(table)
        assert a.column("valid").to_pylist() == b.column("valid").to_pylist()


class TestViolationConsistency:
    """Structural invariant on RANDOM specs + corrupted data: the valid
    mask and the violations table must correspond exactly — every
    invalid row owns ≥1 violation and every violation points at an
    invalid row (record_id = row index when id_column is None)."""

    @given(spec=_spec, seed=st.integers(0, 10_000))
    @settings(max_examples=40, deadline=None)
    def test_mask_matches_violation_rows(self, spec, seed):
        table = generate_table(spec, 30, seed=seed)
        # corrupt: null out the tail of the first column (trips required
        # inside nested/required specs; harmless for optional ones)
        col0 = table.column_names[0]
        vals = table.column(col0).to_pylist()
        try:
            table = table.set_column(
                table.column_names.index(col0), col0,
                pa.array(vals[:15] + [None] * 15, table.column(col0).type),
            )
        except pa.ArrowInvalid:
            pass
        out, viols = compile_spec(spec).run_batch(table)
        valid = out.column("valid").to_pylist()
        bad_rows = {str(i) for i, v in enumerate(valid) if not v}
        viol_rows = set(viols.column("record_id").to_pylist())
        assert viol_rows == bad_rows, (spec, bad_rows ^ viol_rows)


class TestRandomMutationProperty:
    """Constraint-aware mutation on RANDOM parameters: for a leaf spec
    drawn with random bounds, injecting a value just outside the bound
    must fire exactly that rule on exactly the mutated rows."""

    @given(lo=st.integers(-1000, 1000), span=st.integers(0, 500),
           seed=st.integers(0, 10_000))
    @settings(max_examples=30, deadline=None)
    def test_int_range_bounds(self, lo, span, seed):
        spec = {"v": ("integer", ("range", (lo, lo + span)))}
        base = generate_table(spec, 20, seed=seed)
        for bad in (lo - 1, lo + span + 1):
            t = base.set_column(0, "v", pa.array([bad] * 20, pa.int64()))
            out, viols = compile_spec(spec).run_batch(t)
            assert not any(out.column("valid").to_pylist())
            assert set(viols.column("rule_id").to_pylist()) == {"integer.range"}
            assert viols.num_rows == 20

    @given(lo=st.integers(1, 10), span=st.integers(0, 10),
           seed=st.integers(0, 10_000))
    @settings(max_examples=20, deadline=None)
    def test_string_length_bounds(self, lo, span, seed):
        hi = lo + span
        spec = {"s": ("string", [("min", lo), ("max", hi)])}
        base = generate_table(spec, 10, seed=seed)
        too_short = "x" * (lo - 1)
        too_long = "x" * (hi + 1)
        for bad, rule in ((too_short, "string.min"), (too_long, "string.max")):
            t = base.set_column(0, "s", pa.array([bad] * 10, pa.string()))
            out, viols = compile_spec(spec).run_batch(t)
            assert not any(out.column("valid").to_pylist())
            assert set(viols.column("rule_id").to_pylist()) == {rule}

    @given(choices=st.lists(st.sampled_from(["a", "b", "c", "d"]),
                            min_size=1, max_size=3, unique=True),
           seed=st.integers(0, 10_000))
    @settings(max_examples=20, deadline=None)
    def test_enum_out_of_set(self, choices, seed):
        spec = {"e": ("enum", choices)}
        base = generate_table(spec, 10, seed=seed)
        t = base.set_column(0, "e", pa.array(["__nope__"] * 10, pa.string()))
        out, viols = compile_spec(spec).run_batch(t)
        assert not any(out.column("valid").to_pylist())
        assert set(viols.column("rule_id").to_pylist()) == {"enum"}
