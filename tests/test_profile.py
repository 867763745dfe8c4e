"""Tests for the data-profiling operators (stages/profile.py):
schema profiles, snapshot drift rows, and candidate-key discovery."""

import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _base_table() -> pa.Table:
    return pa.table({
        "id": pa.array(range(100), pa.int64()),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(100)],
                         pa.string()),
        "txt": pa.array([f"t{i}" for i in range(100)], pa.string()),
        "val": pa.array([float(i % 7) for i in range(100)], pa.float64()),
    })


class TestSchemaProfile:
    def test_profile_rows(self):
        from peri_ray.stages.profile import schema_profile

        prof = schema_profile(rd.from_arrow(_base_table()).repartition(6))
        row = {r["column"]: r for r in prof.to_pylist()}
        assert set(row) == {"id", "lang", "txt", "val"}
        assert row["id"]["dtype"] == "int64"
        assert row["val"]["dtype"] == "double"
        assert row["lang"]["domain"] == "de,en,fr"  # closed, sorted
        assert row["txt"]["domain"] is None  # 100 distinct > max_domain
        assert row["id"]["n_rows"] == 100 and row["id"]["n_nulls"] == 0

    def test_null_counting_and_domain_cap(self):
        from peri_ray.stages.profile import schema_profile

        t = pa.table({"s": pa.array(["a", None, "b", None], pa.string())})
        prof = schema_profile(rd.from_arrow(t), max_domain=1)
        r = prof.to_pylist()[0]
        assert r["n_nulls"] == 2
        assert r["domain"] is None  # 2 distinct > cap of 1


class TestSchemaDrift:
    def test_change_rows(self):
        from peri_ray.stages.profile import schema_drift, schema_profile

        base = schema_profile(rd.from_arrow(_base_table()).repartition(6))
        t2 = pa.table({
            "id": pa.array([str(i) for i in range(100)], pa.string()),
            "lang": pa.array([("en", "de", "it")[i % 3]
                              for i in range(100)], pa.string()),
            "txt": pa.array([f"t{i}" if i % 5 else None
                             for i in range(100)], pa.string()),
            "extra": pa.array(range(100), pa.int64()),
        })
        new = schema_profile(rd.from_arrow(t2).repartition(4))
        got = [(r["column"], r["change"], r["base_value"], r["new_value"])
               for r in schema_drift(base, new).to_pylist()]
        assert got == [
            ("extra", "column_added", None, "int64"),
            ("id", "dtype_changed", "int64", "string"),
            ("lang", "domain_added_values", None, "it"),
            ("lang", "domain_removed_values", "fr", None),
            ("txt", "null_rate", "0.000000", "0.200000"),
            ("val", "column_removed", "double", None),
        ]

    def test_identical_profiles_no_rows(self):
        from peri_ray.stages.profile import schema_drift, schema_profile

        p = schema_profile(rd.from_arrow(_base_table()))
        assert schema_drift(p, p).num_rows == 0

    def test_null_rate_tolerance(self):
        from peri_ray.stages.profile import schema_drift, schema_profile

        a = pa.table({"s": pa.array(["x"] * 999 + [None], pa.string())})
        b = pa.table({"s": pa.array(["x"] * 998 + [None] * 2, pa.string())})
        pa_, pb = (schema_profile(rd.from_arrow(a)),
                   schema_profile(rd.from_arrow(b)))
        # 0.001 -> 0.002 is inside the default 0.005 tolerance
        assert schema_drift(pa_, pb).num_rows == 0


class TestDiscoverUniqueKeys:
    def test_single_and_composite(self):
        from peri_ray.stages.profile import discover_unique_keys

        ds = rd.from_arrow(_base_table()).repartition(6)
        got = {r["combo"]: r["is_unique"]
               for r in discover_unique_keys(
                   ds, [["id"], ["lang"], ["lang", "val"],
                        ["id", "lang"]]).to_pylist()}
        assert got == {"id": True, "lang": False,
                       "lang,val": False, "id,lang": True}

    def test_nulls_compare_equal(self):
        from peri_ray.stages.profile import discover_unique_keys

        t = pa.table({"a": pa.array([None, None, "x"], pa.string())})
        got = discover_unique_keys(rd.from_arrow(t), [["a"]]).to_pylist()
        assert got == [{"combo": "a", "is_unique": False}]

    def test_cross_batch_duplicate(self):
        from peri_ray.stages.profile import discover_unique_keys

        # each block is internally unique; the duplicate spans blocks,
        # so the verdict must come from the exchange, not the marker
        t = pa.table({"k": pa.array(list(range(50)) + [0], pa.int64())})
        ds = rd.from_arrow(t).repartition(2)
        got = discover_unique_keys(ds, [["k"]]).to_pylist()
        assert got == [{"combo": "k", "is_unique": False}]


class TestInferSpecRoundTrip:
    """peri_ray.infer.infer_spec is the single spec-inference surface
    (stages/profile.py only renders profiles/diffs); these pin the
    round-trip the `inferred_spec_violations` query depends on."""

    def test_inferred_spec_is_legal_and_self_consistent(self):
        from peri_ray.infer import infer_spec
        from peri_ray.spec import validate_spec
        from peri_ray.validate import validate_dataset, violations_dataset

        ds = rd.from_arrow(_base_table()).repartition(4)
        spec = infer_spec(ds)
        validate_spec(spec)  # must be a legal spec
        assert spec["id"] == ("required", "integer")
        assert spec["val"] == ("required", "float")
        assert spec["lang"] == ("required", ("enum", ["de", "en", "fr"]))
        assert spec["txt"] == ("required", "string")  # open domain
        # by construction: zero violations on the profiled data itself
        combined = validate_dataset(ds, spec, id_column="id")
        assert violations_dataset(combined).count() == 0

    def test_drifted_snapshot_flags_exactly_the_drift(self):
        from peri_ray.infer import infer_spec
        from peri_ray.validate import validate_dataset, violations_dataset

        spec = infer_spec(rd.from_arrow(_base_table()))
        drifted = pa.table({
            "id": pa.array(range(100), pa.int64()),
            "lang": pa.array(["it" if i == 7 else ("en", "de", "fr")[i % 3]
                              for i in range(100)], pa.string()),
            "txt": pa.array([None if i == 3 else f"t{i}"
                             for i in range(100)], pa.string()),
            "val": pa.array([float(i % 7) for i in range(100)],
                            pa.float64()),
        })
        combined = validate_dataset(rd.from_arrow(drifted), spec,
                                    id_column="id")
        got = {(r["record_id"], r["rule_id"], r["path"])
               for r in violations_dataset(combined).take_all()}
        assert got == {("7", "enum", "lang"), ("3", "required", "txt")}


class TestInclusionReport:
    """inclusion_report (checks.py) — FK/inclusion-dependency
    discovery with exact containment coefficients."""

    def _ds(self, vals, typ=pa.int64()):
        return rd.from_arrow(pa.table({"k": pa.array(vals, typ)}))

    def test_full_partial_and_empty(self):
        from peri_ray.stages.checks import inclusion_report

        out = inclusion_report([
            ("a_full", self._ds([1, 2, 2, 3]), "k",
             self._ds([1, 2, 3, 4]), "k"),
            ("b_partial", self._ds([1, 2, 3, 9]), "k",
             self._ds([1, 2, 3]), "k"),
            ("c_empty", self._ds([None, None]), "k",
             self._ds([1]), "k"),
        ]).to_pylist()
        by = {r["pair"]: r for r in out}
        assert [r["pair"] for r in out] == ["a_full", "b_partial",
                                            "c_empty"]
        assert by["a_full"]["n_distinct"] == 3
        assert by["a_full"]["n_missing"] == 0
        assert by["a_full"]["containment"] == 1.0
        assert by["a_full"]["is_inclusion"] is True
        assert by["b_partial"]["n_distinct"] == 4
        assert by["b_partial"]["n_missing"] == 1
        assert by["b_partial"]["containment"] == 3.0 / 4.0
        assert by["b_partial"]["is_inclusion"] is False
        # all-null fact side: vacuous, no division by zero
        assert by["c_empty"]["n_distinct"] == 0
        assert by["c_empty"]["containment"] is None
        assert by["c_empty"]["is_inclusion"] is False

    def test_null_fk_is_vacuous(self):
        from peri_ray.stages.checks import inclusion_report

        out = inclusion_report([
            ("p", self._ds([1, None, 2]), "k", self._ds([1, 2]), "k"),
        ]).to_pylist()
        assert out[0]["n_distinct"] == 2
        assert out[0]["is_inclusion"] is True

    def test_mixed_key_types_share_one_exchange(self):
        from peri_ray.stages.checks import inclusion_report

        out = inclusion_report([
            ("ints", self._ds([1, 2]), "k", self._ds([1, 2, 3]), "k"),
            ("strs", self._ds(["x", "y"], pa.string()), "k",
             self._ds(["x"], pa.string()), "k"),
        ]).to_pylist()
        by = {r["pair"]: r for r in out}
        assert by["ints"]["is_inclusion"] is True
        assert by["strs"]["n_missing"] == 1
