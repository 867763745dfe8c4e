"""Spec inference: types from Arrow schema, required from null counts,
enums from capped distinct partials, struct recursion, and the
infer→validate round trip."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


class TestInferSpec:
    def test_flat_types_required_enum(self, ray_session):
        from peri_ray.infer import infer_spec

        tbl = pa.table({
            "id": pa.array(range(40), pa.int64()),
            "score": pa.array([float(i) for i in range(40)], pa.float64()),
            "lang": pa.array((["en", "de", None, "fr"] * 10)),
            "text": pa.array([f"unique text {i}" for i in range(40)]),
            "flag": pa.array([True, False] * 20),
        })
        spec = infer_spec(_ds(tbl), enum_threshold=8)
        assert spec["id"] == ("required", "integer")
        assert spec["score"] == ("required", "float")
        assert spec["lang"] == ("enum", ["de", "en", "fr"])  # nulls → optional
        assert spec["text"] == ("required", "string")  # 40 distinct > 8
        assert spec["flag"] == ("required", "boolean")

    def test_enum_threshold_boundary(self, ray_session):
        from peri_ray.infer import infer_spec

        vals = [f"v{i:02d}" for i in range(8)]
        tbl = pa.table({"c": pa.array(vals * 5)})
        assert infer_spec(_ds(tbl), enum_threshold=8)["c"] == \
            ("required", ("enum", vals))
        assert infer_spec(_ds(tbl), enum_threshold=7)["c"] == \
            ("required", "string")

    def test_struct_recursion_and_parent_nulls(self, ray_session):
        from peri_ray.infer import infer_spec

        inner = pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, None] * 10)
        tbl = pa.table({"id": pa.array(range(30), pa.int64()), "s": inner})
        spec = infer_spec(_ds(tbl), enum_threshold=8)
        # parent has nulls → optional; children inherit parent nulls
        assert spec["s"] == {"a": "integer", "b": ("enum", ["x", "y"])}

    def test_with_ranges(self, ray_session):
        from peri_ray.infer import infer_spec

        tbl = pa.table({
            "i": pa.array([3, 7, 5, -2], pa.int64()),
            "f": pa.array([0.5, 2.25, 1.0, 1.5], pa.float64()),
        })
        spec = infer_spec(_ds(tbl, blocks=2), with_ranges=True)
        assert spec["i"] == ("required", ("integer", ("range", (-2, 7))))
        assert spec["f"] == ("required", ("float", ("range", (0.5, 2.25))))

    def test_round_trip_validates_clean(self, ray_session):
        from peri_ray.infer import infer_spec
        from peri_ray.validate import conforms

        rng = np.random.default_rng(2)
        tbl = pa.table({
            "id": pa.array(range(100), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(100)]),
            "value": pa.array(rng.normal(size=100)),
            "note": pa.array([None if i % 7 == 0 else f"n{i}"
                              for i in range(100)]),
        })
        ds = _ds(tbl)
        spec = infer_spec(ds, enum_threshold=8, with_ranges=True)
        from peri_ray.spec import validate_spec

        validate_spec(spec)  # inferred specs must be legal specs
        assert conforms(_ds(tbl), spec) is True

    def test_all_null_string_column(self, ray_session):
        from peri_ray.infer import infer_spec

        tbl = pa.table({"id": pa.array(range(10), pa.int64()),
                        "s": pa.array([None] * 10, pa.string())})
        spec = infer_spec(_ds(tbl))
        assert spec["s"] == "string"  # no enum from zero observed values

    def test_spec_as_table_rendering(self, ray_session):
        from peri_ray.infer import infer_spec, spec_as_table

        inner = pa.array([{"a": 1}] * 10)
        tbl = pa.table({"id": pa.array(range(10), pa.int64()), "s": inner})
        t = spec_as_table(infer_spec(_ds(tbl)))
        rows = {r["field"]: (r["type"], r["required"], r["enum_vals"])
                for r in t.to_pylist()}
        assert rows["id"] == ("integer", True, None)
        assert rows["s"] == ("map", True, None)
        assert rows["s.a"] == ("integer", True, None)


class TestSpecDiff:
    def test_all_change_kinds(self):
        from peri_ray.infer import spec_diff_table

        a = {"id": ("required", "integer"),
             "name": ("required", "string"),
             "status": ("required", ("enum", ["a", "b"])),
             "score": "float",
             "old": "string"}
        b = {"id": ("required", "integer"),
             "name": "string",                       # required flip
             "status": ("required", ("enum", ["a", "b", "c"])),  # enum
             "score": "integer",                     # type change
             "fresh": "boolean"}                     # added (+ old removed)
        out = {(r["field"], r["change"]): (r["before"], r["after"])
               for r in spec_diff_table(a, b).to_pylist()}
        assert out[("old", "removed")] == ("string", None)
        assert out[("fresh", "added")] == (None, "boolean")
        assert out[("score", "type_changed")] == ("float", "integer")
        assert out[("name", "required_changed")] == ("true", "false")
        assert out[("status", "enum_changed")] == ("a,b", "a,b,c")
        assert ("id", "type_changed") not in out and len(out) == 5

    def test_identical_specs_empty(self):
        from peri_ray.infer import spec_diff_table

        s = {"x": ("required", "integer"), "y": ("enum", ["p", "q"])}
        assert spec_diff_table(s, s).num_rows == 0
