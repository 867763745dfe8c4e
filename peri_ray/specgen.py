"""Spec-driven synthetic data generation — engine analogue of
``Peri.generate/1`` / ``Peri.Generatable`` (reference
``lib/peri/generatable.ex:75-320``).

Where the reference builds per-value StreamData streams (with filters
for constraints), the engine generates whole Arrow columns with seeded
NumPy and then *rejection-resamples* any rows the compiled plan rejects
— the same generate-then-filter semantics, vectorized, and with the
round-trip property (generated data validates clean) guaranteed by
construction.

``gen:`` overrides (reference ``lib/peri.ex:1375-1383``): an opts dict
``{"gen": fn}`` on ``("meta", t, opts)`` / ``("enum", vs, opts)`` /
``("required", t, opts)``, or the ``overrides={field: fn}`` argument;
the callable receives ``(rng, n)`` and returns anything
``pa.array``-able.

``generate_dataset`` streams: ``rd.range(n)`` → ``map_batches`` with a
per-batch RNG seeded by (seed, first index) — same shape as the
web_pages generator, so tables of any size stream through the object
store without driver materialization.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa

from peri_ray import spec as S

_LOWER = np.array(list("abcdefghijklmnopqrstuvwxyz"))


# ---------------------------------------------------------------------------
# regex sampling: build matching strings from the parsed pattern
# ---------------------------------------------------------------------------

def _sample_regex(pattern: str, rng: np.random.Generator, n: int) -> list[str]:
    """Deterministic samples matching ``pattern`` (subset of re syntax:
    literals, classes, ranges, \\d \\w \\s, repeats, branches, groups).
    The engine twin of StreamData's string(:ascii) |> filter(match?)."""
    try:
        import re._parser as sre_parse  # py3.11+: silence sre_parse deprecation
    except ImportError:  # pragma: no cover
        import sre_parse

    parsed = sre_parse.parse(pattern)

    def emit(tokens) -> str:
        out = []
        for op, av in tokens:
            op = str(op).lower()
            if op == "literal":
                out.append(chr(av))
            elif op == "any":
                out.append(chr(rng.integers(97, 123)))
            elif op == "in":
                out.append(_pick_in(av))
            elif op in ("max_repeat", "min_repeat"):
                lo, hi, sub = av
                hi = min(hi if hi != sre_parse.MAXREPEAT else lo + 3, lo + 3)
                reps = int(rng.integers(lo, hi + 1)) if hi > lo else lo
                out.append("".join(emit(sub) for _ in range(reps)))
            elif op == "subpattern":
                out.append(emit(av[3]))
            elif op == "branch":
                choices = av[1]
                out.append(emit(choices[int(rng.integers(0, len(choices)))]))
            elif op in ("at", "assert", "assert_not"):
                continue  # anchors / lookarounds contribute nothing
            elif op == "category":
                out.append(_pick_category(av))
            else:  # pragma: no cover - exotic ops
                out.append("a")
        return "".join(out)

    def _pick_in(items) -> str:
        cands: list[str] = []
        for op, av in items:
            op = str(op).lower()
            if op == "literal":
                cands.append(chr(av))
            elif op == "range":
                lo, hi = av
                cands.append(chr(int(rng.integers(lo, hi + 1))))
            elif op == "category":
                cands.append(_pick_category(av))
            elif op == "negate":
                continue
        if not cands:  # negated class: try a letter
            return chr(rng.integers(97, 123))
        return cands[int(rng.integers(0, len(cands)))]

    def _pick_category(cat) -> str:
        c = str(cat).lower()
        if "digit" in c:
            return chr(rng.integers(48, 58))
        if "space" in c:
            return " "
        return chr(rng.integers(97, 123))

    return [emit(parsed) for _ in range(n)]


# ---------------------------------------------------------------------------
# per-type column generators
# ---------------------------------------------------------------------------

def _rand_strings(rng: np.random.Generator, n: int, lo: int = 1, hi: int = 12) -> list[str]:
    lens = rng.integers(lo, hi + 1, size=n)
    flat = rng.integers(0, 26, size=int(lens.sum()))
    chars = _LOWER[flat]
    out, pos = [], 0
    for k in lens:
        out.append("".join(chars[pos:pos + k]))
        pos += k
    return out


def _numeric_bounds(constraints: list[tuple]) -> tuple[float, float, Any]:
    lo, hi, mult = -1000.0, 1000.0, None
    for c in constraints:
        tag, v = c[0], c[1]
        if tag == "eq":
            lo = hi = float(v)
        elif tag == "gt":
            lo = float(v) + 1
        elif tag == "gte":
            lo = float(v)
        elif tag == "lt":
            hi = float(v) - 1
        elif tag == "lte":
            hi = float(v)
        elif tag == "range":
            lo, hi = float(v[0]), float(v[1])
        elif tag == "multiple_of":
            mult = v
    if hi < lo:
        hi = lo
    return lo, hi, mult


class Generator:
    """Compile-once column generator for a spec (≅ Peri.Generatable)."""

    def __init__(self, spec: dict[str, Any], registry: dict | None = None,
                 overrides: dict[str, Callable] | None = None):
        S.validate_spec(spec)
        self.spec = spec
        self.registry = registry or {}
        self.overrides = overrides or {}
        self._branch_choice: dict[str, int] = {}

    # -- public -----------------------------------------------------------
    def table(self, n: int, seed: int = 0, validate: bool = True) -> pa.Table:
        rng = np.random.default_rng(seed)
        # branch choices (either/oneof/multi) pin per path for the LIFETIME
        # of this Generator, not per table() call: the resample loop must
        # regenerate rows with the SAME arrow type (concat fails on e.g.
        # struct<f0> vs struct<f1>), and generate_dataset's per-block
        # table() calls must all produce one schema or the Dataset's
        # blocks cannot unify
        cols = {k: self._gen(t, rng, n, path=k) for k, t in self.spec.items()}
        table = pa.table(cols)
        if not validate:
            return table
        return self._resample_invalid(table, rng)

    def _resample_invalid(self, table: pa.Table, rng: np.random.Generator) -> pa.Table:
        """Generate-then-filter semantics: rows the compiled plan rejects
        are regenerated (≅ StreamData.filter, which gives up after a
        bounded number of tries)."""
        from peri_ray.compile import compile_spec
        import pyarrow.compute as pc

        plan = compile_spec(self.spec, registry=self.registry)
        for _ in range(8):
            out, _viol = plan.run_batch(table)
            valid = out.column("valid")
            bad = pc.invert(valid)
            n_bad = pc.sum(bad).as_py() or 0
            if not n_bad:
                return table
            fresh = pa.table(
                {k: self._gen(t, rng, n_bad, path=k) for k, t in self.spec.items()}
            )
            keep = table.filter(valid)
            table = pa.concat_tables(
                [keep.select(fresh.column_names), fresh], promote_options="permissive"
            )
        raise ValueError("could not generate valid data for spec after 8 rounds")

    # -- dispatch ---------------------------------------------------------
    def _gen(self, t: Any, rng: np.random.Generator, n: int, path: str = ""):
        if path in self.overrides:
            return pa.array(self.overrides[path](rng, n))
        if isinstance(t, str):
            return self._primitive(t, rng, n)
        if isinstance(t, dict):
            names = list(t.keys())
            children = [pa.array(self._gen(st, rng, n, f"{path}.{k}")) for k, st in t.items()]
            return pa.StructArray.from_arrays(children, names)
        if not (isinstance(t, tuple) and t):
            raise ValueError(f"cannot generate for {t!r}")
        tag = t[0]
        opts = t[2] if len(t) > 2 and isinstance(t[2], dict) else None
        if opts and callable(opts.get("gen")):
            return pa.array(opts["gen"](rng, n))
        if tag in ("required", "meta", "schema"):
            return self._gen(t[1], rng, n, path)
        if tag == "literal":
            return pa.array([t[1]] * n)
        if tag == "enum":
            vs = list(t[1])
            return pa.array([vs[i] for i in rng.integers(0, len(vs), size=n)])
        if tag == "list":
            return self._gen_list(t, rng, n, path)
        if tag == "tuple":
            children = [
                pa.array(self._gen(st, rng, n, f"{path}.f{i}")) for i, st in enumerate(t[1])
            ]
            return pa.StructArray.from_arrays(children, [f"f{i}" for i in range(len(t[1]))])
        if tag == "map":
            return self._gen_map(t, rng, n, path)
        if tag in ("either", "oneof"):
            branches = list(t[1]) if tag == "oneof" else [t[1][0], t[1][1]]
            roll = int(rng.integers(0, len(branches)))
            key = f"{path}#{tag}:{len(branches)}"
            pick = branches[self._branch_choice.setdefault(key, roll)]
            return self._gen(pick, rng, n, path)
        if tag == "multi":
            branches = t[2]
            roll = int(rng.integers(0, len(branches)))
            key = f"{path}#multi:{len(branches)}"
            tagval = list(branches.keys())[self._branch_choice.setdefault(key, roll)]
            return self._gen(branches[tagval], rng, n, path)
        if tag == "ref":
            return self._gen(self.registry[t[1]], rng, n, path)
        if tag == "cond":
            # no row context at gen time: satisfy the stricter true-branch
            return self._gen(t[2], rng, n, path)
        if tag == "dependent":
            if len(t) == 4:  # pairwise: generate the declared type
                return self._gen(t[3], rng, n, path)
            raise ValueError(
                f"{path}: {{:dependent, cb}} needs a gen override (callback decides the schema)"
            )
        if tag == "custom":
            raise ValueError(f"{path}: {{:custom}} needs a gen override")
        if S.is_constraint_attachment(t):
            return self._constrained(t, rng, n, path)
        raise ValueError(f"cannot generate for {t!r}")

    # -- pieces -----------------------------------------------------------
    def _primitive(self, tname: str, rng: np.random.Generator, n: int):
        if tname in ("string", "atom", "any"):
            return pa.array(_rand_strings(rng, n))
        if tname == "integer":
            return pa.array(rng.integers(-1000, 1000, size=n), pa.int64())
        if tname == "float":
            return pa.array(np.round(rng.normal(0, 100, size=n), 6), pa.float64())
        if tname == "boolean":
            return pa.array(rng.integers(0, 2, size=n).astype(bool))
        if tname == "binary":
            return pa.array([bytes(b) for b in rng.integers(0, 256, size=(n, 8), dtype=np.uint8)], pa.binary())
        if tname == "date":
            days = rng.integers(0, 20000, size=n)
            return pa.array(np.datetime64("1990-01-01") + days.astype("timedelta64[D]"))
        if tname == "time":
            us = rng.integers(0, 86_400_000_000, size=n)
            return pa.array(us, pa.time64("us"))
        if tname in ("datetime", "naive_datetime"):
            us = rng.integers(0, 2_000_000_000_000_000, size=n)
            base = np.datetime64("1990-01-01T00:00:00", "us")
            arr = pa.array(base + us.astype("timedelta64[us]"))
            return arr.cast(pa.timestamp("us", tz="UTC")) if tname == "datetime" else arr
        if tname == "duration":
            return pa.array(rng.integers(0, 10**9, size=n), pa.duration("us"))
        if tname == "map":
            keys = pa.array(_rand_strings(rng, n))
            vals = pa.array(_rand_strings(rng, n))
            offsets = pa.array(np.arange(n + 1, dtype=np.int32))
            return pa.MapArray.from_arrays(offsets, keys, vals)
        raise ValueError(f"cannot generate primitive {tname!r}")

    def _constrained(self, t: tuple, rng: np.random.Generator, n: int, path: str):
        inner, attachment = t
        if isinstance(attachment, tuple) and attachment[0] in ("default", "transform"):
            return self._gen(inner, rng, n, path)
        constraints = attachment if isinstance(attachment, list) else [attachment]
        if inner == "string":
            lo, hi, eq, rx = 1, 12, None, None
            for c in constraints:
                if c[0] == "min":
                    lo = max(lo, c[1])
                elif c[0] == "max":
                    hi = min(hi, c[1])
                elif c[0] == "eq":
                    eq = c[1]
                elif c[0] == "regex":
                    rx = c[1]
            if eq is not None:
                return pa.array([eq] * n)
            if rx is not None:
                samples = _sample_regex(rx, rng, n)
                if not all(re.search(rx, s) for s in samples[:3]):
                    raise ValueError(f"{path}: cannot sample regex {rx!r}; use a gen override")
                return pa.array(samples)
            hi = max(hi, lo)
            return pa.array(_rand_strings(rng, n, lo, hi))
        lo, hi, mult = _numeric_bounds(constraints)
        if inner == "integer":
            vals = rng.integers(int(np.ceil(lo)), int(np.floor(hi)) + 1, size=n)
            if mult:
                vals = (vals // int(mult)) * int(mult)
                vals = np.clip(vals, int(np.ceil(lo)), int(np.floor(hi)))
            neq = [c[1] for c in constraints if c[0] == "neq"]
            if neq:
                vals = np.where(np.isin(vals, neq), vals + 1, vals)
            return pa.array(vals, pa.int64())
        if inner == "float":
            vals = rng.uniform(lo, np.nextafter(hi, np.inf), size=n)
            if mult:
                vals = np.round(vals / mult) * mult
                vals = np.clip(vals, lo, hi)
            neq = [c[1] for c in constraints if c[0] == "neq"]
            if neq:
                vals = np.where(np.isin(vals, neq), vals + 0.5, vals)
            return pa.array(vals, pa.float64())
        raise ValueError(f"cannot generate constrained {inner!r}")

    def _gen_list(self, t: tuple, rng: np.random.Generator, n: int, path: str):
        lo, hi, unique = 0, 4, False
        if len(t) > 2 and isinstance(t[2], dict):
            lo = t[2].get("min", lo)
            hi = t[2].get("max", hi)
            unique = t[2].get("unique", False)
        hi = max(hi, lo)
        lens = rng.integers(lo, hi + 1, size=n)
        total = int(lens.sum())
        flat = self._gen(t[1], rng, max(total, 1), f"{path}[]")
        if total == 0:
            flat = flat.slice(0, 0)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        out = pa.ListArray.from_arrays(offsets, flat.slice(0, total))
        if unique:
            # dedup within each row, padding by regeneration is overkill:
            # shrink rows to their unique prefix (still satisfies min via
            # the resample loop if it ever under-runs)
            import pyarrow.compute as pc

            rows = out.to_pylist()
            rows = [list(dict.fromkeys(r)) if r else r for r in rows]
            out = pa.array(rows, out.type)
        return out

    def _gen_map(self, t: tuple, rng: np.random.Generator, n: int, path: str):
        lens = rng.integers(1, 4, size=n)
        total = int(lens.sum())
        if len(t) == 2:
            keys = pa.array(_rand_strings(rng, total))
            items = self._gen(t[1], rng, total, f"{path}{{}}")
        else:
            keys = pa.array(self._gen(t[1], rng, total, f"{path}{{k}}"))
            items = self._gen(t[2], rng, total, f"{path}{{v}}")
        # map keys must be unique per row: suffix duplicates positionally
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        if pa.types.is_string(keys.type):
            raw = keys.to_pylist()
            fixed = []
            for i in range(n):
                seen: dict[str, int] = {}
                for kk in raw[offsets[i]:offsets[i + 1]]:
                    if kk in seen:
                        seen[kk] += 1
                        kk = f"{kk}{seen[kk]}"
                    seen.setdefault(kk, 0)
                    fixed.append(kk)
            keys = pa.array(fixed)
        return pa.MapArray.from_arrays(pa.array(offsets), keys, items)


def generate_table(spec: dict, n: int, seed: int = 0, registry: dict | None = None,
                   overrides: dict[str, Callable] | None = None) -> pa.Table:
    """Seeded pa.Table of n rows satisfying ``spec`` (round-trip property:
    ``compile_spec(spec).run_batch(table)`` marks every row valid)."""
    return Generator(spec, registry, overrides).table(n, seed)


def generate_dataset(spec: dict, n: int, seed: int = 0, registry: dict | None = None,
                     overrides: dict[str, Callable] | None = None,
                     override_num_blocks: int | None = None):
    """Streaming form: the table generates block-by-block inside
    ``map_batches`` (per-batch RNG seeded by (seed, first index)), so any
    scale streams with backpressure — no driver materialization."""
    import ray.data as rd

    gen = Generator(spec, registry, overrides)
    # pre-pin branch choices on the driver so every pickled task copy
    # carries the same either/oneof/multi decisions → one schema across
    # all blocks
    gen.table(1, seed=seed, validate=False)

    def _batch(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        return gen.table(len(ids), seed=seed * 1_000_003 + int(ids[0]))

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(_batch, batch_format="pyarrow", batch_size=8192)
